"""Segmentation subsystem: ResNet+UPerNet model, unified-parsing wrapper,
torch checkpoint import (reference ``netdissect/segmenter.py`` +
``upsegmodel/models.py``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ganspace_tpu.dissection import (
    ResNetConfig, UPerNetConfig, UnifiedParsingSegmenter, dissect,
    init_upernet_params, upernet_forward,
)
from ganspace_tpu.dissection.segmodel import fold_bn, import_torch_resnet
from ganspace_tpu.models.base import InstrumentedModel

from helpers import tiny_dcgan

TINY = UPerNetConfig(
    resnet=ResNetConfig(blocks=(1, 1, 1, 1), width=16),
    fpn_dim=32, ppm_scales=(1, 2), n_objects=7, n_parts=5, n_materials=4,
    n_scenes=3)


@pytest.fixture(scope="module")
def seg():
    return UnifiedParsingSegmenter(cfg=TINY, segsizes=(32,), seed=0)


@pytest.mark.slow
def test_upernet_shapes():
    params = init_upernet_params(TINY, seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    out = upernet_forward(params, x, TINY)
    assert out["object"].shape == (2, 7, 8, 8)      # c2 = /4 resolution
    assert out["part"].shape == (2, 5, 8, 8)
    assert out["material"].shape == (2, 4, 8, 8)
    assert out["scene"].shape == (2, 3)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_flat_label_space(seg):
    labels, cats = seg.get_label_and_category_names()
    assert labels[0] == "-" and cats[0] == "-"
    assert len(labels) == len(cats) == 1 + 6 + 4 + 3
    assert cats[1:7] == ["object"] * 6
    assert cats[7:11] == ["part"] * 4
    assert cats[11:] == ["material"] * 3


def test_segment_batch_flat_indexing(seg):
    imgs = jnp.asarray(np.random.RandomState(1).rand(2, 3, 32, 32), jnp.float32)
    out = np.asarray(seg.segment_batch(imgs))
    assert out.shape == (2, 3, 32, 32)
    labels, cats = seg.get_label_and_category_names()
    # each channel's labels live in that category's flat range (or 0)
    for ci, cat in enumerate(("object", "part", "material")):
        vals = np.unique(out[:, ci])
        for v in vals:
            assert v == 0 or cats[v] == cat
    # downsample halves the map
    assert seg.segment_batch(imgs, downsample=2).shape == (2, 3, 16, 16)


def test_multires_averaging_consistent():
    s1 = UnifiedParsingSegmenter(cfg=TINY, segsizes=(32,), seed=0)
    s2 = UnifiedParsingSegmenter(cfg=TINY, segsizes=(32, 32), seed=0)
    imgs = jnp.asarray(np.random.RandomState(2).rand(1, 3, 32, 32), jnp.float32)
    p1 = s1.category_probabilities(imgs)["object"]
    p2 = s2.category_probabilities(imgs)["object"]
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_predict_single_class(seg):
    imgs = jnp.asarray(np.random.RandomState(3).rand(2, 3, 32, 32), jnp.float32)
    prob, mask = seg.predict_single_class(imgs, classnum=3)
    assert prob.shape == (2, 32, 32)
    assert mask.shape == (2, 32, 32)
    assert np.all((np.asarray(prob) >= 0) & (np.asarray(prob) <= 1))
    # mask pixels are exactly where the flat argmax label equals 3
    seg_map = np.asarray(seg.segment_batch(imgs))
    assert np.array_equal(np.asarray(mask), np.any(seg_map == 3, axis=1))


def test_dissect_with_unified_segmenter(seg):
    model = tiny_dcgan()
    inst = InstrumentedModel(model)
    report = dissect(inst, "deconv0", seg, n_samples=8, batch=4)
    assert len(report["units"]) > 0
    labels, _ = seg.get_label_and_category_names()
    for r in report["units"]:
        assert r["label"] in labels
        assert 0.0 <= r["iou"] <= 1.0


def test_torch_resnet_import_matches_bn_fold():
    torch = pytest.importorskip("torch")
    cfg = ResNetConfig(blocks=(1, 1, 1, 1), width=16)
    # build a torch-style state dict with random BN stats
    rs = np.random.RandomState(0)
    state = {}

    def add_conv_bn(conv, bn, cin, cout, k):
        state[f"{conv}.weight"] = torch.tensor(
            rs.randn(cout, cin, k, k).astype(np.float32))
        state[f"{bn}.weight"] = torch.tensor(rs.rand(cout).astype(np.float32) + 0.5)
        state[f"{bn}.bias"] = torch.tensor(rs.randn(cout).astype(np.float32))
        state[f"{bn}.running_mean"] = torch.tensor(rs.randn(cout).astype(np.float32))
        state[f"{bn}.running_var"] = torch.tensor(rs.rand(cout).astype(np.float32) + 0.1)

    add_conv_bn("conv1", "bn1", 3, 8, 3)
    add_conv_bn("conv2", "bn2", 8, 8, 3)
    add_conv_bn("conv3", "bn3", 8, 16, 3)
    cin = 16
    for si in range(4):
        planes = 16 * (2 ** si)
        cout = planes * 4
        add_conv_bn(f"layer{si+1}.0.conv1", f"layer{si+1}.0.bn1", cin, planes, 1)
        add_conv_bn(f"layer{si+1}.0.conv2", f"layer{si+1}.0.bn2", planes, planes, 3)
        add_conv_bn(f"layer{si+1}.0.conv3", f"layer{si+1}.0.bn3", planes, cout, 1)
        add_conv_bn(f"layer{si+1}.0.downsample.0", f"layer{si+1}.0.downsample.1",
                    cin, cout, 1)
        cin = cout

    p = import_torch_resnet(state, cfg)
    # folded scale/bias must reproduce BN(conv(x)) for the stem conv
    g = state["bn1.weight"].numpy()
    b = state["bn1.bias"].numpy()
    m = state["bn1.running_mean"].numpy()
    v = state["bn1.running_var"].numpy()
    s_ref, b_ref = fold_bn(g, b, m, v)
    assert np.allclose(p["stem.conv1.bn.scale"], s_ref)
    assert np.allclose(p["stem.conv1.bn.bias"], b_ref)
    y = rs.randn(4).astype(np.float32)
    assert np.allclose(y * s_ref[:4] + b_ref[:4],
                       (y - m[:4]) / np.sqrt(v[:4] + 1e-5) * g[:4] + b[:4],
                       atol=1e-5)
