"""Scene-parsing (ADE20K) seg-model family: fidelity vs the reference torch
``segmodel/models.py`` — the SECOND segmentation family the reference ships
(dilated ResNet encoders + PPM/C1 bilinear decoders consumed by the
classifier-dissection path via ``ModelBuilder``, ``models.py:65-185``).

Builds the torch nets with random weights and randomized BN stats, imports
through ``import_torch_segmodel`` (which folds BN) and asserts our forwards
match the torch logits, so a wrong dilation, stride, or Sequential index
cannot pass silently.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REF_DIR = "/root/reference/netdissect/segmodel"


def _load_ref_segmodel():
    if "ref_seg.models" in sys.modules:
        return sys.modules["ref_seg.models"]
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    pkg = types.ModuleType("ref_seg")
    pkg.__path__ = [REF_DIR]
    sys.modules["ref_seg"] = pkg
    for name in ("resnet", "resnext", "models"):
        spec = importlib.util.spec_from_file_location(
            f"ref_seg.{name}", f"{REF_DIR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "ref_seg"
        sys.modules[f"ref_seg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_seg.models"]


def _randomize_bn(model, seed):
    rs = np.random.RandomState(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.from_numpy(
                rs.randn(n).astype(np.float32) * 0.2))
            m.running_var.copy_(torch.from_numpy(
                rs.uniform(0.5, 1.5, n).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                rs.uniform(0.5, 1.5, n).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rs.randn(n).astype(np.float32) * 0.1))


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)


NC = 7  # tiny class count


def _build_pair(decoder_arch, dilate_scale=8, seed=0):
    ref = _load_ref_segmodel()
    ref_resnet = sys.modules["ref_seg.resnet"]
    torch.manual_seed(seed)

    orig = ref_resnet.ResNet(ref_resnet.Bottleneck, [1, 1, 1, 1])
    encoder = ref.ResnetDilated(orig, dilate_scale=dilate_scale)
    fc_dim = 2048
    if decoder_arch == "ppm_bilinear":
        decoder = ref.PPMBilinear(num_class=NC, fc_dim=fc_dim, use_softmax=False)
    else:
        decoder = ref.C1Bilinear(num_class=NC, fc_dim=fc_dim, use_softmax=False)
    _randomize_bn(encoder, seed + 1)
    _randomize_bn(decoder, seed + 2)
    encoder.eval()
    decoder.eval()

    from ganspace_tpu.dissection.segmodel import (
        C1BilinearConfig, PPMBilinearConfig, ResNetConfig,
        import_torch_segmodel)
    rn = ResNetConfig(blocks=(1, 1, 1, 1), dilate_scale=dilate_scale)
    if decoder_arch == "ppm_bilinear":
        cfg = PPMBilinearConfig(resnet=rn, num_class=NC)
    else:
        cfg = C1BilinearConfig(resnet=rn, num_class=NC)
    params = import_torch_segmodel(
        {k: v.clone() for k, v in encoder.state_dict().items()},
        {k: v.clone() for k, v in decoder.state_dict().items()}, cfg)
    return encoder, decoder, params, cfg


@pytest.mark.parametrize("dilate", [8, 16])
@pytest.mark.slow
def test_dilated_encoder_stage_parity(dilate):
    encoder, _, params, cfg = _build_pair("c1_bilinear", dilate_scale=dilate)
    x = np.random.RandomState(3).randn(1, 3, 96, 96).astype(np.float32) * 20
    with torch.no_grad():
        stages = encoder(torch.from_numpy(x), return_feature_maps=True)
    from ganspace_tpu.dissection.segmodel import resnet_features
    enc = {k[len("encoder."):]: v for k, v in params.items()
           if k.startswith("encoder.")}
    feats = resnet_features(enc, jnp.asarray(x), cfg.resnet)
    for i, key in enumerate(("c2", "c3", "c4", "c5")):
        assert feats[key].shape == tuple(stages[i].shape), key
        err = _rel_err(np.asarray(feats[key]), stages[i].numpy())
        assert err < 1e-3, f"dilate{dilate} {key}: rel err {err}"


def test_ppm_bilinear_logits_match_torch():
    encoder, decoder, params, cfg = _build_pair("ppm_bilinear")
    x = np.random.RandomState(9).randn(1, 3, 96, 96).astype(np.float32) * 30
    with torch.no_grad():
        # use_softmax=False + inference=False -> log_softmax of the logits
        pred = decoder(encoder(torch.from_numpy(x), return_feature_maps=True))
    from ganspace_tpu.dissection.segmodel import ppm_bilinear_forward
    import jax
    ours = jax.nn.log_softmax(
        ppm_bilinear_forward(params, jnp.asarray(x), cfg), axis=1)
    assert ours.shape == tuple(pred.shape)
    assert _rel_err(np.asarray(ours), pred.numpy()) < 1e-3


def test_c1_bilinear_logits_match_torch():
    encoder, decoder, params, cfg = _build_pair("c1_bilinear")
    x = np.random.RandomState(5).randn(1, 3, 96, 96).astype(np.float32) * 30
    with torch.no_grad():
        pred = decoder(encoder(torch.from_numpy(x), return_feature_maps=True))
    from ganspace_tpu.dissection.segmodel import c1_bilinear_forward
    import jax
    ours = jax.nn.log_softmax(
        c1_bilinear_forward(params, jnp.asarray(x), cfg), axis=1)
    assert _rel_err(np.asarray(ours), pred.numpy()) < 1e-3


def test_semantic_segmenter_protocol():
    from ganspace_tpu.dissection.segmenter import SemanticSegmenter
    from ganspace_tpu.dissection.segmodel import (C1BilinearConfig,
                                                  ResNetConfig, init_c1_params)
    rn = ResNetConfig(blocks=(1, 1, 1, 1), width=8, dilate_scale=8)
    cfg = C1BilinearConfig(resnet=rn, num_class=5)
    seg = SemanticSegmenter.__new__(SemanticSegmenter)
    # Bypass the resnet50-sized builder for the unit test: wire the tiny
    # C1 net manually through the same code paths.
    import jax
    import jax.numpy as jnp
    from functools import partial as _p
    from ganspace_tpu.dissection.segmodel import c1_bilinear_forward
    seg.cfg = cfg
    seg._forward = _p(c1_bilinear_forward, cfg=cfg)
    seg.params = jax.tree.map(jnp.asarray, init_c1_params(cfg, seed=1))
    seg.segsizes = (64, 96)
    seg.labels = ["-"] + [f"c{i}" for i in range(5)]
    seg.categories = ["-"] + ["object"] * 5
    seg._probs_jit = _p(jax.jit, static_argnames=("size",))(seg._probs)

    imgs = np.random.RandomState(0).rand(2, 3, 96, 96).astype(np.float32)
    labels, cats = seg.get_label_and_category_names()
    assert len(labels) == len(cats) == 6
    segs = np.asarray(seg.segment_batch(imgs, downsample=2))
    assert segs.shape == (2, 1, 48, 48)
    assert segs.min() >= 1 and segs.max() <= 5
    p = np.asarray(seg.class_probability(imgs, 3))
    assert p.shape == (2, 96, 96)
    assert (p >= 0).all() and (p <= 1).all()
    prob, mask = seg.predict_single_class(imgs, 3, downsample=2)
    assert np.asarray(prob).shape == (2, 48, 48)
    assert np.asarray(mask).dtype == bool


def test_builder_arch_surface():
    from ganspace_tpu.dissection.segmodel import build_segmodel
    params, fwd, cfg = build_segmodel("resnet50_dilated8",
                                      "ppm_bilinear_deepsup", num_class=5)
    # resnet50 is too big for a CPU unit test; just check the config wiring.
    assert cfg.resnet.blocks == (3, 4, 6, 3)
    assert cfg.resnet.dilate_scale == 8
    assert cfg.num_class == 5
    assert any(k.startswith("decoder.ppm.3") for k in params)
