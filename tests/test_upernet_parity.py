"""UPerNet import fidelity vs the reference torch upsegmodel.

Builds the reference's torch UPerNet decoder + deep-stem ResNet encoder
(``/root/reference/netdissect/upsegmodel/models.py:441``, ``resnet.py``)
with random weights and randomized BN running stats, exports the state
dicts through ``import_torch_upernet`` (which folds BN), and asserts our
``upernet_forward`` logits match the torch forward — so a transposed conv,
wrong epsilon, or mis-mapped Sequential index cannot pass silently.

The reference decoder's PPM uses the CUDA PrRoIPool2D op, which has no CPU
build; the test substitutes our JAX ``prroi_pool2d`` (independently
validated against brute-force numeric integration in ``test_prroi.py``)
behind the same module interface, so the PPM *wiring* is still exercised
on both sides.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REF_PKG_DIR = "/root/reference/netdissect/upsegmodel"


def _load_ref_upseg():
    """Import the reference upsegmodel package standalone (read-only)."""
    if "ref_upseg.models" in sys.modules:
        return sys.modules["ref_upseg.models"]
    # models.py imports torchvision but never uses it at decoder/encoder
    # construction time; stub it so the CPU-only image lacks it gracefully.
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

    pkg = types.ModuleType("ref_upseg")
    pkg.__path__ = [REF_PKG_DIR]
    sys.modules["ref_upseg"] = pkg

    # CPU-compatible PrRoIPool2D backed by our JAX op.
    prroi_mod = types.ModuleType("ref_upseg.prroi_pool")

    class PrRoIPool2D(torch.nn.Module):
        def __init__(self, ph, pw, spatial_scale):
            super().__init__()
            self.ph, self.pw, self.scale = int(ph), int(pw), float(spatial_scale)

        def forward(self, feat, rois):
            from ganspace_tpu.ops.prroi import prroi_pool2d
            out = prroi_pool2d(
                jnp.asarray(feat.detach().numpy()),
                jnp.asarray(rois.detach().numpy()),
                self.ph, self.pw, spatial_scale=self.scale)
            return torch.from_numpy(np.asarray(out))

    prroi_mod.PrRoIPool2D = PrRoIPool2D
    sys.modules["ref_upseg.prroi_pool"] = prroi_mod

    for name in ("resnet", "resnext", "models"):
        spec = importlib.util.spec_from_file_location(
            f"ref_upseg.{name}", f"{REF_PKG_DIR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "ref_upseg"
        sys.modules[f"ref_upseg.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_upseg.models"]


def _randomize_bn(model, seed):
    """Give every BN layer non-trivial affine params and running stats so
    the fold is actually tested (fresh BN is identity-ish)."""
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


NR = dict(object=8, part=5, material=4, scene=6)
OBJECT_PART = {1: [1, 2], 3: [3, 4]}       # flat part channels 1..4 grouped


def _build_ref_pair(res=192, seed=0):
    ref = _load_ref_upseg()
    ref_resnet = sys.modules["ref_upseg.resnet"]
    torch.manual_seed(seed)

    orig = ref_resnet.ResNet(ref_resnet.Bottleneck, [1, 1, 1, 1])
    encoder = ref.Resnet(orig)
    decoder = ref.UPerNet(nr_classes=NR, fc_dim=2048, use_softmax=False,
                          fpn_dim=64)
    decoder.object_part = OBJECT_PART
    decoder.object_with_part = sorted(OBJECT_PART.keys())
    _randomize_bn(encoder, seed + 1)
    _randomize_bn(decoder, seed + 2)
    encoder.eval()
    decoder.eval()

    from ganspace_tpu.dissection.segmodel import ResNetConfig, UPerNetConfig
    cfg = UPerNetConfig(resnet=ResNetConfig(blocks=(1, 1, 1, 1)),
                        fpn_dim=64, ppm_dim=512,
                        n_objects=NR["object"], n_parts=NR["part"],
                        n_materials=NR["material"], n_scenes=NR["scene"])

    from ganspace_tpu.dissection.segmenter import import_torch_upernet
    params = import_torch_upernet(
        {k: v.clone() for k, v in encoder.state_dict().items()},
        {k: v.clone() for k, v in decoder.state_dict().items()}, cfg)
    return encoder, decoder, params, cfg


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)


@pytest.mark.slow
def test_upernet_logits_match_torch_reference():
    encoder, decoder, params, cfg = _build_ref_pair()

    x = np.random.RandomState(9).randn(1, 3, 192, 192).astype(np.float32) * 40

    switch = {k: True for k in ("object", "part", "scene", "material")}
    with torch.no_grad():
        pred = decoder(encoder(torch.from_numpy(x), return_feature_maps=True),
                       output_switch=switch, seg_size=None)

    from ganspace_tpu.dissection.segmodel import upernet_forward
    ours = upernet_forward(params, jnp.asarray(x), cfg)

    import jax
    # Training-mode reference outputs are log_softmax (models.py:424-441).
    ours_obj = np.asarray(jax.nn.log_softmax(ours["object"], axis=1))
    ours_mat = np.asarray(jax.nn.log_softmax(ours["material"], axis=1))
    ours_scene = np.asarray(jax.nn.log_softmax(ours["scene"], axis=-1))

    assert _rel_err(ours_obj, pred["object"].numpy()) < 1e-3
    assert _rel_err(ours_mat, pred["material"].numpy()) < 1e-3
    assert _rel_err(ours_scene, pred["scene"].numpy()) < 1e-3

    # Part head: reference groups flat part channels per owning object and
    # log-softmaxes each group (models.py:434-441).
    part = np.asarray(ours["part"])
    head = 0
    for gi, obj in enumerate(sorted(OBJECT_PART.keys())):
        n = len(OBJECT_PART[obj])
        grp = part[:, head:head + n]
        grp = grp - np.log(np.exp(grp - grp.max(1, keepdims=True))
                           .sum(1, keepdims=True)) - grp.max(1, keepdims=True)
        assert _rel_err(grp, pred["part"][gi].numpy()) < 1e-3, f"group {gi}"
        head += n


@pytest.mark.slow
def test_resnet_encoder_stage_parity():
    """Each encoder stage (c2..c5) matches torch, catching stem/stride/
    downsample translation bugs at the stage they occur."""
    encoder, decoder, params, cfg = _build_ref_pair(seed=4)
    x = np.random.RandomState(3).randn(1, 3, 128, 128).astype(np.float32) * 20

    with torch.no_grad():
        stages = encoder(torch.from_numpy(x), return_feature_maps=True)

    from ganspace_tpu.dissection.segmodel import resnet_features
    enc = {k[len("encoder."):]: v for k, v in params.items()
           if k.startswith("encoder.")}
    feats = resnet_features(enc, jnp.asarray(x), cfg.resnet)
    for i, key in enumerate(("c2", "c3", "c4", "c5")):
        err = _rel_err(np.asarray(feats[key]), stages[i].numpy())
        assert err < 1e-3, f"{key}: rel err {err}"
