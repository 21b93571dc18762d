"""End-to-end decomposition pipeline tests on tiny models (SURVEY.md §4)."""

import json

import numpy as np
import pytest

from ganspace_tpu.config import Config
from ganspace_tpu.decomposition import component_cache_name, get_or_compute
from ganspace_tpu.models.base import InstrumentedModel

from helpers import tiny_stylegan2

NPZ_KEYS = {"act_comp", "act_mean", "act_stdev", "lat_comp", "lat_mean",
            "lat_stdev", "var_ratio", "random_stdevs"}


@pytest.fixture(scope="module")
def model():
    return tiny_stylegan2()


def test_cache_filename_scheme():
    # Exact reference scheme (decomposition.py:384-392).
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                 estimator="ipca", components=80, n=300_000, use_w=True)
    assert component_cache_name(cfg) == "stylegan2-ffhq_style_ipca_c80_n300000_w.npz"
    cfg2 = Config(model="BigGAN-512", output_class="husky",
                  layer="generator.gen_z", estimator="fbpca", components=64,
                  n=1_000_000, seed=7)
    assert component_cache_name(cfg2) == \
        "biggan-512-husky_generator.gen_z_fbpca_c64_it2_l128_n1000000_seed7.npz"


def test_w_space_fast_path(model, tmp_path, monkeypatch):
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    inst = InstrumentedModel(model)
    model.use_w()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                 estimator="ipca", components=4, n=1500, use_w=True,
                 batch_size=128)
    path = get_or_compute(cfg, inst)
    assert path.is_file()
    data = np.load(path)
    assert set(data.files) == NPZ_KEYS | {"_meta"}
    assert data["act_comp"].shape == (4, 1, 512)
    assert data["lat_comp"].shape == (4, 1, 512)
    # W fast path: lat_comp == act_comp up to row normalization
    norm = data["act_comp"].reshape(4, -1)
    norm = norm / np.linalg.norm(norm, axis=-1, keepdims=True)
    assert np.allclose(data["lat_comp"].reshape(4, -1), norm, atol=1e-5)
    assert np.all(data["lat_stdev"] > 0)  # W-space stdevs measured
    # cached second call: no recompute
    assert get_or_compute(cfg, inst) == path
    model.use_z()


def test_activation_path_with_regression(model, tmp_path, monkeypatch):
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    inst = InstrumentedModel(model)
    model.use_z()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=1000, batch_size=128)
    path = get_or_compute(cfg, inst)
    data = np.load(path)
    assert data["act_comp"].shape == (3, 1, 64, 4, 4)
    assert data["lat_comp"].shape == (3, 1, 512)
    comp = data["act_comp"].reshape(3, -1)
    assert np.allclose(comp @ comp.T, np.eye(3), atol=1e-3)  # orthonormal
    assert np.allclose(np.linalg.norm(data["lat_comp"].reshape(3, -1), axis=-1),
                       1.0, atol=1e-5)  # normalized
    assert np.all(np.diff(data["act_stdev"]) <= 1e-6)  # sorted
    assert np.all(data["random_stdevs"] > 0)
    # random baselines should explain less variance than the PCs
    assert data["random_stdevs"].max() < data["act_stdev"][0]


@pytest.mark.slow
def test_determinism(model, tmp_path, monkeypatch):
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    inst = InstrumentedModel(model)
    model.use_z()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="pca", components=3, n=600, batch_size=100)
    p1 = get_or_compute(cfg, inst)
    d1 = {k: v.copy() for k, v in np.load(p1).items()}
    p2 = get_or_compute(cfg, inst, force_recompute=True)
    d2 = np.load(p2)
    for k in NPZ_KEYS:
        assert np.array_equal(d1[k], d2[k]), f"{k} not deterministic"


def test_fit_stream_matches_fit_partial():
    """fit_stream (scan-fused key-derived blocks) must equal the same blocks
    fed through fit_partial one by one (same keys, same order)."""
    import jax
    import jax.numpy as jnp

    from ganspace_tpu.estimators.ipca import IPCAEstimator

    d, nb, c, n_blocks = 96, 200, 8, 37   # exercises chunk + eager tail
    w = jnp.asarray(np.random.RandomState(0).randn(d, d).astype(np.float32))

    def block_fn(key):
        z = jax.random.normal(key, (nb, d), jnp.float32)
        return jnp.tanh(z @ w)            # stand-in "synthesis to tap"

    key = jax.random.PRNGKey(42)
    streamed = IPCAEstimator(c)
    assert streamed.fit_stream(block_fn, n_blocks, key, chunk=8)

    seq = IPCAEstimator(c)
    for i in range(n_blocks):
        assert seq.fit_partial(block_fn(jax.random.fold_in(key, i)))

    assert streamed.n_samples_seen_ == seq.n_samples_seen_ == n_blocks * nb
    ca, sa, ra = streamed.get_components()
    cb, sb, rb = seq.get_components()
    cos = np.abs(np.sum(ca * cb, -1))
    assert cos.min() > 0.9999
    assert np.allclose(sa, sb, rtol=1e-3)

    # nystrom tier through the same path; fit_stream refines internally, so
    # the sequential reference must run the same two passes (the production
    # driver's begin_refine + re-stream).
    streamed_n = IPCAEstimator(c, mode="nystrom")
    assert streamed_n.fit_stream(block_fn, n_blocks, key, chunk=8)
    seq_n = IPCAEstimator(c, mode="nystrom")
    for i in range(n_blocks):
        assert seq_n.fit_partial(block_fn(jax.random.fold_in(key, i)))
    assert seq_n.begin_refine()
    for i in range(n_blocks):
        assert seq_n.fit_partial(block_fn(jax.random.fold_in(key, i)))
    assert streamed_n.n_samples_seen_ == seq_n.n_samples_seen_
    cn, _, _ = streamed_n.get_components()
    cn2, _, _ = seq_n.get_components()
    cos = np.abs(np.sum(cn * cn2, -1))
    assert cos.min() > 0.9999


def test_cache_records_rng_provenance(model, tmp_path, monkeypatch):
    """ADVICE r1: the npz must record which RNG stream produced it, and a
    cache hit under the other mode must warn instead of silently mixing."""
    from ganspace_tpu.decomposition import _warn_on_provenance_mismatch

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_DEVICE_RNG", "1")
    cfg = Config(model="StyleGAN2", layer="style", estimator="ipca",
                 components=4, n=512, use_w=True)
    inst = InstrumentedModel(model)
    path = get_or_compute(cfg, inst)
    with np.load(path, allow_pickle=False) as d:
        assert "_meta" in d.files
        meta = json.loads(d["_meta"].item().decode())
    assert meta["device_rng"] is True

    import io, contextlib
    monkeypatch.setenv("GANSPACE_DEVICE_RNG", "0")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _warn_on_provenance_mismatch(path, cfg)
    assert "WARNING" in buf.getvalue()


def test_meta_records_actual_rng_stream(model, tmp_path, monkeypatch):
    """The provenance sidecar must record the stream that ACTUALLY ran, not
    the env request: with device RNG requested but the latents over the HBM
    budget, pre-sampling falls back to host numpy and _meta says so."""
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_DEVICE_RNG", "1")
    monkeypatch.setenv("GANSPACE_LATENT_HBM_BUDGET", "0")
    # full PCA has no fused stream, so the pre-sampling path (where the
    # fallback lives) is what runs
    cfg = Config(model="StyleGAN2", layer="style", estimator="pca",
                 components=4, n=512, use_w=True)
    inst = InstrumentedModel(model)
    path = get_or_compute(cfg, inst)
    with np.load(path, allow_pickle=False) as d:
        meta = json.loads(d["_meta"].item().decode())
    assert meta["device_rng"] is False


def test_mesh_provenance_mismatch_warns(model, tmp_path, monkeypatch):
    """A cache hit computed on a different mesh must warn: sharded
    reductions reassociate floating point, so components differ at ~1e-4."""
    from ganspace_tpu.decomposition import (
        _prospective_mesh_desc, _warn_on_provenance_mismatch)

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_DEVICE_RNG", "1")
    cfg = Config(model="StyleGAN2", layer="style", estimator="ipca",
                 components=4, n=512, use_w=True)
    inst = InstrumentedModel(model)
    path = get_or_compute(cfg, inst)
    with np.load(path, allow_pickle=False) as d:
        data = {k: d[k] for k in d.files}
        meta = json.loads(d["_meta"].item().decode())
    # the recorded mesh is the one this environment would use -> no warning
    assert meta["mesh"] == _prospective_mesh_desc(cfg)
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _warn_on_provenance_mismatch(path, cfg)
    assert "mesh" not in buf.getvalue()
    # rewrite the sidecar as if computed single-device -> mismatch warns
    meta["mesh"] = None
    data["_meta"] = np.bytes_(json.dumps(meta).encode())
    np.savez_compressed(path, **data)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _warn_on_provenance_mismatch(path, cfg)
    assert "mesh" in buf.getvalue() and "WARNING" in buf.getvalue()


def test_fused_acts_cache_probe(tmp_path):
    """GANSPACE_FUSED_ACTS=auto turns the fused stream on exactly when THIS
    workload's scan program has compiled to completion before — the sentinel
    registry is keyed by model/layer/shape/estimator, so entries for other
    workloads (whose scan would still be a minutes-scale cold compile) do
    not enable it."""
    import jax
    from ganspace_tpu.decomposition import _fused_acts_cached, _record_fused_acts

    old = getattr(jax.config, "jax_compilation_cache_dir", None)
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        key = "StyleGAN2|ffhq|convs.0|b64|D4096|ipca_c8"
        assert not _fused_acts_cached(key)
        _record_fused_acts(key)
        assert _fused_acts_cached(key)
        assert not _fused_acts_cached("Other|x|convs.0|b64|D4096|ipca_c8")
        _record_fused_acts("second|key")         # registry accumulates
        assert _fused_acts_cached(key)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def _interrupt_on_nth_fit(monkeypatch, n_calls):
    """Wrap decomposition.get_estimator so the produced estimator raises
    KeyboardInterrupt on its ``n_calls``-th fit_partial call (after the
    preceding ones succeeded) — simulating Ctrl-C mid-stream."""
    from ganspace_tpu import decomposition as deco

    real_get = deco.get_estimator
    state = {"calls": 0}

    def wrapped_get(*a, **kw):
        est = real_get(*a, **kw)
        real_fit = est.fit_partial

        def fit_partial(x):
            state["calls"] += 1
            if state["calls"] >= n_calls:
                raise KeyboardInterrupt
            return real_fit(x)

        est.fit_partial = fit_partial
        return est

    monkeypatch.setattr(deco, "get_estimator", wrapped_get)
    return state


def test_interrupt_partial_save_activation_path(model, tmp_path, monkeypatch):
    """Ctrl-C mid-sweep must save the absorbed samples under a corrected
    ``_n{fitted}`` name — NOT the full-run cache name (reference
    decomposition.py:268-274).  n=2100 with batch 512 makes n_total (2048)
    differ from config.n, the case where a wrong-token rename would silently
    poison the cache."""
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    _interrupt_on_nth_fit(monkeypatch, 2)
    inst = InstrumentedModel(model)
    model.use_z()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=2100, batch_size=512)
    with pytest.raises(SystemExit):
        get_or_compute(cfg, inst)
    cache = tmp_path / "cache" / "components"
    full = cache / component_cache_name(cfg)
    partial = cache / full.name.replace("_n2100", "_n2000")
    assert not full.exists(), "partial run must not claim the full-n cache"
    assert partial.is_file()
    data = np.load(partial)
    assert set(data.files) == NPZ_KEYS | {"_meta"}
    comp = data["act_comp"].reshape(3, -1)
    assert np.all(np.isfinite(comp))
    assert np.allclose(comp @ comp.T, np.eye(3), atol=1e-3)


def _interrupt_fused_stream(monkeypatch, after_blocks):
    """Wrap decomposition.get_estimator so the produced estimator's
    fit_stream absorbs ``after_blocks`` blocks and then raises
    KeyboardInterrupt — simulating Ctrl-C mid-scan on the fused paths."""
    from ganspace_tpu import decomposition as deco

    real_get = deco.get_estimator

    def wrapped_get(*a, **kw):
        est = real_get(*a, **kw)
        real_stream = est.fit_stream

        def fit_stream(block_fn, n_blocks, key, **kws):
            real_stream(block_fn, min(after_blocks, n_blocks), key, **kws)
            raise KeyboardInterrupt

        est.fit_stream = fit_stream
        return est

    monkeypatch.setattr(deco, "get_estimator", wrapped_get)


def test_interrupt_partial_save_fused_w_path(model, tmp_path, monkeypatch):
    """Same contract on the fused W-space stream (device-RNG latents
    regenerated inside the scanned fit stream): the interrupt lands in
    fit_stream and the absorbed block count names the partial cache."""
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.delenv("GANSPACE_DEVICE_RNG", raising=False)
    _interrupt_fused_stream(monkeypatch, 1)
    inst = InstrumentedModel(model)
    model.use_w()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                 estimator="ipca", components=4, n=2100, use_w=True,
                 batch_size=512)
    try:
        with pytest.raises(SystemExit):
            get_or_compute(cfg, inst)
    finally:
        model.use_z()
    cache = tmp_path / "cache" / "components"
    full = cache / component_cache_name(cfg)
    assert not full.exists(), "partial run must not claim the full-n cache"
    partials = list(cache.glob("*.npz"))
    assert len(partials) == 1
    # the corrected _n token reflects the absorbed samples (1 block)
    import re
    n_tok = int(re.search(r"_n(\d+)", partials[0].name).group(1))
    assert 0 < n_tok < 2100
    data = np.load(partials[0])
    assert data["act_comp"].shape == (4, 1, 512)
    assert np.all(np.isfinite(data["lat_comp"]))


def test_cache_filename_bf16_tag():
    """--dtype bfloat16 components are cached under a tagged filename so an
    f32 run can never silently reuse preview-precision components."""
    kw = dict(model="StyleGAN2", output_class="ffhq", layer="style",
              estimator="ipca", components=80, n=300000, use_w=True)
    assert component_cache_name(Config(**kw, dtype="bfloat16")) == \
        "stylegan2-ffhq_style_ipca_c80_n300000_w_bf16.npz"
    # default / explicit f32 stay on the exact reference scheme
    assert component_cache_name(Config(**kw, dtype="float32")) == \
        component_cache_name(Config(**kw)) == \
        "stylegan2-ffhq_style_ipca_c80_n300000_w.npz"


def test_linreg_oversized_pinned_batch(model, tmp_path, monkeypatch):
    """A pinned -b larger than the regression sample budget must shrink the
    minibatch, not zero out the accumulation loop (which would solve a
    singular system and write NaN latent directions into the cache)."""
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    inst = InstrumentedModel(model)
    model.use_z()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=600, batch_size=16384)
    path = get_or_compute(cfg, inst)
    data = np.load(path)
    assert np.all(np.isfinite(data["lat_comp"]))
    assert np.all(np.isfinite(data["lat_mean"]))
    assert np.allclose(np.linalg.norm(data["lat_comp"].reshape(3, -1), axis=-1),
                       1.0, atol=1e-5)


def test_corrupt_component_cache_recomputes(model, tmp_path, monkeypatch):
    """A corrupt npz at the cache path (interrupted write) must recompute,
    not be returned to callers that will crash on np.load."""
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    inst = InstrumentedModel(model)
    model.use_w()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                 estimator="ipca", components=4, n=1500, use_w=True,
                 batch_size=128)
    cache = tmp_path / "cache" / "components"
    cache.mkdir(parents=True)
    bad = cache / component_cache_name(cfg)
    bad.write_bytes(b"PK\x03\x04 truncated zip junk")
    path = get_or_compute(cfg, inst)
    assert path == bad
    data = np.load(path)                       # now a real npz
    assert data["act_comp"].shape == (4, 1, 512)
    assert not list(cache.glob("*.tmp.npz"))   # atomic write left no temp
    model.use_z()


@pytest.mark.slow
def test_biggan_fused_stream(tmp_path, monkeypatch):
    """BigGAN rides the fused activation stream via its in-trace truncnorm
    sampler (device_latents_fn_p): forced on, the full pipeline (fit ->
    regression -> cache) produces orthonormal components."""
    from helpers import tiny_biggan
    from ganspace_tpu.models.base import InstrumentedModel
    from ganspace_tpu.models import annotate_model_shapes

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    model = tiny_biggan()
    assert model.device_latents_fn_p() is not None
    inst = InstrumentedModel(model)
    annotate_model_shapes(inst, ["generator.gen_z"])
    cfg = Config(model="BigGAN-128", output_class="husky",
                 layer="generator.gen_z", estimator="ipca", components=6,
                 n=512, batch_size=128)
    import ganspace_tpu.models as models_mod
    monkeypatch.setattr(models_mod, "get_model",
                        lambda *a, **k: model, raising=False)
    path = get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as d:
        comp = d["act_comp"].reshape(6, -1)
        assert np.all(np.isfinite(comp))
        gram = comp @ comp.T
        assert np.allclose(gram, np.eye(6), atol=1e-3)
        assert d["lat_comp"].shape[-1] == model.cfg.z_dim
        # truncnorm draws: latents bounded by 2*truncation
        assert float(np.abs(d["lat_mean"]).max()) < 2.0


def test_bf16_dtype_activation_path(model, tmp_path, monkeypatch):
    """--dtype bfloat16 runs the synthesis sweeps on the bf16 datapath while
    the estimator floor (estimators/utils.mm) keeps statistics at HIGHEST:
    the pipeline must produce a separately-tagged cache whose components
    agree with the f32 run (exactly equal on CPU, where DEFAULT precision
    is still true f32 — the tag + provenance + plumbing are what's CPU-
    testable; the real quality delta is measured on hardware by the bench's
    convtap_bf16_min_cos leg)."""
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    inst = InstrumentedModel(model)
    model.use_z()
    kw = dict(model="StyleGAN2", output_class="ffhq", layer="conv1",
              estimator="ipca", components=3, n=512, batch_size=128)
    p32 = get_or_compute(Config(**kw), inst, force_recompute=True)
    pbf = get_or_compute(Config(**kw, dtype="bfloat16"), inst,
                         force_recompute=True)
    assert pbf != p32 and pbf.name.endswith("_bf16.npz")
    with np.load(p32) as a, np.load(pbf, allow_pickle=True) as b:
        c32 = a["act_comp"].reshape(3, -1)
        cbf = b["act_comp"].reshape(3, -1)
        cos = np.abs(np.sum(c32 * cbf, axis=1))
        assert np.all(cos > 0.999), cos
        meta = json.loads(bytes(b["_meta"].item()).decode())
        assert meta["dtype"] == "bfloat16"
        assert meta["fused_linreg"] is True


@pytest.mark.slow
def test_fused_sentinel_keyed_by_dtype(model, tmp_path, monkeypatch, capsys):
    """An f32 run's fused-scan sentinel must NOT auto-enable the fused path
    for the same workload under --dtype bfloat16: the precision is baked
    into the traced program, so the bf16 scan is a different XLA program
    with its own (minutes-scale cold) compile."""
    import jax
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    old = getattr(jax.config, "jax_compilation_cache_dir", None)
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cc"))
    try:
        inst = InstrumentedModel(model)
        model.use_z()
        kw = dict(model="StyleGAN2", output_class="ffhq", layer="conv1",
                  estimator="ipca", components=3, n=512, batch_size=128)
        # Forced f32 run records the sentinel for its key
        monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
        get_or_compute(Config(**kw), inst, force_recompute=True)
        capsys.readouterr()
        # auto + same dtype + small n: sentinel hit -> fused ON
        monkeypatch.setenv("GANSPACE_FUSED_ACTS", "auto")
        get_or_compute(Config(**kw), inst, force_recompute=True)
        assert "fused activation stream" in capsys.readouterr().out
        # auto + bf16 + small n: different program, no sentinel -> batched
        get_or_compute(Config(**kw, dtype="bfloat16"), inst,
                       force_recompute=True)
        assert "fused activation stream" not in capsys.readouterr().out
        # auto + rand-moments off + small n: the scan without the
        # projection accumulators is another distinct program -> batched
        monkeypatch.setenv("GANSPACE_FUSED_RAND", "0")
        get_or_compute(Config(**kw), inst, force_recompute=True)
        assert "fused activation stream" not in capsys.readouterr().out
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_interrupt_after_fit_never_claims_canonical_name(
        model, tmp_path, monkeypatch):
    """An interrupt landing AFTER the fit completed (e.g. in the sentinel
    write, still inside the try) used to save at the exact canonical cache
    path when n_fitted == config.n — poisoning every later run.  The save
    must carry a _partial tag instead, and a completed in-stream refine
    must NOT be rolled back by the handler's abort_refine."""
    from ganspace_tpu import decomposition as deco

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")

    def boom(*a, **k):
        raise KeyboardInterrupt

    monkeypatch.setattr(deco, "_record_fused_acts", boom)
    inst = InstrumentedModel(model)
    model.use_z()
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=1024, batch_size=128)
    with pytest.raises(SystemExit):
        get_or_compute(cfg, inst)
    cache = tmp_path / "cache" / "components"
    canonical = cache / component_cache_name(cfg)
    assert not canonical.exists(), \
        "interrupted run must never claim the canonical cache name"
    partials = list(cache.glob("*_partial.npz"))
    assert len(partials) == 1
    data = np.load(partials[0])
    assert np.all(np.isfinite(data["act_comp"]))
