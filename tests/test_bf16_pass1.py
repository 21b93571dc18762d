"""Reduced-precision first pass for refine-bound sketch fits (r5).

When the adaptive policy keeps the refine sweep (flat spectra), the
first pass only has to FIND the subspace — so it can stream
bf16-synthesized activations ~3x cheaper, with the mandatory f32 refine
pass determining the estimate (measured min per-component cosine 0.99998
vs the all-f32 two-pass at production D=131072).  The pipeline decides
per workload from the fused-acts sentinel: the first-ever run is all-f32
and records whether the policy refines; later runs of the same workload
stream bf16 first iff it does.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganspace_tpu.estimators.ipca import IPCAEstimator

D, NB, C, N_BLOCKS = 256, 128, 6, 8


def _streams():
    """(f32 block_fn, simulated-low-precision block_fn) over the SAME
    key-derived flat-spectrum samples."""
    w = jnp.asarray(np.random.RandomState(0).randn(32, D).astype(np.float32))

    def f32_fn(key):
        z = jax.random.normal(key, (NB, 32), jnp.float32)
        return jnp.tanh(z @ w)

    def bf_fn(key):
        return f32_fn(key).astype(jnp.bfloat16)

    return f32_fn, bf_fn


def test_refine_stream_matches_full_precision_two_pass():
    f32_fn, bf_fn = _streams()
    key = jax.random.PRNGKey(2)

    ref = IPCAEstimator(C, mode="nystrom", refine="always")
    assert ref.fit_stream(f32_fn, N_BLOCKS, key, chunk=4)
    assert ref._refined

    mix = IPCAEstimator(C, mode="nystrom")
    assert mix.fit_stream(bf_fn, N_BLOCKS, key, chunk=4,
                          refine_stream=(f32_fn, None, None))
    # the refine pass is mandatory and bookkept
    assert mix._refined and mix.refine_skipped is False
    assert mix.policy_would_skip in (True, False)
    assert mix.n_samples_seen_ == ref.n_samples_seen_ == N_BLOCKS * NB  # refine restarts the count

    ca, _, _ = ref.get_components()
    cb, _, _ = mix.get_components()
    cos = np.abs(np.sum(ca * cb, axis=-1))
    assert cos.min() >= 0.999, cos


def test_refine_stream_forces_refine_even_when_policy_would_skip():
    """Decaying spectrum: auto would skip, but a reduced-precision pass 1
    makes the f32 refine load-bearing — it must run, and the would-skip
    verdict must still be recorded for the caller's sentinel."""
    spec = jnp.asarray((0.85 ** np.arange(D)).astype(np.float32))

    def f32_fn(key):
        return jax.random.normal(key, (NB, D), jnp.float32) * spec

    def bf_fn(key):
        return f32_fn(key).astype(jnp.bfloat16)

    est = IPCAEstimator(C, mode="nystrom")
    assert est.fit_stream(bf_fn, N_BLOCKS, jax.random.PRNGKey(4), chunk=4,
                          refine_stream=(f32_fn, None, None))
    assert est._refined and est.refine_skipped is False
    assert est.policy_would_skip is True
    assert est.n_samples_seen_ == N_BLOCKS * NB  # refine restarts the count


@pytest.mark.slow
def test_pipeline_sentinel_drives_bf16_pass1(tmp_path, monkeypatch):
    """Run 1 (all-f32) records policy_refines in the sentinel; run 2 of
    the same workload streams bf16 first, stays f32-grade, and says so in
    the provenance sidecar."""
    from helpers import tiny_stylegan2
    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models.base import InstrumentedModel

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    # force the sketch tier at tiny D (production conv taps are Nystrom)
    monkeypatch.setenv("GANSPACE_IPCA_MOMENTS_MAX_D", "0")
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "jc"))
    try:
        model = tiny_stylegan2()
        model.use_z()
        inst = InstrumentedModel(model)
        cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                     estimator="ipca", components=3, n=1024, batch_size=128)

        def meta_of(path):
            with np.load(path) as d:
                return json.loads(d["_meta"].item().decode()), \
                    d["act_comp"].reshape(3, -1).copy()

        meta1, comp1 = meta_of(get_or_compute(cfg, inst,
                                              force_recompute=True))
        assert meta1["bf16_pass1"] is False          # first-ever run: f32
        if meta1["refine_skipped"] is True:
            pytest.skip("tiny tap spectrum skipped the refine — no "
                        "bf16-pass1 candidate on this model")
        meta2, comp2 = meta_of(get_or_compute(cfg, inst,
                                              force_recompute=True))
        assert meta2["bf16_pass1"] is True           # sentinel kicked in
        assert meta2["refine_skipped"] is False      # f32 refine ran
        cos = np.abs(np.sum(comp1 * comp2, axis=1))
        assert cos.min() >= 0.99, cos
        # opt-out restores the all-f32 path
        monkeypatch.setenv("GANSPACE_BF16_PASS1", "0")
        meta3, _ = meta_of(get_or_compute(cfg, inst, force_recompute=True))
        assert meta3["bf16_pass1"] is False
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
