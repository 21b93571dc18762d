"""Numerical robustness of the sketch-tier factorizations (VERDICT r4 #1).

Root cause of the round-4 ``convtap_decay`` TPU-worker crash
(BENCH_r04.json ``convtap_decay_error``), established by per-stage
bisection on the real chip (tools/decay_bisect.py):

  1. a spectrally-shaped stream (decay ``r^i`` over D=131072 features)
     makes the centered sketch Gram span ~16 decades — numerically
     indefinite in f32 beyond the old 1e-6 Cholesky shift;
  2. ``cholesky`` then returned all-NaN, so the refine test matrix Q was
     NaN (measured: 41.8M/41.9M entries NaN);
  3. the refine pass accumulated a NaN sketch, and ``jnp.linalg.eigh`` on
     a non-finite operand does not return NaN on TPU — it CRASHES the TPU
     worker process (minimal repro: eigh of a NaN [320, 320] matrix).

The fix (estimators/ipca.py ``_sketch_grams``/``_pinv_sqrt_psd``) moves
the l x l factorizations to host float64 with relative clamping —
NaN-impossible for any finite stream — and refuses non-finite streams
with ``FloatingPointError`` at the [l, l] Gram choke point so step 3 can
never be reached.  These tests pin both behaviors at a CPU-sized version
of the crashing configuration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganspace_tpu.estimators.ipca import (
    IPCAEstimator, _nystrom_range, _pinv_sqrt_psd)

D, NB, C, N_BLOCKS = 512, 256, 8, 8


def _shaped_stream(floor=1e-4, r=0.96):
    """The decay-bench shaping at CPU scale: r^i floored, ~8 decades of
    variance — the regime that NaN'd the f32 Cholesky at production D."""
    spec = jnp.asarray(np.maximum(r ** np.arange(D), floor), jnp.float32)

    def block_fn(key):
        return jax.random.normal(key, (NB, D), jnp.float32) * spec

    return block_fn


def _fit(block_fn, monkeypatch, mode="never"):
    monkeypatch.setenv("GANSPACE_IPCA_REFINE", mode)
    est = IPCAEstimator(C, mode="nystrom")
    key = jax.random.PRNGKey(7)
    assert est.fit_stream(block_fn, N_BLOCKS, key, chunk=4)
    return est, key


def test_decay_shaped_range_is_finite_and_orthonormal(monkeypatch):
    """The refine test matrix on the crash-shaped stream: no NaN, and the
    kept columns are orthonormal (the old chol-QR returned 99.7% NaN)."""
    est, _ = _fit(_shaped_stream(), monkeypatch)
    q = np.asarray(_nystrom_range(est._nystrom, est._omega))
    assert np.isfinite(q).all()
    norms = np.linalg.norm(q, axis=0)
    kept = norms > 0.5
    assert kept.sum() >= C          # at least the resolvable directions
    qk = q[:, kept]
    gram = qk.T @ qk
    assert np.abs(gram - np.eye(len(gram))).max() < 1e-2


def test_decay_shaped_refine_completes_with_quality(monkeypatch):
    """Full forced-refine round trip on the crash-shaped stream (the exact
    sequence that killed the TPU worker), then parity vs exact sample PCA."""
    block_fn = _shaped_stream()
    est, key = _fit(block_fn, monkeypatch, mode="always")
    assert est._refined
    comp, stdev, _ = est.get_components()
    assert np.isfinite(comp).all() and np.isfinite(stdev).all()
    x = np.concatenate([np.asarray(block_fn(jax.random.fold_in(key, i)))
                        for i in range(N_BLOCKS)])
    xc = x - x.mean(0)
    w, v = np.linalg.eigh((xc.T @ xc) / (len(x) - 1))
    exact = v[:, np.argsort(w)[::-1][:C]].T
    cos = np.abs(np.sum(exact * comp, axis=-1))
    assert cos.min() >= 0.99, cos


def test_decay_shaped_spectrum_stats_are_finite(monkeypatch):
    est, _ = _fit(_shaped_stream(), monkeypatch)
    stats = est.sketch_convergence()
    assert np.isfinite(stats["sketch_tail_frac"])
    assert np.isfinite(stats["min_rel_gap_topc"])
    assert 0.0 <= stats["sketch_tail_frac"] <= 1.0


def test_nan_stream_raises_instead_of_reaching_eigh(monkeypatch):
    """A NaN activation stream must surface as FloatingPointError at the
    Gram choke point — never flow into eigh (which kills the TPU worker)."""
    def block_fn(key):
        x = jax.random.normal(key, (NB, D), jnp.float32)
        return x.at[0, 0].set(jnp.nan)

    est, _ = _fit(block_fn, monkeypatch)
    with pytest.raises(FloatingPointError):
        est.sketch_convergence()
    with pytest.raises(FloatingPointError):
        est.get_components()
    with pytest.raises(FloatingPointError):
        _nystrom_range(est._nystrom, est._omega)


def test_nan_stream_raises_on_moments_tier():
    est = IPCAEstimator(C, mode="moments")
    x = np.random.RandomState(0).randn(NB, 32).astype(np.float32)
    x[3, 4] = np.inf
    est.fit_partial(x)
    with pytest.raises(FloatingPointError):
        est.get_components()


def test_pinv_sqrt_drops_noise_directions():
    """Indefinite f32-noise eigenvalues are dropped, not amplified: the
    result is finite and W m W is a projector on the kept subspace."""
    m = np.diag([4.0, 1.0, 1e-12, -1e-9]).astype(np.float32)
    w = _pinv_sqrt_psd(m)
    assert np.isfinite(w).all()
    p = w @ m.astype(np.float64) @ w
    assert np.allclose(p[:2, :2], np.eye(2), atol=1e-6)
    assert np.abs(p[2:, 2:]).max() < 1e-6
    with pytest.raises(FloatingPointError):
        _pinv_sqrt_psd(np.array([[np.nan, 0.0], [0.0, 1.0]]))
