"""Adaptive refine: the sketch tier decides its second data sweep from its
own first-pass spectrum (VERDICT r3 #1).

The policy (IPCAEstimator.should_refine) skips the refine sweep iff
``sketch_tail_frac <= 0.012`` and ``min_rel_gap_topc >= 0.02`` — thresholds
calibrated on a 40-case spectrum sweep (docs/PERFORMANCE.md).  These tests
assert the three behavioral contracts on fresh shapes (d=512, c=8 — NOT the
calibration shape):

* decaying spectra skip the sweep AND still match exact sample PCA >= 0.99;
* flat / plateau-at-cut spectra keep the sweep (tail-frac and eigengap
  guards respectively);
* explicit GANSPACE_IPCA_REFINE overrides win in both directions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganspace_tpu.estimators.ipca import IPCAEstimator

D, NB, C, N_BLOCKS = 512, 256, 8, 16


def _spec_stream(spec):
    spec = jnp.asarray(spec, jnp.float32)

    def block_fn(key):
        return jax.random.normal(key, (NB, D), jnp.float32) * spec

    return block_fn


def _exact_pca(block_fn, key, c):
    x = np.concatenate([np.asarray(block_fn(jax.random.fold_in(key, i)))
                        for i in range(N_BLOCKS)])
    xc = x - x.mean(0)
    w, v = np.linalg.eigh((xc.T @ xc) / (len(x) - 1))
    order = np.argsort(w)[::-1][:c]
    return v[:, order].T


def _run(spec, monkeypatch, mode=None):
    if mode is None:
        monkeypatch.delenv("GANSPACE_IPCA_REFINE", raising=False)
    else:
        monkeypatch.setenv("GANSPACE_IPCA_REFINE", mode)
    est = IPCAEstimator(C, mode="nystrom")
    key = jax.random.PRNGKey(11)
    block_fn = _spec_stream(spec)
    assert est.fit_stream(block_fn, N_BLOCKS, key, chunk=8)
    return est, block_fn, key


def test_decaying_spectrum_skips_refine_and_keeps_parity(monkeypatch):
    spec = 0.9 ** np.arange(D)
    est, block_fn, key = _run(spec, monkeypatch)
    assert est.refine_skipped is True
    assert est.refine_stats["sketch_tail_frac"] <= est.REFINE_TAIL_FRAC
    assert est.refine_stats["min_rel_gap_topc"] >= est.REFINE_MIN_GAP
    # single pass only: every sample counted exactly once
    assert est.n_samples_seen_ == N_BLOCKS * NB
    comp, _, _ = est.get_components()
    cos = np.abs(np.sum(_exact_pca(block_fn, key, C) * comp, axis=-1))
    assert cos.min() >= 0.99, cos


def test_flat_spectrum_keeps_refine(monkeypatch):
    est, _, _ = _run(np.ones(D), monkeypatch)
    assert est.refine_skipped is False
    assert est.refine_stats["sketch_tail_frac"] > est.REFINE_TAIL_FRAC
    # two passes ran
    assert est.n_samples_seen_ == N_BLOCKS * NB
    assert est._refined


def test_plateau_at_cut_trips_the_eigengap_guard(monkeypatch):
    # strong decay (tiny tail fraction) BUT a plateau straddling the
    # component cut: tail-frac alone would skip; the gap guard must not.
    spec = (0.9 ** np.arange(D)).astype(np.float64)
    spec[C - 3:C + 3] = spec[C - 3]
    est, _, _ = _run(spec, monkeypatch)
    assert est.refine_stats["sketch_tail_frac"] <= est.REFINE_TAIL_FRAC
    assert est.refine_stats["min_rel_gap_topc"] < est.REFINE_MIN_GAP
    assert est.refine_skipped is False
    assert est._refined


def test_degenerate_pair_at_cut_trips_the_eigengap_guard(monkeypatch):
    """A degenerate pair EXACTLY at the component cut (c-1, c): the
    boundary gap is part of min_rel_gap_topc (ADVICE r4 medium — the old
    pairwise range stopped at (c-2, c-1) and let this case skip)."""
    spec = (0.9 ** np.arange(D)).astype(np.float64)
    spec[C] = spec[C - 1]
    # 8x the default stream: a truly degenerate pair's ESTIMATED gap is
    # eigenvalue sample noise ~ sqrt(2/n); n=32768 puts it at ~1% —
    # decisively under the 2% guard (production n>=50k is tighter still).
    monkeypatch.delenv("GANSPACE_IPCA_REFINE", raising=False)
    est = IPCAEstimator(C, mode="nystrom")
    assert est.fit_stream(_spec_stream(spec), 8 * N_BLOCKS,
                          jax.random.PRNGKey(11), chunk=16)
    assert est.refine_stats["sketch_tail_frac"] <= est.REFINE_TAIL_FRAC
    assert est.refine_stats["min_rel_gap_topc"] < est.REFINE_MIN_GAP
    assert est.refine_skipped is False
    assert est._refined


@pytest.mark.parametrize("mode", ["always", "1"])
def test_explicit_always_overrides_skip(monkeypatch, mode):
    est, _, _ = _run(0.9 ** np.arange(D), monkeypatch, mode=mode)
    assert est.refine_skipped is False
    assert est._refined


@pytest.mark.parametrize("mode", ["never", "0"])
def test_explicit_never_overrides_refine(monkeypatch, mode):
    est, _, _ = _run(np.ones(D), monkeypatch, mode=mode)
    assert est.refine_skipped is True
    assert not est._refined


def test_sketch_convergence_reports_none_before_data(monkeypatch):
    est = IPCAEstimator(C, mode="nystrom")
    assert est.sketch_convergence() is None
    assert est.should_refine() is False   # nothing to refine yet


def test_decision_lands_in_cache_provenance(tmp_path, monkeypatch):
    """The refine decision must be auditable from the npz sidecar."""
    import json
    from helpers import tiny_stylegan2
    from ganspace_tpu import decomposition as deco
    from ganspace_tpu.config import Config
    from ganspace_tpu.models.base import InstrumentedModel

    monkeypatch.delenv("GANSPACE_IPCA_REFINE", raising=False)
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    model = tiny_stylegan2()
    model.use_z()
    inst = InstrumentedModel(model)
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=1024, batch_size=128)
    path = deco.get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as d:
        meta = json.loads(d["_meta"].item().decode())
    assert "refine_skipped" in meta
    # conv-tap on a random-init model: flat-ish spectrum -> either a
    # recorded policy decision (sketch tier) or None (moments tier at this
    # tap size); both must round-trip through the JSON sidecar.
    assert meta["refine_skipped"] in (True, False, None)


def test_refine_policy_fixed_at_construction(monkeypatch):
    """The policy is instance state read once at construction (VERDICT r4
    weak #7: call-time env reads made behavior depend on ambient process
    state); later env mutations must not change an existing estimator."""
    monkeypatch.setenv("GANSPACE_IPCA_REFINE", "never")
    est = IPCAEstimator(C, mode="nystrom")
    monkeypatch.setenv("GANSPACE_IPCA_REFINE", "always")
    assert est.fit_stream(_spec_stream(np.ones(D)), 4,
                          jax.random.PRNGKey(0), chunk=2)
    assert est.refine_skipped is True          # construction-time 'never'
    assert not est._refined
    # explicit kwarg wins over env entirely
    est2 = IPCAEstimator(C, mode="nystrom", refine="never")
    assert est2.refine_policy == "never"
