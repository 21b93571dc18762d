"""Spectrum-derived bf16-datapath grading (VERDICT r4 #6).

bf16 activation rounding is relative noise, so a component's rotation
under it is bounded by eps_rel / rel_gap (see decomposition.BF16_EPS_REL
for the calibration).  The pipeline must grade every --dtype bfloat16
cache from its own fitted spectrum: per-component cosine bounds in
``_meta bf16_cos_bounds`` and a ``bf16_analysis_grade`` verdict — flat
spectra (tiny eigengaps) REFUSE analysis-grade labeling, decaying
spectra certify it.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganspace_tpu.decomposition import BF16_EPS_REL, bf16_component_bounds
from ganspace_tpu.estimators.ipca import IPCAEstimator


def test_bounds_formula_flat_vs_decaying():
    decaying = 0.8 ** np.arange(32)          # 36% relative gaps
    b = bf16_component_bounds(decaying, 8)
    assert (b >= 0.99).all()
    flat = 1.0 - 1e-4 * np.arange(32)        # ~1e-4 relative gaps
    b = bf16_component_bounds(flat, 8)
    assert (b < 0.99).all()
    # spectrum stops AT c: the cut-boundary gap is unknown -> no bound
    b = bf16_component_bounds(decaying[:8], 8)
    assert b[7] == 0.0 and (b[:7] >= 0.99).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_bounds_are_conservative_vs_measured_rotation(seed):
    """Measured per-component cosine between PCA of X and PCA of bf16(X)
    must sit ABOVE the spectrum-derived bound (the bound's entire job)."""
    D, n, c = 128, 8192, 8
    rs = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rs.randn(D, D))
    for spec in (0.9 ** np.arange(D), (1.0 + np.arange(D)) ** -1.0):
        x = (rs.randn(n, D) * np.sqrt(spec)) @ q.T
        xb = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))

        def pca(a):
            a = a - a.mean(0)
            w, v = np.linalg.eigh(a.T @ a / (len(a) - 1))
            o = np.argsort(w)[::-1]
            return w[o], v[:, o[:c]]

        w1, v1 = pca(x)
        _, v2 = pca(xb)
        cos = np.abs(np.sum(v1 * v2, axis=0))
        bound = bf16_component_bounds(w1, c)
        assert (cos + 1e-9 >= bound).all(), (cos, bound)


def test_component_spectrum_tiers():
    d, nb, c = 64, 256, 4
    spec = jnp.asarray((0.9 ** np.arange(d)).astype(np.float32))

    def block_fn(key):
        return jax.random.normal(key, (nb, d), jnp.float32) * spec

    for mode in ("moments", "nystrom"):
        est = IPCAEstimator(c, mode=mode)
        assert est.fit_stream(block_fn, 8, jax.random.PRNGKey(0), chunk=4)
        ev = est.component_spectrum()
        assert ev is not None and len(ev) >= c + 1
        assert (np.diff(ev) <= 1e-9).all()      # descending
        # decaying stream -> certifiable bounds
        b = bf16_component_bounds(ev, c)
        assert (b >= 0.99).all()
    est = IPCAEstimator(c, mode="sklearn")
    est.fit_partial(np.random.RandomState(0)
                    .randn(nb, d).astype(np.float32))
    assert est.component_spectrum() is None


def test_pipeline_bf16_cache_reports_bounds_and_grade(
        tmp_path, monkeypatch, capsys):
    """Every --dtype bfloat16 cache must carry per-component cosine bounds
    and a grade consistent with them, and the pipeline must announce the
    verdict.  (Tiny random models have genuinely gapped tap spectra —
    Marchenko-Pastur inflation at n~D plus real channel structure — so the
    REFUSAL branch is pinned by the formula/conservativeness tests above
    and measured on the production flat conv tap by bench.py's
    convtap_bf16_grade field.)"""
    from helpers import tiny_stylegan2
    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models.base import InstrumentedModel

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    model = tiny_stylegan2()
    model.use_z()
    inst = InstrumentedModel(model)
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=1024, batch_size=128,
                 dtype="bfloat16")
    path = get_or_compute(cfg, inst, force_recompute=True)
    assert "_bf16" in path.name
    with np.load(path) as d:
        meta = json.loads(d["_meta"].item().decode())
    bounds = meta["bf16_cos_bounds"]
    assert len(bounds) == 3 and all(0.0 <= b <= 1.0 for b in bounds)
    assert meta["bf16_analysis_grade"] == (min(bounds) >= 0.99)
    err = capsys.readouterr().err
    assert ("NOT analysis-grade" in err) == (not meta["bf16_analysis_grade"])
    assert "bf16_cos_bounds" in err


def test_eps_rel_constant_pinned():
    # the calibration provenance lives in decomposition.py; a silent change
    # here would invalidate every recorded grade
    assert BF16_EPS_REL == 2e-3
