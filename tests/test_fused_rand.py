"""Random-direction stdev baselines riding the fused fit scan.

The reference computes its baselines by projecting 5000 centered samples on
fixed random directions (reference decomposition.py:310-316).  The fused
streams accumulate the projections' raw first/second moments inside the same
scan instead (IPCAEstimator.fit_stream(rand_dirs=...)): variance is
shift-invariant, so the centered stdev falls out with no extra synthesis
block and no [nb, D] readback, over ALL n samples rather than 5000.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.ipca import IPCAEstimator


def _make_stream(d=96, nb=256, zdim=32, seed=0):
    rs = np.random.RandomState(seed)
    w = jnp.asarray(rs.randn(zdim, d).astype(np.float32))
    scale = jnp.asarray((np.arange(1, d + 1) ** -0.7).astype(np.float32))

    def block_fn(key):
        z = jax.random.normal(key, (nb, zdim), jnp.float32)
        return jnp.tanh(z @ w) * scale

    return block_fn


@pytest.mark.parametrize("mode", ["moments", "nystrom"])
def test_rand_moments_match_direct_projection(mode):
    d, nb, c, n_blocks = 96, 256, 5, 24
    block_fn = _make_stream(d=d, nb=nb)
    dirs = np.random.RandomState(3).randn(c, d).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    key = jax.random.PRNGKey(7)
    est = IPCAEstimator(c, mode=mode)
    assert est.fit_stream(block_fn, n_blocks, key, chunk=8,
                          rand_dirs=jnp.asarray(dirs))
    mom = est.rand_moments()
    assert mom is not None
    pm, pm2, n = mom
    # moments from the LAST pass only — the sketch tier's internal refine
    # pass re-streams the same samples and must not double-count
    assert n == n_blocks * nb
    got = np.asarray(jnp.sqrt(jnp.maximum(pm2 / n, 0.0)))

    # direct: regenerate the stream, center, project, std (ddof=0 — the
    # same estimator the raw-moment identity reproduces)
    xs = [np.asarray(block_fn(jax.random.fold_in(key, i)))
          for i in range(n_blocks)]
    x_all = np.concatenate(xs).astype(np.float64)
    x_all -= x_all.mean(axis=0, keepdims=True)
    want = (dirs.astype(np.float64) @ x_all.T).std(axis=1)
    assert np.allclose(got, want, rtol=2e-4), (got, want)


def test_rand_moments_survive_large_mean_offset():
    """ADVICE r4: with (E[p])^2 >> Var(p) (big uncentered activations), raw
    f32 moments lose the variance to cancellation (E[p^2]-E[p]^2 ~ eps*E[p]^2
    swamps Var); the Chan mean/M2 carry must not."""
    d, nb, c, n_blocks = 64, 256, 4, 16
    rs = np.random.RandomState(1)
    offset = jnp.asarray((3000.0 * rs.randn(d)).astype(np.float32))

    def block_fn(key):
        return jax.random.normal(key, (nb, d), jnp.float32) + offset

    dirs = rs.randn(c, d).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    key = jax.random.PRNGKey(9)
    est = IPCAEstimator(c, mode="moments")
    assert est.fit_stream(block_fn, n_blocks, key, chunk=8,
                          rand_dirs=jnp.asarray(dirs))
    pm, pm2, n = est.rand_moments()
    got = np.asarray(jnp.sqrt(jnp.maximum(pm2 / n, 0.0)))
    xs = np.concatenate([np.asarray(block_fn(jax.random.fold_in(key, i)))
                         for i in range(n_blocks)]).astype(np.float64)
    want = (dirs.astype(np.float64) @ (xs - xs.mean(0)).T).std(axis=1)
    # unit-variance isotropic stream: projections have stdev ~1 whatever
    # the offset; raw f32 moments would be off by O(1) here
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_rand_moments_absent_without_dirs():
    est = IPCAEstimator(4, mode="moments")
    assert est.fit_stream(_make_stream(), 4, jax.random.PRNGKey(0), chunk=2)
    assert est.rand_moments() is None


@pytest.mark.slow
def test_pipeline_fused_rand_matches_block_baseline(tmp_path, monkeypatch):
    """End-to-end: with the whole stream fitting in one block of <=5000
    samples, the scan-accumulated baseline and the legacy last-block
    baseline compute the same statistic over the same samples — the npz
    values must agree tightly."""
    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models import get_instrumented_model

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")

    def run(flag):
        monkeypatch.setenv("GANSPACE_FUSED_RAND", flag)
        cfg = Config(model="DCGAN", layer="deconv3", estimator="ipca",
                     components=4, n=256, batch_size=256)
        inst = get_instrumented_model(cfg, use_w=False)
        path = get_or_compute(cfg, inst, force_recompute=True)
        with np.load(path) as z:
            return z["random_stdevs"].copy()

    with_scan = run("1")
    legacy = run("0")
    assert with_scan.shape == legacy.shape
    assert np.all(with_scan > 0)
    np.testing.assert_allclose(with_scan, legacy, rtol=1e-3)


def test_projected_variance_matches_sampled_projection_std():
    """lat_stdev closed form: Var(d.x) from the moments scatter must match
    the sampled projection variance (exactly, same stream)."""
    d, nb, c, n_blocks = 64, 256, 4, 8
    block_fn = _make_stream(d=d, nb=nb, zdim=16)
    key = jax.random.PRNGKey(3)
    est = IPCAEstimator(c, mode="moments")
    assert est.fit_stream(block_fn, n_blocks, key, chunk=4)
    dirs = np.random.RandomState(5).randn(c, d).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pv = est.projected_variance(dirs)
    assert pv is not None
    xs = np.concatenate([np.asarray(block_fn(jax.random.fold_in(key, i)))
                         for i in range(n_blocks)]).astype(np.float64)
    want = (dirs.astype(np.float64) @ (xs - xs.mean(0)).T).var(axis=1)
    np.testing.assert_allclose(pv, want, rtol=1e-4)
    # sketch tier: no closed form
    est2 = IPCAEstimator(c, mode="nystrom")
    assert est2.fit_stream(block_fn, 2, key, chunk=2)
    assert est2.projected_variance(dirs) is None
