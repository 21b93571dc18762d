"""Fused latent regression: cross-moments accumulated inside the fit sweeps
replace the regression's own synthesis sweep (reference decomposition.py:77-139
runs a third sampling loop + host gelsd; here R follows from raw moments and
G = (n-1)I from the estimator's own model — exact on the moments tier)."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.ipca import IPCAEstimator


def _unit_rows(m):
    return m / np.linalg.norm(m, axis=-1, keepdims=True)


def _stream_and_exact_solve(mode, d=96, nb=256, c=5, n_blocks=24, zdim=32):
    """Run fit_stream(with_reg=True) on a synthetic tap, then solve the SAME
    normal equations exactly (explicit G) over the same samples."""
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(zdim, d).astype(np.float32))
    # anisotropic spectrum so the top components are well identified
    scale = jnp.asarray((np.arange(1, d + 1) ** -0.7).astype(np.float32))

    def block_fn(key):
        z = jax.random.normal(key, (nb, zdim), jnp.float32)
        x = jnp.tanh(z @ w) * scale
        return x, z

    key = jax.random.PRNGKey(7)
    est = IPCAEstimator(c, mode=mode)
    assert est.fit_stream(block_fn, n_blocks, key, chunk=8, with_reg=True)
    reg = est.reg_moments()
    assert reg is not None
    xz, z_sum, n_reg = reg
    # moments from the LAST pass only — never double-counted by the
    # sketch tier's internal refine pass
    assert n_reg == n_blocks * nb
    assert xz.shape == (d, zdim) and z_sum.shape == (zdim,)

    comp, stdev, _ = est.get_components()
    mean = est.mean_

    # exact solve over the identical samples
    xs, zs = [], []
    for i in range(n_blocks):
        x, z = block_fn(jax.random.fold_in(key, i))
        xs.append(np.asarray(x))
        zs.append(np.asarray(z))
    x_all, z_all = np.concatenate(xs), np.concatenate(zs)
    coords = (x_all - mean) @ comp.T / stdev
    m_exact, *_ = np.linalg.lstsq(coords, z_all, rcond=None)

    from ganspace_tpu.decomposition import regression_from_moments
    z_comp, z_mean = regression_from_moments(
        comp, mean.reshape(1, -1), stdev, reg)
    assert np.allclose(z_mean[0], z_all.mean(axis=0), atol=1e-4)
    cos = np.abs(np.sum(_unit_rows(z_comp) * _unit_rows(m_exact), -1))
    return cos


def test_fused_linreg_moments_tier_exact():
    """Moments tier: components are exact eigenvectors of the accumulated
    scatter, so G=(n-1)I is exact and the closed form matches the explicit
    least-squares solve to fp tolerance."""
    cos = _stream_and_exact_solve("moments")
    assert cos.min() > 0.9999, cos


def test_fused_linreg_nystrom_tier():
    """Sketch tier: G=(n-1)I holds to the (refined) sketch accuracy —
    quantify the off-diagonal mixing against the exact solve."""
    cos = _stream_and_exact_solve("nystrom")
    assert cos.min() > 0.99, cos


def test_pipeline_fused_linreg_skips_regression_sweep(tmp_path, monkeypatch):
    """With the fused stream on, get_or_compute must produce lat_comp from
    the piggybacked moments — the separate regression sweep never runs."""
    from helpers import tiny_stylegan2
    from ganspace_tpu import decomposition as deco
    from ganspace_tpu.config import Config
    from ganspace_tpu.models.base import InstrumentedModel

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")

    def no_sweep(*a, **k):
        raise AssertionError("separate regression sweep must not run")

    monkeypatch.setattr(deco, "regression", no_sweep)
    model = tiny_stylegan2()
    model.use_z()
    inst = InstrumentedModel(model)
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=1024, batch_size=128)
    path = deco.get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as d:
        lat = d["lat_comp"].reshape(3, -1)
        assert np.all(np.isfinite(lat))
        assert np.allclose(np.linalg.norm(lat, axis=-1), 1.0, atol=1e-5)
        meta = json.loads(d["_meta"].item().decode())
    assert meta["fused_linreg"] is True


@pytest.mark.slow
def test_pipeline_fused_linreg_matches_exact_regression(tmp_path, monkeypatch):
    """End-to-end: the fused-moments lat_comp must match an exact
    least-squares regression (explicit G) computed over the same fused-stream
    samples and the cached components."""
    from helpers import tiny_stylegan2
    from ganspace_tpu import decomposition as deco
    from ganspace_tpu.config import Config
    from ganspace_tpu.models.base import InstrumentedModel

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    model = tiny_stylegan2()
    model.use_z()
    inst = InstrumentedModel(model)
    batch, n = 128, 2048
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=n, batch_size=batch)
    path = deco.get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as d:
        comp = d["act_comp"].reshape(3, -1)
        mean = d["act_mean"].reshape(1, -1)
        stdev = d["act_stdev"]
        lat = d["lat_comp"].reshape(3, -1)

    # regenerate the exact fused-stream samples (same key schedule as
    # fit_stream: fold_in(PRNGKey(SEED_SAMPLING), block_index))
    fp, pack = model.pure_acts_fn_p("conv1")
    lat_fn, lat_pack = model.device_latents_fn_p()
    key0 = jax.random.PRNGKey(deco.SEED_SAMPLING)
    xs, zs = [], []
    for i in range(n // batch):
        z = lat_fn(lat_pack, jax.random.fold_in(key0, i), batch)
        xs.append(np.asarray(fp(pack, z)))
        zs.append(np.asarray(z).reshape(batch, -1))
    x_all, z_all = np.concatenate(xs), np.concatenate(zs)
    coords = (x_all - mean) @ comp.T / stdev
    m_exact, *_ = np.linalg.lstsq(coords, z_all, rcond=None)
    cos = np.abs(np.sum(_unit_rows(lat) * _unit_rows(m_exact), -1))
    assert cos.min() > 0.999, cos


@pytest.mark.slow
def test_fused_linreg_production_shape_error_bound(tmp_path, monkeypatch):
    """VERDICT r3 item 5: measure the G=(n-1)I approximation at a
    PRODUCTION feature dimensionality (D = 16*64*64 = 65536 >= 64k, the
    Nystrom+refine tier — the one shape where off-diagonal coordinate
    mixing could actually bite) against the exact-G solve over the same
    fused-stream samples.  Measured: min |cos| 0.999999 (c=32, n=4000);
    the asserted bound leaves slack for BLAS reassociation."""
    from ganspace_tpu import decomposition as deco
    from ganspace_tpu.config import Config
    from ganspace_tpu.models import get_model
    from ganspace_tpu.models.base import InstrumentedModel
    from ganspace_tpu.models.stylegan2 import SG2Config

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    # thin-channel 128px synthesis: the convs.6/7 pair taps 64x64 @ 16ch
    cfg_m = SG2Config(resolution=128,
                      channels=((4, 32), (8, 32), (16, 32), (32, 32),
                                (64, 16), (128, 8)))
    model = get_model("StyleGAN2", "ffhq", cfg=cfg_m)
    model.use_z()
    inst = InstrumentedModel(model)
    c, batch, n = 32, 1000, 4000
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="convs.6",
                 estimator="ipca", components=c, n=n, batch_size=batch)
    path = deco.get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as d:
        comp = d["act_comp"].reshape(c, -1)
        assert comp.shape[1] == 65536
        mean = d["act_mean"].reshape(1, -1)
        stdev = d["act_stdev"]
        lat = d["lat_comp"].reshape(c, -1)
        meta = json.loads(d["_meta"].item().decode())
    assert meta["fused_linreg"] is True

    # exact-G solve: same key schedule as fit_stream, explicit coords lstsq
    fp, pack = model.pure_acts_fn_p("convs.6")
    lat_fn, lat_pack = model.device_latents_fn_p()
    key0 = jax.random.PRNGKey(deco.SEED_SAMPLING)
    g = np.zeros((c, c), np.float64)
    r = np.zeros((c, 512), np.float64)
    for i in range(n // batch):
        z = lat_fn(lat_pack, jax.random.fold_in(key0, i), batch)
        x = np.asarray(fp(pack, z))
        coords = (x - mean) @ comp.T / stdev
        g += coords.T @ coords
        r += coords.T @ np.asarray(z).reshape(batch, -1)
    m_exact = np.linalg.solve(g, r)
    cos = np.abs(np.sum(_unit_rows(lat) * _unit_rows(m_exact), -1))
    print(f"fused-linreg D=65536 Nystrom tier: min |cos| {cos.min():.6f}, "
          f"mean {cos.mean():.6f} vs exact-G solve")
    assert cos.min() > 0.999, cos


@pytest.mark.slow
def test_fused_linreg_opt_out(tmp_path, monkeypatch):
    """GANSPACE_FUSED_LINREG=0 restores the separate regression sweep
    (reference-style fresh SEED_LINREG samples) and records it."""
    from helpers import tiny_stylegan2
    from ganspace_tpu import decomposition as deco
    from ganspace_tpu.config import Config
    from ganspace_tpu.models.base import InstrumentedModel

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    monkeypatch.setenv("GANSPACE_FUSED_LINREG", "0")
    model = tiny_stylegan2()
    model.use_z()
    inst = InstrumentedModel(model)
    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="conv1",
                 estimator="ipca", components=3, n=1024, batch_size=128)
    path = deco.get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as d:
        assert np.all(np.isfinite(d["lat_comp"]))
        meta = json.loads(d["_meta"].item().decode())
    assert meta["fused_linreg"] is False


def test_abort_refine_restores_reg_moments(monkeypatch):
    """abort_refine must restore the first-pass cross-moments along with the
    sketch (an interrupted refine otherwise leaves zeroed/partial moments
    that would silently produce a garbage lat_comp in the partial save)."""
    d, nb, c, zdim = 64, 128, 4, 16
    w = jnp.asarray(np.random.RandomState(1).randn(zdim, d).astype(np.float32))

    def block_fn(key):
        z = jax.random.normal(key, (nb, zdim), jnp.float32)
        return jnp.tanh(z @ w), z

    key = jax.random.PRNGKey(3)
    # a zero-block stream is a no-op, not an error
    assert IPCAEstimator(c, mode="nystrom").fit_stream(
        block_fn, 0, key, with_reg=True) is True
    # run only the first pass by disabling refine, then arm/abort manually
    # (the policy is instance state fixed at construction — r5)
    est2 = IPCAEstimator(c, mode="nystrom", refine="never")
    assert est2.fit_stream(block_fn, 6, key, chunk=4, with_reg=True)
    est2.refine_policy = "auto"                  # re-arm for begin_refine
    xz0, zs0, n0 = est2.reg_moments()
    assert est2.begin_refine()
    xz1, zs1, n1 = est2._reg
    assert n1 == 0 and float(jnp.abs(xz1).max()) == 0.0
    est2.abort_refine()
    xz2, zs2, n2 = est2.reg_moments()
    assert n2 == n0
    assert np.array_equal(np.asarray(xz2), np.asarray(xz0))
