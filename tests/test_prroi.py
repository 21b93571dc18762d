"""PrRoI pooling vs brute-force numeric integration + gradient checks
(analog of the reference's ``test_prroi_pooling2d.py`` gradcheck)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganspace_tpu.ops.prroi import prroi_pool2d


def bilinear(feat, y, x):
    """Continuous bilinear surface of one [H, W] map (zero outside)."""
    h, w = feat.shape
    total = 0.0
    for i in range(max(0, int(np.floor(y)) - 1), min(h, int(np.ceil(y)) + 2)):
        for j in range(max(0, int(np.floor(x)) - 1), min(w, int(np.ceil(x)) + 2)):
            total += feat[i, j] * max(0, 1 - abs(y - i)) * max(0, 1 - abs(x - j))
    return total


def brute_force_pool(feat, x1, y1, x2, y2, ph, pw, n_grid=64):
    out = np.zeros((ph, pw))
    bw, bh = (x2 - x1) / pw, (y2 - y1) / ph
    for p in range(ph):
        for q in range(pw):
            xs = np.linspace(x1 + q * bw, x1 + (q + 1) * bw, n_grid + 1)
            ys = np.linspace(y1 + p * bh, y1 + (p + 1) * bh, n_grid + 1)
            xs = 0.5 * (xs[1:] + xs[:-1])
            ys = 0.5 * (ys[1:] + ys[:-1])
            vals = [bilinear(feat, y, x) for y in ys for x in xs]
            out[p, q] = np.mean(vals)
    return out


@pytest.mark.slow
def test_matches_numeric_integration():
    rs = np.random.RandomState(0)
    feat = rs.randn(1, 2, 8, 8).astype(np.float32)
    rois = np.array([[0, 1.3, 0.7, 6.2, 5.9]], np.float32)
    out = np.asarray(prroi_pool2d(jnp.asarray(feat), jnp.asarray(rois), 3, 3))
    for c in range(2):
        ref = brute_force_pool(feat[0, c], 1.3, 0.7, 6.2, 5.9, 3, 3)
        assert np.abs(out[0, c] - ref).max() < 2e-3


def test_batch_index_and_scale():
    rs = np.random.RandomState(1)
    feat = rs.randn(2, 1, 8, 8).astype(np.float32)
    rois = np.array([[1, 0, 0, 16, 16]], np.float32)  # image coords, scale 0.5
    out = np.asarray(prroi_pool2d(jnp.asarray(feat), jnp.asarray(rois), 2, 2,
                                  spatial_scale=0.5))
    ref = brute_force_pool(feat[1, 0], 0, 0, 8, 8, 2, 2)
    assert np.abs(out[0, 0] - ref).max() < 2e-3


def test_degenerate_roi_is_zero():
    feat = jnp.ones((1, 1, 4, 4))
    rois = jnp.asarray(np.array([[0, 2.0, 2.0, 2.0, 3.0]], np.float32))
    out = prroi_pool2d(feat, rois, 2, 2)
    assert np.allclose(out, 0.0)


@pytest.mark.parametrize("wrt", ["features", "coords"])
@pytest.mark.slow
def test_gradients_finite_difference(wrt):
    with jax.enable_x64(True):
        _check_gradients(wrt)


def _check_gradients(wrt):
    rs = np.random.RandomState(2)
    feat = rs.randn(1, 1, 6, 6).astype(np.float64)
    roi = np.array([[0, 1.2, 1.1, 4.8, 4.6]], np.float64)

    if wrt == "features":
        f = lambda x: jnp.sum(prroi_pool2d(x, jnp.asarray(roi), 2, 2) ** 2)
        g = np.asarray(jax.grad(f)(jnp.asarray(feat)))
        eps = 1e-4
        for idx in [(0, 0, 2, 3), (0, 0, 1, 1)]:
            fp = feat.copy()
            fp[idx] += eps
            fm = feat.copy()
            fm[idx] -= eps
            fd = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
            assert abs(g[idx] - fd) < 1e-4
    else:
        # PrRoI's signature property: differentiable w.r.t. box coordinates
        # (the reference needs a dedicated coor_backward CUDA kernel).
        f = lambda r: jnp.sum(prroi_pool2d(jnp.asarray(feat), r, 2, 2) ** 2)
        g = np.asarray(jax.grad(f)(jnp.asarray(roi)))
        eps = 1e-5
        for ci in (1, 2, 3, 4):
            rp = roi.copy()
            rp[0, ci] += eps
            rm = roi.copy()
            rm[0, ci] -= eps
            fd = (float(f(jnp.asarray(rp))) - float(f(jnp.asarray(rm)))) / (2 * eps)
            assert abs(g[0, ci] - fd) < 1e-4, ci
