"""Pallas centered-Gram kernel correctness (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ganspace_tpu.ops.pallas.moments import centered_gram


@pytest.mark.parametrize("n,d", [(512, 256), (300, 130), (77, 515)])
def test_matches_numpy(n, d):
    rs = np.random.RandomState(n + d)
    x = rs.randn(n, d).astype(np.float32)
    got = np.asarray(centered_gram(jnp.asarray(x), interpret=True))
    xc = x - x.mean(0)
    ref = xc.T @ xc
    assert got.shape == (d, d)
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max() + 1e-4


def test_explicit_mean():
    rs = np.random.RandomState(0)
    x = rs.randn(256, 128).astype(np.float32)
    mu = rs.randn(128).astype(np.float32)
    got = np.asarray(centered_gram(jnp.asarray(x), jnp.asarray(mu), interpret=True))
    xc = x - mu
    assert np.abs(got - xc.T @ xc).max() < 1e-3
