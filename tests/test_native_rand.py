"""Native threaded gaussian sampler: bit-exact numpy-legacy parity
(the host-sampling hot path; see native/src/fastrand.cpp)."""

import numpy as np
import pytest

from ganspace_tpu.native import have_fastrand, normal_batches, normal_f64


@pytest.mark.skipif(not have_fastrand(), reason="no native toolchain")
@pytest.mark.parametrize("seed", [0, 1, 12345, 2**31 - 1])
@pytest.mark.parametrize("n", [1, 7, 512, 4096 * 3])
def test_f64_bit_exact(seed, n):
    ref = np.random.RandomState(seed).standard_normal(n)
    got = normal_f64(seed, n)
    assert got.dtype == np.float64
    assert np.array_equal(ref, got)          # BIT exact, not allclose


@pytest.mark.skipif(not have_fastrand(), reason="no native toolchain")
def test_batches_threaded_exact():
    seeds = [3, 999, 424242, 7]
    n_per = 512 * 33
    got = normal_batches(seeds, n_per, n_threads=4)
    assert got.shape == (4, n_per) and got.dtype == np.float32
    for i, s in enumerate(seeds):
        ref = np.random.RandomState(s).standard_normal(n_per).astype(np.float32)
        assert np.array_equal(got[i], ref)


def test_batches_numpy_fallback(monkeypatch):
    import ganspace_tpu.native as native
    monkeypatch.setattr(native, "_build_rand", lambda: None)
    got = native.normal_batches([5], 64)
    ref = np.random.RandomState(5).standard_normal(64).astype(np.float32)
    assert np.array_equal(got[0], ref)
