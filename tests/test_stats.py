"""Streaming statistics vs exact numpy on synthetic streams."""

import pytest
import numpy as np

from ganspace_tpu.stats import (
    RunningConditionalQuantile,
    RunningCrossCovariance,
    RunningQuantile,
    RunningTopK,
    RunningVariance,
)


def test_topk_exact():
    rs = np.random.RandomState(0)
    data = rs.randn(5000, 16).astype(np.float32)
    tk = RunningTopK(k=10)
    for i in range(0, 5000, 700):
        tk.add(data[i:i + 700])
    got = tk.result()
    expect = -np.sort(-data, axis=0)[:10].T
    assert np.allclose(got, expect)
    assert tk.count == 5000

    # state-dict round trip
    tk2 = RunningTopK().set_state_dict(tk.state_dict())
    assert np.array_equal(tk2.result(), got)


@pytest.mark.slow
def test_quantile_accuracy():
    rs = np.random.RandomState(1)
    data = rs.randn(60_000, 8).astype(np.float32) * np.arange(1, 9)
    rq = RunningQuantile(samplesize=1024)
    for i in range(0, data.shape[0], 3000):
        rq.add(data[i:i + 3000])
    qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
    got = rq.quantiles(qs)
    expect = np.quantile(data, qs, axis=0).T
    scale = np.arange(1, 9)[:, None]
    err = np.abs(got - expect) / scale
    assert err.max() < 0.15, err.max()
    assert rq.count == 60_000

    rq2 = RunningQuantile().set_state_dict(rq.state_dict())
    assert np.allclose(rq2.quantiles(qs), got)


@pytest.mark.slow
def test_quantile_normalize_inverts_quantiles():
    """normalize (value -> CDF) is the inverse of quantiles (CDF -> value)
    up to sketch error; exact on a small in-pending stream."""
    rs = np.random.RandomState(2)
    data = rs.randn(50_000, 4).astype(np.float32) + np.arange(4)
    rq = RunningQuantile(samplesize=1024)
    for i in range(0, data.shape[0], 5000):
        rq.add(data[i:i + 5000])
    qs = np.array([0.05, 0.3, 0.5, 0.9, 0.99])
    levels = rq.quantiles(qs)                     # [4, 5]
    back = rq.normalize(levels)                   # [4, 5]
    assert np.abs(back - qs[None, :]).max() < 0.05
    # exact CDF on a tiny unfused stream
    small = RunningQuantile()
    small.add(np.arange(10, dtype=np.float32).reshape(10, 1))
    cdf = small.normalize(np.array([[-1.0], [4.0], [9.0], [100.0]]).T.reshape(1, 4))
    assert np.allclose(cdf, [[0.0, 0.5, 1.0, 1.0]])


def test_conditional_quantile():
    rs = np.random.RandomState(2)
    cq = RunningConditionalQuantile(samplesize=512)
    cq.add("a", rs.randn(4000, 4).astype(np.float32))
    cq.add("b", 5 + rs.randn(4000, 4).astype(np.float32))
    assert cq.has_conditional("a") and cq.has_conditional("b")
    med_a = cq.conditional("a").quantiles(0.5)
    med_b = cq.conditional("b").quantiles(0.5)
    assert np.abs(med_a).max() < 0.3
    assert np.abs(med_b - 5).max() < 0.3


def test_cross_covariance_matches_numpy():
    rs = np.random.RandomState(3)
    a = rs.randn(4096, 6).astype(np.float32)
    b = (a[:, :3] @ rs.randn(3, 5) + 0.5 * rs.randn(4096, 5)).astype(np.float32)
    rc = RunningCrossCovariance()
    for i in range(0, 4096, 512):
        rc.add(a[i:i + 512], b[i:i + 512])
    cov = rc.covariance()
    expect = ((a - a.mean(0)).T @ (b - b.mean(0))) / (4096 - 1)
    assert np.abs(cov - expect).max() < 1e-3
    corr = rc.correlation()
    ref_corr = np.corrcoef(a.T, b.T)[:6, 6:]
    assert np.abs(corr - ref_corr).max() < 1e-3

    rc2 = RunningCrossCovariance().set_state_dict(rc.state_dict())
    assert np.allclose(rc2.covariance(), cov)


def test_running_variance():
    rs = np.random.RandomState(4)
    data = 3 + 2 * rs.randn(10000, 7).astype(np.float32)
    rv = RunningVariance()
    for i in range(0, 10000, 999):
        rv.add(data[i:i + 999])
    assert np.abs(rv.mean() - data.mean(0)).max() < 1e-4
    assert np.abs(rv.variance() - data.var(0, ddof=1)).max() < 1e-2
