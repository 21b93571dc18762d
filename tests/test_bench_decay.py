"""Smoke test for bench.py's decaying-spectrum conv-tap leg (adaptive-refine
skip + bf16 quality on decaying spectra) at tiny CPU shapes.

The leg itself is a hardware benchmark; this asserts its MECHANICS — the
spectral shaping produces a skip decision, the skip parity and bf16 cosine
fields are emitted, the forced-refine reference runs — so a bench-time
failure on real hardware can only be a measurement, not a code path."""

import numpy as np
import pytest

import bench
from helpers import tiny_stylegan2


@pytest.fixture()
def tiny_env(monkeypatch):
    monkeypatch.setenv("GANSPACE_BENCH_CONVTAP_N", "1024")
    monkeypatch.setenv("GANSPACE_BENCH_DECAY_NB", "128")
    monkeypatch.setenv("GANSPACE_BENCH_DECAY_C", "6")
    monkeypatch.setenv("GANSPACE_BENCH_DECAY_D", "1024")
    monkeypatch.setenv("GANSPACE_BENCH_DECAY_RANK", "128")
    # tiny c -> tiny sketch (l=38): steepen the decay so the tail stays
    # inside the same fraction-of-energy budget the production l=320 has
    monkeypatch.setenv("GANSPACE_BENCH_DECAY_R", "0.9")
    # force the sketch tier: the tiny tap (d=1024) would otherwise take the
    # moments fast path, but production convs.2 (d=131072) is Nystrom
    monkeypatch.setenv("GANSPACE_IPCA_MOMENTS_MAX_D", "0")
    monkeypatch.setenv("GANSPACE_BENCH_CONVTAP_LAYER", "conv1")
    monkeypatch.setenv("GANSPACE_BENCH_REPS", "2")
    monkeypatch.delenv("GANSPACE_IPCA_REFINE", raising=False)


def test_decay_leg_fields_and_skip(tiny_env):
    model = tiny_stylegan2()
    model.use_z()
    out = bench._bench_convtap_decay(model, n_chips=1)
    assert out, "pure tap fn must exist for StyleGAN2"
    # the exact geometric spectrum decays 19%/index at the test r: the
    # policy must take the single-pass branch and it must match the forced
    # two-pass reference
    assert out["convtap_decay_refine_skipped"] is True
    assert out["convtap_decay_skip_min_cos"] >= 0.99
    assert out["convtap_decay_bf16_min_cos"] > 0.9   # bf16 quality, recorded
    assert out["convtap_decay_samples_s_chip"] > 0
    assert out["convtap_decay_bf16_samples_s_chip"] > 0
    assert out["convtap_decay_runs"] >= 1
    assert out["convtap_decay_median_s"] > 0
    assert out["convtap_decay_refined_s"] > 0
    # the r4 crash-regression stage (shaped REAL synthesis stream) must
    # complete with finite components; its policy decision is honest —
    # recorded, not required to skip
    assert out["convtap_shaped_finite"] is True
    assert out["convtap_shaped_s"] > 0
    assert out["convtap_shaped_refine_skipped"] in (True, False)
    # env did not leak
    import os
    assert "GANSPACE_IPCA_REFINE" not in os.environ


def test_run_restores_prior_refine_policy(tiny_env, monkeypatch):
    """ADVICE r4: a user-supplied GANSPACE_IPCA_REFINE must survive the
    decay leg (the old finally-pop erased it for the rest of the process)."""
    import os
    monkeypatch.setenv("GANSPACE_IPCA_REFINE", "never")
    model = tiny_stylegan2()
    model.use_z()
    bench._bench_convtap_decay(model, n_chips=1)
    assert os.environ.get("GANSPACE_IPCA_REFINE") == "never"


def test_spread_fields():
    s = bench._spread([3.0, 1.0, 2.0, 10.0, 2.5], "x")
    assert s["x_median_s"] == 2.5
    assert s["x_p10_s"] <= s["x_median_s"] <= s["x_p90_s"]
    assert s["x_runs"] == 5
