"""Profiling utilities (SURVEY.md §5 tracing/profiling replacement)."""

import pytest
import time

import jax.numpy as jnp

from ganspace_tpu.utils.tracing import StepTimer, annotate, device_sync, trace


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        time.sleep(0.02)
    x = jnp.ones((8, 8))
    with t.phase("b", sync=x @ x):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep
    assert t.totals()["a"] >= 0.02


@pytest.mark.slow
def test_trace_writes_files(tmp_path):
    with trace(str(tmp_path)) as d:
        with annotate("matmul"):
            x = jnp.ones((16, 16))
            device_sync(x @ x)
    assert any((tmp_path).rglob("*"))      # trace artifacts written
