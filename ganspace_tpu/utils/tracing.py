"""Profiling and timing utilities (SURVEY.md §5 tracing/profiling).

The reference has only timestamped prints and a CUDA-memory probe; the
TPU-native replacements are:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (op-level device timeline);
* :class:`StepTimer` — lightweight named phase timers with correct device
  semantics (synchronizes via a scalar readback — under remote TPU tunnels
  ``block_until_ready`` can return before execution finishes);
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` passthrough so pipeline
  phases show up named in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(outdir: str = "/tmp/ganspace-trace"):
    """``with trace('dir'): ...`` -> TensorBoard trace under ``dir``."""
    jax.profiler.start_trace(outdir)
    try:
        yield outdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the device trace."""
    return jax.profiler.TraceAnnotation(name)


def device_sync(*arrays) -> None:
    """Reliable device barrier: forces a scalar readback that depends on
    every given array (or a trivial op when none)."""
    if arrays:
        for a in arrays:
            leaves = jax.tree_util.tree_leaves(a)
            if leaves:
                float(jnp.sum(leaves[0].ravel()[:1]))
    else:
        float(jnp.zeros(()))


class StepTimer:
    """Accumulating named phase timers.

        t = StepTimer()
        with t.phase("sample"): ...
        with t.phase("fit", sync=acts): ...
        print(t.report())
    """

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self._total, key=lambda n: -self._total[n]):
            tot, cnt = self._total[name], self._count[name]
            lines.append(f"{name:>24}: {tot:8.2f}s total, {cnt:5d} calls, "
                         f"{tot / cnt * 1000:8.1f} ms/call")
        return "\n".join(lines)

    def totals(self) -> Dict[str, float]:
        return dict(self._total)
