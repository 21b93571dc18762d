"""Streaming per-unit statistics (reference ``netdissect/runningstats.py``).

Device-resident, bounded-memory accumulators used by the dissection
subsystem — and, by design, the same numerically-stable update schemes the
decomposition estimators build on (SURVEY.md §5 calls ``runningstats.py`` the
best in-repo reference for distributed moment updates):

* :class:`RunningTopK` — per-unit top-k via a jitted merge of the carried
  top-k with each batch (reference keeps a 5k append buffer and compresses,
  ``runningstats.py:11-117``; one fused ``lax.top_k`` per batch replaces the
  buffer dance);
* :class:`RunningQuantile` — per-unit quantile sketch by random level
  compaction (the same KLL-style scheme as ``runningstats.py:119-457``:
  when a level fills, sort and keep every other sample, doubling its
  weight), with static shapes so every step jits;
* :class:`RunningConditionalQuantile` — per-condition map of sketches
  (``runningstats.py:458-574``);
* :class:`RunningCrossCovariance` — Chan-style stable cross-moments
  (``runningstats.py:575-675``); under a mesh the per-shard moments
  psum-merge exactly like the estimator statistics;
* :class:`RunningVariance` — plain Chan mean/variance.

All ``state_dict``/``set_state_dict`` methods round-trip numpy dicts for
checkpoint/resume, mirroring the reference's serializable stats.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.utils import mm


# ---------------------------------------------------------------------------
# Top-K
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k",))
def _topk_merge(carry: jnp.ndarray, batch: jnp.ndarray, k: int) -> jnp.ndarray:
    """carry [U, k], batch [N, U] -> new [U, k] (descending)."""
    joined = jnp.concatenate([carry, batch.T], axis=1)
    vals, _ = jax.lax.top_k(joined, k)
    return vals


class RunningTopK:
    """Highest ``k`` activation values seen per unit."""

    def __init__(self, k: int = 100):
        self.k = k
        self.count = 0
        self._vals: Optional[jnp.ndarray] = None

    def add(self, batch) -> None:
        """batch: [N, U] (flatten spatial dims into N beforehand)."""
        batch = jnp.asarray(batch, jnp.float32)
        n, u = batch.shape
        if self._vals is None:
            self._vals = jnp.full((u, self.k), -jnp.inf, jnp.float32)
        self._vals = _topk_merge(self._vals, batch, self.k)
        self.count += n

    def result(self) -> np.ndarray:
        """[U, k] top values, descending; -inf where fewer than k seen."""
        return np.asarray(self._vals)

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {"k": np.int64(self.k), "count": np.int64(self.count),
                "vals": np.asarray(self._vals)}

    def set_state_dict(self, d) -> "RunningTopK":
        self.k = int(d["k"])
        self.count = int(d["count"])
        self._vals = jnp.asarray(d["vals"])
        return self


# ---------------------------------------------------------------------------
# Quantile sketch
# ---------------------------------------------------------------------------

class RunningQuantile:
    """Per-unit streaming quantiles by random level compaction.

    ``depth`` levels of ``samplesize`` slots each; level ``l`` samples carry
    weight ``2^l``.  Expected quantile error is O(1/samplesize) — the same
    guarantee class as the reference's sketch (FOCS'16 family).
    """

    def __init__(self, samplesize: int = 1024, depth: int = 12, seed: int = 0):
        self.samplesize = samplesize
        self.depth = depth
        self.count = 0
        self._rng = np.random.RandomState(seed)
        self._levels: Optional[list] = None   # list of [U, S] jnp arrays
        self._fill: Optional[list] = None     # host fill counts per level
        self.units = None

    def _init(self, u: int):
        self.units = u
        self._levels = [jnp.full((u, self.samplesize), jnp.nan, jnp.float32)
                        for _ in range(self.depth)]
        self._fill = [0] * self.depth

    def add(self, batch) -> None:
        """batch: [N, U]."""
        batch = np.asarray(batch, np.float32)
        n, u = batch.shape
        if self._levels is None:
            self._init(u)
        assert u == self.units
        self.count += n

        # Insert into level 0 in chunks; cascade compactions upward.
        pos = 0
        while pos < n:
            space = self.samplesize - self._fill[0]
            if space == 0:
                self._cascade(0)
                space = self.samplesize - self._fill[0]
            take = min(space, n - pos)
            chunk = jnp.asarray(batch[pos:pos + take].T)  # [U, take]
            lvl = self._levels[0]
            self._levels[0] = jax.lax.dynamic_update_slice_in_dim(
                lvl, chunk, self._fill[0], axis=1)
            self._fill[0] += take
            pos += take

    def _compact_level(self, l: int) -> jnp.ndarray:
        """Sort the FILLED prefix of level l and keep every other sample
        (random offset) — survivors' implicit weight doubles."""
        filled = jnp.sort(self._levels[l][:, :self._fill[l]], axis=1)
        return filled[:, self._rng.randint(2)::2]

    def _cascade(self, l: int):
        """Compact level l into level l+1."""
        if l + 1 >= self.depth:
            # At max depth: in-place compaction (rare; quality degrades gracefully)
            keep = self._compact_level(l)
            self._levels[l] = jnp.concatenate(
                [keep, jnp.full((self.units, self.samplesize - keep.shape[1]),
                                jnp.nan, jnp.float32)], axis=1)
            self._fill[l] = keep.shape[1]
            return
        survivors = self._compact_level(l)
        m = survivors.shape[1]
        if self._fill[l + 1] + m > self.samplesize:
            self._cascade(l + 1)
        self._levels[l + 1] = jax.lax.dynamic_update_slice_in_dim(
            self._levels[l + 1], survivors, self._fill[l + 1], axis=1)
        self._fill[l + 1] += m
        self._levels[l] = jnp.full((self.units, self.samplesize), jnp.nan,
                                   jnp.float32)
        self._fill[l] = 0

    def quantiles(self, qs) -> np.ndarray:
        """qs: scalar or [Q] in [0,1] -> [U, Q] estimated quantiles."""
        qs = np.atleast_1d(np.asarray(qs, np.float64))
        vals, weights = [], []
        for l in range(self.depth):
            f = self._fill[l]
            if f == 0:
                continue
            vals.append(np.asarray(self._levels[l][:, :f]))
            weights.append(np.full((f,), 2.0 ** l))
        v = np.concatenate(vals, axis=1)            # [U, M]
        w = np.concatenate(weights)                 # [M]
        order = np.argsort(v, axis=1)
        v_sorted = np.take_along_axis(v, order, axis=1)
        w_sorted = w[order]
        cum = np.cumsum(w_sorted, axis=1)
        total = cum[:, -1:]
        # weighted quantile: first index with cum >= q * total
        out = np.empty((v.shape[0], qs.size), np.float32)
        for qi, q in enumerate(qs):
            idx = np.argmax(cum >= q * total, axis=1)
            out[:, qi] = np.take_along_axis(v_sorted, idx[:, None], axis=1)[:, 0]
        return out

    def readout(self, n: int = 1001) -> np.ndarray:
        return self.quantiles(np.linspace(0.0, 1.0, n))

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {"samplesize": np.int64(self.samplesize),
                "depth": np.int64(self.depth), "count": np.int64(self.count),
                "fill": np.asarray(self._fill or []),
                "levels": np.stack([np.asarray(l) for l in self._levels])
                if self._levels else np.zeros((0,))}

    def set_state_dict(self, d) -> "RunningQuantile":
        self.samplesize = int(d["samplesize"])
        self.depth = int(d["depth"])
        self.count = int(d["count"])
        self._fill = [int(x) for x in d["fill"]]
        levels = d["levels"]
        self._levels = [jnp.asarray(levels[i]) for i in range(levels.shape[0])]
        self.units = levels.shape[1] if levels.size else None
        return self


class RunningConditionalQuantile:
    """Per-condition quantile sketches (reference ``runningstats.py:458-574``)."""

    def __init__(self, samplesize: int = 1024, depth: int = 12):
        self.samplesize = samplesize
        self.depth = depth
        self._sketches: Dict = {}

    def add(self, condition, batch) -> None:
        if condition not in self._sketches:
            self._sketches[condition] = RunningQuantile(self.samplesize, self.depth)
        self._sketches[condition].add(batch)

    def keys(self):
        return self._sketches.keys()

    def conditional(self, condition) -> RunningQuantile:
        return self._sketches[condition]

    def has_conditional(self, condition) -> bool:
        return condition in self._sketches

    def state_dict(self):
        return {str(k): v.state_dict() for k, v in self._sketches.items()}


# ---------------------------------------------------------------------------
# Cross-covariance / variance
# ---------------------------------------------------------------------------

@jax.jit
def _cross_update(state, a, b):
    count, mean_a, mean_b, cmom, vm_a, vm_b = state
    n = jnp.asarray(float(a.shape[0]), a.dtype)
    new_count = count + n
    bm_a = jnp.mean(a, axis=0)
    bm_b = jnp.mean(b, axis=0)
    da = bm_a - mean_a
    db = bm_b - mean_b
    f = n / new_count
    new_mean_a = mean_a + da * f
    new_mean_b = mean_b + db * f
    ac = a - bm_a
    bc = b - bm_b
    # Chan-style merged cross-moment (runningstats.py:575-632 scheme)
    new_cmom = cmom + mm(ac.T, bc) + jnp.outer(da, db) * (count * n / new_count)
    new_vm_a = vm_a + jnp.sum(jnp.square(ac), axis=0) + jnp.square(da) * (count * n / new_count)
    new_vm_b = vm_b + jnp.sum(jnp.square(bc), axis=0) + jnp.square(db) * (count * n / new_count)
    return (new_count, new_mean_a, new_mean_b, new_cmom, new_vm_a, new_vm_b)


class RunningCrossCovariance:
    """Streaming cross-covariance between two unit sets."""

    def __init__(self):
        self._state = None

    def add(self, a, b) -> None:
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        if self._state is None:
            da, db = a.shape[1], b.shape[1]
            self._state = (jnp.asarray(0.0), jnp.zeros(da), jnp.zeros(db),
                           jnp.zeros((da, db)), jnp.zeros(da), jnp.zeros(db))
        self._state = _cross_update(self._state, a, b)

    @property
    def count(self) -> float:
        return float(self._state[0])

    def mean(self):
        return np.asarray(self._state[1]), np.asarray(self._state[2])

    def covariance(self) -> np.ndarray:
        count = self._state[0]
        return np.asarray(self._state[3] / (count - 1.0))

    def correlation(self) -> np.ndarray:
        count, _, _, cmom, vm_a, vm_b = self._state
        denom = jnp.sqrt(jnp.outer(vm_a, vm_b))
        return np.asarray(cmom / jnp.maximum(denom, 1e-30))

    def state_dict(self):
        keys = ["count", "mean_a", "mean_b", "cmom", "vm_a", "vm_b"]
        return {k: np.asarray(v) for k, v in zip(keys, self._state)}

    def set_state_dict(self, d):
        self._state = tuple(jnp.asarray(d[k]) for k in
                            ["count", "mean_a", "mean_b", "cmom", "vm_a", "vm_b"])
        return self


class RunningVariance:
    """Chan mean/variance per unit."""

    def __init__(self):
        self.count = 0.0
        self._mean = None
        self._m2 = None

    def add(self, batch) -> None:
        batch = jnp.asarray(batch, jnp.float32)
        n = batch.shape[0]
        bm = jnp.mean(batch, axis=0)
        bv = jnp.var(batch, axis=0)
        if self._mean is None:
            self._mean, self._m2, self.count = bm, bv * n, float(n)
            return
        new_count = self.count + n
        delta = bm - self._mean
        self._mean = self._mean + delta * (n / new_count)
        self._m2 = self._m2 + bv * n + jnp.square(delta) * (self.count * n / new_count)
        self.count = new_count

    def mean(self) -> np.ndarray:
        return np.asarray(self._mean)

    def variance(self, ddof: int = 1) -> np.ndarray:
        return np.asarray(self._m2 / (self.count - ddof))

    def stdev(self, ddof: int = 1) -> np.ndarray:
        return np.sqrt(self.variance(ddof))
