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

def _pair_merge(x, fx, y, fy, off):
    """Merge two same-weight sketch levels (each [U, S], +inf padded past its
    fill) -> (kept [U,S], fkept, over [U,S], fover).

    If the union fits in S slots it stays at this level (``kept``); otherwise
    the whole union is compacted — sort, keep every other sample from parity
    ``off`` — and promoted with doubled weight (``over``), leaving the level
    empty.  All shapes static; ``fx/fy/off`` are traced scalars, so one
    compilation serves every fill state.
    """
    s = x.shape[1]
    cat = jnp.sort(jnp.concatenate([x, y], axis=1), axis=1)     # [U, 2S]
    tot = fx + fy
    surv = jnp.where(off, cat[:, 1::2], cat[:, 0::2])           # [U, S]
    fsurv = jnp.where(off, tot // 2, (tot + 1) // 2)
    overflow = tot > s
    inf_row = jnp.full_like(surv, jnp.inf)
    kept = jnp.where(overflow, inf_row, cat[:, :s])
    fkept = jnp.where(overflow, 0, tot)
    over = jnp.where(overflow, surv, inf_row)
    fover = jnp.where(overflow, fsurv, 0)
    return kept, fkept, over, fover


@partial(jax.jit, static_argnames=("depth",))
def _sketch_insert(levels, fills, block, n_real, key, *, depth):
    """One fused insert of ``block`` [U, W] (W a multiple of S; +inf padded
    past ``n_real``) into the level structure [D, U, S] / fills [D]."""
    s = levels.shape[2]
    n_chunks = block.shape[1] // s
    for ci in range(n_chunks):
        carry = block[:, ci * s:(ci + 1) * s]
        fc = jnp.clip(n_real - ci * s, 0, s)
        for l in range(depth):
            key, sub = jax.random.split(key)
            off = jax.random.bernoulli(sub)
            kept, fk, over, fo = _pair_merge(levels[l], fills[l], carry, fc, off)
            if l == depth - 1:
                # top level: keep the compaction in place (graceful decay)
                levels = levels.at[l].set(jnp.where(fo > 0, over, kept))
                fills = fills.at[l].set(jnp.where(fo > 0, fo, fk))
            else:
                levels = levels.at[l].set(kept)
                fills = fills.at[l].set(fk)
            carry, fc = over, fo
    return levels, fills


class RunningQuantile:
    """Per-unit streaming quantiles by random level compaction.

    ``depth`` levels of ``samplesize`` slots each; level ``l`` samples carry
    weight ``2^l``.  Expected quantile error is O(1/samplesize) — the same
    guarantee class as the reference's sketch (FOCS'16 family,
    ``runningstats.py:119-457``).

    TPU-native update path: ``add`` only appends the batch to a device-side
    pending list (zero dispatch); when ``flush_cols`` columns accumulate, ONE
    jitted call (``_sketch_insert``) merges everything — a static-shape
    pair-merge cascade where fill counts are traced scalars, so the XLA
    program compiles once and is reused for every flush.  The reference's
    per-chunk ``dynamic_update_slice`` + host-driven cascade would dispatch
    dozens of shape-varying ops per batch.
    """

    def __init__(self, samplesize: int = 1024, depth: int = 12, seed: int = 0,
                 flush_blocks: int = 8):
        self.samplesize = samplesize
        self.depth = depth
        self.count = 0
        self.units = None
        self._key = jax.random.PRNGKey(seed)
        self._levels: Optional[jnp.ndarray] = None   # [D, U, S]
        self._fills: Optional[jnp.ndarray] = None    # [D] int32
        self._pending: list = []                     # list of [U, n] arrays
        self._pending_cols = 0
        self.flush_cols = flush_blocks * samplesize

    def _init(self, u: int):
        self.units = u
        self._levels = jnp.full((self.depth, u, self.samplesize), jnp.inf,
                                jnp.float32)
        self._fills = jnp.zeros((self.depth,), jnp.int32)

    def add(self, batch) -> None:
        """batch: [N, U]."""
        batch = jnp.asarray(batch, jnp.float32)
        n, u = batch.shape
        if self._levels is None:
            self._init(u)
        assert u == self.units
        self.count += n
        self._pending.append(batch.T)
        self._pending_cols += n
        if self._pending_cols >= self.flush_cols:
            self._flush()

    def _flush(self) -> None:
        if not self._pending:
            return
        x = jnp.concatenate(self._pending, axis=1) if len(self._pending) > 1 \
            else self._pending[0]
        n_real = x.shape[1]
        s = self.samplesize
        w = ((n_real + s - 1) // s) * s
        if w > n_real:
            x = jnp.concatenate(
                [x, jnp.full((self.units, w - n_real), jnp.inf, jnp.float32)],
                axis=1)
        self._key, sub = jax.random.split(self._key)
        self._levels, self._fills = _sketch_insert(
            self._levels, self._fills, x, jnp.int32(n_real), sub,
            depth=self.depth)
        self._pending = []
        self._pending_cols = 0

    def _weighted_sorted(self):
        """(v_sorted [U, M], cum-weights [U, M], totals [U, 1]) over every
        retained sample (sketch levels at weight 2^l plus raw pending)."""
        vals, weights = [], []
        if self._levels is not None:
            fills = np.asarray(self._fills)
            levels = np.asarray(self._levels)
            for l in range(self.depth):
                f = int(fills[l])
                if f == 0:
                    continue
                vals.append(levels[l][:, :f])
                weights.append(np.full((f,), 2.0 ** l))
        for blk in self._pending:                    # raw weight-1 samples
            b = np.asarray(blk)
            vals.append(b)
            weights.append(np.ones((b.shape[1],)))
        v = np.concatenate(vals, axis=1)            # [U, M]
        w = np.concatenate(weights)                 # [M]
        order = np.argsort(v, axis=1)
        v_sorted = np.take_along_axis(v, order, axis=1)
        cum = np.cumsum(w[order], axis=1)
        return v_sorted, cum, cum[:, -1:]

    def quantiles(self, qs) -> np.ndarray:
        """qs: scalar or [Q] in [0,1] -> [U, Q] estimated quantiles."""
        qs = np.atleast_1d(np.asarray(qs, np.float64))
        v_sorted, cum, total = self._weighted_sorted()
        # weighted quantile: first index with cum >= q * total
        out = np.empty((v_sorted.shape[0], qs.size), np.float32)
        for qi, q in enumerate(qs):
            idx = np.argmax(cum >= q * total, axis=1)
            out[:, qi] = np.take_along_axis(v_sorted, idx[:, None], axis=1)[:, 0]
        return out

    def normalize(self, levels) -> np.ndarray:
        """Inverse of :meth:`quantiles`: estimated CDF position of given
        values, per unit (reference ``runningstats.py`` ``normalize``).

        ``levels``: [U] or [U, K] -> [U, K] fractions in [0, 1]; fraction of
        the stream <= the level (so ``1 - normalize(x)`` is the exceedance
        probability used by the max-IoU search)."""
        levels = np.asarray(levels, np.float32)
        if levels.ndim == 1:
            levels = levels[:, None]
        v_sorted, cum, total = self._weighted_sorted()
        out = np.empty(levels.shape, np.float32)
        for u in range(levels.shape[0]):
            pos = np.searchsorted(v_sorted[u], levels[u], side="right")
            cdf = np.concatenate([[0.0], cum[u]])[pos]
            out[u] = cdf / max(float(total[u, 0]), 1e-30)
        return out

    def readout(self, n: int = 1001) -> np.ndarray:
        return self.quantiles(np.linspace(0.0, 1.0, n))

    def state_dict(self) -> Dict[str, np.ndarray]:
        pending = (np.concatenate([np.asarray(b) for b in self._pending], 1)
                   if self._pending else
                   np.zeros((self.units or 0, 0), np.float32))
        return {"samplesize": np.int64(self.samplesize),
                "depth": np.int64(self.depth), "count": np.int64(self.count),
                "fills": np.asarray(self._fills) if self._fills is not None
                else np.zeros((0,), np.int32),
                "levels": np.asarray(self._levels) if self._levels is not None
                else np.zeros((0,)),
                "pending": pending}

    def set_state_dict(self, d) -> "RunningQuantile":
        self.samplesize = int(d["samplesize"])
        self.depth = int(d["depth"])
        self.count = int(d["count"])
        levels = d["levels"]
        if levels.size:
            self._levels = jnp.asarray(levels)
            self._fills = jnp.asarray(d["fills"], jnp.int32)
            self.units = levels.shape[1]
        else:
            self._levels = self._fills = None
            self.units = None
        pending = d.get("pending")
        self._pending = []
        self._pending_cols = 0
        if pending is not None and pending.size:
            if self.units is None:
                self.units = pending.shape[0]
                self._init(self.units)
            self._pending = [jnp.asarray(pending)]
            self._pending_cols = pending.shape[1]
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

    def set_state_dict(self, d) -> "RunningConditionalQuantile":
        """Inverse of :meth:`state_dict`; integer-typed condition keys are
        restored as ints (the dissection passes key conditions by label
        number)."""
        self._sketches = {}
        for k, sub in d.items():
            cond = (int(k) if isinstance(k, str) and k.lstrip("-").isdigit()
                    else k)
            self._sketches[cond] = RunningQuantile(
                self.samplesize, self.depth).set_state_dict(sub)
        return self


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
