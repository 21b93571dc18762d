"""Streaming (incremental) PCA, device-resident and mesh-shardable.

TPU-native replacement for the reference's sklearn ``IncrementalPCA`` tier
(reference ``estimators.py:55-81``) — the only ``batch_support=True``
estimator and the workhorse for 1M-sample runs.  The per-block update
reproduces sklearn's ``partial_fit`` arithmetic exactly:

  1. Chan-style incremental mean/variance update (the same numerically-stable
     scheme the reference's dissection toolkit uses in
     ``netdissect/runningstats.py:575-632``);
  2. stack  M = [ s ⊙ V_old ; X_centered ; mean-correction row ]  with the
     correction  sqrt(n_seen * n_batch / n_total) * (mean_old - mean_batch);
  3. SVD of M and retention of the top-c right singular vectors with
     sklearn's Vt-based sign convention.

The SVD is computed from the smaller Gram of M (k x k or D x D) so the O(k*D)
contraction lands on the MXU as one large matmul instead of a LAPACK
bidiagonalization; only the dominant triplets are consumed, where the
squared-condition precision loss of the Gram trick is negligible.

Multi-chip: all state ([D]-vectors, [c, D] components) and incoming blocks
are sharded along the FEATURE axis.  Every contraction in the update reduces
over D, so under jit XLA turns the Gram products into per-shard partial
matmuls + an ICI psum; the k x k eigh stays replicated.  The sample axis is
how activations arrive from data-parallel synthesis — an all_to_all reshards
[n, D] from batch-sharded to feature-sharded at the estimator boundary
(see ``parallel/mesh.py``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.utils import gram_svd, mm


class _IPCAState(NamedTuple):
    mean: jnp.ndarray            # [D]
    var: jnp.ndarray             # [D]
    components: jnp.ndarray      # [c, D]
    singular_values: jnp.ndarray  # [c]
    explained_variance: jnp.ndarray        # [c]
    explained_variance_ratio: jnp.ndarray  # [c]


@partial(jax.jit, static_argnames=("n_components", "first"))
def _partial_fit(state: _IPCAState, x: jnp.ndarray, n_seen: jnp.ndarray,
                 *, n_components: int, first: bool) -> _IPCAState:
    n, d = x.shape
    n_batch = jnp.asarray(float(n), x.dtype)
    batch_mean = jnp.mean(x, axis=0)
    batch_var = jnp.var(x, axis=0)

    if first:
        n_total = n_batch
        new_mean, new_var = batch_mean, batch_var
        m = x - batch_mean
    else:
        n_total = n_seen + n_batch
        # Chan parallel-update of mean and (population) variance.
        delta = batch_mean - state.mean
        new_mean = state.mean + delta * (n_batch / n_total)
        m2 = (state.var * n_seen + batch_var * n_batch
              + jnp.square(delta) * (n_seen * n_batch / n_total))
        new_var = m2 / n_total
        x_c = x - batch_mean
        mean_corr = jnp.sqrt((n_seen / n_total) * n_batch) * (state.mean - batch_mean)
        m = jnp.concatenate([
            state.singular_values[:, None] * state.components,
            x_c,
            mean_corr[None, :],
        ], axis=0)

    s, vt = gram_svd(m, n_components)
    explained_variance = jnp.square(s) / (n_total - 1.0)
    explained_variance_ratio = jnp.square(s) / jnp.sum(new_var * n_total)
    return _IPCAState(new_mean, new_var, vt, s,
                      explained_variance, explained_variance_ratio)


class IPCAEstimator:
    """Protocol-compatible with reference ``IPCAEstimator`` (``estimators.py:55-81``)."""

    def __init__(self, n_components: int, whiten: bool = False,
                 feature_sharding=None):
        self.n_components = n_components
        self.whiten = whiten  # reference always runs whiten=False
        self.batch_support = True
        self.n_samples_seen_ = 0
        self._state: Optional[_IPCAState] = None
        self._sharding = feature_sharding
        # sklearn default batch size used by fit() (estimators.py:59)
        self.batch_size = max(100, 2 * n_components)

    def get_param_str(self) -> str:
        return "ipca_c{}{}".format(self.n_components, "_w" if self.whiten else "")

    # -- streaming ----------------------------------------------------------
    def _shard_for(self, ndim: int):
        """Rank-matched feature sharding (state vectors are rank 1,
        components/batches rank 2; all shard along the trailing D axis)."""
        if self._sharding is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = self._sharding.spec[-1]
        return NamedSharding(self._sharding.mesh,
                             P(*([None] * (ndim - 1) + [axis])))

    def _placed(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self._shard_for(x.ndim)
        return jax.device_put(x, s) if s is not None else x

    def fit_partial(self, x) -> bool:
        x = jnp.asarray(x, dtype=jnp.float32)
        n, d = x.shape
        if n < self.n_components:
            print(f"\nIPCA error: n_samples={n} < n_components={self.n_components}")
            return False
        x = self._placed(x)
        first = self._state is None
        if first:
            zeros_d = jnp.zeros((d,), jnp.float32)
            zeros_c = jnp.zeros((self.n_components,), jnp.float32)
            self._state = _IPCAState(zeros_d, zeros_d,
                                     jnp.zeros((self.n_components, d), jnp.float32),
                                     zeros_c, zeros_c, zeros_c)
            if self._sharding is not None:
                self._state = _IPCAState(
                    *(self._placed(a) if a.ndim and a.shape[-1] == d else a
                      for a in self._state))
        self._state = _partial_fit(
            self._state, x, jnp.asarray(float(self.n_samples_seen_), jnp.float32),
            n_components=self.n_components, first=first)
        self.n_samples_seen_ += n
        return True

    def fit(self, x):
        x = np.asarray(x)
        for i in range(0, x.shape[0], self.batch_size):
            chunk = x[i:i + self.batch_size]
            if chunk.shape[0] >= self.n_components:
                self.fit_partial(chunk)

    # -- results ------------------------------------------------------------
    @property
    def mean_(self) -> np.ndarray:
        return np.asarray(self._state.mean)

    @property
    def components_(self) -> np.ndarray:
        return np.asarray(self._state.components)

    def get_components(self):
        stdev = np.sqrt(np.asarray(self._state.explained_variance))  # already sorted
        var_ratio = np.asarray(self._state.explained_variance_ratio)
        return self.components_, stdev, var_ratio  # PCA outputs are normalized
