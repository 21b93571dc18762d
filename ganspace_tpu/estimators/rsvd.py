"""Randomized SVD PCA (reference ``FacebookPCAEstimator``, ``estimators.py:124-160``).

The reference wraps ``fbpca.pca(k, n_iter=2, raw=True, l=2k)``.  Same
algorithm here, on device: Gaussian range finder with ``l = 2k`` probes and
``n_iter`` QR-stabilized power iterations, then exact SVD of the small
projected matrix.  Every heavy op is a dense [n, D]-sized contraction — pure
MXU work that shards along either axis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ganspace_tpu.estimators.pca import check_orthogonality, project_stdev_sort
from ganspace_tpu.estimators.utils import gram_svd, mm


def randomized_range(x: jnp.ndarray, l: int, n_iter: int, seed: int = 0) -> jnp.ndarray:
    """Orthonormal basis Q [n, l] approximating the row space of x [n, D]."""
    rs = np.random.RandomState(seed)
    omega = jnp.asarray(rs.standard_normal((x.shape[1], l)).astype(np.float32))
    y = mm(x, omega)
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):
        z = mm(x.T, q)
        z, _ = jnp.linalg.qr(z)
        y = mm(x, z)
        q, _ = jnp.linalg.qr(y)
    return q


class FacebookPCAEstimator:
    def __init__(self, n_components: int, n_iter: int = 2, seed: int = 0):
        self.n_components = n_components
        self.batch_support = False
        self.n_iter = n_iter
        self.l = 2 * n_components
        self.seed = seed
        self.stdev = np.zeros((n_components,), np.float32)
        self.total_var = 0.0
        self.mean_ = None
        self.components_ = None

    def get_param_str(self) -> str:
        return "fbpca_c{}_it{}_l{}".format(self.n_components, self.n_iter, self.l)

    def fit(self, x):
        x = np.asarray(x, dtype=np.float32)
        xj = jnp.asarray(x)
        q = randomized_range(xj, self.l, self.n_iter, self.seed)
        b = mm(q.T, xj)                       # [l, D]
        _, vt = gram_svd(b, self.n_components)
        comp = np.asarray(vt)

        self.total_var = float(np.asarray(jnp.sum(jnp.var(xj, axis=0))))
        self.components_, self.stdev = project_stdev_sort(comp, x)
        check_orthogonality(self.components_, "FBPCA")
        self.mean_ = x.mean(axis=0, keepdims=True)

    def get_components(self):
        var_ratio = self.stdev ** 2 / self.total_var
        return self.components_, self.stdev, var_ratio
