"""FastICA (reference ``ICAEstimator``, ``estimators.py:18-52``).

Device-side FastICA with the sklearn defaults the reference relies on:
logcosh contrast, PCA whitening (reference: "whitening is essential"),
symmetric decorrelation, parallel updates.  The fixed-point loop is a
``lax.while_loop`` with a convergence test; like the reference we raise if
the iteration cap is hit (``estimators.py:33-34``).  The per-iteration cost
is two [c, n] x [n, c]-shaped contractions — MXU-friendly at any n.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.utils import mm, topk_eigh_desc


def _sym_decorrelate(w: jnp.ndarray) -> jnp.ndarray:
    """W <- (W W^T)^(-1/2) W."""
    evals, evecs = jnp.linalg.eigh(mm(w, w.T))
    inv_sqrt = mm(evecs * jnp.reciprocal(jnp.sqrt(jnp.clip(evals, 1e-10, None))), evecs.T)
    return mm(inv_sqrt, w)


@partial(jax.jit, static_argnames=("max_iter",))
def _fastica_core(x1: jnp.ndarray, w_init: jnp.ndarray, *, max_iter: int,
                  tol: float = 1e-4):
    """x1: whitened data [c, n]; returns (W [c, c], n_iter)."""
    n = x1.shape[1]
    w0 = _sym_decorrelate(w_init)

    def body(carry):
        w, it, lim = carry
        wx = mm(w, x1)
        g = jnp.tanh(wx)
        g_prime = jnp.mean(1.0 - jnp.square(g), axis=1)
        w1 = mm(g, x1.T) / n - g_prime[:, None] * w
        w1 = _sym_decorrelate(w1)
        lim = jnp.max(jnp.abs(jnp.abs(jnp.diagonal(mm(w1, w.T))) - 1.0))
        return w1, it + 1, lim

    def cond(carry):
        _, it, lim = carry
        return jnp.logical_and(it < max_iter, lim > tol)

    w, n_iter, _ = jax.lax.while_loop(cond, body, (w0, 0, jnp.asarray(jnp.inf)))
    return w, n_iter


class ICAEstimator:
    def __init__(self, n_components: int):
        self.n_components = n_components
        self.maxiter = 10000
        self.whiten = True  # ICA: whitening is essential, should not be skipped
        self.batch_support = False
        self.stdev = np.zeros((n_components,), np.float32)
        self.total_var = 0.0
        self.components_ = None
        self.n_iter_ = 0

    def get_param_str(self) -> str:
        return "ica_c{}{}".format(self.n_components, "_w" if self.whiten else "")

    def fit(self, x):
        x = np.asarray(x, dtype=np.float32)
        n, d = x.shape
        c = self.n_components
        xj = jnp.asarray(x)
        mean = jnp.mean(xj, axis=0)
        xc = (xj - mean).T                                 # [D, n]

        # PCA whitening to c dims: K [c, D] s.t. K @ xc has identity covariance.
        # (D is small relative to n for ICA-feasible configs, cf. the 32-bit
        # LAPACK size guard in reference decomposition.py:212-215.)
        from ganspace_tpu.estimators.pca import use_pallas_gram
        if use_pallas_gram(n, d):
            from ganspace_tpu.ops.pallas import centered_gram
            cov = centered_gram(xj, mean) / n
        else:
            cov = mm(xc, xc.T) / n                         # [D, D]
        evals, evecs = topk_eigh_desc(cov)
        k_mat = (evecs[:, :c] * jnp.reciprocal(
            jnp.sqrt(jnp.clip(evals[:c], 1e-12, None)))).T  # [c, D]
        x1 = mm(k_mat, xc)                                  # [c, n]

        w_init = jnp.asarray(
            np.random.RandomState(0).standard_normal((c, c)).astype(np.float32))
        w, n_iter = _fastica_core(x1, w_init, max_iter=self.maxiter)
        self.n_iter_ = int(n_iter)
        if self.n_iter_ >= self.maxiter:
            raise RuntimeError(f"FastICA did not converge (N={n}, it={self.maxiter})")

        comp = np.array(mm(w, k_mat))                       # unmixing in D space

        # Normalize rows; rank by projected stdev (reference estimators.py:36-48).
        comp /= np.sqrt(np.sum(comp ** 2, axis=-1, keepdims=True))
        self.total_var = float(x.var(axis=0).sum())
        coords = np.asarray(mm(jnp.asarray(comp), xj.T))
        self.stdev = coords.std(axis=1)
        idx = np.argsort(self.stdev)[::-1]
        self.stdev = self.stdev[idx]
        self.components_ = comp[idx]

    def get_components(self):
        var_ratio = self.stdev ** 2 / self.total_var
        return self.components_, self.stdev, var_ratio  # ICA outputs are not normalized
