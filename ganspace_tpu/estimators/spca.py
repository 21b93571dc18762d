"""Sparse PCA (reference ``SPCAEstimator``, ``estimators.py:165-204``).

The reference defers to sklearn's ``SparsePCA`` (LARS-based dictionary
learning on the CPU, ``n_jobs=-1``).  The TPU-native version solves the same
objective

    min_{U, V}  1/2 ||X - U V||_F^2 + alpha ||V||_1

with alternating minimization that is entirely dense linear algebra:
ridge-regularized least squares for the code U (closed form, c x c solve)
and FISTA soft-thresholding steps for the sparse components V.  Warm-started
from the PCA basis (the reference's own TODO, ``estimators.py:173``).
Components come back normalized and ranked by projected stdev like every
other tier.  Equivalent in objective, not bit-identical to sklearn's
coordinate-descent path — estimator tests assert sparsity/recovery
properties rather than sklearn equality.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.pca import check_orthogonality
from ganspace_tpu.estimators.utils import gram_svd, mm


@partial(jax.jit, static_argnames=("n_iter", "inner_steps"))
def _spca_alternate(x: jnp.ndarray, v0: jnp.ndarray, alpha: float,
                    ridge: float = 0.01, n_iter: int = 50, inner_steps: int = 20):
    """x [n, D] centered; v0 [c, D] init.  Returns sparse V [c, D]."""
    c = v0.shape[0]
    eye = jnp.eye(c, dtype=x.dtype)

    def soft(z, t):
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - t, 0.0)

    def outer(v, _):
        # U-step: ridge LS  U = X V^T (V V^T + ridge I)^-1, columns projected
        # to the unit ball like sklearn's dict-learning atoms — this pins the
        # scale so ``alpha`` thresholds comparably to the reference's sklearn
        # backend (estimators.py:172).
        g = mm(v, v.T) + ridge * eye
        u = jax.scipy.linalg.solve(g.T, mm(v, x.T)).T       # [n, c]
        u = u * jnp.reciprocal(jnp.maximum(
            jnp.linalg.norm(u, axis=0, keepdims=True), 1e-12))
        # V-step: FISTA on 1/2||X - U V||^2 + alpha ||V||_1
        utu = mm(u.T, u)
        utx = mm(u.T, x)
        lip = jnp.maximum(jnp.linalg.eigvalsh(utu)[-1], 1e-6)  # exact Lipschitz (c x c)
        step = 1.0 / lip

        def fista(carry, _):
            vk, yk, tk = carry
            grad = mm(utu, yk) - utx
            v_next = soft(yk - step * grad, step * alpha)
            t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
            y_next = v_next + ((tk - 1.0) / t_next) * (v_next - vk)
            return (v_next, y_next, t_next), None

        (v, _, _), _ = jax.lax.scan(fista, (v, v, jnp.asarray(1.0, x.dtype)),
                                    None, length=inner_steps)
        return v, None

    v, _ = jax.lax.scan(outer, v0, None, length=n_iter)
    return v


class SPCAEstimator:
    def __init__(self, n_components: int, alpha: float = 10.0):
        self.n_components = n_components
        self.whiten = False
        self.alpha = alpha  # higher alpha => sparser components
        self.batch_support = False
        self.stdev = np.zeros((n_components,), np.float32)
        self.total_var = 0.0
        self.components_ = None

    def get_param_str(self) -> str:
        return "spca_c{}_a{}{}".format(self.n_components, self.alpha,
                                       "_w" if self.whiten else "")

    def fit(self, x):
        x = np.asarray(x, dtype=np.float32)
        xj = jnp.asarray(x)
        xc = xj - jnp.mean(xj, axis=0)

        _, v0 = gram_svd(xc, self.n_components)  # PCA warm start
        v = _spca_alternate(xc, v0, float(self.alpha))
        comp = np.asarray(v)
        norms = np.sqrt(np.sum(comp ** 2, axis=-1, keepdims=True))
        comp = comp / np.maximum(norms, 1e-12)

        self.total_var = float(x.var(axis=0).sum())
        # NB: cannot rank by dot-product projection — sparse components are not
        # an orthogonal basis (reference estimators.py:187-189 uses
        # transform(); ridge-coded coordinates serve the same role).
        g = comp @ comp.T + 0.01 * np.eye(comp.shape[0], dtype=comp.dtype)
        codes = np.linalg.solve(g, comp @ x.T).T
        self.stdev = codes.std(axis=0)
        idx = np.argsort(self.stdev)[::-1]
        self.stdev = self.stdev[idx]
        self.components_ = comp[idx]
        check_orthogonality(self.components_, "SPCA")

    def get_components(self):
        var_ratio = self.stdev ** 2 / self.total_var
        return self.components_, self.stdev, var_ratio  # SPCA outputs are normalized
