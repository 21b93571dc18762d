"""Exact full PCA (reference ``PCAEstimator``, ``estimators.py:84-118``).

The reference runs sklearn ``PCA(svd_solver='full')`` on the whole
mean-centered sample matrix, then re-ranks components by projected stdev.
Device-side equivalent: SVD via the smaller Gram (one MXU contraction +
replicated eigh), followed by the same projected-stdev ranking pass.
``batch_support=False``, like the reference tier: the pipeline hands us the
full centered matrix at once.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.utils import gram_svd, mm, svd_flip_vt, topk_eigh_desc


def use_pallas_gram(n: int, d: int) -> bool:
    """Fused pallas covariance pays off on TPU for wide sample-dominant
    blocks (saves materializing the centered copy; ~16% over the XLA
    HIGHEST path at bf16-input/f32-accumulate precision)."""
    return (jax.default_backend() == "tpu" and n >= d and d >= 512
            and d <= 8192)


def project_stdev_sort(components: np.ndarray, x: np.ndarray):
    """Projected stdevs + descending re-rank (reference ``estimators.py:100-106``)."""
    coords = np.asarray(mm(jnp.asarray(components), jnp.asarray(x).T))
    stdev = coords.std(axis=1)
    idx = np.argsort(stdev)[::-1]
    return components[idx], stdev[idx]


def check_orthogonality(components: np.ndarray, label: str):
    m = components @ components.T
    off = m - np.eye(m.shape[0]) * np.diag(m)
    if not np.allclose(off, 0, atol=1e-4):
        print(f"{label} components not orthogonal, max dot {np.abs(off).max()}")


class PCAEstimator:
    def __init__(self, n_components: int):
        self.n_components = n_components
        self.solver = "full"
        self.batch_support = False
        self.stdev = np.zeros((n_components,), np.float32)
        self.total_var = 0.0
        self.mean_ = None
        self.components_ = None

    def get_param_str(self) -> str:
        return f"pca-{self.solver}_c{self.n_components}"

    def fit(self, x):
        x = np.asarray(x, dtype=np.float32)
        xj = jnp.asarray(x)
        mean = jnp.mean(xj, axis=0)
        n, d = x.shape
        if use_pallas_gram(n, d):
            from ganspace_tpu.ops.pallas import centered_gram
            g = centered_gram(xj, mean)
            _, v = topk_eigh_desc(g)
            vt = svd_flip_vt(v[:, :self.n_components].T)
        else:
            _, vt = gram_svd(xj - mean, self.n_components)
        comp = np.asarray(vt)

        # Save variance for later; rank by projected stdev (estimators.py:94-106).
        self.total_var = float(np.asarray(jnp.sum(jnp.var(xj, axis=0))))
        self.components_, self.stdev = project_stdev_sort(comp, x)
        check_orthogonality(self.components_, "PCA")
        self.mean_ = np.asarray(mean)[None, :]

    def get_components(self):
        var_ratio = self.stdev ** 2 / self.total_var
        return self.components_, self.stdev, var_ratio
