"""Shared numerical helpers for the estimator suite."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mm(a, b):
    """Matmul pinned to the estimator floor precision.

    Statistics always accumulate in true f32 (``Precision.HIGHEST``) even
    when the ambient policy is the bf16 MXU datapath: ``--dtype bfloat16``
    speeds up *synthesis* sweeps, but moment/sketch accumulation and the
    final solves stay full-precision so component quality degrades only by
    the (tiny) activation rounding, never by the statistics math itself."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def svd_flip_vt(vt: jnp.ndarray) -> jnp.ndarray:
    """Deterministic sign convention from the rows of V^T.

    Matches sklearn ``svd_flip(u_based_decision=False)`` (used by
    IncrementalPCA): each component is flipped so its largest-|.|
    coordinate is positive.
    """
    idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(jnp.take_along_axis(vt, idx[:, None], axis=1))
    return vt * signs


def topk_eigh_desc(g: jnp.ndarray):
    """eigh returning ALL eigenpairs sorted descending (g symmetric psd)."""
    evals, evecs = jnp.linalg.eigh(g)
    return evals[::-1], evecs[:, ::-1]


def gram_svd(m: jnp.ndarray, n_keep: int):
    """Top-``n_keep`` singular triplets of ``m`` [k, D] via the smaller Gram.

    The MXU does the heavy lifting (one k x D @ D x k or D x k @ k x D
    matmul); the eigendecomposition runs on the min(k, D)-sized Gram.
    Returns (s [n_keep], vt [n_keep, D]) with sklearn's Vt-based signs.
    Only the dominant singular values are consumed downstream, so the
    squared-condition loss on the tail is irrelevant.
    """
    k, d = m.shape
    if k <= d:
        g = mm(m, m.T)                       # [k, k]
        evals, u = topk_eigh_desc(g)
        s = jnp.sqrt(jnp.clip(evals, 0.0, None))
        s_k = s[:n_keep]
        u_k = u[:, :n_keep]
        vt = mm(u_k.T, m) / jnp.maximum(s_k, 1e-30)[:, None]
    else:
        g = mm(m.T, m)                       # [D, D]
        evals, v = topk_eigh_desc(g)
        s = jnp.sqrt(jnp.clip(evals, 0.0, None))
        s_k = s[:n_keep]
        vt = v[:, :n_keep].T
    vt = svd_flip_vt(vt)
    return s_k, vt
