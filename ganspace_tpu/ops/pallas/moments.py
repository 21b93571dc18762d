"""Pallas TPU kernel: fused centered Gram / second-moment accumulation.

Computes ``G = (X - mu)^T (X - mu)`` for a sample block ``X [N, D]`` without
materializing the centered matrix: the subtraction happens on VMEM tiles on
their way into the MXU.  This is the hot statistic of the full-PCA /
ICA-whitening paths (reference tier: ``estimators.py:84-118`` fits sklearn on
a centered copy of the whole sample matrix): at 1M x 4096 the uncentered
formulation saves a 16 GB HBM write + read of the centered copy.

Grid layout: ``(D/TI, D/TJ, N/TK)`` with the sample axis innermost so each
output tile accumulates across sample chunks in its VMEM block
(revisiting-output accumulation).  X is consumed twice through two
BlockSpecs — once as the left operand (k, i) and once as the right (k, j) —
with the per-column mean subtracted from each tile.  f32 accumulation on the
MXU via ``preferred_element_type``.

``centered_gram`` pads arbitrary shapes to tile multiples (zero rows + a
matching zero-mean contribute nothing to the Gram... zero rows minus mu DO
contribute, so padding rows are masked via a validity count — see
``_kernel``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_l_ref, x_r_ref, mu_l_ref, mu_r_ref, nvalid_ref, out_ref):
    k = pl.program_id(2)
    tk = x_l_ref.shape[0]

    # Mask padding rows: rows with global index >= n_valid contribute zero.
    row0 = k * tk
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (tk, 1), 0)
    valid = (rows < nvalid_ref[0]).astype(x_l_ref.dtype)

    xl = (x_l_ref[:, :] - mu_l_ref[0, :][None, :]) * valid
    xr = (x_r_ref[:, :] - mu_r_ref[0, :][None, :]) * valid

    @pl.when(k == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += jnp.dot(xl.T, xr, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_d", "tile_n", "interpret"))
def _centered_gram_padded(x, mu, n_valid, *, tile_d: int, tile_n: int,
                          interpret: bool):
    n, d = x.shape
    grid = (d // tile_d, d // tile_d, n // tile_n)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, tile_d), lambda i, j, k: (k, i)),   # left
            pl.BlockSpec((tile_n, tile_d), lambda i, j, k: (k, j)),   # right
            pl.BlockSpec((1, tile_d), lambda i, j, k: (0, i)),        # mu left
            pl.BlockSpec((1, tile_d), lambda i, j, k: (0, j)),        # mu right
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # n_valid
        ],
        out_specs=pl.BlockSpec((tile_d, tile_d), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        interpret=interpret,
    )(x, x, mu, mu, n_valid)


def centered_gram(x, mu=None, *, tile_d: int = 256, tile_n: int = 512,
                  interpret: bool = False) -> jnp.ndarray:
    """(X - mu)^T (X - mu) for X [N, D]; mu defaults to the column mean.

    Pads N and D up to tile multiples; padding rows are masked inside the
    kernel, padding columns produce zero rows/cols that are sliced off.
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    if mu is None:
        mu = jnp.mean(x, axis=0)
    mu = jnp.asarray(mu, jnp.float32).reshape(1, d)

    td = min(tile_d, max(128, 128 * ((d + 127) // 128)))
    tn = min(tile_n, max(8, 8 * ((n + 7) // 8)))
    d_pad = -d % td
    n_pad = -n % tn
    if d_pad or n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, d_pad)))
        mu = jnp.pad(mu, ((0, 0), (0, d_pad)))
    n_valid = jnp.asarray([n], jnp.int32)
    out = _centered_gram_padded(x, mu, n_valid, tile_d=td, tile_n=tn,
                                interpret=interpret)
    return out[:d, :d]
