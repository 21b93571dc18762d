"""Exact-im2col 3x3 convolution in block (space-to-depth) layout.

The XLA formulation of the block-space 3x3 conv (``ops/s2d.py``
``conv3x3_block_kernel``) carries a (3,3,4C,4Co) kernel whose entries are
~75% structural zeros: each of the four output phases has a 3x3-pixel
receptive field, i.e. 9 of the 36 (tap, phase) slots.  The MXU multiplies
the zeros anyway — a 4x FLOP overhead on the thin high-resolution tail
stages this layout exists for.

This kernel removes most of it.  For an output block (i, j) the union of
the four phases' receptive fields is the 4x4-pixel window with origin
(2i-1, 2j-1); gathering that window per block position gives a patch of
16C channels and turns the conv into ONE dense [th*W, 16C] x [16C, 4Co]
MXU contraction — 16/9 = 1.78x the exact pixel-conv FLOPs instead of 4x.

Halo handling: three row-shifted views of the padded input (rows i-1, i,
i+1 per output row) are tiled with plain non-overlapping BlockSpecs, so the
standard Pallas pipeline streams them — measured on this axon relay, any
manually-issued HBM->VMEM halo DMA (``make_async_copy`` from an ANY-space
operand) crashes the TPU worker process outright, on a kernel as small as
"copy one tile" (see docs/PERFORMANCE.md).  Mosaic constraints shaped the
patch assembly: lane (channel) slices on memrefs must be 128-aligned, and
``jnp.concatenate`` refuses operands with distinct layout offsets — so each
(row, col) window view is one ref read, the sub-128 phase group is rotated
to lane 0 with ``pltpu.roll``, and offset-0 slices concatenate.

Requires 4C to be a multiple of 128 (the lane width) — true for exactly the
stages the block layout serves (C=32 @1024px, C=64 @512px; ``S2D_MAX_CH``).

Guarded behind ``GANSPACE_PALLAS_CONV=1`` (see ``ops/s2d.py``); validated
in interpret mode on any backend (``tests/test_pallas_blockconv.py``).
Reference op being accelerated: the StyleGAN2 tail convs consumed via
``models/wrappers.py:97-267``.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def enabled() -> bool:
    return os.environ.get("GANSPACE_PALLAS_CONV", "0") == "1"


def supported(c: int) -> bool:
    """4C must fill whole 128-lane registers, and C must pack registers
    evenly: the lane assembly needs either whole-register channel groups
    (C % 128 == 0) or an integral number of groups per register
    (128 % C == 0).  Covers the tail stages this layout serves (C=32, 64)."""
    return (4 * c) % 128 == 0 and (c % 128 == 0 or 128 % c == 0)


@functools.lru_cache(maxsize=None)
def _tap_selector() -> np.ndarray:
    """sel[wi, do, u] = 1 iff window slot wi = do + u (pixel tap u-1 of
    output phase do lands in window row wi; origin 2i-1)."""
    s = np.zeros((4, 2, 3), np.float32)
    for do in range(2):
        for u in range(3):
            s[do + u, do, u] = 1.0
    return s


def conv3x3_patch_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Torch-layout weights (Co,C,3,3) -> packed patch kernel [16C, 4Co].

    Patch channel order: (wi, wj, c) — window slot major, matching the
    16-slice assembly below.  Output channel order: (do, dk, o) — the block
    layout's (row-phase, col-phase, channel)."""
    co, c = w.shape[0], w.shape[1]
    sel = jnp.asarray(_tap_selector(), w.dtype)
    k = jnp.einsum("ocuv,idu,jkv->ijcdko", w, sel, sel)
    return k.reshape(16 * c, 4 * co)


def _kernel(xa_ref, xb_ref, xc_ref, k_ref, out_ref, *, th, w_img, c,
            precision):
    row_refs = (xa_ref, xb_ref, xc_ref)
    views = {}
    for ro in range(3):
        for co_ in range(3):
            # One ref read per (row-shift, col-offset): loaded values are
            # offset-canonical, which the lane concat below requires.
            views[(ro, co_)] = row_refs[ro][0, :, co_:co_ + w_img, :]
    slots = []                        # (view, source lane offset) per window slot
    for wi in range(4):
        ro = 1 + (wi - 1) // 2        # which row-shifted view
        di = (wi + 1) % 2             # row phase
        for wj in range(4):
            co_ = 1 + (wj - 1) // 2
            dj = (wj + 1) % 2
            slots.append((views[(ro, co_)], (di * 2 + dj) * c))
    if c % 128 == 0:
        # channel groups are whole registers: plain aligned slices
        pieces = [v[:, :, ch0:ch0 + c] for v, ch0 in slots]
    elif 4 * c < 128:
        # sub-register maps only occur in interpret-mode tests (hardware
        # requires 4C % 128 == 0, see ``supported``)
        pieces = [v[:, :, ch0:ch0 + c] for v, ch0 in slots]
    else:
        # Pack k = 128/C slots into each 128-lane register: rotate each
        # slot's phase group to its lane position, mask, sum, and slice the
        # (now 128-aligned) register off the front.  Mosaic accepts only
        # 128-aligned lane slices in concatenations.
        k_per = 128 // c
        pieces = []
        for g in range(0, 16, k_per):
            acc = None
            for k in range(k_per):
                v, ch0 = slots[g + k]
                shift = (k * c - ch0) % (4 * c)
                if shift:
                    v = pltpu.roll(v, shift, 2)
                lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
                m = (lane >= k * c) & (lane < (k + 1) * c)
                vm = jnp.where(m, v, jnp.zeros_like(v))
                acc = vm if acc is None else acc + vm
            pieces.append(acc[:, :, :128])
    patch = jnp.concatenate(pieces, axis=-1)          # [th, W, 16C]
    acc = jax.lax.dot_general(
        patch.reshape(th * w_img, 16 * c), k_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)
    out_ref[:] = acc.reshape(1, th, w_img, -1).astype(out_ref.dtype)


def conv3x3_blocks_pallas(x_blk: jnp.ndarray, w: jnp.ndarray,
                          *, tile_rows: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Exact-im2col block-space 3x3 correlation, pad 1.

    Drop-in for ``s2d.conv3x3_blocks`` / the conv inside
    ``s2d.modulated_conv3x3_blocks``: x_blk [B, h, w, 4C] blocks of a
    (2h, 2w, C) map, w (Co, C, 3, 3) torch OIHW; returns [B, h, w, 4Co].
    """
    b, h, w_img, f = x_blk.shape
    c = f // 4
    assert w.shape[1] == c and w.shape[2:] == (3, 3), (w.shape, c)
    assert interpret or supported(c), \
        f"pallas block conv needs 4C % 128 == 0, got 4C={f}"
    co = w.shape[0]
    if tile_rows:
        th = tile_rows
    else:
        # Size the row tile to VMEM: 3 input views + patch (plus roughly
        # one temp copy during assembly) + output, double-buffered.
        itemsize = x_blk.dtype.itemsize
        per_row = ((3 * (w_img + 2) * f            # input views
                    + 2 * w_img * 16 * c           # patch + assembly temps
                    + w_img * 4 * co) * itemsize)
        budget = 12 * 1024 * 1024
        th = max(1, min(8, budget // (2 * per_row), h))
        th = 1 << (th.bit_length() - 1)
    while h % th:
        th //= 2

    k16 = conv3x3_patch_kernel(w).astype(x_blk.dtype)
    # One block ring of zero halo = one pixel ring at the used phases
    # (the conv's pad-1 semantics); the three row-shifted views give each
    # output row its (i-1, i, i+1) block rows without overlapping tiles.
    x_pad = jnp.pad(x_blk, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xa = x_pad[:, 0:h]
    xb = x_pad[:, 1:h + 1]
    xc = x_pad[:, 2:h + 2]

    view_spec = pl.BlockSpec((1, th, w_img + 2, f),
                             lambda bi, ti: (bi, ti, 0, 0),
                             memory_space=pltpu.VMEM)
    flops = 2 * b * h * w_img * (16 * c) * (4 * co)
    from ganspace_tpu.ops.precision import get_precision
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w_img=w_img, c=c,
                          precision=get_precision()),
        grid=(b, h // th),
        in_specs=[view_spec, view_spec, view_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, th, w_img, 4 * co),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_img, 4 * co), x_blk.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * x_pad.size * x_pad.dtype.itemsize
            + b * h * w_img * 4 * co * x_blk.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xa, xb, xc, k16)
    return out
