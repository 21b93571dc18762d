"""Style-modulated convolution, the StyleGAN2 hot op, reformulated for the MXU.

The reference path (StyleGAN2 submodule, consumed via reference
``models/wrappers.py:97-267``) builds a *per-sample* weight tensor
``W_b[o,i,·] = scale * W[o,i,·] * s_b[i] * d_b[o]`` and runs a grouped
convolution with ``groups=batch`` — a poor fit for a systolic array, since
every sample gets its own tiny conv.  Because modulation is per-input-channel
and demodulation per-(sample, output-channel), the identical result is

    y_b = d_b ⊙ conv(x_b ⊙ s_b, scale * W)

i.e. scale the inputs, run ONE shared batched convolution (dense MXU work),
scale the outputs.  The demodulation coefficient is computed without ever
materializing per-sample weights:

    d_b[o] = rsqrt( Σ_i s_b[i]^2 · Σ_kk W[o,i,·]^2 · scale^2 + 1e-8 )

which is a [B,in] x [in,out] matmul.  Exact same arithmetic as the reference
(modulo float reassociation), an asymptotic win on TPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

from ganspace_tpu.ops.precision import get_precision
from ganspace_tpu.ops.upfirdn import upfirdn2d


def _shared_conv(x, w, padding):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=get_precision(),
    )


def _shared_conv_transpose2x(x, w):
    # torch F.conv_transpose2d(x, W^T, stride=2, padding=0) for kernel k:
    # lhs_dilation=2 with full padding (k-1) and a spatially-flipped kernel.
    k = w.shape[-1]
    return lax.conv_general_dilated(
        x, jnp.flip(w, (2, 3)),
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=get_precision(),
    )


def modulated_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    style_scales: jnp.ndarray,
    *,
    demodulate: bool = True,
    upsample: bool = False,
    downsample: bool = False,
    blur_kernel: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Modulated conv on an NCHW batch.

    Args:
      x: [B, in, H, W] activations.
      weight: [out, in, kh, kw], torch-orientation (imported checkpoints drop in
        after squeezing the submodule's leading group dim).
      style_scales: [B, in] per-channel modulation from the style affine.
      blur_kernel: 2-D FIR kernel for the resample paths (normalized, gain 1).
    """
    out_ch, in_ch, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    w = (scale * weight).astype(x.dtype)
    s = style_scales.astype(x.dtype)

    xs = x * s[:, :, None, None]

    if upsample:
        y = _shared_conv_transpose2x(xs, w)
        # Submodule Blur config for the transpose path: taps scaled by
        # factor^2 = 4; p = (len - factor) - (k - 1).
        taps = blur_kernel.shape[0]
        p = (taps - 2) - (kh - 1)
        y = upfirdn2d(y, blur_kernel * 4.0, pad=((p + 1) // 2 + 1, p // 2 + 1))
    elif downsample:
        taps = blur_kernel.shape[0]
        p = (taps - 2) + (kh - 1)
        xs = upfirdn2d(xs, blur_kernel, pad=((p + 1) // 2, p // 2))
        y = lax.conv_general_dilated(
            xs, w, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
    else:
        y = _shared_conv(xs, w, kh // 2)

    if demodulate:
        w2 = jnp.sum(jnp.square(w), axis=(2, 3))          # [out, in]
        d = lax.rsqrt(jnp.matmul(jnp.square(s), w2.T, precision=get_precision()) + 1e-8)  # [B, out]
        y = y * d[:, :, None, None].astype(y.dtype)
    return y
