"""upfirdn2d (upsample - FIR filter - downsample) as a single XLA convolution.

TPU-native replacement for the reference's external ``upfirdn2d`` CUDA kernel
(StyleGAN2 submodule op, reference ``SETUP.md:33-40``).  The whole pipeline —
zero-stuffing upsample, padding/cropping, FIR filtering, strided downsample —
maps onto one ``lax.conv_general_dilated`` call:

  * upsample by ``up``      -> ``lhs_dilation=(up, up)``
  * pad ``(pad0, pad1)``    -> conv ``padding`` (negative values crop)
  * FIR filter              -> depthwise kernel (``feature_group_count=C``),
                               flipped for true convolution
  * downsample by ``down``  -> ``window_strides=(down, down)``

XLA lowers this to the MXU/VPU with its own tiling; there is no separate
kernel launch or memory round-trip to fuse away.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ganspace_tpu.ops.precision import get_precision


def make_fir_kernel(taps, gain: float = 1.0) -> jnp.ndarray:
    """Separable FIR kernel from 1-D taps (e.g. [1,3,3,1]), normalized to sum 1."""
    k = np.asarray(taps, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k * gain)


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Apply upfirdn to an NCHW batch with a 2-D FIR ``kernel``."""
    c = x.shape[1]
    kh, kw = kernel.shape
    # True convolution: flip the kernel (the CUDA op convolves, conv_general
    # correlates).  All StyleGAN blur kernels are symmetric, but keep it exact.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k.reshape(1, 1, kh, kw), (c, 1, kh, kw))
    # lhs_dilation produces H*up - (up-1) samples (no trailing zeros); the
    # upfirdn convention zero-pads to H*up, which folds into the end padding.
    p1 = pad[1] + (up - 1)
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(down, down),
        padding=((pad[0], p1), (pad[0], p1)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=get_precision(),
    )


def blur2d(x: jnp.ndarray, kernel: jnp.ndarray, pad: tuple[int, int]) -> jnp.ndarray:
    """FIR low-pass without resampling."""
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


def upsample2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """StyleGAN2 ``Upsample``: zero-stuff x2 then low-pass with gain 4.

    Padding follows the submodule convention: p = len(taps) - 2,
    pad = ((p+1)//2 + 1, p//2).
    """
    ktaps = kernel.shape[0]
    p = ktaps - 2
    return upfirdn2d(x, kernel * 4.0, up=2, down=1, pad=((p + 1) // 2 + 1, p // 2))


def nearest_upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour x2 upsample (ProGAN/BigGAN/StyleGAN1 resize path)."""
    n, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return x.reshape(n, c, 2 * h, 2 * w)
