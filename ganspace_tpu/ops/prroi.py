"""Precise RoI pooling (PrRoI), TPU-native formulation.

Equivalent of the reference's C++/CUDA extension
(``netdissect/upsegmodel/prroi_pool/src/prroi_pooling_gpu_impl.cu``, 443 LoC
of grid-stride gather kernels) used by the unified-parsing segmenter.

PrRoI pooling (Jiang et al., ECCV'18) averages the *bilinearly interpolated*
feature surface over each RoI bin by exact integration.  Because the bilinear
kernel is separable, the double integral factorizes:

    out[r, c, p, q] = 1/area * sum_{h, w} Wy[r, p, h] * F[c, h, w] * Wx[r, q, w]

where ``Wx[r, q, i] = ∫_bin max(0, 1 - |x - i|) dx`` has a closed form (the
triangle-kernel CDF).  So instead of translating gather kernels, the whole op
is two dense weight tensors + one einsum — exactly what the MXU wants — and
JAX autodiff of the (C1-continuous) weight CDF reproduces PrRoI's analytic
gradients w.r.t. both features AND RoI coordinates for free (the reference
needs a dedicated ``coor_backward`` kernel for that).
"""

from __future__ import annotations

import jax.numpy as jnp

from ganspace_tpu.ops.precision import get_precision


def _tri_cdf(u: jnp.ndarray) -> jnp.ndarray:
    """G(u) = integral of the triangle kernel max(0, 1-|t|) over (-inf, u]."""
    u = jnp.clip(u, -1.0, 1.0)
    neg = 0.5 * jnp.square(1.0 + u)            # u in [-1, 0]
    pos = 0.5 + u - 0.5 * jnp.square(u)        # u in [0, 1]
    return jnp.where(u < 0, neg, pos)


def _bin_weights(starts: jnp.ndarray, ends: jnp.ndarray, size: int) -> jnp.ndarray:
    """[R, P] bin intervals -> [R, P, size] integration weights per pixel."""
    idx = jnp.arange(size, dtype=starts.dtype)                   # [size]
    a = starts[..., None] - idx                                  # [R, P, size]
    b = ends[..., None] - idx
    return _tri_cdf(b) - _tri_cdf(a)


def prroi_pool2d(features: jnp.ndarray, rois: jnp.ndarray,
                 pooled_height: int, pooled_width: int,
                 spatial_scale: float = 1.0) -> jnp.ndarray:
    """features [N, C, H, W]; rois [R, 5] = (batch_idx, x1, y1, x2, y2) in
    input coords.  Returns [R, C, pooled_height, pooled_width]."""
    _, _, h, w = features.shape
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale

    bin_w = (x2 - x1) / pooled_width                              # [R]
    bin_h = (y2 - y1) / pooled_height

    px = jnp.arange(pooled_width, dtype=features.dtype)
    py = jnp.arange(pooled_height, dtype=features.dtype)
    x_starts = x1[:, None] + bin_w[:, None] * px[None, :]         # [R, pw]
    x_ends = x_starts + bin_w[:, None]
    y_starts = y1[:, None] + bin_h[:, None] * py[None, :]         # [R, ph]
    y_ends = y_starts + bin_h[:, None]

    wx = _bin_weights(x_starts, x_ends, w)                        # [R, pw, W]
    wy = _bin_weights(y_starts, y_ends, h)                        # [R, ph, H]

    f = features[batch_idx]                                       # [R, C, H, W]
    out = jnp.einsum("rph,rchw,rqw->rcpq", wy, f, wx,
                     precision=get_precision())

    area = bin_w[:, None, None, None] * bin_h[:, None, None, None]
    # Degenerate (empty) bins pool to 0, like the reference kernel.
    return jnp.where(area > 0, out / jnp.maximum(area, 1e-12), 0.0)
