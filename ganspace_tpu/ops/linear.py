"""Equalized-learning-rate linear layers and fused bias+activation.

TPU-native equivalents of the StyleGAN family's runtime-scaled layers
(reference ``models/stylegan/model.py:26-49`` for StyleGAN1's ``MyLinear``;
the StyleGAN2 submodule's ``EqualLinear``/``fused_bias_act`` CUDA op per
reference ``SETUP.md:33-40``).  On TPU there is nothing to hand-fuse: XLA
folds the weight scaling, bias add, leaky-relu and gain into the surrounding
matmul/conv epilogue, so these are plain jnp expressions kept small and
fusion-friendly.

All functions are pure; parameters are passed explicitly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ganspace_tpu.ops.precision import get_precision


def pixel_norm(x: jnp.ndarray, axis: int = -1, epsilon: float = 1e-8) -> jnp.ndarray:
    """x / sqrt(mean(x^2) + eps) along ``axis``.

    StyleGAN1 mapping input norm uses eps=1e-8 (reference
    ``models/stylegan/model.py:138-143``); ProGAN uses the same formula but
    *inside* the sqrt with eps=1e-8 (reference ``netdissect/proggan.py:98-103``).
    """
    return x * jnp.reciprocal(jnp.sqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + epsilon))


def equal_linear(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    lr_mul: float = 1.0,
    gain: float = math.sqrt(2.0),
    use_wscale: bool = True,
) -> jnp.ndarray:
    """y = x @ (weight * w_mul).T + bias * lr_mul.

    ``weight`` is stored torch-style as [out, in] so imported checkpoints drop
    straight in.  With ``use_wscale`` the He constant ``gain/sqrt(fan_in)`` is
    applied at runtime (equalized learning rate, reference
    ``models/stylegan/model.py:28-38``).
    """
    fan_in = weight.shape[1]
    if use_wscale:
        w_mul = gain * (fan_in ** -0.5) * lr_mul
    else:
        w_mul = lr_mul
    y = jnp.matmul(x, (weight * w_mul).T, precision=get_precision())
    if bias is not None:
        y = y + bias * lr_mul
    return y


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    channel_axis: int = 1,
) -> jnp.ndarray:
    """bias-add + leaky-relu + gain, the StyleGAN2 ``fused_bias_act`` op.

    Equivalent of the reference's optional CUDA kernel (``SETUP.md:33-40``);
    XLA fuses this into the producing matmul/conv on TPU.  ``channel_axis``
    selects where the bias broadcasts (1 for NCHW feature maps, -1 for
    dense activations).
    """
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape).astype(x.dtype)
    return (jnp.where(x >= 0, x, negative_slope * x)
            * jnp.asarray(scale, x.dtype))
