"""Op-level parity vs a straight PyTorch transcription of the reference math.

These guard checkpoint-import correctness: if the ops match torch at fp32
roundoff, imported reference weights produce the reference's images.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ganspace_tpu.ops import (
    equal_linear,
    fused_leaky_relu,
    make_fir_kernel,
    modulated_conv2d,
    upfirdn2d,
    upsample2x,
)
from ganspace_tpu.ops.upfirdn import nearest_upsample2x


def torch_modconv(x, weight, s, upsample):
    """rosinality ModulatedConv2d math with per-sample grouped weights."""
    b, in_ch, h, w_sz = x.shape
    out_ch, _, k, _ = weight.shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    w = scale * weight[None] * s[:, None, :, None, None]
    d = torch.rsqrt(w.pow(2).sum([2, 3, 4]) + 1e-8)
    w = w * d[:, :, None, None, None]
    if upsample:
        wt = w.transpose(1, 2).reshape(b * in_ch, out_ch, k, k)
        x = x.reshape(1, b * in_ch, h, w_sz)
        out = F.conv_transpose2d(x, wt, stride=2, padding=0, groups=b)
        out = out.reshape(b, out_ch, 2 * h + 1, 2 * w_sz + 1)
        kk = torch.tensor([1.0, 3, 3, 1])
        kk = kk[:, None] * kk[None, :]
        kk = kk / kk.sum() * 4
        out = F.pad(out, (1, 1, 1, 1))
        kkf = torch.flip(kk, [0, 1])[None, None].repeat(out_ch, 1, 1, 1)
        return F.conv2d(out, kkf, groups=out_ch)
    w = w.reshape(b * out_ch, in_ch, k, k)
    x = x.reshape(1, b * in_ch, h, w_sz)
    return F.conv2d(x, w, padding=k // 2, groups=b).reshape(b, out_ch, h, w_sz)


@pytest.mark.parametrize("upsample", [False, True])
def test_modulated_conv_matches_torch(upsample):
    rs = np.random.RandomState(0)
    x = rs.randn(2, 8, 8, 8).astype(np.float32)
    w = rs.randn(12, 8, 3, 3).astype(np.float32)
    s = (1 + 0.1 * rs.randn(2, 8)).astype(np.float32)
    ours = np.asarray(modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
        demodulate=True, upsample=upsample, blur_kernel=make_fir_kernel([1, 3, 3, 1])))
    ref = torch_modconv(torch.tensor(x), torch.tensor(w), torch.tensor(s), upsample).numpy()
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() < 2e-6 * np.abs(ref).max() + 1e-6


def test_upsample2x_matches_reference_convention():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 8, 8).astype(np.float32)
    ours = np.asarray(upsample2x(jnp.asarray(x), make_fir_kernel([1, 3, 3, 1])))
    # torch reference: zero-stuff, pad (2,1), convolve with flipped 4-tap FIR*4
    xt = torch.tensor(x)
    up = torch.zeros(2, 3, 16, 16)
    up[:, :, ::2, ::2] = xt
    kk = torch.tensor([1.0, 3, 3, 1])
    kk = kk[:, None] * kk[None, :]
    kk = kk / kk.sum() * 4
    up = F.pad(up, (2, 1, 2, 1))
    kkf = torch.flip(kk, [0, 1])[None, None].repeat(3, 1, 1, 1)
    ref = F.conv2d(up, kkf, groups=3).numpy()
    assert ours.shape == ref.shape == (2, 3, 16, 16)
    assert np.abs(ours - ref).max() < 1e-6


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2))])
def test_upfirdn_shapes(up, down, pad):
    x = jnp.ones((1, 2, 8, 8))
    k = make_fir_kernel([1, 3, 3, 1])
    out = upfirdn2d(x, k, up=up, down=down, pad=pad)
    expect = (8 * up + pad[0] + pad[1] - 4) // down + 1
    assert out.shape == (1, 2, expect, expect)


def test_equal_linear_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.randn(4, 16).astype(np.float32)
    w = rs.randn(8, 16).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    lrmul = 0.01
    ours = np.asarray(equal_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                   lr_mul=lrmul, gain=1.0))
    scale = (1.0 / math.sqrt(16)) * lrmul
    ref = (torch.tensor(x) @ (torch.tensor(w) * scale).T + torch.tensor(b) * lrmul).numpy()
    assert np.abs(ours - ref).max() < 1e-6


def test_fused_leaky_relu():
    x = jnp.asarray(np.array([[-1.0, 2.0]], np.float32))
    b = jnp.asarray(np.array([0.5, -0.5], np.float32))
    out = np.asarray(fused_leaky_relu(x, b, channel_axis=-1))
    expect = np.array([[-0.1, 1.5]]) * math.sqrt(2.0)
    assert np.allclose(out, expect, atol=1e-6)


def test_nearest_upsample():
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 1, 2, 2))
    out = np.asarray(nearest_upsample2x(x))
    ref = F.interpolate(torch.arange(4.0).reshape(1, 1, 2, 2),
                        scale_factor=2, mode="nearest").numpy()
    assert np.array_equal(out, ref)
