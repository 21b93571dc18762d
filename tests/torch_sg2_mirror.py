"""Independent PyTorch mirror of the rosinality StyleGAN2 generator graph.

The reference's torch StyleGAN2 lives in a git submodule that is NOT
vendored in /root/reference (models/stylegan2/ holds only __init__.py) and
its op/ package is CUDA-only — so cross-framework validation of our JAX
synthesis (test_torch_parity_fullres.test_stylegan2_fullres_parity) runs
against this standalone torch implementation instead.  It is written from
the rosinality checkpoint format spec (the same g_ema key layout
``ganspace_tpu.models.stylegan2`` consumes: ``style.i``, ``input.input``,
``conv1``, ``convs.i``, ``to_rgb1``, ``to_rgbs.i``) using ONLY stock torch
ops — F.linear, F.conv2d, F.conv_transpose2d and an explicit
zero-stuff/pad/filter upfirdn — so it shares no code with either the JAX
path or the (absent) reference CUDA path.

Semantics mirrored (rosinality model.py, public):
  * EqualLinear: y = x @ (W * gain/sqrt(fan_in) * lr_mul).T + b * lr_mul
  * mapping: PixelNorm -> 8 x EqualLinear(lr_mul=0.01) + fused lrelu
    (bias add -> leaky_relu(0.2) -> * sqrt(2))
  * ModulatedConv2d: input-channel scale by the style affine, He-scaled
    weight, optional demodulation rsqrt(sum w^2 + 1e-8), grouped via
    input scaling + output demodulation (algebraically identical to the
    per-sample weight form)
  * upsample conv: conv_transpose2d(stride 2) then blur [1,3,3,1]*4 with
    pad (1, 1); skip upsample: upfirdn up=2, kernel*4, pad (2, 1)
  * noise: x + noise_weight * fixed_noise; activate: fused lrelu
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def upfirdn2d_t(x, kernel, up=1, down=1, pad=(0, 0)):
    """Zero-stuff -> pad -> TRUE convolution -> stride, NCHW."""
    n, c, h, w = x.shape
    if up > 1:
        z = x.new_zeros(n, c, h * up, w * up)
        z[:, :, ::up, ::up] = x
        x = z
    x = F.pad(x, [pad[0], pad[1], pad[0], pad[1]])
    k = torch.flip(kernel, (0, 1))[None, None].repeat(c, 1, 1, 1)
    x = F.conv2d(x, k, groups=c)
    if down > 1:
        x = x[:, :, ::down, ::down]
    return x


def fir_kernel(taps=(1, 3, 3, 1)):
    k = np.outer(taps, taps).astype(np.float32)
    return torch.from_numpy(k / k.sum())


def equal_linear_t(x, weight, bias=None, lr_mul=1.0, gain=1.0):
    w = weight * (gain * weight.shape[1] ** -0.5 * lr_mul)
    b = bias * lr_mul if bias is not None else None
    return F.linear(x, w, b)


def fused_lrelu_t(x, bias=None, channel_axis=1):
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape)
    return F.leaky_relu(x, 0.2) * math.sqrt(2.0)


def mapping_t(params, z, n_mlp=8):
    x = z * torch.rsqrt(torch.mean(z * z, dim=-1, keepdim=True) + 1e-8)
    for i in range(1, n_mlp + 1):
        x = equal_linear_t(x, _t(params[f"style.{i}.weight"]),
                           lr_mul=0.01, gain=1.0)
        x = fused_lrelu_t(x, _t(params[f"style.{i}.bias"]) * 0.01,
                          channel_axis=-1)
    return x


def modulated_conv_t(x, weight, style_s, demodulate=True, upsample=False,
                     blur_k=None):
    out_ch, in_ch, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    w = scale * weight
    xs = x * style_s[:, :, None, None]
    if upsample:
        y = F.conv_transpose2d(xs, w.transpose(0, 1), stride=2, padding=0)
        y = upfirdn2d_t(y, blur_k * 4.0, pad=(1, 1))
    else:
        y = F.conv2d(xs, w, padding=kh // 2)
    if demodulate:
        w2 = (w * w).sum(dim=(2, 3))                       # [out, in]
        d = torch.rsqrt((style_s * style_s) @ w2.t() + 1e-8)
        y = y * d[:, :, None, None]
    return y


def _style_scale(params, name, w_lat):
    return equal_linear_t(w_lat, _t(params[f"{name}.modulation.weight"]),
                          _t(params[f"{name}.modulation.bias"]), gain=1.0)


def styled_conv_t(params, name, x, w_lat, noise, blur_k, upsample=False):
    s = _style_scale(params, f"{name}.conv", w_lat)
    x = modulated_conv_t(x, _t(params[f"{name}.conv.weight"]), s,
                         demodulate=True, upsample=upsample, blur_k=blur_k)
    x = x + float(params[f"{name}.noise.weight"][0]) * _t(noise)
    return fused_lrelu_t(x, _t(params[f"{name}.activate.bias"]))


def to_rgb_t(params, name, x, w_lat, skip, blur_k):
    s = _style_scale(params, f"{name}.conv", w_lat)
    out = modulated_conv_t(x, _t(params[f"{name}.conv.weight"]), s,
                           demodulate=False)
    out = out + _t(params[f"{name}.bias"])
    if skip is not None:
        out = out + upfirdn2d_t(skip, blur_k * 4.0, up=2, pad=(2, 1))
    return out


@torch.no_grad()
def synthesize_t(params, noise_buffers, z, log_size, n_mlp=8, capture=()):
    """Full rosinality forward from Z, single broadcast style; returns the
    raw [-1, 1]-scale image [B, 3, R, R] — or ``(img, taps)`` when
    ``capture`` names styled-conv outputs ('conv1', 'convs.i': the
    post-activate maps, matching ganspace_tpu's tap semantics)."""
    blur_k = fir_kernel()
    w = mapping_t(params, z, n_mlp)
    batch = z.shape[0]
    const = _t(params["input.input"])
    x = const.expand(batch, -1, -1, -1)
    taps = {}

    def tap(name, val):
        if name in capture:
            taps[name] = val

    x = styled_conv_t(params, "conv1", x, w, noise_buffers[0], blur_k)
    tap("conv1", x)
    skip = to_rgb_t(params, "to_rgb1", x, w, None, blur_k)
    ci = 0
    for res_log in range(3, log_size + 1):
        x = styled_conv_t(params, f"convs.{ci}", x, w,
                          noise_buffers[1 + ci], blur_k, upsample=True)
        tap(f"convs.{ci}", x)
        x = styled_conv_t(params, f"convs.{ci + 1}", x, w,
                          noise_buffers[1 + ci + 1], blur_k)
        tap(f"convs.{ci + 1}", x)
        skip = to_rgb_t(params, f"to_rgbs.{res_log - 3}", x, w, skip, blur_k)
        ci += 2
    return (skip, taps) if capture else skip
