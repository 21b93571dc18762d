"""Space-to-depth (block-layout) convolutions for the high-resolution tail.

Why this exists: on TPU, XLA's convolution throughput collapses when the
channel count is far below the 128-lane MXU width.  Measured on a v5e
(3x3 conv, f32, B=4): 85% MXU at C=512, 48% at C=256, 10% at C=64 and 3% at
C=32 — while wall time at a fixed resolution barely depends on C at all.
StyleGAN2's last two stages (reference submodule consumed via
``models/wrappers.py:97-267``; 1024px -> C=32, 512px -> C=64) therefore run
an order of magnitude off roofline in the naive NCHW formulation.

The fix is to hold those stages in **block layout**: a 2x2 space-to-depth
view ``x_blk[b, i, j, (di*2+dj)*C + c] = x[b, 2i+di, 2j+dj, c]`` with
4C >= 128 channels, and to rewrite every conv of the tail as an exactly
equivalent convolution *in block space*:

  * plain 3x3 conv          -> 3x3 block conv, kernel (3,3,4C,4C')
  * transpose-conv 2x + FIR -> composite 6-tap kernel, expressed either as a
    stride-1 pixel-space conv producing block output (s2d ENTRY: the input
    is still in pixel layout) or as an lhs_dilation=2 block-space conv
    (block in -> block out, doubling block resolution)
  * FIR 2x upsample (skip)  -> same machinery with an identity channel map

The kernels are built analytically from the torch-layout weights at trace
time (tiny scatter ops), so checkpoint import and parameter storage are
untouched.  Every builder mirrors the exact arithmetic of
``ops/modconv.py`` / ``ops/upfirdn.py`` (same flips, paddings, scales);
results agree to float-reassociation error.

Derivation sketch (1-D, per axis).  Let pixel output p = 2i + do with block
index i and phase do.  For the plain conv, input tap r = do + u - 1 lands in
block i + floor(r/2), phase r mod 2, giving a 3-wide block kernel.  For the
upsample path, composing the flipped conv-transpose weights wf with the
FIR taps kb yields the 6-tap composite C6 = kb * wf (full convolution) with
   out[2i+do] = sum_a K[do, a] x[i+a],   K[do, a] = C6[2a + 3 - do]
(three taps per phase); the plain FIR 2x upsample is the same with offset 2.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from ganspace_tpu.ops.precision import get_precision

#: Channel-count threshold below which a synthesis stage runs in block
#: layout: measured on v5e, XLA conv throughput collapses below ~128
#: channels (3% MXU at C=32, 1024²; 85% at C=512), so stages at <= 64
#: channels are held as (H/2, W/2, 4C) blocks.  Single source of truth for
#: all four model families.
S2D_MAX_CH = 64


def enabled() -> bool:
    """Block-layout tails are on by default; GANSPACE_S2D=0 opts out
    (e.g. to diff against the plain formulation)."""
    import os
    return os.environ.get("GANSPACE_S2D", "1") != "0"


# ---------------------------------------------------------------------------
# Layout transforms
# ---------------------------------------------------------------------------


def to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC (B,H,W,C) -> block layout (B,H/2,W/2,4C), channel order (di,dj,c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def from_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """Block layout (B,h,w,4C) -> NHWC (B,2h,2w,C)."""
    b, h, w, f = x.shape
    c = f // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def nchw_to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    return to_blocks(jnp.transpose(x, (0, 2, 3, 1)))


def blocks_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(from_blocks(x), (0, 3, 1, 2))


def noise_to_blocks(noise: jnp.ndarray) -> jnp.ndarray:
    """Noise buffer (1,1,H,W) -> (h,w,4) block view (phase-only channels)."""
    h, w = noise.shape[-2] // 2, noise.shape[-1] // 2
    n = noise.reshape(h, 2, w, 2).transpose(0, 2, 1, 3)
    return n.reshape(h, w, 4)


def scale_phase_channels(x_blk: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply block-layout activations by a per-(batch, channel) scale."""
    b, h, w, f = x_blk.shape
    c = s.shape[-1]
    y = x_blk.reshape(b, h, w, 4, c) * s[:, None, None, None, :].astype(x_blk.dtype)
    return y.reshape(b, h, w, f)


def add_noise_blocks(x_blk: jnp.ndarray, noise_blk: jnp.ndarray,
                     gain: jnp.ndarray) -> jnp.ndarray:
    """x + gain * noise with (h,w,4) phase-layout noise, broadcast over c."""
    b, h, w, f = x_blk.shape
    c = f // 4
    y = (x_blk.reshape(b, h, w, 4, c)
         + (jnp.asarray(gain, x_blk.dtype) * noise_blk.astype(x_blk.dtype))[..., None])
    return y.reshape(b, h, w, f)


# ---------------------------------------------------------------------------
# Kernel builders (trace-time, tiny)
# ---------------------------------------------------------------------------


# All builders are single einsums against constant 0/1 selector tensors —
# one fused XLA op each (scatter chains compile 10-100x slower on CPU).


@lru_cache(maxsize=None)
def _conv3_selector() -> np.ndarray:
    """S[u, do, du, di] = 1 iff input tap r = do+u-1 lands in block row
    du-1 = floor(r/2) at phase di = r mod 2."""
    s = np.zeros((3, 2, 3, 2), np.float32)
    for u in range(3):
        for do in range(2):
            r = do + u - 1
            s[u, do, r // 2 + 1, r % 2] = 1.0
    return s


def conv3x3_block_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Block-space kernel for a stride-1 3x3 correlation (``ops/modconv.py``
    ``_shared_conv``): w (Co,C,3,3) torch OIHW -> K (3,3,4C,4Co)."""
    co, c = w.shape[0], w.shape[1]
    s = jnp.asarray(_conv3_selector(), w.dtype)
    # (du,dv,di,dj,c,do,dk,co) <- sum_uv S[u,do,du,di] S[v,dk,dv,dj] w[o,c,u,v]
    k8 = jnp.einsum("ocuv,udpq,vest->psqtcdeo", w, s, s)
    return k8.reshape(3, 3, 4 * c, 4 * co)


@lru_cache(maxsize=None)
def _full_conv_selector(t: int, k: int) -> np.ndarray:
    """P[t, e, u] = 1 iff e = t + u (full-convolution index sum)."""
    p = np.zeros((t, t + k - 1, k), np.float32)
    for ti in range(t):
        for u in range(k):
            p[ti, ti + u, u] = 1.0
    return p


def _composite_upsample_taps(wf: jnp.ndarray, kb: jnp.ndarray) -> jnp.ndarray:
    """Full 2-D convolution of flipped conv weights wf (Co,C,kh,kw) with FIR
    taps kb (t,t): the single-kernel equivalent of transpose-conv + blur."""
    _, _, kh, kw = wf.shape
    t = kb.shape[0]
    p1 = jnp.asarray(_full_conv_selector(t, kh), wf.dtype)
    p2 = jnp.asarray(_full_conv_selector(t, kw), wf.dtype)
    return jnp.einsum("ts,ocuv,teu,sfv->ocef", kb, wf, p1, p2)


@lru_cache(maxsize=None)
def _phase_selector(off: int, L: int) -> np.ndarray:
    """T[a+1, do, e] = 1 iff e = 2a + off - do, a in {-1,0,1}."""
    t = np.zeros((3, 2, L), np.float32)
    for a in (-1, 0, 1):
        for do in range(2):
            e = 2 * a + off - do
            if 0 <= e < L:
                t[a + 1, do, e] = 1.0
    return t


def _pixel_phase_kernel(c6: jnp.ndarray, off: int) -> jnp.ndarray:
    """K_pix (3,3,C,4Co) with K[a+1,b+1,c,(do,dk,c')] = C6[c',c, 2a+off-do,
    2b+off-dk] (zero outside support)."""
    co, c, L = c6.shape[0], c6.shape[1], c6.shape[2]
    t = jnp.asarray(_phase_selector(off, L), c6.dtype)
    k = jnp.einsum("ocef,ade,bkf->abcdko", c6, t, t)
    return k.reshape(3, 3, c, 4 * co)


# (s, di) -> a lookup for the lhs_dilation=2 block-space formulation; the
# even/odd output parities use disjoint window slots so no entry conflicts.
_BLK_TAP = {(0, 1): -1, (2, 0): 0, (2, 1): 1, (1, 0): -1, (1, 1): 0, (3, 0): 1}


@lru_cache(maxsize=None)
def _blk_selector() -> np.ndarray:
    """U[s, di, a+1] = 1 per the (s, di) -> a window-slot table."""
    u = np.zeros((4, 2, 3), np.float32)
    for (s, di), a in _BLK_TAP.items():
        u[s, di, a + 1] = 1.0
    return u


def _block_phase_kernel(k_pix: jnp.ndarray, c: int) -> jnp.ndarray:
    """Reindex K_pix (3,3,C,4Co) into the block-input kernel (4,4,4C,4Co)."""
    fco = k_pix.shape[-1]
    kp = k_pix.reshape(3, 3, c, fco)
    u = jnp.asarray(_blk_selector(), k_pix.dtype)
    k = jnp.einsum("abcf,sda,teb->stdecf", kp, u, u)
    return k.reshape(4, 4, 4 * c, fco)


def rgb_block_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv (to_rgb) in block space: w (Co,C,1,1) -> (1,1,4C,4Co)."""
    co, c = w.shape[0], w.shape[1]
    eye = jnp.eye(2, dtype=w.dtype)
    k = jnp.einsum("oc,ad,be->abcdeo", w[:, :, 0, 0], eye, eye)
    return k.reshape(1, 1, 4 * c, 4 * co)


# ---------------------------------------------------------------------------
# Conv drivers
# ---------------------------------------------------------------------------


def _conv(x, k, *, lhs_dilation=None, padding):
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=get_precision(),
    )


def _demod_scales(w: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """rsqrt(sum_i s_i^2 sum_kk w^2 + 1e-8), as ``ops/modconv.py:100-103``."""
    w2 = jnp.sum(jnp.square(w), axis=(2, 3))  # (Co, C)
    return lax.rsqrt(jnp.matmul(jnp.square(s), jnp.transpose(w2),
                                precision=get_precision()) + 1e-8)


def modulated_conv3x3_blocks(x_blk, weight, styles, *, demodulate=True):
    """Block-layout equivalent of ``modulated_conv2d`` (plain 3x3 path).

    x_blk: (B,h,w,4C) blocks of a (2h,2w,C) map; weight (Co,C,3,3);
    styles (B,C).  Returns (B,h,w,4Co).
    """
    _, c = weight.shape[0], weight.shape[1]
    scale = 1.0 / math.sqrt(c * weight.shape[2] * weight.shape[3])
    w = scale * weight
    x = scale_phase_channels(x_blk, styles)
    from ganspace_tpu.ops.pallas import blockconv
    if blockconv.enabled() and blockconv.supported(c):
        y = blockconv.conv3x3_blocks_pallas(x, w)
    else:
        y = _conv(x, conv3x3_block_kernel(w), padding=((1, 1), (1, 1)))
    if demodulate:
        y = scale_phase_channels(y, _demod_scales(w, styles.astype(w.dtype)))
    return y


def _upconv_core(x, wf, kb, c, pixel_input):
    """Shared driver for any stride-2-up conv whose composite (flipped
    weights wf full-convolved with FIR taps kb) has pixel-phase offset 3."""
    c6 = _composite_upsample_taps(wf, kb)
    k_pix = _pixel_phase_kernel(c6, off=3)
    if pixel_input:
        return _conv(x, k_pix, padding=((1, 1), (1, 1)))
    return _conv(x, _block_phase_kernel(k_pix, c),
                 lhs_dilation=(2, 2), padding=((2, 2), (2, 2)))


def modulated_upconv_blocks(x, weight, styles, blur_kernel, *,
                            demodulate=True, pixel_input=False):
    """Block-layout transpose-conv 2x + FIR blur (``modulated_conv2d``
    upsample path: ``ops/modconv.py:84-89``).

    pixel_input=True: x is NHWC (B,H,W,C); output (B,H,W,4Co) = blocks of
    the 2x-upsampled map (the s2d entry stage — no layout pass needed).
    pixel_input=False: x is blocks (B,h,w,4C); output (B,2h,2w,4Co).
    """
    _, c, kh, kw = weight.shape
    scale = 1.0 / math.sqrt(c * kh * kw)
    w = scale * weight
    wf = jnp.flip(w, (2, 3))
    kb = jnp.flip(blur_kernel, (0, 1)).astype(w.dtype) * 4.0
    if pixel_input:
        x = x * styles[:, None, None, :].astype(x.dtype)
    else:
        x = scale_phase_channels(x, styles)
    y = _upconv_core(x, wf, kb, c, pixel_input)
    if demodulate:
        y = scale_phase_channels(y, _demod_scales(w, styles.astype(w.dtype)))
    return y


def sg1_upconv_blocks(x, wm, *, pixel_input=False):
    """StyleGAN1 fused upscale+conv-transpose followed by the [1,2,1] blur
    (``models/stylegan.py`` ``_my_conv2d`` fused path + ``_blur121``,
    reference ``model.py:82-91,145-169``) in block space.  ``wm`` is the
    already equalized-lr-scaled 3x3 weight (Co,C,3,3); bias NOT applied.

    Unlike the StyleGAN2 path, conv and blur stay separate ops: the blur
    zero-pads the *conv output* (a 1-pixel ring the fused composite cannot
    express), so fusing them would be wrong on the image border.  The
    stride-2 transpose conv alone has composite taps CK = flip(w4) at
    offset 2 (y[2i+do] = sum_{u==do mod 2} wf[u] x[i+(do+u-2)/2])."""
    co, c = wm.shape[0], wm.shape[1]
    wp = jnp.pad(wm, ((0, 0), (0, 0), (1, 1), (1, 1)))
    w4 = (wp[:, :, 1:, 1:] + wp[:, :, :-1, 1:]
          + wp[:, :, 1:, :-1] + wp[:, :, :-1, :-1])
    wf = jnp.flip(w4, (2, 3))
    k_pix = _pixel_phase_kernel(wf, off=2)
    if pixel_input:
        y = _conv(x, k_pix, padding=((1, 1), (1, 1)))
    else:
        y = _conv(x, _block_phase_kernel(k_pix, c),
                  lhs_dilation=(2, 2), padding=((2, 2), (2, 2)))
    kb1 = np.array([1.0, 2.0, 1.0], np.float32)
    kb = np.outer(kb1, kb1)
    w_blur = (jnp.eye(co, dtype=wm.dtype)[:, :, None, None]
              * jnp.asarray(kb / kb.sum(), wm.dtype))
    return _conv(y, conv3x3_block_kernel(w_blur), padding=((1, 1), (1, 1)))


def nearest_up_blocks(x, channels: int, *, pixel_input=False):
    """Plain nearest-neighbour 2x upsample in block space (identity channel
    map; taps [0,1,1,0] per axis at offset 2)."""
    dt = x.dtype
    eye = jnp.eye(channels, dtype=dt)[:, :, None, None]
    m = np.zeros((4, 4), np.float32)
    m[1, 1] = m[1, 2] = m[2, 1] = m[2, 2] = 1.0
    # CK[c',c,e1,e2] = delta(c',c) * (m1 x m1) with m1 = [0,1,1,0]
    ck = eye * jnp.asarray(m, dt)[None, None]
    k_pix = _pixel_phase_kernel(ck, off=2)
    if pixel_input:
        return _conv(x, k_pix, padding=((1, 1), (1, 1)))
    return _conv(x, _block_phase_kernel(k_pix, channels),
                 lhs_dilation=(2, 2), padding=((2, 2), (2, 2)))


def modulated_rgb_blocks(x_blk, weight, styles):
    """Block-layout 1x1 to_rgb modconv (demodulate=False path)."""
    c = weight.shape[1]
    scale = 1.0 / math.sqrt(c)
    x = scale_phase_channels(x_blk, styles)
    return _conv(x, rgb_block_kernel(scale * weight), padding=((0, 0), (0, 0)))


def tap_blocks(ts, name, x_blk):
    """Tap in block layout: converts to the reference NCHW view only when the
    tap is actually retained/edited/stopped at (``TapState.needs``), so the
    layout round-trip is free on untapped high-res layers."""
    if ts.needs(name):
        x = blocks_to_nchw(x_blk)
        x = ts.tap(name, x)
        if not ts.stopped:
            x_blk = nchw_to_blocks(x)
    return x_blk


# Per-axis tap-summation matrix for nearest-neighbour 2x upsample composed
# with a 3-tap correlation: CK[e] = sum_u A[e,u] w[u], offset 2 (see module
# docstring; out[2i+do] = sum_a CK[2a+2-do] x[i+a]).
_NEAREST_TAPS = ((1, 0, 0), (1, 1, 0), (0, 1, 1), (0, 0, 1))


def nearestup_conv_blocks(x, w, *, pixel_input=False):
    """Nearest-neighbour 2x upsample + 3x3 correlation (the ProGAN/BigGAN
    up-conv, reference ``netdissect/proggan.py:124-147``) in block space."""
    c = w.shape[1]
    a = jnp.asarray(_NEAREST_TAPS, w.dtype)
    ck = jnp.einsum("eu,ocuv,fv->ocef", a, w, a)
    k_pix = _pixel_phase_kernel(ck, off=2)
    if pixel_input:
        return _conv(x, k_pix, padding=((1, 1), (1, 1)))
    return _conv(x, _block_phase_kernel(k_pix, c),
                 lhs_dilation=(2, 2), padding=((2, 2), (2, 2)))


def conv3x3_blocks(x_blk, w):
    """Plain stride-1 3x3 correlation (pad 1) in block space.

    ``GANSPACE_PALLAS_CONV=1`` routes supported shapes through the
    experimental exact-im2col Pallas kernel (``ops/pallas/blockconv``) —
    measured 2 orders of magnitude SLOWER on v5e (lane-granular phase
    extraction runs on the VPU; see docs/PERFORMANCE.md), kept for
    evaluation on other TPU generations/toolchains."""
    from ganspace_tpu.ops.pallas import blockconv
    if blockconv.enabled() and blockconv.supported(x_blk.shape[-1] // 4):
        return blockconv.conv3x3_blocks_pallas(x_blk, w)
    return _conv(x_blk, conv3x3_block_kernel(w), padding=((1, 1), (1, 1)))


def conv1x1_blocks(x_blk, w):
    """Plain 1x1 conv in block space (block-diagonal channel map)."""
    return _conv(x_blk, rgb_block_kernel(w), padding=((0, 0), (0, 0)))


def pixel_norm_blocks(x_blk, eps: float = 1e-8):
    """Per-pixel channel norm (ProGAN ``PixelNormLayer``) — each of the four
    phases normalizes over its own c channels."""
    b, h, w, f = x_blk.shape
    y = x_blk.reshape(b, h, w, 4, f // 4)
    y = y * jnp.reciprocal(
        jnp.sqrt(jnp.mean(jnp.square(y), axis=-1, keepdims=True) + eps))
    return y.reshape(b, h, w, f)


def upsample2x_blocks(x, blur_kernel, *, pixel_input=False):
    """Block-layout FIR 2x upsample (``ops/upfirdn.py`` ``upsample2x``):
    identity channel map, taps kb[2a+2-do] per axis."""
    if pixel_input:
        c = x.shape[-1]
    else:
        c = x.shape[-1] // 4
    kb = jnp.flip(blur_kernel, (0, 1)) * 4.0
    eye = jnp.eye(c, dtype=kb.dtype)[:, :, None, None]
    c4 = eye * kb[None, None, :, :]  # (C,C,4,4)
    k_pix = _pixel_phase_kernel(c4, off=2)
    if pixel_input:
        return _conv(x, k_pix, padding=((1, 1), (1, 1)))
    return _conv(x, _block_phase_kernel(k_pix, c),
                 lhs_dilation=(2, 2), padding=((2, 2), (2, 2)))
