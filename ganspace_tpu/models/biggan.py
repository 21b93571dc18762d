"""BigGAN-deep generator (reference ``models/biggan/pytorch_biggan/``).

Functional JAX re-implementation of the HuggingFace BigGAN-deep port the
reference vendors, including Härkönen's per-layer latent modification
(reference ``pytorch_pretrained_biggan/model.py:13-14, 295-311``): every
GenBlock receives its own ``cond = concat(z_i, embed_i)``, giving
``len(layers) + 1`` independently editable latent slots (one extra for
``gen_z`` — reference ``wrappers.py:571-573``).

Faithfully covered:
  * truncation-interpolated batch-norm statistics — 51 precomputed stats
    interpolated per ``math.modf(truncation / step)`` (``model.py:126-135``),
    baked per truncation value at trace time since truncation is static;
  * bottleneck GenBlock with channel-drop skip (``model.py:152-202``);
  * SAGAN self-attention at 64x64 (``model.py:57-96``);
  * spectral norm is *baked into* the imported weights (eval-mode sigma is a
    constant given the stored u/v vectors, see ``models/torch_import.py``) —
    at inference there is nothing to iterate;
  * truncated-normal latent sampling (``utils.py:21-33``) on the host.

Class conditioning: integer ImageNet ids always work; a name-alias table
covers the classes used throughout the reference README/notebooks (the
reference resolves arbitrary names through nltk WordNet, which needs a
downloaded corpus — offline here).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


from ganspace_tpu import sampling
from ganspace_tpu.models.base import BaseGenerator, TapState
from ganspace_tpu.ops.precision import get_precision
from ganspace_tpu.ops.upfirdn import nearest_upsample2x
from ganspace_tpu.ops import s2d as s2d_ops

# (up-sample?, in-width-mult, out-width-mult), reference biggan config.py:21-31
LAYERS_128 = ((False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
              (False, 8, 8), (True, 8, 4), (False, 4, 4), (True, 4, 2),
              (False, 2, 2), (True, 2, 1))
LAYERS_256 = ((False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
              (False, 8, 8), (True, 8, 8), (False, 8, 8), (True, 8, 4),
              (False, 4, 4), (True, 4, 2), (False, 2, 2), (True, 2, 1))
LAYERS_512 = ((False, 16, 16), (True, 16, 16), (False, 16, 16), (True, 16, 8),
              (False, 8, 8), (True, 8, 8), (False, 8, 8), (True, 8, 4),
              (False, 4, 4), (True, 4, 2), (False, 2, 2), (True, 2, 1),
              (False, 1, 1), (True, 1, 1))

# ImageNet ids for class names used in the reference README, notebooks and
# shipped caches (reference resolves these via WordNet at runtime).
CLASS_ALIASES = {
    "husky": 250, "siberian_husky": 250, "golden_retriever": 207,
    "lighthouse": 437, "beacon": 437, "church": 497, "castle": 483,
    "barn": 425, "library": 624, "bookshop": 454, "restaurant": 762,
    "coffee_shop": 762, "volcano": 980, "alp": 970, "cliff": 972,
    "lakeside": 975, "seashore": 978, "valley": 979, "daisy": 985,
    "rose_hip": 989, "acorn": 988, "mushroom": 947, "pizza": 963,
    "cheeseburger": 933, "goldfish": 1, "tabby": 281, "tiger": 292,
    "lion": 291, "zebra": 340, "badger": 362, "panda": 388,
    "giant_panda": 388, "monarch": 323, "jellyfish": 107, "flamingo": 130,
    "pelican": 144, "king_penguin": 145, "duck": 97, "drake": 97,
    "bald_eagle": 22, "ostrich": 9, "cock": 7, "hen": 8,
    "sports_car": 817, "convertible": 511, "jeep": 609, "minibus": 654,
    "pickup": 717, "fire_engine": 555, "airliner": 404, "warplane": 895,
    "speedboat": 814, "canoe": 472, "container_ship": 510, "trailer_truck": 867,
    "steam_locomotive": 820, "egyptian_cat": 285, "samoyed": 258,
    "irish_setter": 213, "scottish_terrier": 199, "wood_rabbit": 330,
    "brown_bear": 294, "ice_bear": 296, "hamster": 333,
}


@dataclass(frozen=True)
class BigGANConfig:
    output_dim: int = 128
    z_dim: int = 128
    class_embed_dim: int = 128
    channel_width: int = 128
    num_classes: int = 1000
    layers: Tuple[Tuple[bool, int, int], ...] = LAYERS_128
    attention_layer_position: int = 8
    eps: float = 1e-4
    n_stats: int = 51

    @classmethod
    def for_resolution(cls, resolution: int, **kw) -> "BigGANConfig":
        layers = {128: LAYERS_128, 256: LAYERS_256, 512: LAYERS_512}[resolution]
        return cls(output_dim=resolution, layers=layers, **kw)

    def module_plan(self):
        """Ordered module list: ('attn', ch) or ('gen', up, cin, cout)."""
        plan = []
        ch = self.channel_width
        for i, (up, cin, cout) in enumerate(self.layers):
            if i == self.attention_layer_position:
                plan.append(("attn", ch * cin))
            plan.append(("gen", up, ch * cin, ch * cout))
        return plan

    @property
    def n_latents(self) -> int:
        return len(self.layers) + 1  # one for gen_z + one per GenBlock


def init_params(cfg: BigGANConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    p: Dict[str, np.ndarray] = {}
    # condition_vector_dim = z_dim * 2 (reference biggan model.py:209): the
    # class embedding projects to z_dim and is concatenated with z.
    cond_dim = cfg.z_dim * 2

    def conv(name, cin, cout, k, bias=True, std=None):
        std = std if std is not None else 1.0 / math.sqrt(cin * k * k)
        p[f"{name}.weight"] = (std * rs.randn(cout, cin, k, k)).astype(np.float32)
        if bias:
            p[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def cond_bn(name, ch):
        p[f"{name}.running_means"] = (0.1 * rs.randn(cfg.n_stats, ch)).astype(np.float32)
        p[f"{name}.running_vars"] = (1.0 + 0.1 * rs.rand(cfg.n_stats, ch)).astype(np.float32)
        p[f"{name}.scale.weight"] = (0.02 * rs.randn(ch, cond_dim)).astype(np.float32)
        p[f"{name}.offset.weight"] = (0.02 * rs.randn(ch, cond_dim)).astype(np.float32)

    p["embeddings.weight"] = (0.1 * rs.randn(cfg.z_dim, cfg.num_classes)).astype(np.float32)
    ch16 = 16 * cfg.channel_width
    std = 1.0 / math.sqrt(cond_dim)
    p["generator.gen_z.weight"] = (std * rs.randn(4 * 4 * ch16, cond_dim)).astype(np.float32)
    p["generator.gen_z.bias"] = np.zeros((4 * 4 * ch16,), np.float32)

    gi = 0
    for mod in cfg.module_plan():
        if mod[0] == "attn":
            ch = mod[1]
            base = f"generator.layers.{gi}"
            conv(f"{base}.snconv1x1_theta", ch, ch // 8, 1, bias=False)
            conv(f"{base}.snconv1x1_phi", ch, ch // 8, 1, bias=False)
            conv(f"{base}.snconv1x1_g", ch, ch // 2, 1, bias=False)
            conv(f"{base}.snconv1x1_o_conv", ch // 2, ch, 1, bias=False)
            p[f"{base}.gamma"] = np.zeros((1,), np.float32) + 0.1
        else:
            _, up, cin, cout = mod
            mid = cin // 4
            base = f"generator.layers.{gi}"
            cond_bn(f"{base}.bn_0", cin)
            conv(f"{base}.conv_0", cin, mid, 1)
            cond_bn(f"{base}.bn_1", mid)
            conv(f"{base}.conv_1", mid, mid, 3)
            cond_bn(f"{base}.bn_2", mid)
            conv(f"{base}.conv_2", mid, mid, 3)
            cond_bn(f"{base}.bn_3", mid)
            conv(f"{base}.conv_3", mid, cout, 1)
        gi += 1

    # Real configs end at width-mult 1 so this equals channel_width
    # (reference model.py:226-228); sized from the last layer for generality.
    ch = cfg.channel_width * cfg.layers[-1][2]
    p["generator.bn.running_means"] = (0.1 * rs.randn(cfg.n_stats, ch)).astype(np.float32)
    p["generator.bn.running_vars"] = (1.0 + 0.1 * rs.rand(cfg.n_stats, ch)).astype(np.float32)
    p["generator.bn.weight"] = np.ones((ch,), np.float32)
    p["generator.bn.bias"] = np.zeros((ch,), np.float32)
    conv("generator.conv_to_rgb", ch, ch, 3)
    return p


# ---------------------------------------------------------------------------
# Pure ops
# ---------------------------------------------------------------------------

def _conv(params, name, x, k, pad):
    w = params[f"{name}.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
    b = params.get(f"{name}.bias")
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1).astype(y.dtype)
    return y


def _trunc_stats(params, name, truncation: float, n_stats: int):
    """Interpolated running stats for a static truncation (model.py:126-135)."""
    step = 1.0 / (n_stats - 1)
    coef, start = math.modf(truncation / step)
    start = int(start)
    means, variances = params[f"{name}.running_means"], params[f"{name}.running_vars"]
    if coef != 0.0:
        # NB: the reference interpolates "backwards" (coef weights the lower
        # index); replicated verbatim for checkpoint parity.
        mean = means[start] * coef + means[start + 1] * (1 - coef)
        var = variances[start] * coef + variances[start + 1] * (1 - coef)
    else:
        mean = means[start]
        var = variances[start]
    return mean, var


def _cond_bn(params, name, x, cond, truncation, n_stats, eps=1e-4):
    mean, var = _trunc_stats(params, name, truncation, n_stats)
    weight = 1.0 + jnp.matmul(cond, params[f"{name}.scale.weight"].T,
                              precision=get_precision())
    bias = jnp.matmul(cond, params[f"{name}.offset.weight"].T,
                      precision=get_precision())
    inv = lax.rsqrt(var + eps)
    x_hat = ((x - mean[None, :, None, None].astype(x.dtype))
             * inv[None, :, None, None].astype(x.dtype))
    return (x_hat * weight[:, :, None, None].astype(x.dtype)
            + bias[:, :, None, None].astype(x.dtype))


def _plain_bn(params, name, x, truncation, n_stats, eps=1e-4):
    mean, var = _trunc_stats(params, name, truncation, n_stats)
    inv = lax.rsqrt(var + eps)
    w, b = params[f"{name}.weight"], params[f"{name}.bias"]
    scale = (inv * w).astype(x.dtype)
    shift = (b - mean * inv * w).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _self_attn(params, base, x, ts: TapState):
    n, ch, h, w = x.shape
    theta = _conv(params, f"{base}.snconv1x1_theta", x, 1, 0).reshape(n, ch // 8, h * w)
    phi = _maxpool2(_conv(params, f"{base}.snconv1x1_phi", x, 1, 0))
    phi = phi.reshape(n, ch // 8, h * w // 4)
    attn = jax.nn.softmax(
        jnp.einsum("ncp,ncq->npq", theta, phi, precision=get_precision()), axis=-1)
    g = _maxpool2(_conv(params, f"{base}.snconv1x1_g", x, 1, 0)).reshape(n, ch // 2, h * w // 4)
    attn_g = jnp.einsum("ncq,npq->ncp", g, attn,
                        precision=get_precision()).reshape(n, ch // 2, h, w)
    attn_g = _conv(params, f"{base}.snconv1x1_o_conv", attn_g, 1, 0)
    out = x + params[f"{base}.gamma"][0].astype(x.dtype) * attn_g
    return ts.tap(base, out)


# Space-to-depth tail (see ``ops/s2d.py``): GenBlocks whose bottleneck width
# mid = cin/4 falls to or below this run in (H/2, W/2, 4C) block layout from
# their up-conv onward (BigGAN-256/512 tails reach mid=32 at 256-512 px,
# where plain NCHW convs run far off roofline on TPU).
S2D_MAX_CH = s2d_ops.S2D_MAX_CH


def _cond_bn_blk(params, name, x_blk, cond, truncation, n_stats, eps=1e-4):
    mean, var = _trunc_stats(params, name, truncation, n_stats)
    weight = 1.0 + jnp.matmul(cond, params[f"{name}.scale.weight"].T,
                              precision=get_precision())
    bias = jnp.matmul(cond, params[f"{name}.offset.weight"].T,
                      precision=get_precision())
    inv = lax.rsqrt(var + eps)
    b, h, w, f = x_blk.shape
    c = f // 4
    y = x_blk.reshape(b, h, w, 4, c)
    y = ((y - mean[None, None, None, None, :].astype(y.dtype))
         * inv[None, None, None, None, :].astype(y.dtype))
    y = (y * weight[:, None, None, None, :].astype(y.dtype)
         + bias[:, None, None, None, :].astype(y.dtype))
    return y.reshape(b, h, w, f)


def _plain_bn_blk(params, name, x_blk, truncation, n_stats, eps=1e-4):
    mean, var = _trunc_stats(params, name, truncation, n_stats)
    inv = lax.rsqrt(var + eps)
    w_, b_ = params[f"{name}.weight"], params[f"{name}.bias"]
    scale = inv * w_
    shift = b_ - mean * scale
    b, h, w, f = x_blk.shape
    c = f // 4
    y = x_blk.reshape(b, h, w, 4, c)
    y = (y * scale[None, None, None, None, :].astype(y.dtype)
         + shift[None, None, None, None, :].astype(y.dtype))
    return y.reshape(b, h, w, f)


def _conv_blk(params, name, x_blk, k):
    w = params[f"{name}.weight"].astype(x_blk.dtype)
    if k == 1:
        y = s2d_ops.conv1x1_blocks(x_blk, w)
    else:
        y = s2d_ops.conv3x3_blocks(x_blk, w)
    b = params.get(f"{name}.bias")
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return y


def _gen_block_blk(params, base, x, cond, truncation, n_stats, up, ts: TapState,
                   enter: bool):
    """Block-layout GenBlock.  With ``enter`` the input is still NCHW: the
    pre-upsample half runs in pixel layout and the layout switch happens
    inside the fused nearest-up conv_1 (free)."""
    tb = s2d_ops.tap_blocks
    if enter:
        x0 = x
        x = ts.tap(f"{base}.bn_0", _cond_bn(params, f"{base}.bn_0", x, cond, truncation, n_stats))
        x = ts.tap(f"{base}.relu", jax.nn.relu(x))
        x = ts.tap(f"{base}.conv_0", _conv(params, f"{base}.conv_0", x, 1, 0))
        x = ts.tap(f"{base}.bn_1", _cond_bn(params, f"{base}.bn_1", x, cond, truncation, n_stats))
        x = ts.tap(f"{base}.relu", jax.nn.relu(x))
        if ts.stopped:
            return x
        x = jnp.transpose(x, (0, 2, 3, 1))  # pixel NHWC
        w1 = params[f"{base}.conv_1.weight"].astype(x.dtype)
        x = s2d_ops.nearestup_conv_blocks(x, w1, pixel_input=True)
        b1 = params.get(f"{base}.conv_1.bias")
        if b1 is not None:
            x = x + jnp.tile(b1, 4).astype(x.dtype)
        x = tb(ts, f"{base}.conv_1", x)
    else:
        x0 = x
        x = tb(ts, f"{base}.bn_0", _cond_bn_blk(params, f"{base}.bn_0", x, cond, truncation, n_stats))
        x = tb(ts, f"{base}.relu", jax.nn.relu(x))
        x = tb(ts, f"{base}.conv_0", _conv_blk(params, f"{base}.conv_0", x, 1))
        x = tb(ts, f"{base}.bn_1", _cond_bn_blk(params, f"{base}.bn_1", x, cond, truncation, n_stats))
        x = tb(ts, f"{base}.relu", jax.nn.relu(x))
        if ts.stopped:
            return x
        if up:
            w1 = params[f"{base}.conv_1.weight"].astype(x.dtype)
            x = s2d_ops.nearestup_conv_blocks(x, w1)
            b1 = params.get(f"{base}.conv_1.bias")
            if b1 is not None:
                x = x + jnp.tile(b1, 4).astype(x.dtype)
            x = tb(ts, f"{base}.conv_1", x)
        else:
            x = tb(ts, f"{base}.conv_1", _conv_blk(params, f"{base}.conv_1", x, 3))
    if ts.stopped:
        return x

    x = tb(ts, f"{base}.bn_2", _cond_bn_blk(params, f"{base}.bn_2", x, cond, truncation, n_stats))
    x = tb(ts, f"{base}.relu", jax.nn.relu(x))
    x = tb(ts, f"{base}.conv_2", _conv_blk(params, f"{base}.conv_2", x, 3))
    x = tb(ts, f"{base}.bn_3", _cond_bn_blk(params, f"{base}.bn_3", x, cond, truncation, n_stats))
    x = tb(ts, f"{base}.relu", jax.nn.relu(x))
    x = tb(ts, f"{base}.conv_3", _conv_blk(params, f"{base}.conv_3", x, 1))
    if ts.stopped:
        return x

    if enter:
        cin = x0.shape[1]
        cout4 = x.shape[-1]
        if cout4 != cin * 4:
            x0 = x0[:, :cin // 2]  # channel-drop skip (model.py:195-197)
        x0 = jnp.transpose(x0, (0, 2, 3, 1))
        if up:
            x0 = s2d_ops.nearest_up_blocks(x0, x0.shape[-1], pixel_input=True)
        else:
            x0 = s2d_ops.nchw_to_blocks(jnp.transpose(x0, (0, 3, 1, 2)))
    else:
        cin4 = x0.shape[-1]
        if x.shape[-1] != cin4:
            b, h, w, _ = x0.shape
            x0 = x0.reshape(b, h, w, 4, cin4 // 4)[..., :cin4 // 8]
            x0 = x0.reshape(b, h, w, cin4 // 2)
        if up:
            x0 = s2d_ops.nearest_up_blocks(x0, x0.shape[-1] // 4)
    return tb(ts, base, x + x0)


def _gen_block(params, base, x, cond, truncation, n_stats, up, ts: TapState):
    x0 = x
    x = ts.tap(f"{base}.bn_0", _cond_bn(params, f"{base}.bn_0", x, cond, truncation, n_stats))
    x = ts.tap(f"{base}.relu", jax.nn.relu(x))
    x = ts.tap(f"{base}.conv_0", _conv(params, f"{base}.conv_0", x, 1, 0))

    x = ts.tap(f"{base}.bn_1", _cond_bn(params, f"{base}.bn_1", x, cond, truncation, n_stats))
    x = ts.tap(f"{base}.relu", jax.nn.relu(x))
    if up:
        x = nearest_upsample2x(x)
    x = ts.tap(f"{base}.conv_1", _conv(params, f"{base}.conv_1", x, 3, 1))

    x = ts.tap(f"{base}.bn_2", _cond_bn(params, f"{base}.bn_2", x, cond, truncation, n_stats))
    x = ts.tap(f"{base}.relu", jax.nn.relu(x))
    x = ts.tap(f"{base}.conv_2", _conv(params, f"{base}.conv_2", x, 3, 1))

    x = ts.tap(f"{base}.bn_3", _cond_bn(params, f"{base}.bn_3", x, cond, truncation, n_stats))
    x = ts.tap(f"{base}.relu", jax.nn.relu(x))
    x = ts.tap(f"{base}.conv_3", _conv(params, f"{base}.conv_3", x, 1, 0))

    if x.shape[1] != x0.shape[1]:
        x0 = x0[:, :x0.shape[1] // 2]  # channel-drop skip (model.py:195-197)
    if up:
        x0 = nearest_upsample2x(x0)
    return ts.tap(base, x + x0)


def synthesize(params, zs, class_onehot, edits, *, cfg: BigGANConfig,
               truncation: float, n_layers_to_run: int,
               retain: Tuple[str, ...], stop_at: Optional[str],
               s2d_tail: bool = True, act_dtype: Optional[str] = None):
    """zs: tuple of n_latents [B, z_dim] arrays; class_onehot [B, 1000]."""
    ts = TapState(retain, edits, stop_at)
    embeds = []
    for _ in zs:
        e = jnp.matmul(class_onehot, params["embeddings.weight"].T,
                       precision=get_precision())
        embeds.append(ts.tap("embeddings", e))
    if stop_at == "embeddings":
        return None, ts.retained

    conds = [jnp.concatenate([z, e], axis=1) for z, e in zip(zs, embeds)]

    z = jnp.matmul(conds[0], params["generator.gen_z.weight"].T,
                   precision=get_precision()) + params["generator.gen_z.bias"]
    z = ts.tap("generator.gen_z", z)
    if ts.stopped:
        return None, ts.retained

    ch16 = 16 * cfg.channel_width
    x = z.reshape(-1, 4, 4, ch16).transpose(0, 3, 1, 2)
    if act_dtype is not None:
        x = x.astype(jnp.dtype(act_dtype))

    # Block-layout entry point: the first up-GenBlock whose bottleneck has
    # thinned to <= S2D_MAX_CH channels (static — part of the jit signature).
    entry_mi = None
    if s2d_tail:
        plan = cfg.module_plan()
        attn_mi = max((mi for mi, mod in enumerate(plan) if mod[0] == "attn"),
                      default=-1)
        for mi, mod in enumerate(plan):
            if (mi > attn_mi and mod[0] == "gen" and mod[1]
                    and mod[2] // 4 <= S2D_MAX_CH):
                entry_mi = mi
                break

    cond_idx = 1
    for mi, mod in enumerate(cfg.module_plan()):
        if mi >= n_layers_to_run:
            return None, ts.retained
        base = f"generator.layers.{mi}"
        if mod[0] == "attn":
            x = _self_attn(params, base, x, ts)
        else:
            _, up, _, _ = mod
            if entry_mi is not None and mi >= entry_mi:
                x = _gen_block_blk(params, base, x, conds[cond_idx], truncation,
                                   cfg.n_stats, up, ts, enter=(mi == entry_mi))
            else:
                x = _gen_block(params, base, x, conds[cond_idx], truncation,
                               cfg.n_stats, up, ts)
            cond_idx += 1
        if ts.stopped:
            return None, ts.retained

    if entry_mi is not None:
        tb = s2d_ops.tap_blocks
        x = tb(ts, "generator.bn", _plain_bn_blk(params, "generator.bn", x, truncation, cfg.n_stats))
        x = tb(ts, "generator.relu", jax.nn.relu(x))
        x = tb(ts, "generator.conv_to_rgb", _conv_blk(params, "generator.conv_to_rgb", x, 3))
        if ts.stopped:
            return None, ts.retained
        b, h, w, f = x.shape
        x = x.reshape(b, h, w, 4, f // 4)[..., :3].reshape(b, h, w, 12)
        x = s2d_ops.blocks_to_nchw(x)
        x = jnp.tanh(x).astype(jnp.float32)
        return x, ts.retained

    x = ts.tap("generator.bn", _plain_bn(params, "generator.bn", x, truncation, cfg.n_stats))
    x = ts.tap("generator.relu", jax.nn.relu(x))
    x = ts.tap("generator.conv_to_rgb", _conv(params, "generator.conv_to_rgb", x, 3, 1))
    x = x[:, :3]
    x = jnp.tanh(x).astype(jnp.float32)
    if ts.stopped:
        return None, ts.retained
    return x, ts.retained


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------

class BigGAN(BaseGenerator):
    """Drop-in equivalent of the reference ``BigGAN`` wrapper
    (``models/wrappers.py:525-648``)."""

    def __init__(self, resolution: int = 512, class_name=None, truncation: float = 1.0,
                 cfg: Optional[BigGANConfig] = None,
                 params: Optional[Dict[str, np.ndarray]] = None, init_seed: int = 0):
        resolution = int(resolution)
        super().__init__(f"BigGAN-{resolution}", class_name)
        self.cfg = cfg or BigGANConfig.for_resolution(resolution)
        self.resolution = self.cfg.output_dim
        self.truncation = truncation
        if params is None:
            # Local HF .bin, TF-Hub dump, or s3 download-on-miss
            # (wrappers.py:537-560 + pytorch_pretrained_biggan/model.py).
            from ganspace_tpu.models import checkpoints as _ckpt
            found, tf_found, rel = _ckpt.locate_biggan(resolution)
            if found is not None:
                from ganspace_tpu.models.torch_import import import_biggan
                params = import_biggan(found)
            elif tf_found is not None:  # TF-Hub variable dump, converted here
                from ganspace_tpu.models.tf_import import import_biggan_tf
                params = import_biggan_tf(tf_found, cfg=self.cfg)
            else:
                _ckpt.note_random_init(f"BigGAN-{resolution}", rel)
                params = init_params(self.cfg, init_seed)
        self.params = jax.tree.map(jnp.asarray, params)
        self.v_class = None
        self.set_output_class(class_name if class_name is not None else "husky")
        self.name = f"BigGAN-{resolution}-{self.outclass}-t{self.truncation}"
        self.has_latent_residual = True
        self._s2d = s2d_ops.enabled()
        self._jit_core = partial(
            jax.jit,
            static_argnames=("truncation", "n_layers_to_run", "retain",
                             "stop_at", "s2d_tail", "act_dtype"))(
            partial(synthesize, cfg=self.cfg))

    # -- class conditioning --------------------------------------------------
    def _one_hot(self, class_id) -> np.ndarray:
        v = np.zeros((1, self.cfg.num_classes), np.float32)
        v[0, class_id] = 1.0
        return v

    def is_valid_class(self, class_id) -> bool:
        """Any of the 1000 ImageNet classes by index, name, or WNID
        (reference ``wrappers.py:581-587`` + WordNet resolution in
        ``pytorch_pretrained_biggan/utils.py:174-216``, embedded offline in
        ``imagenet_classes.py``)."""
        from ganspace_tpu.models import imagenet_classes
        if isinstance(class_id, int):
            return class_id < self.cfg.num_classes
        if isinstance(class_id, str):
            return imagenet_classes.is_valid(class_id, aliases=CLASS_ALIASES)
        raise RuntimeError(f"Unknown class identifier {class_id}")

    def set_output_class(self, class_id):
        if class_id is None:          # "no preference": keep the current class
            return
        if isinstance(class_id, (int, np.integer)):
            self.v_class = jnp.asarray(self._one_hot(int(class_id)))
            self.outclass = f"class{class_id}"
        elif isinstance(class_id, str):
            from ganspace_tpu.models import imagenet_classes
            key = class_id.replace(" ", "_").lower()
            try:
                idx = imagenet_classes.resolve(key, aliases=CLASS_ALIASES)
            except KeyError as e:
                raise RuntimeError(str(e)) from None
            self.outclass = key
            self.v_class = jnp.asarray(self._one_hot(idx))
        else:
            raise RuntimeError(f"Unknown class identifier {class_id}")

    def get_conditional_state(self, z):
        return self.v_class

    def set_conditional_state(self, z, c):
        self.v_class = c

    # -- reference API -------------------------------------------------------
    def get_max_latents(self):
        return self.cfg.n_latents

    def sample_latent(self, n_samples=1, truncation=None, seed=None):
        if seed is None:
            seed = np.random.randint(np.iinfo(np.int32).max)
        return jnp.asarray(sampling.truncated_latents(
            n_samples, self.cfg.z_dim, truncation or self.truncation, seed))

    def device_latents_fn_p(self):
        """In-trace truncnorm sampler (scipy truncnorm(-2,2)*truncation
        distributionally — reference ``utils.py:21-33``): lets BigGAN ride
        the fused decomposition/regression scans like the gaussian models."""
        dim, trunc = self.cfg.z_dim, float(self.truncation)

        def fn(pack, key, n):
            return trunc * jax.random.truncated_normal(
                key, -2.0, 2.0, (n, dim), jnp.float32)
        return fn, ()

    def sample_latents_device(self, n_batches, batch_size, seed,
                              sharding=None):
        """Device truncnorm stream (scipy truncnorm(-2,2) distributionally).
        With ``sharding`` the per-batch draw is jitted straight into the
        mesh layout so samples materialize shard-local (no resharding)."""
        key = jax.random.PRNGKey(int(seed))

        def draw(k):
            return self.truncation * jax.random.truncated_normal(
                k, -2.0, 2.0, (batch_size, self.cfg.z_dim), jnp.float32)

        if sharding is not None:
            draw = jax.jit(draw, out_shardings=sharding)
        return [draw(jax.random.fold_in(key, i)) for i in range(n_batches)]

    def tap_names(self):
        names = ["embeddings", "generator.gen_z"]
        for mi, mod in enumerate(self.cfg.module_plan()):
            base = f"generator.layers.{mi}"
            if mod[0] == "attn":
                names.append(base)
            else:
                names += [f"{base}.bn_0", f"{base}.relu", f"{base}.conv_0",
                          f"{base}.bn_1", f"{base}.conv_1", f"{base}.bn_2",
                          f"{base}.conv_2", f"{base}.bn_3", f"{base}.conv_3", base]
        names += ["generator.bn", "generator.relu", "generator.conv_to_rgb"]
        return tuple(names)

    def _n_layers_for(self, layer_name: Optional[str]) -> int:
        n_modules = len(self.cfg.module_plan())
        if layer_name is None:
            return n_modules
        if layer_name in ("embeddings", "generator.gen_z"):
            return 0
        m = re.match(r"^generator\.layers\.([0-9]+)", layer_name)
        if m:
            return int(m.group(1)) + 1
        return n_modules

    def pure_acts_fn_p(self, layer_name: str):
        """Pure tap function (weights as explicit operands) for the fused
        decomposition stream and the batch autotuner.  The pack snapshots
        the CURRENT class vector — rebuild after set_output_class."""
        tap = self.resolve_tap(layer_name)
        cfg = self.cfg
        trunc = float(self.truncation)
        n_run = self._n_layers_for(layer_name)
        s2d_tail = self._s2d
        from ganspace_tpu.ops.precision import synth_dtype_name
        act_dtype = synth_dtype_name()

        def fn(pack, z):
            params, v_class = pack
            zs = tuple([z] * cfg.n_latents)
            onehot = jnp.broadcast_to(v_class, (z.shape[0], cfg.num_classes))
            _, retained = synthesize(params, zs, onehot, {}, cfg=cfg,
                                     truncation=trunc, n_layers_to_run=n_run,
                                     retain=(tap,), stop_at=tap,
                                     s2d_tail=s2d_tail, act_dtype=act_dtype)
            return retained[tap].reshape(z.shape[0], -1)
        return fn, (self.params, self.v_class)

    def _run(self, x, stop_at, layer_name=None):
        zs = x if isinstance(x, list) else self.cfg.n_latents * [x]
        assert len(zs) == self.cfg.n_latents, \
            f"Expected {self.cfg.n_latents} latents, got {len(zs)}"
        zs = tuple(jnp.asarray(z) for z in zs)
        class_onehot = jnp.broadcast_to(self.v_class,
                                        (zs[0].shape[0], self.cfg.num_classes))
        from ganspace_tpu.ops.precision import synth_dtype_name
        retain, edits, store = self._instrumentation()
        n_run = self._n_layers_for(layer_name) if stop_at is not None \
            else len(self.cfg.module_plan())
        img, retained = self._jit_core(
            self.params, zs, class_onehot, edits,
            truncation=float(self.truncation), n_layers_to_run=n_run,
            retain=retain, stop_at=stop_at, s2d_tail=self._s2d,
            act_dtype=synth_dtype_name())
        if store is not None:
            store(retained)
        return img

    def forward(self, x):
        img = self._run(x, stop_at=None)
        return 0.5 * (img + 1)

    def partial_forward(self, x, layer_name):
        stop_at = self.resolve_tap(layer_name)
        # The shared ``relu`` module fires 4x per GenBlock; the reference runs
        # the whole block and its hook keeps the LAST call's output
        # (wrappers.py:609-648 + nethook overwrite semantics), so the stop
        # point is the block boundary while retention stays on the relu tap.
        if stop_at.endswith(".relu") and stop_at.startswith("generator.layers"):
            stop_at = stop_at.rsplit(".", 1)[0]
        self._run(x, stop_at=stop_at, layer_name=layer_name)
        return None
