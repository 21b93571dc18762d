"""StyleGAN2 generator, re-designed TPU-first.

Functional re-implementation of the capability surface the reference consumes
from its ``stylegan2-pytorch`` submodule via ``models/wrappers.py:97-267``:
8 output classes at 256-1024 px, Z or W primary latent space, per-layer style
injection (W+), fixed seeded noise buffers, truncation toward ``latent_avg``,
and early-exit capture at the wrapper's checkpoint names (``style``, ``input``,
``conv1``, ``to_rgb1``, ``convs.i``, ``to_rgbs.i`` — ``wrappers.py:194-259``).

TPU-native choices:
  * modulated conv runs as ONE shared batched convolution with input/output
    scaling (see ``ops/modconv.py``) instead of per-sample grouped weights;
  * ``upfirdn2d`` is a single dilated XLA conv (see ``ops/upfirdn.py``);
  * partial_forward is jit specialization: ``stop_at`` is a static argument,
    so XLA dead-code-eliminates every stage past the tap;
  * the whole synthesis is jitted once per (n_styles, taps, edit-structure)
    signature and reused.

Parameters live in a flat dict keyed by the torch module paths of the
rosinality checkpoint format (``g_ema`` keys such as ``style.1.weight``,
``convs.0.conv.weight``), so importing a reference checkpoint is a pure
renaming-free copy (see ``models/torch_import.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu import sampling
from ganspace_tpu.models.base import BaseGenerator, TapState
from ganspace_tpu.ops import (
    equal_linear,
    fused_leaky_relu,
    make_fir_kernel,
    modulated_conv2d,
    pixel_norm,
    upsample2x,
)
from ganspace_tpu.ops import s2d as s2d_ops
from ganspace_tpu.ops.precision import synth_dtype_name

# Stages whose channel count is at or below this run in space-to-depth block
# layout (``ops/s2d.py``): measured on v5e, XLA conv throughput collapses
# below ~128 channels, so the 512px (C=64) and 1024px (C=32) stages are held
# as (H/2, W/2, 4C) blocks with MXU-friendly channel counts.
S2D_MAX_CH = s2d_ops.S2D_MAX_CH

# Reference wrapper class->resolution table (wrappers.py:106-117).
CONFIGS = {
    "ffhq": 1024,
    "car": 512,
    "cat": 256,
    "church": 256,
    "horse": 256,
    "bedrooms": 256,
    "kitchen": 256,
    "places": 256,
}


def default_channels(channel_multiplier: int = 2) -> Dict[int, int]:
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


@dataclass(frozen=True)
class SG2Config:
    resolution: int = 1024
    w_dim: int = 512
    n_mlp: int = 8
    channels: Tuple[Tuple[int, int], ...] = ()  # ((res, ch), ...); empty -> default
    blur_taps: Tuple[int, ...] = (1, 3, 3, 1)

    def channel_map(self) -> Dict[int, int]:
        return dict(self.channels) if self.channels else default_channels()

    @property
    def log_size(self) -> int:
        return int(math.log2(self.resolution))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2


def init_params(cfg: SG2Config, seed: int = 0) -> Dict[str, np.ndarray]:
    """Random parameters (for tests/benchmarks; checkpoints replace these)."""
    rs = np.random.RandomState(seed)
    ch = cfg.channel_map()
    p: Dict[str, np.ndarray] = {}

    def lin(name, fan_in, fan_out, lr_mul=1.0, bias_val=0.0):
        p[f"{name}.weight"] = rs.randn(fan_out, fan_in).astype(np.float32) / lr_mul
        p[f"{name}.bias"] = np.full((fan_out,), bias_val, dtype=np.float32)

    def modconv(name, in_ch, out_ch, k):
        p[f"{name}.weight"] = rs.randn(out_ch, in_ch, k, k).astype(np.float32)
        lin(f"{name}.modulation", cfg.w_dim, in_ch, bias_val=1.0)

    def styled_conv(name, in_ch, out_ch):
        modconv(f"{name}.conv", in_ch, out_ch, 3)
        # Nonzero noise gain so fixed-noise determinism is actually exercised
        # by randomly-initialized test models.
        p[f"{name}.noise.weight"] = 0.1 * rs.randn(1).astype(np.float32)
        p[f"{name}.activate.bias"] = np.zeros((out_ch,), dtype=np.float32)

    def to_rgb(name, in_ch):
        modconv(f"{name}.conv", in_ch, 3, 1)
        p[f"{name}.bias"] = np.zeros((1, 3, 1, 1), dtype=np.float32)

    for i in range(1, cfg.n_mlp + 1):
        lin(f"style.{i}", cfg.w_dim, cfg.w_dim, lr_mul=0.01)

    p["input.input"] = rs.randn(1, ch[4], 4, 4).astype(np.float32)
    styled_conv("conv1", ch[4], ch[4])
    to_rgb("to_rgb1", ch[4])

    in_ch = ch[4]
    ci = 0
    for res_log in range(3, cfg.log_size + 1):
        out_ch = ch[2 ** res_log]
        styled_conv(f"convs.{ci}", in_ch, out_ch)      # upsampling conv
        styled_conv(f"convs.{ci + 1}", out_ch, out_ch)
        to_rgb(f"to_rgbs.{res_log - 3}", out_ch)
        in_ch = out_ch
        ci += 2
    return p


def make_noise(cfg: SG2Config, seed: int = 0) -> Tuple[np.ndarray, ...]:
    """Fixed per-resolution noise buffers (reference ``wrappers.py:261-267``).

    Drawn from numpy instead of torch.cuda RNG — bit parity with the
    reference's CUDA noise is unattainable off-GPU; the noise is constant
    across samples so it shifts activation means only, never PCA components.
    """
    rs = np.random.RandomState(seed)
    noise = [rs.randn(1, 1, 4, 4).astype(np.float32)]
    for i in range(3, cfg.log_size + 1):
        for _ in range(2):
            noise.append(rs.randn(1, 1, 2 ** i, 2 ** i).astype(np.float32))
    return tuple(noise)


# ---------------------------------------------------------------------------
# Pure synthesis
# ---------------------------------------------------------------------------

def _mapping(params, z, n_mlp: int) -> jnp.ndarray:
    x = pixel_norm(z, axis=-1)
    for i in range(1, n_mlp + 1):
        x = equal_linear(x, params[f"style.{i}.weight"], bias=None, lr_mul=0.01, gain=1.0)
        x = fused_leaky_relu(x, params[f"style.{i}.bias"] * 0.01, channel_axis=-1)
    return x


def _styled_conv(params, name, x, w_lat, noise, blur_k, ts: TapState, upsample=False):
    s = equal_linear(w_lat, params[f"{name}.conv.modulation.weight"],
                     params[f"{name}.conv.modulation.bias"], gain=1.0)
    x = modulated_conv2d(x, params[f"{name}.conv.weight"], s,
                         demodulate=True, upsample=upsample, blur_kernel=blur_k)
    x = ts.tap(f"{name}.conv", x)
    x = x + params[f"{name}.noise.weight"][0].astype(x.dtype) * noise.astype(x.dtype)
    x = fused_leaky_relu(x, params[f"{name}.activate.bias"], channel_axis=1)
    return ts.tap(name, x)


def _to_rgb(params, name, x, w_lat, skip, blur_k, ts: TapState):
    s = equal_linear(w_lat, params[f"{name}.conv.modulation.weight"],
                     params[f"{name}.conv.modulation.bias"], gain=1.0)
    out = modulated_conv2d(x, params[f"{name}.conv.weight"], s, demodulate=False)
    out = out + params[f"{name}.bias"].astype(out.dtype)
    if skip is not None:
        out = out + upsample2x(skip, blur_k)
    return ts.tap(name, out)


_tap_blk = s2d_ops.tap_blocks


def _styled_conv_blk(params, name, x, w_lat, noise_blk, blur_k, ts: TapState, mode):
    """Block-layout styled conv; ``mode`` in {"entry", "up", "plain"}.
    "entry" consumes a pixel-layout NHWC tensor and emits blocks of the
    2x-upsampled map (the layout switch costs nothing)."""
    s = equal_linear(w_lat, params[f"{name}.conv.modulation.weight"],
                     params[f"{name}.conv.modulation.bias"], gain=1.0)
    w = params[f"{name}.conv.weight"]
    if mode == "plain":
        x = s2d_ops.modulated_conv3x3_blocks(x, w, s)
    else:
        x = s2d_ops.modulated_upconv_blocks(x, w, s, blur_k,
                                            pixel_input=(mode == "entry"))
    x = _tap_blk(ts, f"{name}.conv", x)
    if ts.stopped:
        return x
    x = s2d_ops.add_noise_blocks(x, noise_blk, params[f"{name}.noise.weight"][0])
    x = fused_leaky_relu(x, jnp.tile(params[f"{name}.activate.bias"], 4),
                         channel_axis=-1)
    return _tap_blk(ts, name, x)


def _to_rgb_blk(params, name, x_blk, w_lat, skip, blur_k, ts: TapState, *,
                skip_is_pixel=False):
    s = equal_linear(w_lat, params[f"{name}.conv.modulation.weight"],
                     params[f"{name}.conv.modulation.bias"], gain=1.0)
    out = s2d_ops.modulated_rgb_blocks(x_blk, params[f"{name}.conv.weight"], s)
    out = out + jnp.tile(params[f"{name}.bias"].reshape(-1), 4).astype(out.dtype)
    if skip is not None:
        if skip_is_pixel:  # NCHW skip from the last pixel-layout stage
            skip_nhwc = jnp.transpose(skip, (0, 2, 3, 1))
            out = out + s2d_ops.upsample2x_blocks(skip_nhwc, blur_k,
                                                  pixel_input=True)
        else:
            out = out + s2d_ops.upsample2x_blocks(skip, blur_k)
    return _tap_blk(ts, name, out)


def synthesize(params, consts, styles, edits, *, cfg: SG2Config, input_is_w: bool,
               inject_index: Optional[int], truncation: float,
               retain: Tuple[str, ...], stop_at: Optional[str],
               s2d_tail: bool = True, act_dtype: Optional[str] = None):
    """One traced program covering forward AND partial_forward.

    Mirrors the reference's staged walk (``wrappers.py:194-259``); with a
    static ``stop_at``, everything after the tap is dead code to XLA.
    ``strided_style`` in the reference fork is shape-preserving on the
    broadcast [B, n_latent, 512] tensor and is the identity here.
    """
    ts = TapState(retain, edits, stop_at)
    blur_k = make_fir_kernel(cfg.blur_taps)
    n_latent = cfg.n_latent

    if input_is_w:
        ws = [jnp.asarray(s) for s in styles]
    else:
        ws = [ts.tap("style", _mapping(params, jnp.asarray(s), cfg.n_mlp)) for s in styles]

    if truncation < 1.0:
        avg = consts["latent_avg"]
        ws = [avg + truncation * (w - avg) for w in ws]

    if len(ws) == 1:
        latent = jnp.repeat(ws[0][:, None, :], n_latent, axis=1)
    elif len(ws) == 2:
        idx = inject_index if inject_index is not None else n_latent // 2
        latent = jnp.concatenate([
            jnp.repeat(ws[0][:, None, :], idx, axis=1),
            jnp.repeat(ws[1][:, None, :], n_latent - idx, axis=1),
        ], axis=1)
    else:
        assert len(ws) == n_latent, f"Expected {n_latent} latents, got {len(ws)}"
        latent = jnp.stack(ws, axis=1)

    if stop_at == "style":
        return None, ts.retained

    # Optional half-precision activation storage: halves HBM traffic
    # through the whole synthesis.  ``act_dtype`` is a STATIC argument (part
    # of the jit cache key) — callers read the ops.precision.synth_dtype
    # policy per call, so scoping the context works on warm caches too.
    dt = jnp.dtype(act_dtype) if act_dtype is not None else None
    if dt is not None:
        latent = latent.astype(dt)

    noise = consts["noise"]
    batch = latent.shape[0]

    out = jnp.broadcast_to(params["input.input"],
                           (batch,) + params["input.input"].shape[1:])
    if dt is not None:
        out = out.astype(dt)
    out = ts.tap("input", out)
    if ts.stopped:
        return None, ts.retained

    out = _styled_conv(params, "conv1", out, latent[:, 0], noise[0], blur_k, ts)
    if ts.stopped:
        return None, ts.retained

    skip = _to_rgb(params, "to_rgb1", out, latent[:, 1], None, blur_k, ts)
    if ts.stopped:
        return None, ts.retained

    i = 1
    noise_i = 1
    n_pairs = cfg.log_size - 2
    ch = cfg.channel_map()
    in_blocks = False
    for pair in range(n_pairs):
        res = 2 ** (pair + 3)
        enter = s2d_tail and not in_blocks and ch[res] <= S2D_MAX_CH
        if in_blocks or enter:
            if enter:
                # The entry up-conv consumes the pixel layout directly
                # (NHWC); switching into block layout is part of the conv.
                out = jnp.transpose(out, (0, 2, 3, 1))
                in_blocks = True
            out = _styled_conv_blk(params, f"convs.{i - 1}", out, latent[:, i],
                                   s2d_ops.noise_to_blocks(noise[noise_i]),
                                   blur_k, ts, "entry" if enter else "up")
            if ts.stopped:
                return None, ts.retained
            out = _styled_conv_blk(params, f"convs.{i}", out, latent[:, i + 1],
                                   s2d_ops.noise_to_blocks(noise[noise_i + 1]),
                                   blur_k, ts, "plain")
            if ts.stopped:
                return None, ts.retained
            skip = _to_rgb_blk(params, f"to_rgbs.{i // 2}", out, latent[:, i + 2],
                               skip, blur_k, ts, skip_is_pixel=enter)
            if ts.stopped:
                return None, ts.retained
        else:
            out = _styled_conv(params, f"convs.{i - 1}", out, latent[:, i],
                               noise[noise_i], blur_k, ts, upsample=True)
            if ts.stopped:
                return None, ts.retained
            out = _styled_conv(params, f"convs.{i}", out, latent[:, i + 1],
                               noise[noise_i + 1], blur_k, ts)
            if ts.stopped:
                return None, ts.retained
            skip = _to_rgb(params, f"to_rgbs.{i // 2}", out, latent[:, i + 2], skip, blur_k, ts)
            if ts.stopped:
                return None, ts.retained
        i += 2
        noise_i += 2

    if in_blocks:
        skip = s2d_ops.blocks_to_nchw(skip)
    if dt is not None and skip is not None:
        skip = skip.astype(jnp.float32)
    return skip, ts.retained


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------

class StyleGAN2(BaseGenerator):
    """Drop-in equivalent of the reference ``StyleGAN2`` wrapper
    (``models/wrappers.py:97-267``)."""

    def __init__(self, class_name: Optional[str] = None, truncation: float = 1.0,
                 use_w: bool = False, cfg: Optional[SG2Config] = None,
                 params: Optional[Dict[str, np.ndarray]] = None,
                 latent_avg: Optional[np.ndarray] = None, init_seed: int = 0):
        super().__init__("StyleGAN2", class_name or "ffhq")
        if cfg is None:
            if self.outclass not in CONFIGS:
                raise ValueError(
                    f"Invalid StyleGAN2 class {self.outclass}, should be one of "
                    f"[{', '.join(CONFIGS)}]")
            cfg = SG2Config(resolution=CONFIGS[self.outclass])
        self.cfg = cfg
        self.resolution = cfg.resolution
        self.truncation = truncation
        self.w_primary = use_w
        self.name = f"StyleGAN2-{self.outclass}"
        self.has_latent_residual = True

        if params is None:
            # Reference checkpoint layout + download-on-miss
            # (wrappers.py:138-161); random init when the file is absent and
            # unfetchable (zero-egress environment).
            from ganspace_tpu.models import checkpoints as _ckpt
            found, rel = _ckpt.locate_stylegan2(self.outclass, self.resolution)
            if found is not None:
                from ganspace_tpu.models.torch_import import import_stylegan2
                params, latent_avg = import_stylegan2(found)
            else:
                _ckpt.note_random_init(self.name, rel)
                params = init_params(cfg, seed=init_seed)
        self.params = jax.tree.map(jnp.asarray, params)
        self.latent_avg = jnp.asarray(
            latent_avg if latent_avg is not None else np.zeros((cfg.w_dim,), np.float32))
        self.set_noise_seed(0)

        # Space-to-depth tail (ops/s2d.py): on by default, opt out with
        # GANSPACE_S2D=0 (e.g. when diffing against the plain formulation).
        self._s2d = s2d_ops.enabled()
        self._jit_core = partial(
            jax.jit, static_argnames=("input_is_w", "inject_index", "truncation",
                                      "retain", "stop_at", "s2d_tail",
                                      "act_dtype"))(
            partial(synthesize, cfg=self.cfg))

    # -- reference API -------------------------------------------------------
    def latent_space_name(self):
        return "W" if self.w_primary else "Z"

    def use_w(self):
        self.w_primary = True

    def use_z(self):
        self.w_primary = False

    def get_max_latents(self):
        return self.cfg.n_latent

    def set_output_class(self, new_class):
        # None = "no preference" (e.g. a Config with no --class): keep current.
        if new_class is not None and self.outclass != new_class:
            raise RuntimeError("StyleGAN2: cannot change output class without reloading")

    def set_noise_seed(self, seed: int):
        self.consts = {
            "noise": tuple(jnp.asarray(n) for n in make_noise(self.cfg, seed)),
            "latent_avg": self.latent_avg,
        }

    def tap_names(self):
        names = ["style", "input", "conv1.conv", "conv1", "to_rgb1"]
        i = 1
        for _ in range(self.cfg.log_size - 2):
            names += [f"convs.{i-1}.conv", f"convs.{i-1}",
                      f"convs.{i}.conv", f"convs.{i}", f"to_rgbs.{i//2}"]
            i += 2
        return tuple(names)

    def sample_latent(self, n_samples=1, seed=None, truncation=None):
        if seed is None:
            seed = np.random.randint(np.iinfo(np.int32).max)
        z = jnp.asarray(sampling.gaussian_latents(n_samples, self.cfg.w_dim, seed))
        if self.w_primary:
            z = self._map_to_w(z)
        return z

    @partial(jax.jit, static_argnums=0)
    def _map_to_w(self, z):
        return _mapping(self.params, z, self.cfg.n_mlp)

    def _gaussian_latent_dim(self):
        return self.cfg.w_dim

    def _latents_from_gaussian(self, z):
        return self._map_to_w(z) if self.w_primary else z

    def latents_from_gaussian_p(self):
        if not self.w_primary:
            return (lambda pack, z: z), ()
        n_mlp = self.cfg.n_mlp
        return (lambda params, z: _mapping(params, z, n_mlp)), self.params

    def pure_acts_fn_p(self, layer_name: str):
        """Pure ``fn(pack, latents [n, w_dim]) -> activations [n, -1]`` at
        the tap — traceable inside an outer jit/scan (no instrumentation, no
        edits), weights as explicit operands.  Used by the decomposition's
        fused activation stream and the batch autotuner."""
        tap = self.resolve_tap(layer_name)
        cfg = self.cfg
        input_is_w, trunc = self.w_primary, float(self.truncation)

        s2d_tail = self._s2d
        act_dtype = synth_dtype_name()

        def fn(pack, lat):
            params, consts = pack
            _, retained = synthesize(
                params, consts, (lat,), {}, cfg=cfg, input_is_w=input_is_w,
                inject_index=None, truncation=trunc, retain=(tap,),
                stop_at=tap, s2d_tail=s2d_tail, act_dtype=act_dtype)
            return retained[tap].reshape(lat.shape[0], -1)
        return fn, (self.params, self.consts)

    # -- execution ----------------------------------------------------------
    def _run(self, x, stop_at: Optional[str]):
        styles = tuple(jnp.asarray(s) for s in (x if isinstance(x, list) else [x]))
        inject_index = None
        if len(styles) == 2:
            # Reference picks a random mix point per call (wrappers.py:207-214).
            inject_index = int(np.random.randint(1, self.cfg.n_latent))
        retain, edits, store = self._instrumentation()
        img, retained = self._jit_core(
            self.params, self.consts, styles, edits,
            input_is_w=self.w_primary, inject_index=inject_index,
            truncation=float(self.truncation), retain=retain, stop_at=stop_at,
            s2d_tail=self._s2d, act_dtype=synth_dtype_name())
        if store is not None:
            store(retained)
        return img

    def forward(self, x):
        img = self._run(x, stop_at=None)
        return 0.5 * (img + 1)

    def partial_forward(self, x, layer_name: str):
        self._run(x, stop_at=self.resolve_tap(layer_name))
        return None
