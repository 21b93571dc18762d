"""StyleGAN(1) generator (reference ``models/stylegan/model.py``, 455 LoC).

Functional JAX re-implementation of the reference's PyTorch port: equalized-lr
dense/conv layers (``model.py:26-104``), per-layer noise with pre-set buffers
(``model.py:106-122``), AdaIN style modulation (``model.py:124-136``),
instance norm epilogue (``model.py:230-253``), const-input block
(``model.py:256-281``), fused upscale+conv-transpose for >=128 px blocks
(``model.py:82-91``), and blocks keyed ``4x4 .. 1024x1024``
(``model.py:305-363``).  11 output classes at 256-1024 px
(reference ``models/wrappers.py:276-291``).

Tap names mirror the torch module paths the reference tests exercise
(``tests/partial_forward_test.py:63-72``), e.g.
``g_synthesis.blocks.128x128.conv0_up`` and
``g_synthesis.blocks.1024x1024.epi2.style_mod.lin``.

Parameters are stored flat under the reference checkpoint key names, so the
lernapparat-format ``.pt`` state dict imports as a direct copy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


from ganspace_tpu import sampling
from ganspace_tpu.models.base import BaseGenerator, TapState
from ganspace_tpu.ops import equal_linear, pixel_norm
from ganspace_tpu.ops.precision import get_precision
from ganspace_tpu.ops import s2d as s2d_ops

# Reference wrapper class->resolution table (wrappers.py:276-291).
CONFIGS = {
    "ffhq": 1024,
    "celebahq": 1024,
    "bedrooms": 256,
    "cars": 512,
    "cats": 256,
    "vases": 1024,
    "wikiart": 512,
    "fireworks": 512,
    "abstract": 512,
    "anime": 512,
    "ukiyo-e": 512,
}

N_BROADCAST_LATENTS = 18  # reference hardcodes 18 W slots (wrappers.py:361-362)


def _nf(stage: int, fmap_base: int = 8192, fmap_max: int = 512) -> int:
    return min(int(fmap_base / (2.0 ** stage)), fmap_max)


@dataclass(frozen=True)
class SG1Config:
    resolution: int = 1024
    w_dim: int = 512
    fmap_base: int = 8192
    fmap_max: int = 512

    @property
    def log_size(self) -> int:
        return int(math.log2(self.resolution))

    def block_names(self) -> Tuple[str, ...]:
        return tuple(f"{2**r}x{2**r}" for r in range(2, self.log_size + 1))

    def block_channels(self) -> Tuple[int, ...]:
        return tuple(min(int(self.fmap_base / (2.0 ** (r - 1))), self.fmap_max)
                     for r in range(2, self.log_size + 1))


def init_params(cfg: SG1Config, seed: int = 0) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    p: Dict[str, np.ndarray] = {}

    def lin(name, fan_in, fan_out, lrmul=1.0):
        p[f"{name}.weight"] = rs.randn(fan_out, fan_in).astype(np.float32) / lrmul
        p[f"{name}.bias"] = np.zeros((fan_out,), np.float32)

    def conv(name, cin, cout, k):
        p[f"{name}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32)
        p[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def epilogue(name, ch):
        p[f"{name}.top_epi.noise.weight"] = 0.1 * rs.randn(ch).astype(np.float32)
        lin(f"{name}.style_mod.lin", cfg.w_dim, 2 * ch)

    for i in range(8):
        lin(f"g_mapping.dense{i}", cfg.w_dim, cfg.w_dim, lrmul=0.01)

    names, chans = cfg.block_names(), cfg.block_channels()
    for bi, (bname, ch) in enumerate(zip(names, chans)):
        base = f"g_synthesis.blocks.{bname}"
        if bi == 0:
            p[f"{base}.const"] = np.ones((1, ch, 4, 4), np.float32)
            p[f"{base}.bias"] = np.ones((ch,), np.float32)
        else:
            conv(f"{base}.conv0_up", chans[bi - 1], ch, 3)
        epilogue(f"{base}.epi1", ch)
        conv(f"{base}.conv" if bi == 0 else f"{base}.conv1", ch, ch, 3)
        epilogue(f"{base}.epi2", ch)
    conv("g_synthesis.torgb", chans[-1], 3, 1)
    return p


# ---------------------------------------------------------------------------
# Pure ops
# ---------------------------------------------------------------------------

_BLUR_121 = np.array([1.0, 2.0, 1.0], np.float32)


def _conv2d(x, w, padding):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())


def _blur121(x):
    """Depthwise [1,2,1] blur, normalized, stride 1 (reference model.py:145-169)."""
    k = np.outer(_BLUR_121, _BLUR_121)
    k = k / k.sum()
    c = x.shape[1]
    kj = jnp.broadcast_to(jnp.asarray(k).reshape(1, 1, 3, 3), (c, 1, 3, 3)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, kj, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=get_precision())


def _upscale2d(x):
    n, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return x.reshape(n, c, 2 * h, 2 * w)


def _my_conv2d(params, name, x, *, gain=math.sqrt(2.0), upscale=False,
               blur_after=False, fused_ok=True):
    """MyConv2d (reference ``model.py:51-104``): equalized-lr conv with the
    fused upscale+conv-transpose path for output >= 128 px."""
    w = params[f"{name}.weight"]
    b = params[f"{name}.bias"]
    cout, cin, k, _ = w.shape
    w_mul = gain * ((cin * k * k) ** -0.5)
    wm = (w * w_mul).astype(x.dtype)

    if upscale and fused_ok:
        # Fused path (model.py:82-91): pad the 3x3 kernel to 4x4 by summing
        # four shifted copies, then stride-2 transpose conv with padding 1.
        wp = jnp.pad(wm, ((0, 0), (0, 0), (1, 1), (1, 1)))
        w4 = (wp[:, :, 1:, 1:] + wp[:, :, :-1, 1:]
              + wp[:, :, 1:, :-1] + wp[:, :, :-1, :-1])
        # torch conv_transpose(stride=2, padding=1, k=4) == lhs_dilation 2 with
        # padding k-1-p = 2 and a flipped kernel.
        y = lax.conv_general_dilated(
            x, jnp.flip(w4, (2, 3)), (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
    else:
        if upscale:
            x = _upscale2d(x)
        y = _conv2d(x, wm, k // 2)

    if blur_after:
        y = _blur121(y)
    return y + b.reshape(1, -1, 1, 1).astype(y.dtype), (upscale and not fused_ok)


# Space-to-depth tail threshold (see ``ops/s2d.py`` and the identical scheme
# in ``models/stylegan2.py``): blocks with <=64 channels (256px+ on the 1024
# models) run in (H/2, W/2, 4C) layout.  Entry requires the fused transpose
# path (res >= 128), which holds whenever channels have thinned this far.
S2D_MAX_CH = s2d_ops.S2D_MAX_CH


def _layer_epilogue_blk(params, name, x_blk, w_lat, noise_blk, ts: TapState):
    """Block-layout ``_layer_epilogue``: noise -> lrelu -> InstanceNorm ->
    StyleMod, with the instance statistics taken over all four phases."""
    b, h, w, f = x_blk.shape
    c = f // 4
    nw = params[f"{name}.top_epi.noise.weight"]
    y = x_blk.reshape(b, h, w, 4, c)
    y = y + noise_blk[None, :, :, :, None].astype(y.dtype) * nw.astype(y.dtype)
    x_blk = s2d_ops.tap_blocks(ts, f"{name}.top_epi.noise", y.reshape(b, h, w, f))
    if ts.stopped:
        return x_blk
    x = jnp.where(x_blk >= 0, x_blk, 0.2 * x_blk)
    # f32 statistics under bf16 storage (see _layer_epilogue).
    y = x.reshape(b, h, w, 4, c).astype(jnp.float32)
    mu = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(y, axis=(1, 2, 3), keepdims=True)
    y = ((y - mu) * lax.rsqrt(var + 1e-5)).astype(x.dtype)
    style = equal_linear(w_lat, params[f"{name}.style_mod.lin.weight"],
                         params[f"{name}.style_mod.lin.bias"], gain=1.0)
    style = ts.tap(f"{name}.style_mod.lin", style)
    if ts.stopped:
        return y.reshape(b, h, w, f)
    style = style.reshape(-1, 2, c)[:, :, None, None, None, :].astype(y.dtype)
    y = y * (style[:, 0] + 1.0) + style[:, 1]
    return s2d_ops.tap_blocks(ts, name, y.reshape(b, h, w, f))


def _layer_epilogue(params, name, x, w_lat, noise, ts: TapState):
    """NoiseLayer -> lrelu -> InstanceNorm -> StyleMod (model.py:230-253)."""
    nw = params[f"{name}.top_epi.noise.weight"]
    x = x + nw.reshape(1, -1, 1, 1).astype(x.dtype) * noise.astype(x.dtype)
    x = ts.tap(f"{name}.top_epi.noise", x)
    x = jnp.where(x >= 0, x, 0.2 * x)
    # InstanceNorm2d, affine=False, eps=1e-5 (model.py:241).  Statistics in
    # f32 even under bf16 activation storage: whole-map mean/var accumulated
    # in bf16 loses enough precision to visibly corrupt the normalization.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.var(xf, axis=(2, 3), keepdims=True)
    x = (((xf - mu) * lax.rsqrt(var + 1e-5))).astype(x.dtype)
    # StyleMod (model.py:124-136): gain-1 equalized linear -> scale/shift
    style = equal_linear(w_lat, params[f"{name}.style_mod.lin.weight"],
                         params[f"{name}.style_mod.lin.bias"], gain=1.0)
    style = ts.tap(f"{name}.style_mod.lin", style)
    ch = x.shape[1]
    style = style.reshape(-1, 2, ch, 1, 1).astype(x.dtype)
    x = x * (style[:, 0] + 1.0) + style[:, 1]
    return ts.tap(name, x)


def mapping_forward(params, z) -> jnp.ndarray:
    x = pixel_norm(z, axis=-1)
    for i in range(8):
        x = equal_linear(x, params[f"g_mapping.dense{i}.weight"],
                         params[f"g_mapping.dense{i}.bias"], lr_mul=0.01)
        x = jnp.where(x >= 0, x, 0.2 * x)
    return x


def synthesize(params, consts, styles, edits, *, cfg: SG1Config, input_is_w: bool,
               retain: Tuple[str, ...], stop_at: Optional[str],
               s2d_tail: bool = True, act_dtype: Optional[str] = None):
    ts = TapState(retain, edits, stop_at)
    dt = jnp.dtype(act_dtype) if act_dtype is not None else None

    if input_is_w:
        # Mapping is not executed, so its tap never fires (matches the
        # reference, where the hook lives on the un-called module).
        ws = [jnp.asarray(s) for s in styles]
    else:
        # The 'g_mapping' hook retains the per-call [B, 512] output
        # (wrappers.py:373-379), not the broadcast [B, 18, 512] tensor.
        ws = [ts.tap("g_mapping", mapping_forward(params, jnp.asarray(s)))
              for s in styles]

    if len(ws) == 1:
        latent = jnp.repeat(ws[0][:, None, :], N_BROADCAST_LATENTS, axis=1)
    else:
        assert len(ws) == N_BROADCAST_LATENTS, \
            f"Must provide 1 or {N_BROADCAST_LATENTS} latents"
        latent = jnp.stack(ws, axis=1)

    if stop_at == "g_mapping":
        return None, ts.retained
    latent = ts.tap("truncation", latent)  # identity: no truncation module
    if ts.stopped:
        return None, ts.retained

    # SG1 keeps f32 activations through the low-res stages even under bf16
    # storage: the epilogue instance-normalizes small fluctuations around a
    # large mean there, so bf16 INPUT rounding (not the statistics) destroys
    # the normalized signal.  The dtype engages at the space-to-depth entry,
    # where the memory win lives and spatial variance is healthy.
    noise = consts["noise"]
    names = cfg.block_names()
    chans = cfg.block_channels()
    batch = latent.shape[0]

    x = None
    in_blocks = False
    for bi, bname in enumerate(names):
        base = f"g_synthesis.blocks.{bname}"
        if bi == 0:
            const = params[f"{base}.const"]
            x = jnp.broadcast_to(const, (batch,) + const.shape[1:])
            x = x + params[f"{base}.bias"].reshape(1, -1, 1, 1).astype(x.dtype)
            x = _layer_epilogue(params, f"{base}.epi1", x, latent[:, 0], noise[bi], ts)
            if ts.stopped:
                return None, ts.retained
            x, _ = _my_conv2d(params, f"{base}.conv", x)
            x = ts.tap(f"{base}.conv", x)
            if ts.stopped:
                return None, ts.retained
        elif in_blocks or (s2d_tail and chans[bi] <= S2D_MAX_CH
                           and (2 ** (bi + 2)) >= 128):
            enter = not in_blocks
            wname = f"{base}.conv0_up"
            w = params[f"{wname}.weight"]
            wm = (w * (math.sqrt(2.0) * ((w.shape[1] * 9) ** -0.5))).astype(x.dtype)
            if enter:
                x = jnp.transpose(x, (0, 2, 3, 1))  # pixel NHWC at entry
                if dt is not None:
                    x = x.astype(dt)
                    wm = wm.astype(dt)
                in_blocks = True
            x = s2d_ops.sg1_upconv_blocks(x, wm, pixel_input=enter)
            x = x + jnp.tile(params[f"{wname}.bias"], 4).astype(x.dtype)
            x = s2d_ops.tap_blocks(ts, f"{base}.conv0_up", x)
            if ts.stopped:
                return None, ts.retained
            noise_blk = s2d_ops.noise_to_blocks(noise[bi])
            x = _layer_epilogue_blk(params, f"{base}.epi1", x,
                                    latent[:, 2 * bi], noise_blk, ts)
            if ts.stopped:
                return None, ts.retained
            w1 = params[f"{base}.conv1.weight"]
            wm1 = (w1 * (math.sqrt(2.0) * ((w1.shape[1] * 9) ** -0.5))).astype(x.dtype)
            x = s2d_ops.conv3x3_blocks(x, wm1)
            x = x + jnp.tile(params[f"{base}.conv1.bias"], 4).astype(x.dtype)
            x = s2d_ops.tap_blocks(ts, f"{base}.conv1", x)
            if ts.stopped:
                return None, ts.retained
            x = _layer_epilogue_blk(params, f"{base}.epi2", x,
                                    latent[:, 2 * bi + 1], noise_blk, ts)
            if ts.stopped:
                return None, ts.retained
            x = s2d_ops.tap_blocks(ts, base, x)
            if ts.stopped:
                return None, ts.retained
            continue
        else:
            # Fused transpose path only when output res >= 128 (model.py:82).
            fused = (2 ** (bi + 2)) >= 128
            x, _ = _my_conv2d(params, f"{base}.conv0_up", x, upscale=True,
                              blur_after=True, fused_ok=fused)
            if not fused:
                # The Upscale2d submodule runs as a separate stage here; its
                # tap only exists on this path (on the fused path the
                # upscaled tensor is never materialized — reference
                # model.py:82-93 skips the module entirely).
                pass
            x = ts.tap(f"{base}.conv0_up", x)
            if ts.stopped:
                return None, ts.retained
            x = _layer_epilogue(params, f"{base}.epi1", x, latent[:, 2 * bi], noise[bi], ts)
            if ts.stopped:
                return None, ts.retained
            x, _ = _my_conv2d(params, f"{base}.conv1", x)
            x = ts.tap(f"{base}.conv1", x)
            if ts.stopped:
                return None, ts.retained
        x = _layer_epilogue(params, f"{base}.epi2", x,
                            latent[:, 2 * bi + 1], noise[bi], ts)
        if ts.stopped:
            return None, ts.retained
        x = ts.tap(base, x)
        if ts.stopped:
            return None, ts.retained

    if in_blocks:
        w = params["g_synthesis.torgb.weight"]
        wm = (w * ((w.shape[1]) ** -0.5)).astype(x.dtype)
        rgb = s2d_ops.conv1x1_blocks(x, wm)
        rgb = rgb + jnp.tile(params["g_synthesis.torgb.bias"], 4).astype(rgb.dtype)
        rgb = s2d_ops.blocks_to_nchw(rgb)
    else:
        rgb, _ = _my_conv2d(params, "g_synthesis.torgb", x, gain=1.0)
    if rgb is not None and rgb.dtype != jnp.float32:
        rgb = rgb.astype(jnp.float32)
    rgb = ts.tap("g_synthesis.torgb", rgb)
    return rgb, ts.retained


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------

class StyleGAN(BaseGenerator):
    """Drop-in equivalent of the reference ``StyleGAN`` wrapper
    (``models/wrappers.py:270-436``)."""

    def __init__(self, class_name: Optional[str] = None, truncation: float = 1.0,
                 use_w: bool = False, cfg: Optional[SG1Config] = None,
                 params: Optional[Dict[str, np.ndarray]] = None, init_seed: int = 0):
        super().__init__("StyleGAN", class_name or "ffhq")
        if cfg is None:
            if self.outclass not in CONFIGS:
                raise ValueError(
                    f"Invalid StyleGAN class {self.outclass}, should be one of "
                    f"[{', '.join(CONFIGS)}]")
            cfg = SG1Config(resolution=CONFIGS[self.outclass])
        self.cfg = cfg
        self.resolution = cfg.resolution
        self.w_primary = use_w
        self.name = f"StyleGAN-{self.outclass}"
        self.has_latent_residual = True
        if params is None:
            # Local .pt, local TF pickle, or download-on-miss from the
            # reference's torch/TF source tables (wrappers.py:311-345).
            from ganspace_tpu.models import checkpoints as _ckpt
            found, rel = _ckpt.locate_stylegan(self.outclass, self.resolution)
            if found is not None and found.suffix == ".pkl":
                from ganspace_tpu.models.tf_import import import_stylegan_tf
                params = import_stylegan_tf(found)
            elif found is not None:
                from ganspace_tpu.models.torch_import import import_stylegan
                params = import_stylegan(found)
            else:
                _ckpt.note_random_init(self.name, rel)
                params = init_params(cfg, init_seed)
        self.params = jax.tree.map(jnp.asarray, params)
        self.set_noise_seed(0)
        self._s2d = s2d_ops.enabled()
        self._jit_core = partial(
            jax.jit, static_argnames=("input_is_w", "retain", "stop_at",
                                      "s2d_tail", "act_dtype"))(
            partial(synthesize, cfg=self.cfg))

    def latent_space_name(self):
        return "W" if self.w_primary else "Z"

    def use_w(self):
        self.w_primary = True

    def use_z(self):
        self.w_primary = False

    def get_max_latents(self):
        return N_BROADCAST_LATENTS

    def set_output_class(self, new_class):
        # None = "no preference": keep the current class.
        if new_class is not None and self.outclass != new_class:
            raise RuntimeError("StyleGAN: cannot change output class without reloading")

    def set_noise_seed(self, seed: int):
        # One noise buffer per resolution; BOTH epilogues of a block reuse it
        # (the reference reseeds torch per NoiseLayer with the same seed, so
        # same-shape buffers are identical — wrappers.py:420-436).
        noise = []
        for r in range(2, self.cfg.log_size + 1):
            rs = np.random.RandomState(seed)
            noise.append(jnp.asarray(rs.randn(1, 1, 2 ** r, 2 ** r).astype(np.float32)))
        self.consts = {"noise": tuple(noise)}

    def tap_names(self):
        names = ["g_mapping", "truncation"]
        for bi, bname in enumerate(self.cfg.block_names()):
            base = f"g_synthesis.blocks.{bname}"
            if bi == 0:
                names += [f"{base}.epi1.top_epi.noise", f"{base}.epi1.style_mod.lin",
                          f"{base}.epi1", f"{base}.conv",
                          f"{base}.epi2.top_epi.noise", f"{base}.epi2.style_mod.lin",
                          f"{base}.epi2", base]
            else:
                names += [f"{base}.conv0_up",
                          f"{base}.epi1.top_epi.noise", f"{base}.epi1.style_mod.lin",
                          f"{base}.epi1", f"{base}.conv1",
                          f"{base}.epi2.top_epi.noise", f"{base}.epi2.style_mod.lin",
                          f"{base}.epi2", base]
        names.append("g_synthesis.torgb")
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
        return mapping_forward(self.params, z)

    def _gaussian_latent_dim(self):
        return self.cfg.w_dim

    def _latents_from_gaussian(self, z):
        return self._map_to_w(z) if self.w_primary else z

    def latents_from_gaussian_p(self):
        if not self.w_primary:
            return (lambda pack, z: z), ()
        return (lambda params, z: mapping_forward(params, z)), self.params

    def pure_acts_fn_p(self, layer_name: str):
        """Pure tap function (weights as explicit operands) for the fused
        decomposition stream and the batch autotuner."""
        tap = self.resolve_tap(layer_name)
        cfg = self.cfg
        input_is_w = self.w_primary
        s2d_tail = self._s2d
        from ganspace_tpu.ops.precision import synth_dtype_name
        act_dtype = synth_dtype_name()

        def fn(pack, lat):
            params, consts = pack
            _, retained = synthesize(params, consts, (lat,), {}, cfg=cfg,
                                     input_is_w=input_is_w, retain=(tap,),
                                     stop_at=tap, s2d_tail=s2d_tail,
                                     act_dtype=act_dtype)
            return retained[tap].reshape(lat.shape[0], -1)
        return fn, (self.params, self.consts)

    def _run(self, x, stop_at):
        styles = tuple(jnp.asarray(s) for s in (x if isinstance(x, list) else [x]))
        retain, edits, store = self._instrumentation()
        from ganspace_tpu.ops.precision import synth_dtype_name
        img, retained = self._jit_core(self.params, self.consts, styles, edits,
                                       input_is_w=self.w_primary,
                                       retain=retain, stop_at=stop_at,
                                       s2d_tail=self._s2d,
                                       act_dtype=synth_dtype_name())
        if store is not None:
            store(retained)
        return img

    def forward(self, x):
        return 0.5 * (self._run(x, None) + 1)

    def partial_forward(self, x, layer_name):
        self._run(x, self.resolve_tap(layer_name))
        return None
