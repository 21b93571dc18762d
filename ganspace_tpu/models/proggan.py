"""Progressive GAN generator (reference ``netdissect/proggan.py``, 299 LoC).

Sequential pixel-norm / wscale-conv / lrelu column with nearest-neighbour
upsampling every other layer (reference ``proggan.py:98-171``), resolution ->
channel-schedule table (``proggan.py:61-69``), and the GANDissect LSUN
checkpoints' layer naming: ``layer1 .. layerN`` plus ``output_KxK``
(``proggan.py:70-88``).  Seven LSUN classes (reference ``wrappers.py:474-491``).
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
from ganspace_tpu.ops.precision import get_precision
from ganspace_tpu.ops.upfirdn import nearest_upsample2x
from ganspace_tpu.ops import s2d as s2d_ops

VALID_CLASSES = ["bedroom", "churchoutdoor", "conferenceroom", "diningroom",
                 "kitchen", "livingroom", "restaurant"]

# Resolution -> feature-depth schedule (reference proggan.py:61-69).
SIZES_FOR_RESOLUTION = {
    8: [512, 512, 512],
    16: [512, 512, 512, 512],
    32: [512, 512, 512, 512, 256],
    64: [512, 512, 512, 512, 256, 128],
    128: [512, 512, 512, 512, 256, 128, 64],
    256: [512, 512, 512, 512, 256, 128, 64, 32],
    1024: [512, 512, 512, 512, 512, 256, 128, 64, 32, 16],
}


@dataclass(frozen=True)
class ProGANConfig:
    sizes: Tuple[int, ...]

    @classmethod
    def for_resolution(cls, resolution: int) -> "ProGANConfig":
        return cls(tuple(SIZES_FOR_RESOLUTION[resolution]))

    def layer_plan(self):
        """[(name, cin, cout, kernel, pad, upsample)] mirroring proggan.py:72-87."""
        s = self.sizes
        plan = [("layer1", s[0], s[1], 4, 3, False),
                ("layer2", s[1], s[1], 3, 1, False)]
        idx = 3
        for si, so in zip(s[1:-1], s[2:]):
            plan.append((f"layer{idx}", si, so, 3, 1, True))
            plan.append((f"layer{idx + 1}", so, so, 3, 1, False))
            idx += 2
        dim = 4 * (2 ** (len(plan) // 2 - 1))
        plan.append((f"output_{dim}x{dim}", s[-1], 3, 1, 0, False))
        return plan


def init_params(cfg: ProGANConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    p: Dict[str, np.ndarray] = {}
    for name, cin, cout, k, _, _ in cfg.layer_plan():
        p[f"{name}.conv.weight"] = rs.randn(cout, cin, k, k).astype(np.float32)
        p[f"{name}.wscale.b"] = 0.1 * rs.randn(cout).astype(np.float32)
    return p


def _pixel_norm_nchw(x):
    # proggan.py:102-103: x / sqrt(mean(x^2, dim=1) + 1e-8)
    return x * jnp.reciprocal(
        jnp.sqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + 1e-8))


# The block-layout (space-to-depth) tail enters at the first up-conv whose
# output channels drop to or below this — see ``ops/s2d.py``; ProGAN tails
# thin out to C=16-64 where the plain NCHW conv runs ~10-30x off roofline.
S2D_MAX_CH = s2d_ops.S2D_MAX_CH


def synthesize(params, z, edits, *, cfg: ProGANConfig,
               retain: Tuple[str, ...], stop_at: Optional[str],
               s2d_tail: bool = True, act_dtype: Optional[str] = None):
    ts = TapState(retain, edits, stop_at)
    dt = jnp.dtype(act_dtype) if act_dtype is not None else None
    x = z.reshape(z.shape[0], z.shape[1], 1, 1)
    if dt is not None:
        x = x.astype(dt)
    plan = cfg.layer_plan()
    in_blocks = False
    for li, (name, cin, cout, k, pad, up) in enumerate(plan):
        is_output = li == len(plan) - 1
        enter = (s2d_tail and not in_blocks and up and k == 3
                 and cout <= S2D_MAX_CH)
        if in_blocks or enter:
            w = params[f"{name}.conv.weight"].astype(x.dtype)
            if enter:
                x = jnp.transpose(x, (0, 2, 3, 1))  # pixel NHWC at entry
                x = x * jnp.reciprocal(jnp.sqrt(
                    jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8))
                x = s2d_ops.nearestup_conv_blocks(x, w, pixel_input=True)
                in_blocks = True
            else:
                x = s2d_ops.pixel_norm_blocks(x)
                if up:
                    x = s2d_ops.nearestup_conv_blocks(x, w)
                elif k == 3:
                    x = s2d_ops.conv3x3_blocks(x, w)
                else:  # 1x1 output conv
                    x = s2d_ops.conv1x1_blocks(x, w)
            gain = 1.0 if is_output else math.sqrt(2.0) / k
            b = params[f"{name}.wscale.b"].astype(x.dtype)
            x = x * jnp.asarray(gain / math.sqrt(cin), x.dtype) + jnp.tile(b, 4)
            if not is_output:
                x = jnp.where(x >= 0, x, 0.2 * x)
            x = s2d_ops.tap_blocks(ts, name, x)
            if ts.stopped:
                return None, ts.retained
        else:
            x = _pixel_norm_nchw(x)
            if up:
                x = nearest_upsample2x(x)
            w = params[f"{name}.conv.weight"].astype(x.dtype)
            x = lax.conv_general_dilated(
                x, w, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
            # WScaleLayer (proggan.py:110-121): gain/sqrt(fan_in) with
            # gain = sqrt(2)/kernel_size for conv blocks, 1 for the output block.
            gain = 1.0 if is_output else math.sqrt(2.0) / k
            scale = gain / math.sqrt(cin)
            b = params[f"{name}.wscale.b"].astype(x.dtype)
            x = x * jnp.asarray(scale, x.dtype) + b.reshape(1, -1, 1, 1)
            if not is_output:
                x = jnp.where(x >= 0, x, 0.2 * x)
            x = ts.tap(name, x)
            if ts.stopped:
                return None, ts.retained
    if in_blocks:
        x = s2d_ops.blocks_to_nchw(x)
    if dt is not None and x is not None:
        x = x.astype(jnp.float32)
    return x, ts.retained


class ProGAN(BaseGenerator):
    """Drop-in equivalent of the reference ``ProGAN`` wrapper
    (``models/wrappers.py:469-522``)."""

    def __init__(self, lsun_class: Optional[str] = None, resolution: int = 256,
                 cfg: Optional[ProGANConfig] = None,
                 params: Optional[Dict[str, np.ndarray]] = None, init_seed: int = 0):
        super().__init__("ProGAN", lsun_class)
        if self.outclass is not None and self.outclass not in VALID_CLASSES:
            raise ValueError(
                f"Invalid LSUN class {self.outclass}, should be one of {VALID_CLASSES}")
        if cfg is None and params is None:
            # Local .pth, TF-era .pkl, or GANDissect download-on-miss
            # (wrappers.py:484-491).
            from ganspace_tpu.models import checkpoints as _ckpt
            found, rel = _ckpt.locate_progan(self.outclass)
            if found is not None and found.suffix == ".pkl":
                from ganspace_tpu.models.tf_import import import_progan_tf
                params, sizes = import_progan_tf(found)
                cfg = ProGANConfig(sizes)
            elif found is not None:
                from ganspace_tpu.models.torch_import import import_progan
                params, sizes = import_progan(found)
                cfg = ProGANConfig(sizes)
            else:
                _ckpt.note_random_init(f"ProGAN-{self.outclass}", rel)
        self.cfg = cfg or ProGANConfig.for_resolution(resolution)
        self.resolution = 4 * 2 ** (len(self.cfg.sizes) - 2)
        self.name = f"ProGAN-{self.outclass}"
        self.has_latent_residual = False
        self.params = jax.tree.map(
            jnp.asarray, params if params is not None else init_params(self.cfg, init_seed))
        self._s2d = s2d_ops.enabled()
        self._jit_core = partial(
            jax.jit, static_argnames=("retain", "stop_at", "s2d_tail",
                                      "act_dtype"))(
            partial(synthesize, cfg=self.cfg))

    def tap_names(self):
        return tuple(name for name, *_ in self.cfg.layer_plan())

    def sample_latent(self, n_samples=1, seed=None, truncation=None):
        if seed is None:
            seed = np.random.randint(np.iinfo(np.int32).max)
        # zdataset.z_sample_for_model semantics (netdissect/zdataset.py:26-40).
        return jnp.asarray(sampling.gaussian_latents(n_samples, self.cfg.sizes[0], seed))

    def _gaussian_latent_dim(self):
        return self.cfg.sizes[0]

    def pure_acts_fn_p(self, layer_name: str):
        """Pure tap function (weights as explicit operands) for the fused
        decomposition stream and the batch autotuner."""
        tap = self.resolve_tap(layer_name)
        cfg = self.cfg

        s2d_tail = self._s2d
        from ganspace_tpu.ops.precision import synth_dtype_name
        act_dtype = synth_dtype_name()

        def fn(params, z):
            _, retained = synthesize(params, z, {}, cfg=cfg, retain=(tap,),
                                     stop_at=tap, s2d_tail=s2d_tail,
                                     act_dtype=act_dtype)
            return retained[tap].reshape(z.shape[0], -1)
        return fn, self.params

    def _run(self, x, stop_at):
        if isinstance(x, list):
            assert len(x) == 1, "ProGAN only supports a single global latent"
            x = x[0]
        retain, edits, store = self._instrumentation()
        from ganspace_tpu.ops.precision import synth_dtype_name
        img, retained = self._jit_core(self.params, jnp.asarray(x), edits,
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
