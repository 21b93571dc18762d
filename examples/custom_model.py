"""Bring-your-own-generator walkthrough
(the custom-model-import part of the reference's ``Ganspace_colab.ipynb``).

The reference imports arbitrary torch.hub / checkpointed ``nn.Module``
generators and hooks their layers; here a custom generator is a **pure,
stage-indexed synthesis function** — taps come from threading a
:class:`~ganspace_tpu.models.base.TapState` through it, and partial_forward
falls out of jit-specializing on ``stop_at`` (XLA dead-code-eliminates every
stage after the tap).  Once wrapped in :class:`BaseGenerator` and registered,
every CLI, estimator, edit mode, and server in the framework works on it.

    python examples/custom_model.py [--n 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ganspace_tpu import sampling
from ganspace_tpu.models.base import BaseGenerator, TapState


# ---------------------------------------------------------------------------
# 1. The generator: config + params + a pure synthesis function
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ToyConfig:
    z_dim: int = 64
    width: int = 256
    resolution: int = 32        # output is [B, 3, res, res]


def init_params(cfg: ToyConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    half = cfg.resolution // 2
    return {
        "fc1.weight": (rs.randn(cfg.z_dim, cfg.width) / np.sqrt(cfg.z_dim)
                       ).astype(np.float32),
        "fc2.weight": (rs.randn(cfg.width, 16 * half * half) /
                       np.sqrt(cfg.width)).astype(np.float32),
        "rgb.weight": (0.1 * rs.randn(16, 3, 3, 3)).astype(np.float32),
    }


def synthesize(params, z, edits, *, cfg: ToyConfig,
               retain: Tuple[str, ...], stop_at: Optional[str]):
    """fc1 -> fc2 -> reshape to a feature map -> 2x upsample -> 3x3 to RGB.

    Each stage ends in ``ts.tap(name, x)``: that single line gives this
    model retention (``retain_layer``), activation edits (``edit_layer``),
    and compiler-DCE partial_forward (``stop_at``) — the three reference
    mechanisms (``nethook.py:15``, ``wrappers.py:40-42``) with no hooks.
    """
    ts = TapState(retain, edits, stop_at)
    half = cfg.resolution // 2
    x = jnp.tanh(z @ params["fc1.weight"].astype(z.dtype))
    x = ts.tap("fc1", x)
    if ts.stopped:
        return None, ts.retained
    x = jnp.tanh(x @ params["fc2.weight"].astype(z.dtype))
    x = x.reshape(x.shape[0], 16, half, half)
    x = ts.tap("fc2", x)
    if ts.stopped:
        return None, ts.retained
    x = jax.image.resize(x, (*x.shape[:2], cfg.resolution, cfg.resolution),
                         "nearest")
    x = jax.lax.conv_general_dilated(
        x, params["rgb.weight"].astype(z.dtype).transpose(1, 0, 2, 3),
        (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jnp.tanh(x)
    x = ts.tap("output", x)
    return x, ts.retained


# ---------------------------------------------------------------------------
# 2. The wrapper: BaseGenerator surface over the pure function
# ---------------------------------------------------------------------------

class ToyGenerator(BaseGenerator):
    def __init__(self, class_name=None, cfg: Optional[ToyConfig] = None,
                 seed: int = 0, **_):
        super().__init__("ToyGAN", class_name or "default")
        self.cfg = cfg or ToyConfig()
        self.name = "ToyGAN"
        self.has_latent_residual = False
        self.params = jax.tree.map(jnp.asarray, init_params(self.cfg, seed))
        self._jit_core = partial(jax.jit, static_argnames=("retain", "stop_at"))(
            partial(synthesize, cfg=self.cfg))

    def tap_names(self):
        return ("fc1", "fc2", "output")

    def sample_latent(self, n_samples=1, seed=0, truncation=None):
        if seed is None:
            seed = np.random.randint(np.iinfo(np.int32).max)
        return jnp.asarray(
            sampling.gaussian_latents(n_samples, self.cfg.z_dim, seed))

    def _run(self, x, stop_at):
        if isinstance(x, list):
            x = x[0]
        retain, edits, store = self._instrumentation()
        img, retained = self._jit_core(self.params, jnp.asarray(x), edits,
                                       retain=retain, stop_at=stop_at)
        if store is not None:
            store(retained)
        return img

    def forward(self, x):
        return 0.5 * (self._run(x, None) + 1)

    def partial_forward(self, x, layer_name):
        # True early exit: jit specializes on stop_at, XLA drops later stages.
        self._run(x, self.resolve_tap(layer_name))


# ---------------------------------------------------------------------------
# 3. Register it and drive the standard pipeline
# ---------------------------------------------------------------------------

def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("-c", "--components", type=int, default=4)
    p.add_argument("--outdir", default=None)
    args = p.parse_args(argv)

    outdir = Path(args.outdir or tempfile.mkdtemp(prefix="ganspace_custom_"))
    os.environ.setdefault("GANSPACE_OUTPUT_DIR", str(outdir))

    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.edit import create_strip_centered
    from ganspace_tpu.models import (get_instrumented_model, register_model,
                                     unregister_model)

    register_model("ToyGAN", ToyGenerator)
    try:
        inst = get_instrumented_model("ToyGAN", None, "fc2")
        print(f"feature shapes: {dict(inst.feature_shape)}")

        cfg = Config(model="ToyGAN", layer="fc2", estimator="ipca",
                     components=args.components, n=args.n, batch_size=128)
        npz_path = get_or_compute(cfg, inst)
        data = np.load(npz_path)
        print(f"components: {npz_path.name}  "
              f"var_ratio={np.round(data['var_ratio'], 3).tolist()}")

        z = inst.model.sample_latent(1, seed=5)
        frames = create_strip_centered(
            inst, "activation", "fc2", [z],
            data["act_comp"][:1], data["lat_comp"][:1],
            data["act_stdev"][:1], data["lat_stdev"][:1],
            data["act_mean"], data["lat_mean"],
            sigma=2.0, layer_start=0, layer_end=1, num_frames=5)[0]
        strip = np.hstack([np.asarray(f) for f in frames])
        try:
            from PIL import Image
            out = outdir / "toygan_component0_strip.png"
            Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)
                            ).save(out)
            print(f"edit strip: {out}")
        except ImportError:
            print("PIL unavailable; skipped strip PNG")
    finally:
        unregister_model("ToyGAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
