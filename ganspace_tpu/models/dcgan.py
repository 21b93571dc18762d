"""DCGAN generator in the pytorch_GAN_zoo style (reference ``GANZooModel``).

The reference loads ``facebookresearch/pytorch_GAN_zoo`` over torch.hub
(reference ``models/wrappers.py:438-466``); that path needs network access,
so here the same architecture (transposed-conv DCGAN trunk) is built locally
with importable weights.  Reference behaviours kept: no true partial_forward
(falls back to a full forward, ``wrappers.py:453-455``) and the last 20 latent
dimensions acting as the conditioning slice (``wrappers.py:457-461``).
"""

from __future__ import annotations

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


@dataclass(frozen=True)
class DCGANConfig:
    latent_dim: int = 120
    cond_dim: int = 20          # last 20 dims = conditioning (wrappers.py:457-461)
    base_channels: int = 512
    resolution: int = 64

    @property
    def z_total(self) -> int:
        return self.latent_dim + self.cond_dim


def init_params(cfg: DCGANConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    p: Dict[str, np.ndarray] = {}
    n_up = int(np.log2(cfg.resolution // 4))
    cin = cfg.z_total
    ch = cfg.base_channels
    for i in range(n_up + 1):
        cout = 3 if i == n_up else max(ch >> i, 32)
        k = 4
        p[f"deconv{i}.weight"] = (0.02 * rs.randn(cin, cout, k, k)).astype(np.float32)
        p[f"deconv{i}.bias"] = np.zeros((cout,), np.float32)
        if i != n_up:
            p[f"bn{i}.weight"] = np.ones((cout,), np.float32)
            p[f"bn{i}.bias"] = np.zeros((cout,), np.float32)
            # torch BatchNorm2d running stats (identity at fresh init);
            # imported checkpoints overwrite these with trained values.
            p[f"bn{i}.running_mean"] = np.zeros((cout,), np.float32)
            p[f"bn{i}.running_var"] = np.ones((cout,), np.float32)
        cin = cout
    return p


def synthesize(params, z, edits, *, cfg: DCGANConfig,
               retain: Tuple[str, ...], stop_at: Optional[str]):
    ts = TapState(retain, edits, stop_at)
    n_up = int(np.log2(cfg.resolution // 4))
    x = z.reshape(z.shape[0], -1, 1, 1)
    for i in range(n_up + 1):
        w = params[f"deconv{i}.weight"].astype(x.dtype)   # [in, out, k, k]
        # torch ConvTranspose2d(k=4, stride=2, pad=1) (stride 1 pad 0 for the
        # first, 1x1 -> 4x4): lhs_dilation + flipped, transposed kernel.
        kernel = jnp.flip(w, (2, 3)).transpose(1, 0, 2, 3)
        if i == 0:
            y = lax.conv_general_dilated(
                x, kernel, (1, 1), ((3, 3), (3, 3)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
        else:
            y = lax.conv_general_dilated(
                x, kernel, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=get_precision())
        y = y + params[f"deconv{i}.bias"].reshape(1, -1, 1, 1)
        if i != n_up:
            # Eval-mode BatchNorm, as the reference runs it (model.eval(),
            # wrappers.py:696): RUNNING statistics, never batch statistics —
            # a sample's activations must not depend on its batch-mates
            # (fresh init: identity stats, matching torch's defaults).
            mu = params.get(f"bn{i}.running_mean",
                            np.zeros((y.shape[1],), np.float32))
            var = params.get(f"bn{i}.running_var",
                             np.ones((y.shape[1],), np.float32))
            mu = jnp.asarray(mu, y.dtype).reshape(1, -1, 1, 1)
            var = jnp.asarray(var, y.dtype).reshape(1, -1, 1, 1)
            y = (y - mu) * lax.rsqrt(var + 1e-5)
            y = y * params[f"bn{i}.weight"].reshape(1, -1, 1, 1) \
                + params[f"bn{i}.bias"].reshape(1, -1, 1, 1)
            y = jax.nn.relu(y)
            y = ts.tap(f"deconv{i}", y)
        else:
            y = jnp.tanh(y)
            y = ts.tap("output", y)
        if ts.stopped:
            return None, ts.retained
        x = y
    return x, ts.retained


class GANZooModel(BaseGenerator):
    def __init__(self, model_name: str = "DCGAN", cfg: Optional[DCGANConfig] = None,
                 params: Optional[Dict[str, np.ndarray]] = None, init_seed: int = 0):
        super().__init__(model_name, "default")
        if params is None and cfg is None:
            # pytorch_GAN_zoo checkpoint (the torch.hub format the reference
            # loads, wrappers.py:438-466): local file or download-on-miss,
            # architecture inferred from the checkpoint itself.
            from ganspace_tpu.models import checkpoints as _ckpt
            found, rel = _ckpt.locate_ganzoo(model_name)
            if found is not None:
                from ganspace_tpu.models.torch_import import import_ganzoo_dcgan
                params, cfg = import_ganzoo_dcgan(found)
            else:
                _ckpt.note_random_init(model_name, rel)
        self.cfg = cfg or DCGANConfig()
        self.resolution = self.cfg.resolution
        self.name = model_name
        self.has_latent_residual = False
        self.params = jax.tree.map(
            jnp.asarray, params if params is not None else init_params(self.cfg, init_seed))
        self._jit_core = partial(jax.jit, static_argnames=("retain", "stop_at"))(
            partial(synthesize, cfg=self.cfg))

    def tap_names(self):
        n_up = int(np.log2(self.cfg.resolution // 4))
        return tuple(f"deconv{i}" for i in range(n_up)) + ("output",)

    def sample_latent(self, n_samples=1, seed=0, truncation=None):
        if seed is None:
            seed = np.random.randint(np.iinfo(np.int32).max)
        return jnp.asarray(
            sampling.gaussian_latents(n_samples, self.cfg.z_total, seed))

    def _gaussian_latent_dim(self):
        return self.cfg.z_total

    def get_conditional_state(self, z):
        return z[:, -self.cfg.cond_dim:]

    def set_conditional_state(self, z, c):
        return jnp.concatenate([z[:, :-self.cfg.cond_dim], c], axis=1)

    def pure_acts_fn_p(self, layer_name: str):
        """Pure tap function (weights as explicit operands) for the fused
        decomposition stream and the batch autotuner."""
        tap = self.resolve_tap(layer_name)
        if tap == "output":
            return None          # full forward needed; use the generic loop
        cfg = self.cfg

        def fn(params, z):
            _, retained = synthesize(params, z, {}, cfg=cfg, retain=(tap,),
                                     stop_at=tap)
            return retained[tap].reshape(z.shape[0], -1)
        return fn, self.params

    def _run(self, x, stop_at):
        if isinstance(x, list):
            assert len(x) == 1, "DCGAN only supports a single global latent"
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
        # Reference: "Don't bother for now" — full forward (wrappers.py:453-455),
        # but retention still lands at the hooked tap.
        return self._run(x, None)
