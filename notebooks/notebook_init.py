"""Shared setup for the figure-reproduction scripts
(reference ``notebooks/notebook_init.py``).

``setup(model, layer, ...)`` returns a populated namespace: instrumented
model, computed (or cached) components as device arrays, and the strip/grid
helpers — everything the reference notebooks import, through this
framework's public API only (``get_instrumented_model``, ``get_or_compute``,
``create_strip(_centered)``, ``save_frames``, ``sample_np``, ``edit_layer``
— the exact surface the reference notebooks consume, SURVEY.md §2.6).

All scripts accept ``--tiny`` to run on randomly-initialized reduced models
(no checkpoints, <1 min each) so the whole suite is reproducible offline;
with imported checkpoints the same scripts regenerate the paper figures.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

# importable without installing the package (scripts run from anywhere)
_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax.numpy as jnp

from ganspace_tpu.config import Config
from ganspace_tpu.decomposition import get_or_compute
from ganspace_tpu.edit import create_strip, create_strip_centered, save_frames  # noqa: F401  (re-export)
from ganspace_tpu.models import get_instrumented_model


OUTDIR = Path(os.environ.get("GANSPACE_FIGURE_DIR", "out/figures"))


def tiny_overrides(model: str) -> dict:
    """Reduced configs for checkpoint-free runs."""
    if model == "StyleGAN2":
        from ganspace_tpu.models.stylegan2 import SG2Config
        return {"cfg": SG2Config(
            resolution=64,
            channels=((4, 128), (8, 128), (16, 64), (32, 64), (64, 32)))}
    if model == "StyleGAN":
        from ganspace_tpu.models.stylegan import SG1Config
        return {"cfg": SG1Config(resolution=64, fmap_base=512)}
    if "BigGAN" in model:
        from ganspace_tpu.models.biggan import BigGANConfig
        return {"cfg": BigGANConfig(
            output_dim=64, z_dim=32, channel_width=16,
            layers=((False, 16, 16), (True, 16, 8), (True, 8, 8),
                    (True, 8, 4), (True, 4, 2)),
            attention_layer_position=3)}
    if model == "ProGAN":
        from ganspace_tpu.models.proggan import ProGANConfig
        return {"cfg": ProGANConfig(sizes=(128, 64, 64, 32, 16))}
    if model == "DCGAN":
        from ganspace_tpu.models.dcgan import DCGANConfig
        return {"cfg": DCGANConfig(resolution=32, base_channels=64)}
    return {}


def parse_args(argv=None, **defaults):
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true",
                   help="random-init reduced model, no checkpoint")
    p.add_argument("--model", default=defaults.get("model", "StyleGAN2"))
    p.add_argument("--class", dest="output_class",
                   default=defaults.get("output_class"))
    p.add_argument("--layer", default=defaults.get("layer", "style"))
    p.add_argument("--n", type=int, default=defaults.get("n", 2048))
    p.add_argument("--components", "-c", type=int,
                   default=defaults.get("components", 16))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--outdir", default=None)
    return p.parse_args(argv)


def setup(args, use_w: bool = True, estimator: str = "ipca"):
    """Model + components namespace shared by every figure script."""
    kwargs = tiny_overrides(args.model) if args.tiny else {}
    inst = get_instrumented_model(args.model, args.output_class, args.layer,
                                  use_w=use_w, **kwargs)
    model = inst.model
    if use_w and hasattr(model, "use_w"):
        model.use_w()

    cfg = Config(model=args.model, output_class=args.output_class,
                 layer=args.layer, estimator=estimator,
                 components=args.components, n=args.n, use_w=use_w,
                 seed=args.seed if args.seed else None)
    dump = get_or_compute(cfg, inst)
    data = np.load(dump, allow_pickle=False)
    # Skip non-numeric sidecar keys (e.g. the _meta provenance string).
    t = SimpleNamespace(**{k: jnp.asarray(data[k]) for k in data.files
                           if np.issubdtype(data[k].dtype, np.number)})
    data.close()

    outdir = Path(args.outdir) if args.outdir else OUTDIR
    outdir.mkdir(parents=True, exist_ok=True)
    return SimpleNamespace(inst=inst, model=model, cfg=cfg, comps=t,
                           outdir=outdir)


def save_figure_grid(rows, outpath, pad: int = 2):
    """Stack rows of HWC float images into one PNG."""
    from PIL import Image

    from ganspace_tpu.utils import pad_frames, to_uint8
    strips = [np.hstack(pad_frames([np.atleast_3d(f) for f in row]))
              for row in rows]
    w = max(s.shape[1] for s in strips)
    strips = [np.pad(s, ((0, 0), (0, w - s.shape[1]), (0, 0)),
                     constant_values=1.0) for s in strips]
    grid = np.vstack(strips)
    Path(outpath).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8(grid)).save(outpath)
    print(f"wrote {outpath}")
    return outpath
