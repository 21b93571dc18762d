"""Generate images and write segmentation visualizations
(reference ``netdissect/tool/ganseg.py``).

    python -m ganspace_tpu.tools.ganseg --model DCGAN --size 16 \
        --outdir out/ganseg [--segmenter color|unified]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m ganspace_tpu.tools.ganseg")
    p.add_argument("--model", default="DCGAN")
    p.add_argument("--class", dest="output_class", default=None)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--segmenter", choices=("color", "unified"),
                   default="color")
    p.add_argument("--outdir", default="out/ganseg")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ganspace_tpu.dissection import ColorSegmenter, UnifiedParsingSegmenter
    from ganspace_tpu.dissection.viz import segment_visualization
    from ganspace_tpu.models import get_model
    from ganspace_tpu.native import ImageWriterPool
    from ganspace_tpu.utils import to_uint8

    model = get_model(args.model, args.output_class)
    seg = ColorSegmenter() if args.segmenter == "color" \
        else UnifiedParsingSegmenter()
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    with ImageWriterPool(4) as pool:
        done = 0
        while done < args.size:
            b = min(args.batch, args.size - done)
            z = model.sample_latent(b, seed=args.seed + done)
            imgs = model.forward(z)
            segmap = np.asarray(seg.segment_batch(jnp.clip(imgs, 0, 1)))
            imgs_np = np.clip(np.transpose(np.asarray(imgs), (0, 2, 3, 1)), 0, 1)
            for i in range(b):
                rgb = segment_visualization(segmap[i])
                side = np.hstack([imgs_np[i], rgb])
                pool.save_png(outdir / f"ganseg_{done + i:05d}.png",
                              to_uint8(side))
            done += b
        pool.wait()
    from ganspace_tpu.tools.lightbox import write_lightbox
    write_lightbox(outdir, title=f"{args.model} segmentations")
    print(f"wrote {args.size} image|segmentation pairs to {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
