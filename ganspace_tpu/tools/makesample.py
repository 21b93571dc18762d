"""Sample images from a generator to PNG files
(reference ``netdissect/tool/makesample.py``).

    python -m ganspace_tpu.tools.makesample --model DCGAN --size 32 \
        --outdir out/samples [--seed 1] [--batch 16] [--class NAME]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m ganspace_tpu.tools.makesample")
    p.add_argument("--model", default="DCGAN")
    p.add_argument("--class", dest="output_class", default=None)
    p.add_argument("--size", type=int, default=100, help="number of images")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--truncation", type=float, default=None)
    p.add_argument("--outdir", default="out/samples")
    args = p.parse_args(argv)

    from ganspace_tpu.models import get_model
    from ganspace_tpu.native import ImageWriterPool
    from ganspace_tpu.utils import to_uint8

    model = get_model(args.model, args.output_class)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    with ImageWriterPool(4) as pool:
        done = 0
        while done < args.size:
            b = min(args.batch, args.size - done)
            z = model.sample_latent(b, seed=args.seed + done,
                                    truncation=args.truncation)
            imgs = np.clip(np.transpose(
                np.asarray(model.forward(z)), (0, 2, 3, 1)), 0, 1)
            for i in range(b):
                pool.save_png(outdir / f"image_{done + i:05d}.png",
                              to_uint8(imgs[i]))
            done += b
        pool.wait()
    from ganspace_tpu.tools.lightbox import write_lightbox
    write_lightbox(outdir, title=f"{args.model} samples")
    print(f"wrote {args.size} samples to {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
