"""Per-unit top-activating sample grids for a whole layer
(reference ``netdissect/tool/allunitsample.py``).

    python -m ganspace_tpu.tools.allunitsample --model DCGAN --layer deconv1 \
        --samples 128 --outdir out/units [--topk 6]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m ganspace_tpu.tools.allunitsample")
    p.add_argument("--model", default="DCGAN")
    p.add_argument("--class", dest="output_class", default=None)
    p.add_argument("--layer", required=True)
    p.add_argument("--samples", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--topk", type=int, default=6)
    p.add_argument("--outdir", default="out/units")
    args = p.parse_args(argv)

    from ganspace_tpu.dissection import tally_stats
    from ganspace_tpu.dissection.dissect import regenerate_sample
    from ganspace_tpu.models import get_instrumented_model
    from ganspace_tpu.native import ImageWriterPool
    from ganspace_tpu.utils import to_uint8

    inst = get_instrumented_model(args.model, args.output_class, args.layer)
    model = inst.model
    stats = tally_stats(inst, args.layer, n_samples=args.samples,
                        batch=args.batch, seed=args.seed, k_top=args.topk)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    with ImageWriterPool(4) as pool:
        for u in range(stats["units"]):
            imgs = []
            for s in stats["topk_samples"][u][:args.topk]:
                # Batch-aligned regeneration: index s lives in the batch
                # drawn with seed + (s//batch)*batch, not seed + s.
                z = regenerate_sample(model, s, seed=args.seed,
                                      batch=args.batch, n_samples=args.samples)
                img = np.asarray(model.forward(z))[0]
                imgs.append(np.clip(np.transpose(img, (1, 2, 0)), 0, 1))
            pool.save_png(outdir / f"unit_{u:04d}.png",
                          to_uint8(np.hstack(imgs)))
        pool.wait()
    from ganspace_tpu.tools.lightbox import write_lightbox
    write_lightbox(outdir, title=f"{args.model}/{args.layer} top samples")
    print(f"wrote {stats['units']} unit grids to {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
