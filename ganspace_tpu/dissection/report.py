"""Dissection report generation (reference ``dissection.py:174-500, 1371``).

Writes the JSON report, an SVG IoU bargraph, per-unit top-image grids
(through the native async writer pool) and a static HTML viewer — the
offline equivalents of the reference's ``generate_report`` /
``make_svg_bargraph`` / ``dissect.html``.
"""

from __future__ import annotations

import html
import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ganspace_tpu.models.base import InstrumentedModel
from ganspace_tpu.native import ImageWriterPool
from ganspace_tpu.utils import to_uint8


def make_svg_bargraph(names, values, width: int = 640, bar_h: int = 16) -> str:
    """Horizontal IoU bargraph (reference ``make_svg_bargraph``,
    ``dissection.py:1371``)."""
    vmax = max(values) if len(values) else 1.0
    rows = []
    for i, (name, val) in enumerate(zip(names, values)):
        w = int((width - 180) * (val / max(vmax, 1e-9)))
        y = i * (bar_h + 4)
        rows.append(
            f'<text x="0" y="{y + bar_h - 3}" font-size="12">{html.escape(str(name))}</text>'
            f'<rect x="150" y="{y}" width="{max(w,1)}" height="{bar_h}" fill="#4a90d9"/>'
            f'<text x="{155 + w}" y="{y + bar_h - 3}" font-size="11">{val:.3f}</text>')
    height = len(values) * (bar_h + 4) + 4
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}">{"".join(rows)}</svg>')


def save_unit_images(report: Dict, inst: InstrumentedModel, outdir,
                     n_units: int = 20, seed: int = 1,
                     pool: Optional[ImageWriterPool] = None):
    """Regenerate and save each top unit's highest-activating samples
    (async via the native writer pool)."""
    outdir = Path(outdir)
    (outdir / "image").mkdir(parents=True, exist_ok=True)
    own_pool = pool is None
    pool = pool or ImageWriterPool(4)
    model = inst.model
    # Regenerate batch-aligned: a top-sample index s belongs to the batch
    # drawn with seed + (s//batch)*batch (see dissect.regenerate_sample).
    from ganspace_tpu.dissection.dissect import regenerate_sample
    seed = report.get("seed", seed)
    batch = report.get("batch", 16)
    n_samples = report.get("n_samples", 1000)
    try:
        for rec in report["units"][:n_units]:
            imgs = []
            for s in rec["top_samples"][:4]:
                z = regenerate_sample(model, s, seed=seed, batch=batch,
                                      n_samples=n_samples)
                img = np.asarray(model.forward(z))[0]
                imgs.append(np.transpose(img, (1, 2, 0)))
            grid = to_uint8(np.clip(np.hstack(imgs), 0, 1))
            pool.save_png(outdir / "image" / f"unit_{rec['unit']}.png", grid)
        pool.wait()
    finally:
        if own_pool:
            pool.close()


def generate_report(report: Dict, outdir, inst: Optional[InstrumentedModel] = None,
                    n_units: int = 20) -> Path:
    """JSON + SVG + HTML under ``outdir``; returns the html path."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    serializable = {k: v for k, v in report.items() if k != "iou_matrix"}
    (outdir / "dissect.json").write_text(json.dumps(serializable, indent=2))

    top = report["units"][:n_units]
    svg = make_svg_bargraph(
        [f"unit {r['unit']}: {r['label']}" for r in top],
        [r["iou"] for r in top])
    (outdir / "bargraph.svg").write_text(svg)

    if inst is not None:
        save_unit_images(report, inst, outdir, n_units=n_units)

    rows = []
    for r in top:
        img_tag = (f'<img src="image/unit_{r["unit"]}.png" height="96"/>'
                   if inst is not None else "")
        rows.append(
            f"<tr><td>{r['unit']}</td><td>{html.escape(r['label'])}</td>"
            f"<td>{r['iou']:.3f}</td><td>{img_tag}</td></tr>")
    page = f"""<!DOCTYPE html><html><head><title>dissect: {html.escape(report['model'])}</title>
<style>body{{font-family:sans-serif}}td{{padding:4px 10px}}</style></head><body>
<h2>{html.escape(report['model'])} — {html.escape(report['layer'])}</h2>
<p>{report['n_samples']} samples, activation level quantile {report['level_quantile']}</p>
{svg}
<table><tr><th>unit</th><th>label</th><th>iou</th><th>top images</th></tr>
{''.join(rows)}</table></body></html>"""
    out = outdir / "dissect.html"
    out.write_text(page)
    return out
