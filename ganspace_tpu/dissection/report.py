"""Dissection report generation (reference ``dissection.py:174-500, 1371``).

Writes the JSON report, an SVG IoU bargraph, per-unit top-image grids
(through the native async writer pool) and a static HTML viewer — the
offline equivalents of the reference's ``generate_report`` /
``make_svg_bargraph`` / ``dissect.html``.

Also the ACE reporting halves (reference ``acesummarize.py`` /
``aceplotablate.py``): loss-history curves per run, normalized
ablation-effect curves per ranking, and an ``ace.html`` summary page.
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
                    n_units: int = 20, html_summary: bool = True) -> Path:
    """JSON + SVG + HTML under ``outdir``; returns the html path.
    ``html_summary=False`` (reference ``--no-report``) writes the data file
    only and returns the json path."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    serializable = {k: v for k, v in report.items()
                    if k not in ("iou_matrix", "iqr_matrix")}
    json_path = outdir / "dissect.json"
    json_path.write_text(json.dumps(serializable, indent=2))
    if not html_summary:
        return json_path

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


# ---------------------------------------------------------------------------
# ACE reporting (reference acesummarize.py / aceplotablate.py)
# ---------------------------------------------------------------------------

def _figure(figsize=(4.5, 3.5)):
    from matplotlib.backends.backend_agg import FigureCanvasAgg as FigureCanvas
    from matplotlib.figure import Figure
    fig = Figure(figsize=figsize)
    FigureCanvas(fig)
    return fig


def save_ace_loss_plot(runs: Dict[str, Dict], outpath, title: str = "") -> Path:
    """Loss-history curves, one per labeled run (e.g. different L1
    strengths) — the ``acesummarize.py:28-60`` plot: per-run optimization
    loss with the run label in the legend."""
    outpath = Path(outpath)
    fig = _figure()
    ax = fig.add_subplot(111)
    for label, run in runs.items():
        ax.plot(run["loss_history"], label=str(label))
    ax.set_title(title or "ACE optimization loss")
    ax.grid(True)
    ax.legend()
    ax.set_ylabel("Loss")
    ax.set_xlabel("Steps")
    fig.tight_layout()
    outpath.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(outpath)
    return outpath


def save_ablation_effect_plot(effects: Dict[str, Dict[int, float]],
                              baseline: float, outpath,
                              classname: str = "") -> Path:
    """Normalized ablation-effect curves ``1 - presence(k) / baseline`` per
    ranking (``aceplotablate.py:25-51``): x = units ablated, y = portion of
    class pixels removed, one labeled curve per ranking (ACE vs IoU...)."""
    outpath = Path(outpath)
    fig = _figure()
    ax = fig.add_subplot(111)
    for label, eff in effects.items():
        ks = sorted(int(k) for k in eff)
        base = eff.get(0, baseline) or baseline or 1e-9
        ax.plot(ks, [1.0 - eff[k] / base for k in ks], marker=".",
                label=str(label))
    ax.set_title(f"Effect of ablating units for {classname}".strip())
    ax.grid(True)
    ax.legend()
    ax.set_ylabel(f"Portion of {classname or 'class'} pixels removed")
    ax.set_xlabel("Number of units ablated")
    ax.set_ylim(0, 1.0)
    fig.tight_layout()
    outpath.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(outpath)
    return outpath


def generate_ace_report(outdir, classname: str, runs: Dict[str, Dict],
                        effects: Optional[Dict[str, Dict[int, float]]] = None,
                        n_top: int = 20) -> Path:
    """ACE summary page: loss plot + effect plot + per-run table (baseline
    presence, final loss, saturated-unit count, top-ranked units).  Returns
    the ``ace.html`` path.  ``runs`` maps a label to an ``ace_optimize``
    result; ``effects`` maps a label to an ``ablation_effect`` result."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    save_ace_loss_plot(runs, outdir / "ace-loss.png",
                       title=f"{classname} ACE loss")
    first = next(iter(runs.values()))
    effect_tag = ""
    if effects:
        save_ablation_effect_plot(effects, first.get("baseline", 0.0),
                                  outdir / "ace-effect.png", classname)
        effect_tag = '<img src="ace-effect.png"/>'

    rows = []
    for label, run in runs.items():
        abl = np.asarray(run["ablation"])
        top = ", ".join(str(int(u)) for u in np.asarray(run["ranking"])[:8])
        rows.append(
            f"<tr><td>{html.escape(str(label))}</td>"
            f"<td>{run.get('baseline', float('nan')):.5f}</td>"
            f"<td>{run['loss_history'][-1]:.5f}</td>"
            f"<td>{int((abl >= 0.999).sum())}/{abl.size}</td>"
            f"<td>{top}</td></tr>")
    page = f"""<!DOCTYPE html><html><head><title>ACE: {html.escape(classname)}</title>
<style>body{{font-family:sans-serif}}td{{padding:4px 10px}}</style></head><body>
<h2>ACE — {html.escape(classname)}</h2>
<img src="ace-loss.png"/> {effect_tag}
<table><tr><th>run</th><th>baseline presence</th><th>final loss</th>
<th>saturated units</th><th>top units</th></tr>
{''.join(rows)}</table></body></html>"""
    out = outdir / "ace.html"
    out.write_text(page)
    return out
