"""Dissection REST server + live-edit viewer
(reference ``netdissect/server.py`` Flask/connexion app + ``serverstate.py``'s
``GanTester``, and the ``dissect.html``/``edit.html`` static viewers).

Stdlib-only (``ThreadingHTTPServer``) like the interactive app — no Flask
dependency.  Endpoints:

    GET  /                       viewer page (report table + live edit panel)
    GET  /api/report             full dissection report JSON
    GET  /api/units?n=20         top-n units
    GET  /api/generate?seed=&units=&strength=&n=   JPEG batch with the given
                                 units ablated (strength 1 = remove) or
                                 boosted (negative strength adds activation)
    GET  /api/overlay?unit=&seed=  unit-activation overlay JPEG
    GET  /api/layers             tap name/channels/shape (ref GET /layers)
    GET  /api/rankings           named per-unit score vectors (GET /rankings)
    GET  /api/levels?quantiles=0.9,0.99   per-unit activation quantile
                                 levels from the stats sketch (GET /levels;
                                 needs the session's ``stats=``)
    POST /api/features           {"ids": [...], "units": [...]} -> per-unit
                                 max/mean over report samples (POST /features)
    POST /api/featuremaps        same body -> level-normalized 0-255 maps
                                 (POST /featuremaps)
    GET  /image/unit_N.png       saved report images (if generated)

The live-edit path reuses the same ``InstrumentedModel`` edit semantics as
everything else (``edit_layer(ablation=...)``); device work happens under a
lock since HTTP threads share one model.
"""

from __future__ import annotations

import io
import json
import threading
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ganspace_tpu.models.base import InstrumentedModel


class DissectionSession:
    """Server-side state: one dissected (model, layer) + its report.

    ``stats`` (optional) is the ``tally_stats`` dict; with it the session
    can answer quantile-level queries (reference ``GET /levels``)."""

    def __init__(self, inst: InstrumentedModel, layer: str, report: Dict,
                 outdir: Optional[Path] = None, stats: Optional[Dict] = None):
        self.inst = inst
        self.layer = layer
        self.report = report
        self.outdir = Path(outdir) if outdir else None
        self.units = len(report["units"])
        # Unit indices are report-relative: the tally covers channels
        # [0, n_channels) even when the report lists fewer rows.
        self.n_channels = max(r["unit"] for r in report["units"]) + 1
        self.stats = stats

    # -- request validation (raise ValueError -> HTTP 400, never a dropped
    #    connection: out-of-range ids/units would otherwise surface deep in
    #    the regeneration path as negative-dimension or index errors) -------
    def check_ids(self, ids) -> list:
        n = int(self.report["n_samples"])
        ids = [int(i) for i in ids]
        for i in ids:
            if not 0 <= i < n:
                raise ValueError(f"sample id {i} out of range [0, {n})")
        return ids

    def check_units(self, units) -> Optional[list]:
        if units is None:
            return None
        units = [int(u) for u in units]
        for u in units:
            if not 0 <= u < self.n_channels:
                raise ValueError(
                    f"unit {u} out of range [0, {self.n_channels})")
        return units

    # -- live generation ----------------------------------------------------
    def generate(self, seed: int = 0, n: int = 4, units=(),
                 strength: float = 1.0) -> np.ndarray:
        """[n] samples with ``units`` ablated by ``strength`` -> uint8 grid."""
        model = self.inst.model
        self.inst.remove_edits()
        if len(units):
            units = self.check_units(units)
            alpha = np.zeros((self.n_channels,), np.float32)
            alpha[np.asarray(units, np.int64)] = strength
            self.inst.edit_layer(self.layer, ablation=alpha)
        z = model.sample_latent(n, seed=seed)
        imgs = np.asarray(model.forward(z))
        self.inst.remove_edits()
        imgs = np.clip(np.transpose(imgs, (0, 2, 3, 1)), 0, 1)
        return (np.hstack(list(imgs)) * 255).astype(np.uint8)

    # -- report-derived queries (reference serverstate.py API) --------------
    def layers(self) -> list:
        """Layer name + channel count + spatial shape
        (reference ``get_layers``, ``serverstate.py:52-61``)."""
        shape = getattr(self.inst, "feature_shape", {}).get(self.layer)
        spatial = (list(shape[2:]) if shape is not None and len(shape) == 4
                   else [1, 1])
        return [{"layer": self.layer, "channels": self.units,
                 "shape": spatial}]

    def rankings(self) -> list:
        """Named per-unit score vectors, unit-indexed
        (reference ``get_rankings``, ``serverstate.py:78-88``)."""
        by_unit = sorted(self.report["units"], key=lambda r: r["unit"])
        out = [{"name": "iou", "metric": "iou",
                "scores": [r["iou"] for r in by_unit]},
               {"name": "activation level", "metric": "level",
                "scores": [r["activation_level"] for r in by_unit]}]
        if "iqr" in by_unit[0]:
            # fixed-threshold information quality ratio (score_tally_stats)
            out.append({"name": "iqr", "metric": "iqr",
                        "scores": [r["iqr"] for r in by_unit]})
        if "iqr_score" in by_unit[0]:
            # level-search max IQR (collect_iqr), when --iqr ran
            out.append({"name": "max iqr", "metric": "iqr",
                        "scores": [r["iqr_score"] for r in by_unit]})
        return out

    def levels(self, quantiles) -> list:
        """[U, Q] activation values at the requested quantiles from the
        stats pass's sketch (reference ``get_levels``,
        ``serverstate.py:90-93``); needs ``stats=``."""
        if not self.stats:
            raise ValueError(
                "session built without stats; pass stats=tally_stats(...)")
        qs = np.clip(np.asarray(quantiles, np.float64), 0.0, 1.0)
        return np.asarray(self.stats["quantiles"].quantiles(qs)).tolist()

    def _regenerate(self, ids) -> np.ndarray:
        """Latents for report sample indices, reproducing the stats pass's
        seed-per-batch draw geometry (dissect.regenerate_sample)."""
        from ganspace_tpu.dissection.dissect import regenerate_sample
        model = self.inst.model
        seed = int(self.report.get("seed", 1))
        batch = int(self.report.get("batch", 16))
        n_samples = int(self.report["n_samples"])
        return np.concatenate(
            [np.asarray(regenerate_sample(model, int(s), seed=seed,
                                          batch=batch, n_samples=n_samples))
             for s in ids], axis=0)

    def features(self, ids, units=None) -> Dict:
        """Per-unit activation stats (max/mean over the map) for report
        sample indices (reference ``get_features``,
        ``serverstate.py:151-163``; mask-restricted stats are not carried
        over — the overlay endpoint covers localized inspection)."""
        self.inst.retain_layer(self.layer)
        z = self._regenerate(ids)
        self.inst.model.partial_forward(z, self.layer)
        act = np.asarray(self.inst.retained_features()[self.layer])
        if act.ndim == 2:
            act = act[:, :, None, None]
        if units is not None:
            act = act[:, np.asarray(units, np.int64)]
        return {self.layer: {"max": act.max(axis=(2, 3)).tolist(),
                             "mean": act.mean(axis=(2, 3)).tolist()}}

    def featuremaps(self, ids, units=None) -> Dict:
        """Level-normalized activation maps scaled 0-255
        (reference ``get_featuremaps``, ``serverstate.py:165-177``):
        each unit's map is divided by its dissection activation level, so
        255 = 'at or above the threshold that defines this unit on'."""
        self.inst.retain_layer(self.layer)
        z = self._regenerate(ids)
        self.inst.model.partial_forward(z, self.layer)
        act = np.asarray(self.inst.retained_features()[self.layer])
        if act.ndim == 2:
            act = act[:, :, None, None]
        levels = np.ones((act.shape[1],), np.float32)
        for r in self.report["units"]:
            levels[r["unit"]] = max(r["activation_level"], 1e-9)
        if units is not None:
            sel = np.asarray(units, np.int64)
            act, levels = act[:, sel], levels[sel]
        maps = np.clip(act / levels[None, :, None, None], 0.0, 1.0)
        return {self.layer: (maps * 255).astype(np.uint8).tolist()}

    def overlay(self, unit: int, seed: int = 0) -> np.ndarray:
        """Activation overlay of one unit on one sample -> uint8 image."""
        from ganspace_tpu.dissection.viz import activation_overlay
        (unit,) = self.check_units([unit])
        model = self.inst.model
        self.inst.retain_layer(self.layer)
        z = model.sample_latent(1, seed=seed)
        img = np.asarray(model.forward(z))[0]
        act = np.asarray(self.inst.retained_features()[self.layer])[0]
        if act.ndim == 1:
            act = act[:, None, None]
        out = activation_overlay(img, act[unit])
        return (out * 255).astype(np.uint8)


_PAGE = """<!DOCTYPE html>
<html><head><title>dissect: {model}/{layer}</title><style>
body {{ font-family: sans-serif; background: #181818; color: #ddd; margin: 20px; }}
td, th {{ padding: 3px 10px; text-align: left; }}
img {{ image-rendering: auto; }}
input, button {{ margin: 2px; }}
a {{ color: #7ab6f5; }}
</style></head><body>
<h2>{model} — {layer}</h2>
<p>{n_samples} samples; click a unit to ablate it in the live panel.</p>
<div>
  <b>live edit</b>:
  units <input id="units" size="20" value=""/>
  strength <input id="strength" size="4" value="1.0"/>
  seed <input id="seed" size="6" value="0"/>
  <button onclick="gen()">generate</button>
</div>
<img id="live" src="/api/generate?seed=0&n=4"/>
<table id="tbl"><tr><th>unit</th><th>label</th><th>category</th><th>iou</th>
<th>overlay</th></tr></table>
<script>
async function load() {{
  const r = await (await fetch('/api/units?n=24')).json();
  const tbl = document.getElementById('tbl');
  for (const u of r.units) {{
    const tr = document.createElement('tr');
    tr.innerHTML = `<td><a href="#" onclick="add(${{u.unit}});return false;">` +
      `${{u.unit}}</a></td><td>${{u.label}}</td><td>${{u.category}}</td>` +
      `<td>${{u.iou.toFixed(3)}}</td>` +
      `<td><img src="/api/overlay?unit=${{u.unit}}&seed=0" height="64"/></td>`;
    tbl.appendChild(tr);
  }}
}}
function add(u) {{
  const el = document.getElementById('units');
  el.value = el.value ? el.value + ',' + u : '' + u;
  gen();
}}
async function gen() {{
  const u = document.getElementById('units').value;
  const s = document.getElementById('strength').value;
  const seed = document.getElementById('seed').value;
  document.getElementById('live').src =
    `/api/generate?seed=${{seed}}&n=4&units=${{u}}&strength=${{s}}&t=` + Date.now();
}}
load();
</script></body></html>
"""


def serve(session: DissectionSession, host: str = "127.0.0.1",
          port: int = 8088, block: bool = True):
    """Start the server; returns the (running) HTTPServer instance."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from PIL import Image

    lock = threading.Lock()

    def jpeg(arr: np.ndarray) -> bytes:
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=92)
        return buf.getvalue()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)

            def qi(name, default):
                return int(q.get(name, [default])[0] or default)

            def qf(name, default):
                return float(q.get(name, [default])[0] or default)

            if url.path == "/":
                page = _PAGE.format(
                    model=session.report["model"], layer=session.layer,
                    n_samples=session.report["n_samples"])
                self._send(200, page.encode())
            elif url.path == "/api/report":
                body = json.dumps({k: v for k, v in session.report.items()
                                   if k != "iou_matrix"}).encode()
                self._send(200, body, "application/json")
            elif url.path == "/api/units":
                n = qi("n", 20)
                body = json.dumps(
                    {"units": session.report["units"][:n]}).encode()
                self._send(200, body, "application/json")
            elif url.path == "/api/layers":
                self._send(200, json.dumps({"layers": session.layers()})
                           .encode(), "application/json")
            elif url.path == "/api/rankings":
                self._send(200, json.dumps({"rankings": session.rankings()})
                           .encode(), "application/json")
            elif url.path == "/api/levels":
                try:
                    quantiles = [float(v) for v in
                                 q.get("quantiles", [""])[0].split(",")
                                 if v.strip()]
                    if not quantiles:
                        raise ValueError("pass ?quantiles=0.9,0.99,...")
                    body = json.dumps({"levels": session.levels(quantiles)})
                except ValueError as e:
                    self._send(400, str(e).encode(), "text/plain")
                    return
                self._send(200, body.encode(), "application/json")
            elif url.path == "/api/generate":
                try:
                    units = session.check_units(
                        [u for u in q.get("units", [""])[0].split(",")
                         if u.strip()])
                    n = qi("n", 4)
                    if not 1 <= n <= 64:
                        raise ValueError("n must be in [1, 64]")
                    with lock:
                        grid = session.generate(
                            seed=qi("seed", 0), n=n, units=units,
                            strength=qf("strength", 1.0))
                except ValueError as e:
                    self._send(400, f"bad request: {e}".encode(), "text/plain")
                    return
                self._send(200, jpeg(grid), "image/jpeg")
            elif url.path == "/api/overlay":
                try:
                    with lock:
                        img = session.overlay(qi("unit", 0),
                                              seed=qi("seed", 0))
                except ValueError as e:
                    self._send(400, f"bad request: {e}".encode(), "text/plain")
                    return
                self._send(200, jpeg(img), "image/jpeg")
            elif url.path.startswith("/image/") and session.outdir:
                f = session.outdir / "image" / Path(url.path).name
                if f.is_file():
                    self._send(200, f.read_bytes(), "image/png")
                else:
                    self._send(404, b"not found", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path not in ("/api/features", "/api/featuremaps"):
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length))
                if not isinstance(body, dict):
                    raise ValueError("request must be a JSON object")
                ids = session.check_ids(body["ids"])
                units = session.check_units(body.get("units"))
            except (ValueError, TypeError, KeyError) as e:
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            with lock:
                if url.path == "/api/features":
                    res = session.features(ids, units)
                else:
                    res = session.featuremaps(ids, units)
            self._send(200, json.dumps({"res": res}).encode(),
                       "application/json")

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"dissection server at http://{host}:{port}/")
    if block:
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
