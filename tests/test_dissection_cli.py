"""Dissection CLI end-to-end on a tiny run: flag surface added for reference
parity (--quantile modes, --maxiou, --rank-all-labels, --examples)."""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_dissection_cli_flags(tmp_path):
    from ganspace_tpu.dissection.__main__ import main

    rc = main(["--model", "DCGAN", "--layer", "deconv1",
               "--samples", "16", "--batch", "8", "--seed", "1",
               "--quantile", "maxiou", "--iqr", "--maxiou",
               "--rank-all-labels", "--examples", "4",
               "--outdir", str(tmp_path)])
    assert rc == 0
    d = tmp_path / "deconv1"
    rep = json.loads((d / "dissect.json").read_text())

    # per-unit threshold mode (reference GAN-mode default semantics)
    assert rep["level_quantile"] == "per-unit"
    # scorer fields from the shared conditional-quantile pass
    u0 = rep["units"][0]
    for key in ("iqr_label", "iqr_score", "maxiou_label", "maxiou",
                "maxiou_level", "maxiou_quantile"):
        assert key in u0, key
    # --maxiou writes the reference npz fields
    mi = np.load(d / "max_iou.npz")
    assert set(mi.files) == {"max_iou", "max_iou_level", "max_iou_quantile"}
    assert mi["max_iou"].shape[0] == 256            # DCGAN deconv1 units
    # --rank-all-labels: per-label descending unit rankings, k = --examples
    rk = rep["label_rankings"]
    assert rk and all(len(r["units"]) <= 4 for r in rk)
    for r in rk:
        assert r["ious"] == sorted(r["ious"], reverse=True)
    # --examples caps the report images
    assert len(list((d / "image").glob("unit_*.png"))) <= 4
    assert (d / "dissect.html").exists() and (d / "bargraph.svg").exists()
