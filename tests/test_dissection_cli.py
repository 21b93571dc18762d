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


def test_classifier_mode(tmp_path):
    """Classifier runner (reference ClassifierSegRunner via --model without
    --gan): --features factory + --broden ground truth -> unit/label report."""
    from ganspace_tpu.dissection.__main__ import main
    from ganspace_tpu.dissection.broden import write_synthetic_broden

    broden = write_synthetic_broden(tmp_path / "broden", n_images=8, size=32)
    out = tmp_path / "out"
    rc = main(["--features", "examples.custom_classifier:features",
               "--broden", str(broden), "--layer", "conv2",
               "--samples", "8", "--batch", "4", "--rank-all-labels",
               "--examples", "4", "--outdir", str(out)])
    assert rc == 0
    d = out / "conv2"
    rep = json.loads((d / "dissect.json").read_text())
    assert rep["model"] == "classifier" and rep["layer"] == "conv2"
    assert rep["n_samples"] == 8
    assert len({u["unit"] for u in rep["units"]}) == 32   # conv2 width
    # labels/categories come from the broden metadata, not a segmenter
    assert all(u["label"] in rep["labels"] for u in rep["units"])
    assert all(u["category"] in ("object", "part", "-")
               for u in rep["units"])
    rk = rep["label_rankings"]
    assert rk and all(len(r["units"]) <= 4 for r in rk)
    assert (d / "dissect.html").exists() and (d / "bargraph.svg").exists()


def test_classifier_mode_flag_validation(tmp_path, capsys):
    from ganspace_tpu.dissection.__main__ import main

    with pytest.raises(SystemExit):
        main(["--features", "examples.custom_classifier:features",
              "--outdir", str(tmp_path)])
    assert "--broden" in capsys.readouterr().err


def test_imagedir_mode(tmp_path):
    """Image-only runner (reference --imagedir): overlays + histogram +
    gallery, no GAN."""
    from PIL import Image

    from ganspace_tpu.dissection.__main__ import main

    img, out = tmp_path / "img", tmp_path / "out"
    img.mkdir()
    rs = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(
            img / f"im{i}.png")
    assert main(["--imagedir", str(img), "--samples", "4", "--batch", "2",
                 "--outdir", str(out)]) == 0
    assert len(list(out.glob("seg_*.png"))) == 4     # --samples limit
    hist = json.loads((out / "labels.json").read_text())
    assert hist and all(h["pixels"] > 0 for h in hist)
    assert sum(h["pixels"] for h in hist) == 4 * 16 * 16
    assert "seg_im0.png" in (out / "+lightbox.html").read_text()


def test_no_labels_no_report_alias_quiet(tmp_path, capsys):
    """--no-labels / --no-report / NAME:DISPLAY / --netname / --quiet
    (reference __main__.py flag surface)."""
    from ganspace_tpu.dissection.__main__ import main

    rc = main(["--model", "DCGAN", "--layer", "deconv1:alias1",
               "--samples", "8", "--batch", "4", "--no-labels",
               "--no-report", "--no-images", "--netname", "mynet",
               "--quiet", "--outdir", str(tmp_path)])
    assert rc == 0
    assert capsys.readouterr().out == ""             # --quiet
    d = tmp_path / "alias1"                          # display-name outdir
    rep = json.loads((d / "dissect.json").read_text())
    assert rep["layer"] == "alias1" and rep["model"] == "mynet"
    assert rep["labels"] == []                       # no segmentation tally
    tops = [u["top_values"][0] for u in rep["units"]]
    assert tops == sorted(tops, reverse=True)        # ranked by activation
    assert not (d / "dissect.html").exists()         # --no-report
    assert not (d / "image").exists()

    # --no-labels rejects label-dependent flags
    with pytest.raises(SystemExit):
        main(["--model", "DCGAN", "--layer", "deconv1", "--no-labels",
              "--iqr", "--outdir", str(tmp_path)])


def test_meta_and_merge(tmp_path):
    """--meta attaches metadata; --merge updates units positionally in unit
    order within the matching layer (reference dissection.py:171,307-318)."""
    from ganspace_tpu.dissection.__main__ import main

    (tmp_path / "meta.json").write_text(json.dumps({"experiment": "e7"}))
    (tmp_path / "merge.json").write_text(json.dumps({"layers": [
        {"layer": "deconv1",
         "units": [{"interp": False}, {"interp": True, "note": "edge"}]}]}))
    rc = main(["--model", "DCGAN", "--layer", "deconv1",
               "--samples", "8", "--batch", "4", "--no-labels",
               "--no-report", "--no-images", "--quiet",
               "--meta", str(tmp_path / "meta.json"),
               "--merge", str(tmp_path / "merge.json"),
               "--outdir", str(tmp_path)])
    assert rc == 0
    rep = json.loads((tmp_path / "deconv1" / "dissect.json").read_text())
    assert rep["meta"] == {"experiment": "e7"}
    by_unit = {u["unit"]: u for u in rep["units"]}
    assert by_unit[0]["interp"] is False
    assert by_unit[1]["interp"] is True and by_unit[1]["note"] == "edge"
    assert "interp" not in by_unit[2]


def test_label_histogram_multichannel():
    """Multi-channel maps must count a pixel once per carried label and
    background only where no channel fires (review finding: flat ravel
    inflated label 0 by the channel count)."""
    from ganspace_tpu.dissection.__main__ import _label_histogram

    m = np.zeros((3, 2, 2), np.int64)     # 3 categories, 4 pixels
    m[0, 0, 0] = 1                        # pixel (0,0): labels 1 (ch0)...
    m[1, 0, 0] = 2                        # ...and 2 (ch1)
    m[2, 1, 1] = 3                        # pixel (1,1): label 3
    h = _label_histogram(m, 5)
    assert h.tolist() == [2, 1, 1, 1, 0]  # bg = 2 unlabeled pixels, not 2*C

    flat = np.array([[0, 1], [1, 4]])
    assert _label_histogram(flat, 5).tolist() == [1, 2, 0, 0, 1]


def test_mode_flag_conflicts(tmp_path, capsys):
    """--serve and --quantile iqr are GAN-session features; the classifier
    and imagedir modes must reject them loudly, not silently downgrade."""
    from ganspace_tpu.dissection.__main__ import main

    with pytest.raises(SystemExit):
        main(["--features", "examples.custom_classifier:features",
              "--broden", str(tmp_path), "--serve", "8000",
              "--outdir", str(tmp_path)])
    assert "--serve" in capsys.readouterr().err

    with pytest.raises(SystemExit):
        main(["--features", "examples.custom_classifier:features",
              "--broden", str(tmp_path), "--quantile", "iqr",
              "--outdir", str(tmp_path)])
    assert "GAN-mode" in capsys.readouterr().err
