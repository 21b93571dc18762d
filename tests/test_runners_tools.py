"""Classifier-dissection runners and tool CLIs
(reference ``dissection.py:1505-1572`` + ``netdissect/tool/``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ganspace_tpu.dissection import ColorSegmenter, write_synthetic_broden
from ganspace_tpu.dissection.broden import BrodenDataset
from ganspace_tpu.dissection.runners import dissect_classifier, segment_dataset


@pytest.fixture(scope="module")
def broden(tmp_path_factory):
    d = tmp_path_factory.mktemp("broden")
    write_synthetic_broden(d, n_images=6, size=16, n_labels=5)
    return BrodenDataset(d)


def test_dissect_classifier(broden):
    # toy "classifier": 4 fixed color-projection feature maps
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(4, 3).astype(np.float32))

    def features(images):
        return jnp.einsum("uc,bchw->buhw", w, images)[:, :, ::2, ::2]

    report = dissect_classifier(features, broden, broden.labels,
                                batch=3)
    assert report["n_samples"] == 6
    assert len(report["units"]) == 4
    for r in report["units"]:
        assert r["label"] in broden.labels
        assert 0.0 <= r["iou"] <= 1.0
    # renders through the standard report generator
    from ganspace_tpu.dissection import generate_report
    out = generate_report(report, broden.dir / "rep")
    assert out.exists()


def test_segment_dataset(broden):
    maps = segment_dataset(ColorSegmenter(), broden, batch=4)
    assert len(maps) == 6
    assert maps[0].shape == (16, 16)


def test_dissect_classifier_multiseg(tmp_path):
    """Runners must consume every dataset family: MultiSegmentDataset yields
    (img, seg, bincount) 3-tuples and its batches take a limit kwarg."""
    import json

    from PIL import Image

    from ganspace_tpu.dissection import MultiSegmentDataset

    root = tmp_path / "seg"
    (root / "img").mkdir(parents=True)
    (root / "seg").mkdir()
    (root / "labelnames.json").write_text(json.dumps([
        {"field": "shape", "index": 0, "bitshift": 0, "bitmask": 3,
         "label": ["-", "cube", "sphere"]},
    ]))
    rs = np.random.RandomState(1)
    for i in range(8):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            root / "img" / f"{i}.png")
        Image.fromarray(np.full((8, 8), (i % 2) + 1, np.uint8)).save(
            root / "seg" / f"{i}.png")
    ds = MultiSegmentDataset(root)

    def features(images):          # [B,3,H,W] -> [B,2,h,w]
        return jnp.stack([images.mean(axis=1), images.max(axis=1)],
                         axis=1)[:, :, ::2, ::2]

    report = dissect_classifier(features, ds, ds.labels,
                                categories=[""] + ["shape"] * 2,
                                batch=2, limit=4)
    assert report["n_samples"] == 4
    assert len(report["units"]) == 2
    assert all(r["label"] in ds.labels for r in report["units"])


def test_makesample_cli(tmp_path):
    from ganspace_tpu.tools.makesample import main
    rc = main(["--model", "DCGAN", "--size", "5", "--batch", "3",
               "--outdir", str(tmp_path)])
    assert rc == 0
    assert len(list(tmp_path.glob("image_*.png"))) == 5
    # gallery page alongside (reference tool/makesample.py:97 lightbox copy)
    page = (tmp_path / "+lightbox.html").read_text()
    assert "image_00004.png" in page and "<script" in page
    assert "http" not in page.split("</title>")[1]   # self-contained, no CDN


def test_lightbox_writer(tmp_path):
    from ganspace_tpu.tools.lightbox import write_lightbox
    for name in ("b.png", "a.jpg", "skip.txt"):
        (tmp_path / name).write_bytes(b"x")
    out = write_lightbox(tmp_path, title="t<i>tle")
    page = out.read_text()
    assert '["a.jpg", "b.png"]' in page        # sorted, non-images skipped
    assert "t&lt;i&gt;tle" in page             # title html-escaped
    explicit = write_lightbox(tmp_path, images=["b.png"]).read_text()
    assert '["b.png"]' in explicit


def test_ganseg_cli(tmp_path):
    from ganspace_tpu.tools.ganseg import main
    rc = main(["--model", "DCGAN", "--size", "4", "--batch", "4",
               "--outdir", str(tmp_path)])
    assert rc == 0
    assert len(list(tmp_path.glob("ganseg_*.png"))) == 4


@pytest.mark.slow
def test_allunitsample_cli(tmp_path):
    from ganspace_tpu.tools.allunitsample import main
    rc = main(["--model", "DCGAN", "--layer", "deconv1", "--samples", "8",
               "--batch", "4", "--topk", "3", "--outdir", str(tmp_path)])
    assert rc == 0
    assert len(list(tmp_path.glob("unit_*.png"))) > 0


@pytest.mark.slow
def test_custom_model_registration(tmp_path):
    """register_model: a user generator drives the whole pipeline
    (reference analog: torch.hub GAN-zoo / colab custom-model import)."""
    from ganspace_tpu.models import (get_instrumented_model, get_model,
                                     register_model, unregister_model)
    from ganspace_tpu.models.dcgan import DCGANConfig, GANZooModel

    def factory(output_class, **kw):
        m = GANZooModel("MyGAN", cfg=DCGANConfig(resolution=16,
                                                 base_channels=32))
        m.name = "MyGAN"
        return m

    register_model("MyGAN", factory)
    try:
        m = get_model("MyGAN")
        assert m.name == "MyGAN"
        inst = get_instrumented_model("MyGAN", None, "deconv1")
        assert "deconv1" in inst.feature_shape
        # end-to-end decomposition on the custom model
        import os
        os.environ["GANSPACE_OUTPUT_DIR"] = str(tmp_path)
        from ganspace_tpu.config import Config
        from ganspace_tpu.decomposition import get_or_compute
        cfg = Config(model="MyGAN", layer="deconv1", estimator="ipca",
                     components=3, n=64, batch_size=16)
        path = get_or_compute(cfg, inst)
        assert path.exists()
    finally:
        unregister_model("MyGAN")
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        get_model("MyGAN")


def test_package_entry_point(tmp_path, capsys):
    from ganspace_tpu.__main__ import main
    assert main(["--help"]) == 0
    assert "visualize" in capsys.readouterr().out
    assert main(["nope"]) == 2
    assert main(["makesample", "--model", "DCGAN", "--size", "2",
                 "--batch", "2", "--outdir", str(tmp_path)]) == 0
    assert len(list(tmp_path.glob("image_*.png"))) == 2


@pytest.mark.slow
def test_custom_model_example(tmp_path, monkeypatch):
    """examples/custom_model.py: a from-scratch pure-function generator
    registered and driven through decomposition + the edit engine
    (reference Ganspace_colab.ipynb custom-model import)."""
    import importlib.util, sys
    from pathlib import Path
    path = Path(__file__).parent.parent / "examples" / "custom_model.py"
    spec = importlib.util.spec_from_file_location("custom_model_example", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["custom_model_example"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    assert mod.main(["--n", "256", "-c", "3", "--outdir", str(tmp_path)]) == 0
    assert list((tmp_path / "cache" / "components").glob("toygan*_c3_*.npz"))
    assert (tmp_path / "toygan_component0_strip.png").exists()
