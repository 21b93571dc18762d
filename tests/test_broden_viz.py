"""Broden reader, viz overlays, dissection CLI, and server
(reference ``netdissect/{broden,actviz,segviz,__main__,server}.py``)."""

import json
import urllib.request

import numpy as np
import pytest

from ganspace_tpu.dissection import (
    BrodenDataset, ColorSegmenter, activation_overlay, activation_surface,
    dissect, segment_visualization, write_synthetic_broden,
)
from ganspace_tpu.dissection.broden import decode_label_png, encode_label_png
from ganspace_tpu.models.base import InstrumentedModel

from helpers import tiny_dcgan


def test_label_png_roundtrip():
    rs = np.random.RandomState(0)
    codes = rs.randint(0, 70000, (8, 8))
    assert np.array_equal(decode_label_png(encode_label_png(codes)),
                          codes % (256 * 256))


def test_broden_dataset(tmp_path):
    d = write_synthetic_broden(tmp_path / "broden", n_images=4, size=16,
                               n_labels=6)
    ds = BrodenDataset(d)
    assert len(ds) == 4
    assert ds.categories == ["object", "part"]
    img, seg, rec = ds[0]
    assert img.shape == (3, 16, 16) and img.dtype == np.float32
    assert seg.shape == (2, 16, 16)
    assert seg.max() < 6
    batches = list(ds.batches(3))
    assert batches[0][0].shape == (3, 3, 16, 16)
    assert batches[1][1].shape == (1, 2, 16, 16)
    prim = ds.primary_categories_per_index()
    assert len(prim) == len(ds.labels)
    assert prim[0] == 0 and prim[1] == 1  # alternating categories


def test_broden_full_image_label(tmp_path):
    d = write_synthetic_broden(tmp_path / "b2", n_images=1, size=8)
    ds = BrodenDataset(d)
    ds.index[0]["object"] = "5"           # numeric cell = full-image label
    _, seg, _ = ds[0]
    assert np.all(seg[0] == 5)


def test_activation_overlay_shapes():
    img = np.random.RandomState(0).rand(3, 32, 32).astype(np.float32)
    act = np.random.RandomState(1).randn(8, 8).astype(np.float32)
    surf = activation_surface(act, (32, 32))
    assert surf.shape == (32, 32)
    assert surf.min() >= 0 and surf.max() <= 1
    out = activation_overlay(img, act)
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0 and out.max() <= 1
    # active region keeps full brightness, inactive is dimmed
    assert np.any(out < np.transpose(img, (1, 2, 0)) - 1e-6)


def test_segment_visualization():
    seg = np.array([[0, 1], [2, 1]])
    rgb = segment_visualization(seg)
    assert rgb.shape == (2, 2, 3)
    assert np.all(rgb[0, 0] == 0)                    # background black
    assert not np.allclose(rgb[0, 1], rgb[1, 0])     # distinct label colors
    multi = segment_visualization(np.stack([seg, np.zeros_like(seg)]),
                                  size=(4, 4))
    assert multi.shape == (4, 4, 3)


@pytest.mark.slow
def test_dissection_cli(tmp_path):
    from ganspace_tpu.dissection.__main__ import main
    rc = main(["--model", "DCGAN", "--layer", "deconv1",
               "--outdir", str(tmp_path / "out"), "--samples", "16",
               "--batch", "8", "--iqr", "--cov", "--no-images"])
    assert rc == 0
    rep = json.loads((tmp_path / "out" / "deconv1" / "dissect.json").read_text())
    assert rep["layer"] == "deconv1"
    assert "iqr_label" in rep["units"][0]
    corr = np.load(tmp_path / "out" / "deconv1" / "correlation.npy")
    assert corr.ndim == 2
    assert (tmp_path / "out" / "deconv1" / "dissect.html").exists()
    assert (tmp_path / "out" / "deconv1" / "bargraph.svg").exists()


def test_dissection_server(tmp_path):
    from ganspace_tpu.dissection.dissect import tally_stats
    from ganspace_tpu.dissection.server import DissectionSession, serve
    model = tiny_dcgan()
    inst = InstrumentedModel(model)
    stats = tally_stats(inst, "deconv1", n_samples=8, batch=4)
    report = dissect(inst, "deconv1", ColorSegmenter(), n_samples=8, batch=4,
                     stats=stats)
    session = DissectionSession(inst, "deconv1", report, stats=stats)
    server = serve(session, port=0, block=False)
    port = server.server_address[1]
    try:
        base = f"http://127.0.0.1:{port}"
        units = json.loads(urllib.request.urlopen(
            f"{base}/api/units?n=3").read())
        assert len(units["units"]) == 3
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "live edit" in page
        img = urllib.request.urlopen(
            f"{base}/api/generate?seed=1&n=2&units=0,1&strength=1.0").read()
        assert img[:2] == b"\xff\xd8"                # JPEG magic
        ov = urllib.request.urlopen(f"{base}/api/overlay?unit=0&seed=0").read()
        assert ov[:2] == b"\xff\xd8"
        # reference serverstate API surface: layers/rankings/levels
        layers = json.loads(urllib.request.urlopen(
            f"{base}/api/layers").read())["layers"]
        assert layers[0]["layer"] == "deconv1"
        assert layers[0]["channels"] == session.units
        rankings = json.loads(urllib.request.urlopen(
            f"{base}/api/rankings").read())["rankings"]
        names = {r["name"]: r for r in rankings}
        assert len(names["iou"]["scores"]) == session.units
        levels = np.asarray(json.loads(urllib.request.urlopen(
            f"{base}/api/levels?quantiles=0.5,0.99").read())["levels"])
        assert levels.shape == (session.units, 2)
        assert (levels[:, 1] >= levels[:, 0]).all()   # monotone in quantile
        # POST features / featuremaps on report sample ids
        req = urllib.request.Request(
            f"{base}/api/features", method="POST",
            data=json.dumps({"ids": [0, 3], "units": [0, 1]}).encode(),
            headers={"Content-Type": "application/json"})
        feats = json.loads(urllib.request.urlopen(req).read())["res"]
        assert np.asarray(feats["deconv1"]["max"]).shape == (2, 2)
        req = urllib.request.Request(
            f"{base}/api/featuremaps", method="POST",
            data=json.dumps({"ids": [1]}).encode(),
            headers={"Content-Type": "application/json"})
        fmaps = np.asarray(json.loads(
            urllib.request.urlopen(req).read())["res"]["deconv1"])
        assert fmaps.shape[:2] == (1, session.units)
        assert fmaps.min() >= 0 and fmaps.max() <= 255
        # top-sample consistency: regenerating a unit's top sample and
        # measuring its per-unit max must reproduce the report's top value
        top_u = report["units"][0]
        req = urllib.request.Request(
            f"{base}/api/features", method="POST",
            data=json.dumps({"ids": [top_u["top_samples"][0]],
                             "units": [top_u["unit"]]}).encode(),
            headers={"Content-Type": "application/json"})
        got = json.loads(urllib.request.urlopen(req).read())["res"]
        assert abs(got["deconv1"]["max"][0][0] - top_u["top_values"][0]) < 1e-3
        # probe: bad path 404s, bad body 400s instead of crashing the thread
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/api/nope")
        req = urllib.request.Request(
            f"{base}/api/features", method="POST", data=b'{"ids": ["x"]}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
        # out-of-range ids/units must 400, not crash the handler thread
        # (ids beyond n_samples reach negative-size sampling otherwise)
        for bad in (b'{"ids": [300]}', b'{"ids": [-1]}',
                    b'{"ids": [0], "units": [9999]}',
                    b'{"ids": [0], "units": [-1]}'):
            req = urllib.request.Request(
                f"{base}/api/features", method="POST", data=bad,
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 400, bad
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/api/generate?units=9999")
        assert exc.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/api/overlay?unit=-3")
        assert exc.value.code == 400
        # in-range requests still work after the rejected ones
        ok = urllib.request.urlopen(f"{base}/api/generate?units=0&n=1").read()
        assert ok[:2] == b"\xff\xd8"
    finally:
        server.shutdown()


def test_multi_segment_dataset(tmp_path):
    """Reference ``segdata.py`` semantics: bitfield-packed seg PNGs decode to
    global-numbered per-category label planes, 75/25 train/val split,
    (img, seg, bincount) triples."""
    from PIL import Image
    from ganspace_tpu.dissection import MultiSegmentDataset
    root = tmp_path / "clevrseg"
    (root / "img").mkdir(parents=True)
    (root / "seg").mkdir()
    # two fields packed into channel 0: shape in bits 0-1, color in bits 2-3
    (root / "labelnames.json").write_text(json.dumps([
        {"field": "shape", "index": 0, "bitshift": 0, "bitmask": 3,
         "label": ["-", "cube", "sphere"]},
        {"field": "color", "index": 0, "bitshift": 2, "bitmask": 3,
         "label": ["-", "red", "blue"]},
    ]))
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            root / "img" / f"{i}.png")
        shape_v = np.full((8, 8), (i % 2) + 1, np.uint8)   # cube or sphere
        color_v = np.zeros((8, 8), np.uint8)
        color_v[:4] = 2                                    # top half blue
        packed = np.stack([shape_v | (color_v << 2),
                           np.zeros((8, 8), np.uint8),
                           np.zeros((8, 8), np.uint8)], -1)
        Image.fromarray(packed).save(root / "seg" / f"{i}.png")
    ds = MultiSegmentDataset(root)
    assert len(ds) == 3                                    # 75% train split
    assert ds.labels == ["-", "cube", "sphere", "red", "blue"]
    assert ds.categories == ["shape", "color"]
    assert ds.label_category == [0, 0, 0, 1, 1]
    img, seg, binc = ds[0]
    assert img.shape == (3, 8, 8) and img.dtype == np.float32
    assert seg.shape == (2, 8, 8)
    assert np.all(seg[0] == 1)                             # cube everywhere
    assert np.all(seg[1][:4] == 4) and np.all(seg[1][4:] == 0)  # blue / none
    assert binc[1] == 64 and binc[4] == 32 and binc[0] == 32
    val = MultiSegmentDataset(root, val=True)
    assert len(val) == 1
    assert np.all(val[0][1][0] == 2)                       # sample 3: sphere
    imgs, segs, bincs = next(ds.batches(2))
    assert imgs.shape == (2, 3, 8, 8) and segs.shape == (2, 2, 8, 8)
    assert bincs.shape == (2, 5)
    assert sum(1 for _ in ds.batches(2, limit=2)) == 1


def test_prefetching_loader_matches_serial(tmp_path):
    """batches(workers=4) (the reference DataLoader num_workers analog) must
    yield bit-identical, in-order batches vs the serial path, on all three
    dataset types; worker exceptions must surface."""
    from ganspace_tpu.dissection import MultiSegmentDataset
    from ganspace_tpu.dissection.broden import (
        BrodenDataset, ParallelImageFolders, write_synthetic_broden,
    )
    from PIL import Image

    d = write_synthetic_broden(tmp_path / "broden", n_images=7, size=16)
    datasets = [BrodenDataset(d)]
    datasets.append(ParallelImageFolders([d / "images"]))
    root = tmp_path / "ms"
    (root / "img").mkdir(parents=True)
    (root / "seg").mkdir()
    (root / "labelnames.json").write_text(json.dumps([
        {"field": "shape", "index": 0, "bitshift": 0, "bitmask": 3,
         "label": ["-", "a", "b"]}]))
    rs = np.random.RandomState(1)
    for i in range(7):
        Image.fromarray(rs.randint(0, 255, (8, 8, 3), np.uint8)).save(
            root / "img" / f"{i}.png")
        Image.fromarray(rs.randint(0, 3, (8, 8, 3), np.uint8)).save(
            root / "seg" / f"{i}.png")
    datasets.append(MultiSegmentDataset(root))

    for ds in datasets:
        serial = list(ds.batches(3, workers=1))
        parallel = list(ds.batches(3, workers=4))
        assert len(serial) == len(parallel) > 1, type(ds).__name__
        for s, p in zip(serial, parallel):
            for a, b in zip(s, p):
                assert np.array_equal(a, b), type(ds).__name__

    class Boom:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom")
            return (np.zeros(2),)

    from ganspace_tpu.dissection.broden import _iter_items
    with pytest.raises(ValueError, match="boom"):
        list(_iter_items(Boom(), 5, workers=4))


def test_parallel_image_folders(tmp_path):
    """Reference ``parallelfolder.py`` semantics: filename-keyed pairing,
    mismatch detection, intersection mode, stacked batches."""
    from PIL import Image
    from ganspace_tpu.dissection.broden import ParallelImageFolders
    for root in ("photo", "seg"):
        d = tmp_path / root / "park"
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(np.full((8, 8, 3), i * 30, np.uint8)).save(d / f"{i}.png")
    ds = ParallelImageFolders([tmp_path / "photo", tmp_path / "seg"])
    assert len(ds) == 3
    a, b = ds[1]
    assert a.shape == (8, 8, 3) and (a == 30).all() and (b == 30).all()
    batches = list(ds.batches(2))
    assert batches[0][0].shape == (2, 8, 8, 3) and len(batches) == 2

    extra = tmp_path / "photo" / "park" / "zz.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(extra)
    with pytest.raises(RuntimeError, match="not found in all folders"):
        ParallelImageFolders([tmp_path / "photo", tmp_path / "seg"])
    assert len(ParallelImageFolders([tmp_path / "photo", tmp_path / "seg"],
                                    intersection=True)) == 3


def test_plotutil_helpers():
    """Reference ``plotutil.py`` notebook helpers: square-grid image plot
    and shared-scale channel-max heatmaps (headless Agg)."""
    import matplotlib
    matplotlib.use("Agg")
    from ganspace_tpu.dissection import plot_max_heatmap, plot_tensor_images
    rs = np.random.RandomState(0)
    f = plot_tensor_images(rs.rand(5, 3, 8, 8).astype(np.float32))
    assert len(f.axes) == 6                               # 2x3 grid for N=5
    assert len(f.axes[0].images) == 1                     # populated cell
    assert len(f.axes[5].images) == 0                     # padded cell blank
    f2 = plot_max_heatmap(rs.randn(3, 4, 6, 6).astype(np.float32),
                          shape=(12, 12))
    assert len(f2.axes) == 4                              # 2x2 grid for N=3
    im = f2.axes[0].images[0]
    assert im.get_array().shape == (12, 12)               # resized
    lo, hi = im.get_clim()
    assert lo == f2.axes[1].images[0].get_clim()[0]       # shared scale
    import matplotlib.pyplot as plt
    plt.close("all")


def test_multi_segment_dataset_out_of_range_values(tmp_path):
    """Packed values beyond a field's label table (bitmask covers the channel
    width, not the table) decode as unlabeled — bincount length stays fixed
    so batches() can stack, and no out-of-table global ids leak downstream."""
    from PIL import Image
    from ganspace_tpu.dissection import MultiSegmentDataset
    root = tmp_path / "oor"
    (root / "img").mkdir(parents=True)
    (root / "seg").mkdir()
    (root / "labelnames.json").write_text(json.dumps([
        {"field": "thing", "index": 0, "bitshift": 0, "bitmask": 255,
         "label": ["-", "a", "b"]},          # mask 255 >> table of 3
    ]))
    for i in range(3):                       # 75% split -> 2 train items
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            root / "img" / f"{i}.png")
        v = np.full((4, 4), 1, np.uint8)
        if i == 0:
            v[0, 0] = 40                     # out-of-table packed value
        Image.fromarray(np.stack([v, 0 * v, 0 * v], -1)).save(
            root / "seg" / f"{i}.png")
    ds = MultiSegmentDataset(root)
    img, seg, binc = ds[0]
    assert seg.max() < len(ds.labels)
    assert seg[0, 0, 0] == 0                 # unlabeled, not label 40
    assert binc.shape == (len(ds.labels),)
    imgs, segs, bincs = next(ds.batches(2, limit=2))   # stacks fine
    assert bincs.shape == (2, len(ds.labels))
