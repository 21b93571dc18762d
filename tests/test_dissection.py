"""Dissection engine on a tiny generator with the offline color segmenter."""

import json

import numpy as np
import pytest

from ganspace_tpu.dissection import ColorSegmenter, dissect, tally_stats, upsample_grid
from ganspace_tpu.dissection.report import generate_report, make_svg_bargraph
from ganspace_tpu.models.base import InstrumentedModel

from helpers import tiny_stylegan2

import jax.numpy as jnp


@pytest.fixture(scope="module")
def inst():
    model = tiny_stylegan2()
    model.use_z()
    return InstrumentedModel(model)


def test_upsample_grid():
    act = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4).astype(np.float32))
    up = upsample_grid(act, (16, 16))
    assert up.shape == (2, 3, 16, 16)
    # corners preserved under bilinear half-pixel resize within tolerance
    assert np.abs(np.asarray(up[:, :, ::4, ::4]).mean()
                  - np.asarray(act).mean()) < 0.2


def test_color_segmenter():
    seg = ColorSegmenter()
    labels, cats = seg.get_label_and_category_names()
    img = np.zeros((1, 3, 4, 4), np.float32)
    img[0, 0] = 1.0  # pure red
    out = np.asarray(seg.segment_batch(jnp.asarray(img)))
    assert labels[out[0, 0, 0]] == "red"


def test_tally_and_dissect(inst, tmp_path):
    stats = tally_stats(inst, "convs.0", n_samples=48, batch=16, k_top=4)
    units = stats["units"]
    assert units == 64
    assert stats["topk_values"].shape == (units, 4)
    assert np.all(np.diff(stats["topk_values"], axis=1) <= 1e-6)  # descending
    assert stats["quantiles"].count == 48 * 8 * 8

    report = dissect(inst, "convs.0", ColorSegmenter(), n_samples=48,
                     batch=16, stats=stats)
    assert len(report["units"]) == units
    ious = [r["iou"] for r in report["units"]]
    assert ious == sorted(ious, reverse=True)
    assert all(0.0 <= i <= 1.0 for i in ious)
    assert report["iou_matrix"].shape == (units, len(report["labels"]))
    # The fixed-threshold information-quality-ratio column rides the same
    # contingency counts (reference score_tally_stats).
    assert report["iqr_matrix"].shape == report["iou_matrix"].shape
    assert all(0.0 <= r["iqr"] <= 1.0 for r in report["units"])

    out = generate_report(report, tmp_path, inst=inst, n_units=5)
    assert out.is_file()
    data = json.loads((tmp_path / "dissect.json").read_text())
    assert data["layer"] == "convs.0"
    assert (tmp_path / "bargraph.svg").is_file()
    assert (tmp_path / "image" / f"unit_{report['units'][0]['unit']}.png").is_file()


def test_svg_bargraph():
    svg = make_svg_bargraph(["a", "b"], [0.5, 0.25])
    assert svg.startswith("<svg") and "rect" in svg and "0.500" in svg


def test_regenerate_sample_matches_top_activator():
    """ADVICE r1: top-sample indices must regenerate the latent that
    actually produced the recorded activation (batch-aligned seeds), for
    any s % batch != 0."""
    from ganspace_tpu.dissection.dissect import regenerate_sample

    model = tiny_stylegan2()
    inst = InstrumentedModel(model)
    layer = "convs.0"
    n, batch, seed = 64, 16, 9
    stats = tally_stats(inst, layer, n_samples=n, batch=batch, seed=seed,
                        k_top=4)
    assert stats["seed"] == seed and stats["batch"] == batch

    inst.retain_layer(layer)
    checked = 0
    for u in range(min(stats["units"], 8)):
        s = int(stats["topk_samples"][u][0])
        if s % batch == 0:
            continue  # the old buggy path got these right by luck
        z = regenerate_sample(model, s, seed=seed, batch=batch, n_samples=n)
        model.partial_forward(z, layer)
        act = np.asarray(inst.retained_features()[layer])
        got = act[0, u].max()
        want = stats["topk_values"][u][0]
        assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (u, s, got, want)
        checked += 1
    assert checked > 0, "no off-boundary top samples in this draw"


def test_dissect_per_unit_levels(inst):
    """Per-unit threshold override (the reference GAN mode's default picks
    per-unit agreement-maximizing levels, __main__.py:153-157)."""
    seg = ColorSegmenter()
    stats = tally_stats(inst, "convs.0", n_samples=8, batch=4, seed=1)
    units = stats["units"]
    rs = np.random.RandomState(0)
    levels = rs.rand(units).astype(np.float32)
    report = dissect(inst, "convs.0", seg, n_samples=8, batch=4, seed=1,
                     stats=stats, levels=levels)
    assert report["level_quantile"] == "per-unit"
    by_unit = {r["unit"]: r for r in report["units"]}
    for u in range(units):
        assert abs(by_unit[u]["activation_level"] - levels[u]) < 1e-6
    with pytest.raises(AssertionError):
        dissect(inst, "convs.0", seg, n_samples=8, batch=4, seed=1,
                stats=stats, levels=levels[:3])


def test_iqr_max_scores_synthetic():
    """Information-quality-ratio level search (reference collect_iqr): a unit
    perfectly predicted by one label scores ~1 at the true threshold; an
    independent unit and an absent label are gated to zero."""
    from ganspace_tpu.dissection import iqr_max_scores
    from ganspace_tpu.stats import RunningConditionalQuantile, RunningQuantile

    rng = np.random.RandomState(0)
    n = 20000
    is_a = rng.rand(n) < 0.25
    # unit 0 fires U(0.75, 1) exactly on label-A pixels, U(0, 0.75) elsewhere
    u0 = np.where(is_a, 0.75 + 0.25 * rng.rand(n), 0.75 * rng.rand(n))
    u1 = rng.rand(n)                       # unit 1: independent of the label
    acts = np.stack([u0, u1], axis=1).astype(np.float32)

    uncond = RunningQuantile(samplesize=4096)
    uncond.add(acts)
    cq = RunningConditionalQuantile(samplesize=4096)
    cq.add(0, acts[is_a])
    stats = {"unconditional": uncond, "conditional": cq,
             "labels": ["A", "B"],
             "label_fracs": np.array([is_a.mean(), 0.0], np.float32)}

    out = iqr_max_scores(stats)
    assert out["max_iqr"].shape == (2, 2)
    assert out["max_iqr"][0, 0] > 0.8
    assert abs(out["max_iqr_level"][0, 0] - 0.75) < 0.05
    assert out["max_iqr_agreement"][0, 0] > 0.95
    assert out["max_iqr_iou"][0, 0] > 0.9
    assert out["max_iqr"][1, 0] < 0.05     # independent unit: no information
    assert out["max_iqr"][:, 1].max() == 0.0         # label never observed


@pytest.mark.slow
def test_stats_cache_roundtrip(inst, tmp_path):
    """save_stats_cache/load_stats_cache reproduce the sketches exactly and
    refuse a provenance mismatch (the reference reuses per-pass npz files
    blindly; this cache is keyed on the draw geometry)."""
    from ganspace_tpu.dissection.dissect import (
        collect_stats_and_cond_quantiles, load_stats_cache, save_stats_cache,
    )

    stats, cond = collect_stats_and_cond_quantiles(
        inst, "convs.0", ColorSegmenter(), n_samples=16, batch=8, seed=2)
    prov = {"model": "tiny", "layer": "convs.0", "n": 16, "seed": 2}
    p = tmp_path / "stats_cache.npz"
    save_stats_cache(p, stats, cond, prov)

    s2, c2 = load_stats_cache(p, prov)
    qs = np.array([0.25, 0.5, 0.995])
    np.testing.assert_array_equal(s2["topk_values"], stats["topk_values"])
    np.testing.assert_array_equal(s2["topk_samples"], stats["topk_samples"])
    np.testing.assert_array_equal(s2["quantiles"].quantiles(qs),
                                  stats["quantiles"].quantiles(qs))
    assert (s2["seed"], s2["batch"], s2["n_samples"]) == (2, 8, 16)
    np.testing.assert_array_equal(c2["label_fracs"], cond["label_fracs"])
    assert set(c2["conditional"].keys()) == set(cond["conditional"].keys())
    for l in cond["conditional"].keys():
        np.testing.assert_array_equal(
            c2["conditional"].conditional(l).quantiles(qs),
            cond["conditional"].conditional(l).quantiles(qs))
    np.testing.assert_array_equal(c2["unconditional"].quantiles(qs),
                                  cond["unconditional"].quantiles(qs))

    # provenance mismatch -> full recompute signal
    assert load_stats_cache(p, {**prov, "n": 32}) == (None, None)
    assert load_stats_cache(p, {**prov, "extra": "x"}) == (None, None)
    assert load_stats_cache(tmp_path / "missing.npz", prov) == (None, None)


def test_tally_cache_roundtrip(inst, tmp_path):
    """dissect(cache_path=...) reuses the tally counts only when provenance
    and the exact per-unit levels match (reference bincounts npz)."""
    seg = ColorSegmenter()
    stats = tally_stats(inst, "convs.0", n_samples=16, batch=8, seed=1)
    prov = {"model": "tiny", "layer": "convs.0", "n": 16}
    p = tmp_path / "tally_cache.npz"
    kw = dict(n_samples=16, batch=8, seed=1, stats=stats,
              cache_path=p, cache_provenance=prov)

    r1 = dissect(inst, "convs.0", seg, **kw)
    assert p.is_file()
    r2 = dissect(inst, "convs.0", seg, **kw)          # cache hit
    np.testing.assert_array_equal(r1["iou_matrix"], r2["iou_matrix"])
    np.testing.assert_array_equal(r1["iqr_matrix"], r2["iqr_matrix"])

    # different levels -> miss (recompute, still equal numerically here
    # because the quantile is the same; assert via a genuinely different one)
    r3 = dissect(inst, "convs.0", seg, n_samples=16, batch=8, seed=1,
                 stats=stats, level_quantile=0.5,
                 cache_path=p, cache_provenance=prov)
    assert not np.array_equal(r1["iou_matrix"], r3["iou_matrix"])
    # and the cache now holds the 0.5-quantile tally; the original levels
    # miss and recompute to the same numbers
    r4 = dissect(inst, "convs.0", seg, **kw)
    np.testing.assert_allclose(r1["iou_matrix"], r4["iou_matrix"],
                               rtol=1e-6, atol=1e-7)
    # provenance mismatch -> miss
    r5 = dissect(inst, "convs.0", seg, n_samples=16, batch=8, seed=1,
                 stats=stats, cache_path=p,
                 cache_provenance={**prov, "n": 32})
    np.testing.assert_allclose(r1["iou_matrix"], r5["iou_matrix"],
                               rtol=1e-6, atol=1e-7)


def test_corrupt_cache_recomputes(inst, tmp_path):
    """A truncated/corrupt cache npz (e.g. Ctrl-C mid-write of an older,
    non-atomic writer) must signal recompute, not crash with BadZipFile."""
    from ganspace_tpu.dissection.dissect import (
        _load_tally_cache, collect_stats_and_cond_quantiles,
        load_stats_cache, save_stats_cache,
    )

    prov = {"model": "tiny", "layer": "convs.0", "n": 16}
    p = tmp_path / "stats_cache.npz"

    # not-a-zip garbage
    p.write_bytes(b"\x00garbage not a zip")
    assert load_stats_cache(p, prov) == (None, None)
    assert _load_tally_cache(p, prov, np.zeros(4, np.float32)) is None

    # truncated but zip-magic-prefixed file (what an interrupted write makes)
    stats, cond = collect_stats_and_cond_quantiles(
        inst, "convs.0", ColorSegmenter(), n_samples=16, batch=8, seed=2)
    save_stats_cache(p, stats, cond, prov)
    whole = p.read_bytes()
    p.write_bytes(whole[: len(whole) // 2])
    assert load_stats_cache(p, prov) == (None, None)

    # atomic write: no .tmp sibling survives a successful save
    save_stats_cache(p, stats, cond, prov)
    assert not list(tmp_path.glob("*.tmp.npz"))
    s2, c2 = load_stats_cache(p, prov)
    assert s2 is not None and c2 is not None
