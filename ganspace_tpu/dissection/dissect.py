"""GAN-dissection engine (reference ``netdissect/dissection.py``, 1617 LoC).

Quantifies what individual convolutional units of a generator encode:

  1. **stats pass** — stream N generated samples, collecting per-unit
     activation quantiles (level-compaction sketch) and per-unit top-k
     images (reference ``collect_quantiles_and_topk``, ``dissection.py:680``);
  2. **tally pass** — threshold each unit at a top quantile, upsample the
     unit mask to image resolution, and accumulate intersection/union
     counts against a semantic segmentation of the same images (reference
     ``collect_bincounts``/IoU scoring, ``dissection.py:743,1008``);
  3. **report** — per-unit best-matching concept + IoU, serialized as JSON
     + HTML with SVG bargraphs (see ``report.py``).

The segmenter is a protocol (the reference hardwires the unified-parsing
checkpoint, ``netdissect/segmenter.py:48``, whose weights need a download);
:class:`ColorSegmenter` is a self-contained color-space segmenter so the full
pipeline runs and is testable offline, and any checkpoint-backed semantic
segmenter drops into the same slot.

TPU notes: both passes are streaming and batch-sharded; the per-batch
reductions (quantile sketch inserts, top-k merges, bincount accumulation)
run on device; only uint8 top-image crops come back to the host.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.models.base import InstrumentedModel
from ganspace_tpu.stats import (
    RunningConditionalQuantile, RunningCrossCovariance, RunningQuantile,
)


def upsample_grid(act: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample of unit activations [B, U, h, w] to image ``size``
    (reference ``upsample_grid``, ``dissection.py:1322``)."""
    b, u, h, w = act.shape
    return jax.image.resize(act, (b, u, size[0], size[1]), method="bilinear")


class SegmenterBase:
    """Protocol (reference ``BaseSegmenter``, ``netdissect/segmenter.py:11``)."""

    def get_label_and_category_names(self) -> Tuple[List[str], List[str]]:
        raise NotImplementedError

    def segment_batch(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, 3, H, W] in [0,1] -> integer labels [B, H, W], or
        multi-channel [B, C, H, W] when a pixel carries one label per
        category (object/part/material), as the unified-parsing segmenter
        returns."""
        raise NotImplementedError

    def class_probability(self, images: jnp.ndarray,
                          classnum: int) -> jnp.ndarray:
        """Differentiable per-pixel probability [B, H, W] of one flat label
        (the ACE objective's signal).  Optional — only segmenters used with
        ``ace_optimize`` need it."""
        raise NotImplementedError(
            f"{type(self).__name__} does not expose class probabilities")

    def _check_classnum(self, classnum: int) -> None:
        """Validate a flat label index against ``self.labels``."""
        if not 1 <= classnum < len(self.labels):
            raise ValueError(
                f"classnum {classnum} out of range (flat label 0 is '-'; "
                f"valid classes are 1..{len(self.labels) - 1})")

    def _check_not_divided(self, classnum: int) -> None:
        """Quadrant-divided pseudo-labels (``segdiv='quad'``) are hard
        label-map constructs with no differentiable probability —
        the reference's predict_single_class documents the same limit."""
        div_base = getattr(self, "_div_base", None)
        if div_base is not None and classnum >= div_base:
            raise ValueError(
                f"classnum {classnum} ('{self.labels[classnum]}') is a "
                f"subdivided quadrant label; class probabilities exist only "
                f"for base labels (< {div_base})")


class ColorSegmenter(SegmenterBase):
    """Checkpoint-free segmenter: nearest-anchor color quantization.

    Labels pixels by their nearest anchor in RGB space — enough structure
    for the IoU machinery to find genuinely color-selective units, and fully
    offline.  Swap in a semantic segmenter for concept-level dissection.
    """

    ANCHORS = np.array([
        [0.05, 0.05, 0.05], [0.95, 0.95, 0.95], [0.8, 0.15, 0.15],
        [0.15, 0.8, 0.15], [0.15, 0.15, 0.8], [0.85, 0.85, 0.2],
        [0.8, 0.4, 0.1], [0.55, 0.3, 0.6], [0.5, 0.5, 0.5],
    ], np.float32)
    NAMES = ["black", "white", "red", "green", "blue", "yellow",
             "orange", "purple", "gray"]

    def get_label_and_category_names(self):
        return list(self.NAMES), ["color"] * len(self.NAMES)

    def segment_batch(self, images):
        px = jnp.transpose(images, (0, 2, 3, 1))                  # [B, H, W, 3]
        d = jnp.sum(
            jnp.square(px[..., None, :] - jnp.asarray(self.ANCHORS)), axis=-1)
        return jnp.argmin(d, axis=-1)                             # [B, H, W]

    def class_probability(self, images, classnum, tau: float = 0.02):
        """Softmax over negative anchor distances — a differentiable
        relaxation of the hard nearest-anchor assignment."""
        px = jnp.transpose(images, (0, 2, 3, 1))
        d = jnp.sum(
            jnp.square(px[..., None, :] - jnp.asarray(self.ANCHORS)), axis=-1)
        return jax.nn.softmax(-d / tau, axis=-1)[..., classnum]


def _acts_and_image(inst: InstrumentedModel, layer: str, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
    inst.retain_layer(layer)
    img = inst.model.forward(z)
    act = inst.retained_features()[layer]
    return act, jnp.clip(img, 0.0, 1.0)


class _StatsAccum:
    """Per-unit quantile sketch + top-k (value, sample index) accumulator —
    the shared per-batch body of :func:`tally_stats` and the fused pass."""

    def __init__(self, k_top: int, samplesize: int):
        self.k_top = k_top
        self.samplesize = samplesize
        self.rq: Optional[RunningQuantile] = None
        self.topk_val: Optional[np.ndarray] = None   # [U, k]
        self.topk_idx: Optional[np.ndarray] = None

    def update(self, act: jnp.ndarray, start: int) -> None:
        """act [B,U,h,w]; ``start`` = global index of the batch's first
        sample (merged into the top-k index lists)."""
        bsz, units = act.shape[0], act.shape[1]
        per_image_max = np.asarray(
            jnp.max(act.reshape(bsz, units, -1), axis=2))
        flat = np.asarray(jnp.transpose(act, (0, 2, 3, 1)).reshape(-1, units))
        if self.rq is None:
            self.rq = RunningQuantile(samplesize=self.samplesize)
            self.topk_val = np.full((units, self.k_top), -np.inf, np.float32)
            self.topk_idx = np.zeros((units, self.k_top), np.int64)
        self.rq.add(flat)
        # merge per-image maxima into the top-k (value, sample index) lists
        cand_val = np.concatenate([self.topk_val, per_image_max.T], axis=1)
        cand_idx = np.concatenate(
            [self.topk_idx, np.broadcast_to(np.arange(start, start + bsz),
                                            (units, bsz))], axis=1)
        order = np.argsort(-cand_val, axis=1)[:, :self.k_top]
        self.topk_val = np.take_along_axis(cand_val, order, axis=1)
        self.topk_idx = np.take_along_axis(cand_idx, order, axis=1)

    def result(self, *, seed: int, batch: int, n_samples: int) -> Dict:
        return {"quantiles": self.rq, "topk_values": self.topk_val,
                "topk_samples": self.topk_idx,
                "units": self.topk_val.shape[0],
                # RNG geometry, so sample indices regenerate faithfully
                "seed": seed, "batch": batch, "n_samples": n_samples}


def tally_stats(inst: InstrumentedModel, layer: str, *, n_samples: int = 1000,
                batch: int = 16, seed: int = 1, k_top: int = 8,
                samplesize: int = 1024):
    """Stats pass: per-unit quantile sketch + top-k sample indices/values."""
    model = inst.model
    acc = _StatsAccum(k_top, samplesize)
    np.random.seed(seed)
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        z = model.sample_latent(b, seed=seed + start)
        act, _ = _acts_and_image(inst, layer, z)
        if act.ndim == 2:
            act = act[:, :, None, None]
        acc.update(act, start)
    return acc.result(seed=seed, batch=batch, n_samples=n_samples)


def regenerate_sample(model, s: int, *, seed: int, batch: int, n_samples: int):
    """Latent of global sample index ``s``, exactly as the stats passes drew
    it: batches start at multiples of ``batch`` with seed ``seed + start``,
    so ``s`` is row ``s - start`` of its batch.  (Drawing
    ``sample_latent(1, seed=seed + s)`` instead returns an *unrelated*
    latent for any ``s % batch != 0`` — the reference avoids the hazard by
    indexing one fixed z_universe.)"""
    s = int(s)
    start = (s // batch) * batch
    b = min(batch, n_samples - start)
    z = model.sample_latent(b, seed=seed + start)
    return z[s - start][None]


def _flatten_seg(seg: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W] or [B,C,H,W] -> [B,C,H,W] (C=1 for single-channel)."""
    return seg[:, None] if seg.ndim == 3 else seg


@lru_cache(maxsize=None)
def _label_sampler(n_labels: int, pixels_per_label: int):
    """Jitted Gumbel-max per-label pixel sampler (cached per config, so
    repeated passes reuse one trace).

    TPU formulation: instead of the reference's dynamic per-label gathers
    (data-dependent shapes), each batch draws a *fixed* ``pixels_per_label``
    pixel sample per present label via Gumbel-max categorical sampling over
    the label mask — static shapes, one jitted draw per batch, and the
    sketch insert stays O(pixels_per_label) regardless of label frequency.
    """

    @jax.jit
    def _label_samples(act_up, seg, key):
        """act_up [B,U,H,W], seg [B,C,H,W] ->
        (per-label pixel samples [L, P, U], per-label pixel counts [L])."""
        b, u = act_up.shape[0], act_up.shape[1]
        flat_act = act_up.transpose(0, 2, 3, 1).reshape(-1, u)   # [BHW, U]
        onehot = jnp.zeros((flat_act.shape[0], n_labels), jnp.float32)
        for c in range(seg.shape[1]):
            onehot = jnp.maximum(
                onehot, jax.nn.one_hot(seg[:, c].reshape(-1), n_labels))
        counts = jnp.sum(onehot, axis=0)                          # [L]
        # Gumbel-max: top-P indices of log(mask) + gumbel per label
        g = jax.random.gumbel(key, (n_labels, flat_act.shape[0]))
        scores = jnp.where(onehot.T > 0, g, -jnp.inf)
        _, idx = jax.lax.top_k(scores, pixels_per_label)          # [L, P]
        return flat_act[idx], counts

    return _label_samples


class _CondAccum:
    """Conditional + unconditional sketch accumulator — the shared per-batch
    body of :func:`collect_cond_quantiles` and the fused pass."""

    def __init__(self, labels: List[str], pixels_per_label: int,
                 samplesize: int):
        self.labels = labels
        self.n_labels = len(labels)
        self.pixels_per_label = pixels_per_label
        self.cq = RunningConditionalQuantile(samplesize=samplesize)
        self.uncond = RunningQuantile(samplesize=samplesize)
        self.label_px = np.zeros((self.n_labels,), np.float64)
        self.total_px = 0.0

    def update(self, act: jnp.ndarray, img: jnp.ndarray,
               segmenter: SegmenterBase, key) -> "jax.Array":
        """One batch of (activations, images) -> the next PRNG key."""
        seg = _flatten_seg(segmenter.segment_batch(img))
        act_up = upsample_grid(act, seg.shape[-2:])
        key, sub = jax.random.split(key)
        samples, counts = _label_sampler(
            self.n_labels, self.pixels_per_label)(act_up, seg, sub)
        counts = np.asarray(counts)
        self.label_px += counts
        self.total_px += act_up.shape[0] * act_up.shape[2] * act_up.shape[3]
        self.uncond.add(np.asarray(
            act_up.transpose(0, 2, 3, 1).reshape(-1, act.shape[1])))
        samples = np.asarray(samples)
        for l in range(self.n_labels):
            n_px = int(counts[l])
            if n_px == 0:
                continue
            take = min(self.pixels_per_label, n_px)
            self.cq.add(l, samples[l, :take])
        return key

    def result(self) -> Dict:
        return {"conditional": self.cq, "unconditional": self.uncond,
                "labels": self.labels,
                "label_fracs": (self.label_px /
                                max(self.total_px, 1.0)).astype(np.float32)}


def collect_cond_quantiles(inst: InstrumentedModel, layer: str,
                           segmenter: SegmenterBase, *, n_samples: int = 256,
                           batch: int = 16, seed: int = 1,
                           pixels_per_label: int = 256,
                           samplesize: int = 1024) -> Dict:
    """Conditional quantile pass (reference ``collect_cond_quantiles``,
    ``dissection.py:878``): per-label sketches of unit activations at pixels
    carrying that label, plus the unconditional sketch.  (See
    :func:`_label_sampler` for the static-shape TPU formulation.)"""
    model = inst.model
    labels, _ = segmenter.get_label_and_category_names()
    acc = _CondAccum(labels, pixels_per_label, samplesize)
    key = jax.random.PRNGKey(seed)
    np.random.seed(seed)
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        z = model.sample_latent(b, seed=seed + start)
        act, img = _acts_and_image(inst, layer, z)
        if act.ndim == 2:
            act = act[:, :, None, None]
        key = acc.update(act, img, segmenter, key)
    return acc.result()


def collect_stats_and_cond_quantiles(
        inst: InstrumentedModel, layer: str, segmenter: SegmenterBase, *,
        n_samples: int = 256, batch: int = 16, seed: int = 1, k_top: int = 8,
        pixels_per_label: int = 256,
        samplesize: int = 1024) -> Tuple[Dict, Dict]:
    """Fused stats + conditional-quantile pass: ONE synthesis/segmentation
    stream feeds both the per-unit quantile sketch + top-k
    (:func:`tally_stats`) and the per-label conditional sketches
    (:func:`collect_cond_quantiles`).  The per-unit-threshold CLI modes
    (``--quantile iqr/maxiou``, ``--iqr``, ``--maxiou``) need both, and the
    generator forward dominates each pass on TPU, so fusing removes one of
    the pipeline's three synthesis sweeps.  (The reference streams them as
    separate passes, ``dissection.py:680,878``.)

    Returns ``(stats, cond_stats)``, each bit-identical to the separate
    passes: the same per-batch latent seeds, the same sketch-compaction key
    sequences (each sketch carries its own PRNG), and the same per-batch
    Gumbel keys.
    """
    model = inst.model
    labels, _ = segmenter.get_label_and_category_names()
    stats_acc = _StatsAccum(k_top, samplesize)
    cond_acc = _CondAccum(labels, pixels_per_label, samplesize)
    key = jax.random.PRNGKey(seed)
    np.random.seed(seed)
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        z = model.sample_latent(b, seed=seed + start)
        act, img = _acts_and_image(inst, layer, z)
        if act.ndim == 2:
            act = act[:, :, None, None]
        stats_acc.update(act, start)              # raw-res sketch + top-k
        key = cond_acc.update(act, img, segmenter, key)  # upsampled sketches
    return (stats_acc.result(seed=seed, batch=batch, n_samples=n_samples),
            cond_acc.result())


def save_stats_cache(path, stats: Optional[Dict] = None,
                     cond: Optional[Dict] = None,
                     provenance: Optional[Dict] = None) -> None:
    """Serialize the stats / conditional-quantile pass results to one npz.

    The reference caches every expensive pass as npz files under outdir and
    silently reuses whatever it finds there (``dissection.py:700-712,
    888-895,1061-1074``); this cache additionally records its draw geometry
    (``provenance``) and :func:`load_stats_cache` only reuses an exact
    match — a stale or foreign file recomputes instead of silently
    corrupting the run."""
    out = {}
    for k, v in (provenance or {}).items():
        out[f"prov_{k}"] = np.asarray(v)
    if stats is not None:
        for k, v in stats["quantiles"].state_dict().items():
            out[f"rq_{k}"] = v
        out["topk_values"] = stats["topk_values"]
        out["topk_samples"] = stats["topk_samples"]
        for k in ("units", "seed", "batch", "n_samples"):
            out[f"stats_{k}"] = np.int64(stats[k])
    if cond is not None:
        for label_key, sub in cond["conditional"].state_dict().items():
            for k, v in sub.items():
                out[f"cond_{label_key}__{k}"] = v
        for k, v in cond["unconditional"].state_dict().items():
            out[f"uncond_{k}"] = v
        out["labels"] = np.asarray(cond["labels"])
        out["label_fracs"] = cond["label_fracs"]
    _savez_atomic(path, out)


def _savez_atomic(path, arrays: Dict) -> None:
    """np.savez to a sibling temp file, then rename over ``path``.

    Cache writes can be interrupted (Ctrl-C mid-savez); a truncated zip at
    the stable cache path would otherwise poison every later run of the
    same command."""
    import os
    from pathlib import Path

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # pid-unique, .npz-suffixed (savez appends .npz otherwise) so concurrent
    # writers of the same cache can't interleave into one temp file
    tmp = path.with_name(f"{path.stem}.{os.getpid()}.tmp.npz")
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _load_npz_cache(path):
    """np.load a cache file, returning None on ANY unreadable/corrupt file.

    Truncated zips raise ``zipfile.BadZipFile`` (not OSError/ValueError), and
    corrupt *members* only raise when lazily read — so callers must also keep
    member reads inside their own guard (see the load functions below)."""
    from pathlib import Path

    path = Path(path)
    if not path.is_file():
        return None
    try:
        # Eager read of every member: corruption surfaces here, not at a
        # lazy data[key] access later.
        with np.load(path, allow_pickle=False) as data:
            return {k: data[k] for k in data.files}
    except Exception as e:
        print(f"Warning: ignoring unreadable cache {path} ({e!r}); "
              f"recomputing")
        return None


def load_stats_cache(path, provenance: Dict
                     ) -> Tuple[Optional[Dict], Optional[Dict]]:
    """Inverse of :func:`save_stats_cache`: returns ``(stats, cond)``
    (either may be None) — all None unless every provenance field matches
    the stored one exactly."""
    data = _load_npz_cache(path)
    if data is None:
        return None, None
    for k, v in provenance.items():
        key = f"prov_{k}"
        if key not in data or str(data[key]) != str(np.asarray(v)):
            return None, None

    try:
        stats = None
        if "topk_values" in data:
            rq = RunningQuantile().set_state_dict(
                {k[len("rq_"):]: data[k] for k in data
                 if k.startswith("rq_")})
            stats = {"quantiles": rq, "topk_values": data["topk_values"],
                     "topk_samples": data["topk_samples"],
                     "units": int(data["stats_units"]),
                     "seed": int(data["stats_seed"]),
                     "batch": int(data["stats_batch"]),
                     "n_samples": int(data["stats_n_samples"])}
        cond = None
        if "label_fracs" in data:
            nested: Dict[str, Dict] = {}
            for k in data:
                if k.startswith("cond_"):
                    label_key, sub = k[len("cond_"):].split("__", 1)
                    nested.setdefault(label_key, {})[sub] = data[k]
            cq = RunningConditionalQuantile().set_state_dict(nested)
            uncond = RunningQuantile().set_state_dict(
                {k[len("uncond_"):]: data[k] for k in data
                 if k.startswith("uncond_")})
            cond = {"conditional": cq, "unconditional": uncond,
                    "labels": [str(l) for l in data["labels"]],
                    "label_fracs": np.asarray(data["label_fracs"])}
    except (KeyError, ValueError) as e:
        print(f"Warning: ignoring malformed stats cache {path} ({e!r}); "
              f"recomputing")
        return None, None
    return stats, cond


def iqr_scores(cond_stats: Dict, quantile: float = 0.5) -> np.ndarray:
    """Median-shift relevance: score[u, l] = (median(act | label l) -
    median(act)) / interquartile-range(act).  A cheap robust effect-size
    ranking; the reference's "IQR" proper is the *information quality ratio*
    — see :func:`iqr_max_scores` (level search, ``dissection.py:1049``) and
    the tally-threshold ``iqr_matrix`` :func:`dissect` attaches
    (``score_tally_stats``, ``dissection.py:661``)."""
    uncond = cond_stats["unconditional"]
    qs = uncond.quantiles(np.array([0.25, quantile, 0.75]))       # [U, 3]
    iqr = np.maximum(qs[:, 2] - qs[:, 0], 1e-9)
    n_labels = len(cond_stats["labels"])
    units = qs.shape[0]
    out = np.zeros((units, n_labels), np.float32)
    cq = cond_stats["conditional"]
    for l in range(n_labels):
        if not cq.has_conditional(l):
            continue
        med_l = cq.conditional(l).quantiles(quantile)[:, 0]
        out[:, l] = (med_l - qs[:, 1]) / iqr
    return out


def maxiou_scores(cond_stats: Dict, n_levels: int = 100) -> Dict:
    """Per-unit IoU-maximizing thresholds (reference ``collect_maxiou``,
    ``dissection.py:1008``): instead of one fixed activation quantile, search
    ``n_levels`` log-spaced exceedance fractions (1e-3..1) and keep, per
    (unit, label), the threshold with the best IoU.  Pure post-processing on
    the conditional-quantile sketches — no extra data pass:

        isect(u, l, k) = P(act_u > level_k | label l) * P(label l)
        union(u, l, k) = P(label l) + P(act_u > level_k) - isect
        max_iou(u, l)  = max_k isect / union

    (The reference normalizes the union term per annotation *category*;
    this pipeline tallies labels flat, so the unconditional distribution
    plays that role — equivalent whenever there is a single category.)

    Returns {"max_iou" [U, L], "max_iou_level" [U, L],
             "max_iou_quantile" [U, L]} (the npz fields of the reference's
    ``max_iou.npz``).
    """
    uncond = cond_stats["unconditional"]
    cq = cond_stats["conditional"]
    label_fracs = np.asarray(cond_stats["label_fracs"], np.float64)
    n_labels = len(cond_stats["labels"])

    fracs = np.logspace(-3, 0, n_levels)             # exceedance fractions
    levels = uncond.quantiles(1.0 - fracs)           # [U, K]
    units = levels.shape[0]
    denom = 1.0 - uncond.normalize(levels)           # [U, K] = P(act > level)

    max_iou = np.zeros((units, n_labels), np.float32)
    max_level = np.zeros((units, n_labels), np.float32)
    max_quantile = np.zeros((units, n_labels), np.float32)
    for l in range(n_labels):
        if not cq.has_conditional(l) or label_fracs[l] <= 0:
            continue
        isect = (1.0 - cq.conditional(l).normalize(levels)) * label_fracs[l]
        union = label_fracs[l] + denom - isect
        iou = isect / np.maximum(union, 1e-30)       # [U, K]
        best = np.argmax(iou, axis=1)                # [U]
        rows = np.arange(units)
        max_iou[:, l] = iou[rows, best]
        max_level[:, l] = levels[rows, best]
        max_quantile[:, l] = fracs[best]
    return {"max_iou": max_iou, "max_iou_level": max_level,
            "max_iou_quantile": max_quantile}


def _information_quality_ratio(a00, a01, a10, a11):
    """MI, joint entropy, and their ratio for a 2x2 contingency table of
    probabilities, elementwise over the trailing dims (reference
    ``mutual_information``/``joint_entropy``/``information_quality_ratio``,
    ``dissection.py:1161-1185``).  0·log0 terms and 0/0 ratios -> 0."""
    arr = np.clip(np.stack([np.stack([a00, a01]), np.stack([a10, a11])]),
                  0.0, 1.0)
    rows = arr.sum(axis=1, keepdims=True)                    # [2,1,...]
    cols = arr.sum(axis=0, keepdims=True)                    # [1,2,...]
    with np.errstate(divide="ignore", invalid="ignore"):
        mi_terms = arr * np.log(arr / (rows * cols))
        je_terms = arr * np.log(arr)
    mi = np.clip(np.nansum(mi_terms, axis=(0, 1)), 0.0, None)
    je = np.clip(-np.nansum(je_terms, axis=(0, 1)), 0.0, None)
    with np.errstate(divide="ignore", invalid="ignore"):
        iqr = mi / je
    iqr = np.where(np.isfinite(iqr), iqr, 0.0)
    return mi, je, iqr


def iqr_max_scores(cond_stats: Dict, n_levels: int = 100,
                   agreement_min: float = 0.8,
                   min_label_frac: float = 1e-3) -> Dict:
    """Per-unit information-quality-ratio-maximizing thresholds (reference
    ``collect_iqr``, ``dissection.py:1049-1159``): search ``n_levels``
    log-spaced exceedance fractions and keep, per (unit, label), the level
    maximizing IQR = MI(unit fires; label present) / H_joint of the 2x2
    contingency table — zeroing candidates whose raw agreement
    P(both) + P(neither) <= ``agreement_min`` or whose activation level is
    <= 0 (the reference's positively-correlated, positive-threshold
    constraint), and distrusting labels rarer than ``min_label_frac``.
    Pure post-processing on the conditional-quantile sketches.

    (Same flat-tally caveat as :func:`maxiou_scores`: the reference
    normalizes P(unit fires) per annotation *category*; here the
    unconditional distribution plays that role.)

    Returns the per-(unit, label) [U, L] fields of the reference's
    ``iqr.npz``: {"max_iqr", "max_iqr_level", "max_iqr_quantile",
    "max_iqr_agreement", "max_iqr_iou"}.
    """
    uncond = cond_stats["unconditional"]
    cq = cond_stats["conditional"]
    label_fracs = np.asarray(cond_stats["label_fracs"], np.float64)
    n_labels = len(cond_stats["labels"])

    fracs = np.logspace(-3, 0, n_levels)             # exceedance fractions
    levels = uncond.quantiles(1.0 - fracs)           # [U, K]
    units = levels.shape[0]
    preds = 1.0 - uncond.normalize(levels)           # [U, K] = P(act > level)

    out = {k: np.zeros((units, n_labels), np.float32)
           for k in ("max_iqr", "max_iqr_level", "max_iqr_quantile",
                     "max_iqr_agreement", "max_iqr_iou")}
    rows = np.arange(units)
    for l in range(n_labels):
        if not cq.has_conditional(l) or label_fracs[l] < min_label_frac:
            continue
        truth = label_fracs[l]
        isect = (1.0 - cq.conditional(l).normalize(levels)) * truth  # [U, K]
        union = truth + preds - isect
        _, _, iqr = _information_quality_ratio(
            isect, preds - isect, truth - isect, 1.0 - union)
        iqr[:, -1] = 0.0          # the 1.0 quantile carries no information
        agreement = np.clip(isect, 0, 1) + np.clip(1.0 - union, 0, 1)
        iqr = np.where(agreement <= agreement_min, 0.0, iqr)
        iqr = np.where(levels <= 0.0, 0.0, iqr)
        best = np.argmax(iqr, axis=1)                # [U]
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = isect / union
        iou = np.where(np.isfinite(iou), iou, 0.0)
        out["max_iqr"][:, l] = iqr[rows, best]
        out["max_iqr_level"][:, l] = levels[rows, best]
        out["max_iqr_quantile"][:, l] = fracs[best]
        out["max_iqr_agreement"][:, l] = agreement[rows, best]
        out["max_iqr_iou"][:, l] = iou[rows, best]
    return out


def collect_covariance(inst: InstrumentedModel, layer: str,
                       segmenter: SegmenterBase, *, n_samples: int = 256,
                       batch: int = 16, seed: int = 1) -> Dict:
    """Unit-activation / label-fraction cross-covariance pass (reference
    ``dissection.py:1187``): streams per-image mean unit activations against
    per-image label pixel fractions through the Chan-stable accumulator."""
    model = inst.model
    labels, _ = segmenter.get_label_and_category_names()
    n_labels = len(labels)
    rcc = RunningCrossCovariance()

    @jax.jit
    def _features(act, seg):
        unit_mean = jnp.mean(act.reshape(act.shape[0], act.shape[1], -1), -1)
        onehot = jnp.zeros(seg.shape[:1] + seg.shape[-2:] + (n_labels,))
        for c in range(seg.shape[1]):
            onehot = jnp.maximum(onehot, jax.nn.one_hot(seg[:, c], n_labels))
        frac = jnp.mean(onehot, axis=(1, 2))
        return unit_mean, frac

    np.random.seed(seed)
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        z = model.sample_latent(b, seed=seed + start)
        act, img = _acts_and_image(inst, layer, z)
        if act.ndim == 2:
            act = act[:, :, None, None]
        seg = _flatten_seg(segmenter.segment_batch(img))
        unit_mean, frac = _features(act, seg)
        rcc.add(unit_mean, frac)
    return {"cross": rcc, "labels": labels,
            "correlation": rcc.correlation()}


def _save_tally_cache(path, provenance: Optional[Dict], levels: np.ndarray,
                      tally) -> None:
    """Cache the tally contingency counts (reference ``bincounts`` npz,
    ``dissection.py:743-765``), keyed on provenance + exact levels."""
    inter, act, seg, total_px = tally
    out = {f"prov_{k}": np.asarray(v) for k, v in (provenance or {}).items()}
    out.update(levels=np.asarray(levels, np.float32), inter=inter,
               act_count=act, seg_count=seg, total_px=np.int64(total_px))
    _savez_atomic(path, out)


def _load_tally_cache(path, provenance: Optional[Dict], levels: np.ndarray):
    """Inverse of :func:`_save_tally_cache`; None unless provenance AND the
    threshold levels match exactly."""
    data = _load_npz_cache(path)
    if data is None:
        return None
    for k, v in (provenance or {}).items():
        key = f"prov_{k}"
        if key not in data or str(data[key]) != str(np.asarray(v)):
            return None
    if "levels" not in data or not np.array_equal(
            data["levels"], np.asarray(levels, np.float32)):
        return None
    try:
        return (data["inter"], data["act_count"], data["seg_count"],
                int(data["total_px"]))
    except (KeyError, ValueError):
        return None


def dissect(inst: InstrumentedModel, layer: str, segmenter: SegmenterBase, *,
            n_samples: int = 1000, batch: int = 16, seed: int = 1,
            level_quantile: float = 0.995, k_top: int = 8,
            stats: Optional[dict] = None,
            levels: Optional[np.ndarray] = None,
            cache_path=None, cache_provenance: Optional[Dict] = None) -> Dict:
    """Full dissection of one layer; returns the report dict
    (units ranked by best-concept IoU).

    ``levels`` overrides the fixed-quantile unit thresholds with a per-unit
    [U] array — e.g. the IoU-maximizing levels from :func:`maxiou_scores`
    (the reference's GAN mode picks per-unit agreement-maximizing thresholds
    by default, ``__main__.py:153-157`` + ``dissection.py:102-115``).

    ``cache_path`` caches the tally counts (the reference's per-pass
    ``bincounts`` npz, ``dissection.py:743-765``), reused only when
    ``cache_provenance`` AND the exact threshold levels match.
    """
    model = inst.model
    stats = stats or tally_stats(inst, layer, n_samples=n_samples, batch=batch,
                                 seed=seed, k_top=k_top)
    units = stats["units"]
    if levels is None:
        levels = jnp.asarray(stats["quantiles"].quantiles(level_quantile)[:, 0])
        level_desc = level_quantile
    else:
        levels = jnp.asarray(np.asarray(levels, np.float32).reshape(-1))
        assert levels.shape[0] == units, \
            f"per-unit levels [{levels.shape[0]}] != units [{units}]"
        level_desc = "per-unit"

    labels, categories = segmenter.get_label_and_category_names()
    n_labels = len(labels)

    cached = _load_tally_cache(cache_path, cache_provenance,
                               np.asarray(levels)) \
        if cache_path is not None else None

    inter = jnp.zeros((units, n_labels))
    act_count = jnp.zeros((units,))
    seg_count = jnp.zeros((n_labels,))
    total_px = 0

    @jax.jit
    def _tally(act, seg, inter, act_count, seg_count):
        b, u = act.shape[0], act.shape[1]
        size = seg.shape[-2:]
        up = upsample_grid(act, size)                      # [B, U, H, W]
        mask = (up > levels[None, :, None, None]).astype(jnp.float32)
        if seg.ndim == 4:
            # Multi-channel seg: a pixel holds one label per category;
            # union the per-channel one-hots (a label can't repeat across
            # categories, so a plain max is exact).
            onehot = jnp.max(
                jax.nn.one_hot(seg, n_labels, dtype=jnp.float32), axis=1)
        else:
            onehot = jax.nn.one_hot(seg, n_labels, dtype=jnp.float32)  # [B,H,W,L]
        inter = inter + jnp.einsum("buhw,bhwl->ul", mask, onehot)
        act_count = act_count + jnp.sum(mask, axis=(0, 2, 3))
        seg_count = seg_count + jnp.sum(onehot, axis=(0, 1, 2))
        return inter, act_count, seg_count

    if cached is not None:
        inter_np, act_np, seg_np, total_px = cached
    else:
        np.random.seed(seed)
        for start in range(0, n_samples, batch):
            b = min(batch, n_samples - start)
            z = model.sample_latent(b, seed=seed + start)
            act, img = _acts_and_image(inst, layer, z)
            if act.ndim == 2:
                act = act[:, :, None, None]
            seg = segmenter.segment_batch(img)
            inter, act_count, seg_count = _tally(act, seg, inter, act_count,
                                                 seg_count)
            total_px += b * int(np.prod(seg.shape[-2:]))
        inter_np = np.asarray(inter)
        act_np = np.asarray(act_count)[:, None]
        seg_np = np.asarray(seg_count)[None, :]
        if cache_path is not None:
            _save_tally_cache(cache_path, cache_provenance,
                              np.asarray(levels),
                              (inter_np, act_np, seg_np, total_px))
    union = act_np + seg_np - inter_np
    iou = inter_np / np.maximum(union, 1e-9)
    # The reference scores the same contingency table a second way at the
    # fixed threshold: information quality ratio MI/H_joint
    # (``score_tally_stats``, ``dissection.py:661-679``).
    tp = float(max(total_px, 1))
    _, _, iqr_mat = _information_quality_ratio(
        inter_np / tp, (act_np - inter_np) / tp,
        (seg_np - inter_np) / tp, (tp - union) / tp)
    iqr_mat = iqr_mat.astype(np.float32)

    best = np.argmax(iou, axis=1)
    report_units = []
    for u in range(units):
        report_units.append({
            "unit": int(u),
            "label": labels[int(best[u])],
            "category": categories[int(best[u])],
            "iou": float(iou[u, best[u]]),
            "iqr": float(iqr_mat[u, best[u]]),
            "activation_level": float(np.asarray(levels)[u]),
            "top_samples": [int(s) for s in stats["topk_samples"][u]],
            "top_values": [float(v) for v in stats["topk_values"][u]],
        })
    report_units.sort(key=lambda r: -r["iou"])
    return {
        "layer": layer,
        "model": getattr(model, "name", model.model_name),
        "n_samples": n_samples,
        "batch": stats.get("batch", batch),
        "seed": stats.get("seed", seed),
        "level_quantile": level_desc,
        "labels": labels,
        "units": report_units,
        "iou_matrix": iou,
        "iqr_matrix": iqr_mat,
    }
