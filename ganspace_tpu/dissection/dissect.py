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

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.models.base import InstrumentedModel
from ganspace_tpu.stats import RunningQuantile, RunningTopK


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


def _acts_and_image(inst: InstrumentedModel, layer: str, z) -> Tuple[jnp.ndarray, jnp.ndarray]:
    inst.retain_layer(layer)
    img = inst.model.forward(z)
    act = inst.retained_features()[layer]
    return act, jnp.clip(img, 0.0, 1.0)


def tally_stats(inst: InstrumentedModel, layer: str, *, n_samples: int = 1000,
                batch: int = 16, seed: int = 1, k_top: int = 8,
                samplesize: int = 1024):
    """Stats pass: per-unit quantile sketch + top-k sample indices/values."""
    model = inst.model
    rq: Optional[RunningQuantile] = None
    topk_val: Optional[np.ndarray] = None   # [U, k]
    topk_idx: Optional[np.ndarray] = None

    np.random.seed(seed)
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        z = model.sample_latent(b, seed=seed + start)
        act, _ = _acts_and_image(inst, layer, z)
        if act.ndim == 2:
            act = act[:, :, None, None]
        bsz, units = act.shape[0], act.shape[1]
        per_image_max = np.asarray(jnp.max(act.reshape(bsz, units, -1), axis=2))
        flat = np.asarray(jnp.transpose(act, (0, 2, 3, 1)).reshape(-1, units))
        if rq is None:
            rq = RunningQuantile(samplesize=samplesize)
            topk_val = np.full((units, k_top), -np.inf, np.float32)
            topk_idx = np.zeros((units, k_top), np.int64)
        rq.add(flat)
        # merge per-image maxima into the top-k (value, sample index) lists
        cand_val = np.concatenate([topk_val, per_image_max.T], axis=1)
        cand_idx = np.concatenate(
            [topk_idx, np.broadcast_to(np.arange(start, start + bsz),
                                       (units, bsz))], axis=1)
        order = np.argsort(-cand_val, axis=1)[:, :k_top]
        topk_val = np.take_along_axis(cand_val, order, axis=1)
        topk_idx = np.take_along_axis(cand_idx, order, axis=1)

    return {"quantiles": rq, "topk_values": topk_val, "topk_samples": topk_idx,
            "units": topk_val.shape[0]}


def dissect(inst: InstrumentedModel, layer: str, segmenter: SegmenterBase, *,
            n_samples: int = 1000, batch: int = 16, seed: int = 1,
            level_quantile: float = 0.995, k_top: int = 8,
            stats: Optional[dict] = None) -> Dict:
    """Full dissection of one layer; returns the report dict
    (units ranked by best-concept IoU)."""
    model = inst.model
    stats = stats or tally_stats(inst, layer, n_samples=n_samples, batch=batch,
                                 seed=seed, k_top=k_top)
    units = stats["units"]
    levels = jnp.asarray(stats["quantiles"].quantiles(level_quantile)[:, 0])

    labels, categories = segmenter.get_label_and_category_names()
    n_labels = len(labels)

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

    np.random.seed(seed)
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        z = model.sample_latent(b, seed=seed + start)
        act, img = _acts_and_image(inst, layer, z)
        if act.ndim == 2:
            act = act[:, :, None, None]
        seg = segmenter.segment_batch(img)
        inter, act_count, seg_count = _tally(act, seg, inter, act_count, seg_count)
        total_px += b * int(np.prod(seg.shape[-2:]))

    inter_np = np.asarray(inter)
    union = np.asarray(act_count)[:, None] + np.asarray(seg_count)[None, :] - inter_np
    iou = inter_np / np.maximum(union, 1e-9)

    best = np.argmax(iou, axis=1)
    report_units = []
    for u in range(units):
        report_units.append({
            "unit": int(u),
            "label": labels[int(best[u])],
            "category": categories[int(best[u])],
            "iou": float(iou[u, best[u]]),
            "activation_level": float(np.asarray(levels)[u]),
            "top_samples": [int(s) for s in stats["topk_samples"][u]],
            "top_values": [float(v) for v in stats["topk_values"][u]],
        })
    report_units.sort(key=lambda r: -r["iou"])
    return {
        "layer": layer,
        "model": getattr(model, "name", model.model_name),
        "n_samples": n_samples,
        "level_quantile": level_quantile,
        "labels": labels,
        "units": report_units,
        "iou_matrix": iou,
    }
