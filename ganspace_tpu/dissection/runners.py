"""Dissection runners for non-generator sources
(reference ``dissection.py``'s ``ImageOnlySegRunner:1505`` /
``ClassifierSegRunner:1529`` / ``GeneratorSegRunner:1572``).

The generator path lives in :func:`dissect.dissect`; these runners cover the
other two reference modes:

* :func:`dissect_classifier` — dissect the units of an arbitrary feature
  extractor (a classifier layer) against a labeled segmentation dataset
  (broden ground truth): per-unit quantiles over dataset images, then IoU of
  thresholded upsampled unit masks vs the label maps.
* :func:`segment_dataset` — the image-only mode: run a segmenter over
  dataset images (no features), returning per-image label maps — the input
  for building new broden-style annotations.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.dissection.dissect import upsample_grid
from ganspace_tpu.stats import RunningQuantile


def dissect_classifier(features_fn: Callable, dataset, labels: Sequence[str],
                       *, categories: Optional[Sequence[str]] = None,
                       batch: int = 16, level_quantile: float = 0.995,
                       samplesize: int = 1024, limit: Optional[int] = None,
                       workers: Optional[int] = None, sampler=None) -> Dict:
    """``features_fn(images [B,3,H,W]) -> activations [B,U,h,w]``;
    ``dataset`` yields (images, seg [B,C,H,W]) via ``.batches`` (broden).

    Returns the same report dict shape as :func:`dissect.dissect`, so
    ``report.generate_report`` renders it unchanged.
    """
    n_labels = len(labels)
    categories = list(categories) if categories is not None \
        else ["-"] * n_labels

    # Pass 1: per-unit quantiles.  Datasets yield (img, seg) or
    # (img, seg, bincount) tuples (BrodenDataset vs MultiSegmentDataset —
    # reference segdata.py returns the bincount as a third element).
    rq: Optional[RunningQuantile] = None
    n_images = 0
    for images, *_ in dataset.batches(batch, limit=limit, workers=workers, sampler=sampler):
        act = jnp.asarray(features_fn(jnp.asarray(images)))
        if act.ndim == 2:
            act = act[:, :, None, None]
        u = act.shape[1]
        if rq is None:
            rq = RunningQuantile(samplesize=samplesize)
        rq.add(np.asarray(
            jnp.transpose(act, (0, 2, 3, 1)).reshape(-1, u)))
        n_images += act.shape[0]
    assert rq is not None, "empty dataset"
    units = rq.units
    levels = jnp.asarray(rq.quantiles(level_quantile)[:, 0])

    # Pass 2: IoU tally vs ground-truth labels
    inter = jnp.zeros((units, n_labels))
    act_count = jnp.zeros((units,))
    seg_count = jnp.zeros((n_labels,))

    @jax.jit
    def _tally(act, seg, inter, act_count, seg_count):
        size = seg.shape[-2:]
        up = upsample_grid(act, size)
        mask = (up > levels[None, :, None, None]).astype(jnp.float32)
        onehot = jnp.max(
            jax.nn.one_hot(seg, n_labels, dtype=jnp.float32), axis=1)
        inter = inter + jnp.einsum("buhw,bhwl->ul", mask, onehot)
        act_count = act_count + jnp.sum(mask, axis=(0, 2, 3))
        seg_count = seg_count + jnp.sum(onehot, axis=(0, 1, 2))
        return inter, act_count, seg_count

    for images, seg, *_ in dataset.batches(batch, limit=limit, sampler=sampler,
                                            workers=workers):
        act = jnp.asarray(features_fn(jnp.asarray(images)))
        if act.ndim == 2:
            act = act[:, :, None, None]
        seg = jnp.asarray(seg)
        if seg.ndim == 3:
            seg = seg[:, None]
        inter, act_count, seg_count = _tally(act, seg, inter, act_count,
                                             seg_count)

    inter_np = np.asarray(inter)
    union = (np.asarray(act_count)[:, None] + np.asarray(seg_count)[None, :]
             - inter_np)
    iou = inter_np / np.maximum(union, 1e-9)
    best = np.argmax(iou, axis=1)
    report_units: List[dict] = []
    for u in range(units):
        report_units.append({
            "unit": int(u),
            "label": str(labels[int(best[u])]),
            "category": str(categories[int(best[u])]),
            "iou": float(iou[u, best[u]]),
            "activation_level": float(np.asarray(levels)[u]),
            "top_samples": [],
            "top_values": [],
        })
    report_units.sort(key=lambda r: -r["iou"])
    return {
        "layer": getattr(features_fn, "__name__", "features"),
        "model": "classifier",
        "n_samples": n_images,
        "level_quantile": level_quantile,
        "labels": list(labels),
        "units": report_units,
        "iou_matrix": iou,
    }


def segment_dataset(segmenter, dataset, *, batch: int = 16,
                    limit: Optional[int] = None,
                    workers: Optional[int] = None,
                    sampler=None) -> List[np.ndarray]:
    """Image-only mode: segment every dataset image; returns label maps."""
    out: List[np.ndarray] = []
    for images, *_ in dataset.batches(batch, limit=limit, workers=workers, sampler=sampler):
        seg = np.asarray(segmenter.segment_batch(jnp.asarray(images)))
        out.extend(list(seg))
    return out
