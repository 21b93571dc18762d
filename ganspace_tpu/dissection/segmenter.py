"""Unified-parsing segmenter wrapper (reference ``netdissect/segmenter.py``).

Wraps the UPerNet model (``segmodel.py``) behind the ``SegmenterBase``
protocol used by dissection: a flat label space spanning the object / part /
material categories, multi-resolution inference with probability averaging,
and per-class probability readout for ACE-style optimization.

Differences from the reference, by design:

* The reference downloads the CSAIL unified-parsing torch checkpoint and
  labeldata.json at import (``segmenter.py:48``, network required).  Here the
  checkpoint is injected (imported torch ``state_dict`` or saved params npz);
  with none given the net is randomly initialized with generic label names —
  the full dissection pipeline stays runnable and testable offline.
* Multi-resolution inference jits one function per requested size and
  averages softmax probabilities on device — XLA recompiles per static
  shape, which is the TPU-native way to handle the small fixed set of
  eval sizes.  The reference's ``segdiv='quad'`` connected-component
  quadrant subdivision (``segmenter.py:257-285``) is implemented as the
  same host-side post-pass (``expand_segment_quad`` below) behind the
  same flag, with one intended divergence: the reference's
  ``component_masks`` drops the last connected component of every image
  (``range(1, num)`` over 1..num ids) — ours processes all of them.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.dissection.dissect import SegmenterBase
from ganspace_tpu.dissection.segmodel import (
    Params, UPerNetConfig, adaptive_avg_pool, init_upernet_params,
    resize_bilinear, upernet_forward,
)

# The reference feeds the net 0-255 BGR images minus the Caffe-era channel
# means (``segmenter.py:146-150``).
_BGR_MEAN = (102.9801, 115.9465, 122.7717)

CATEGORIES = ("object", "part", "material")


def default_label_data(cfg: UPerNetConfig) -> Dict[str, List[str]]:
    """Generic label names used when no labeldata is supplied."""
    return {
        "object": ["-"] + [f"object-{i}" for i in range(1, cfg.n_objects)],
        "part": ["-"] + [f"part-{i}" for i in range(1, cfg.n_parts)],
        "material": ["-"] + [f"material-{i}" for i in range(1, cfg.n_materials)],
        "scene": [f"scene-{i}" for i in range(cfg.n_scenes)],
    }


class UnifiedParsingSegmenter(SegmenterBase):
    """Object+part+material segmentation in one flat label space.

    Flat indexing: 0 = '-' (background/unlabeled); object labels follow,
    then part labels, then material labels (each category's own 0 maps to
    flat 0).  ``segment_batch`` returns one label map per category,
    [B, n_categories, H, W], like the reference's multi-channel output.
    """

    def __init__(self, cfg: Optional[UPerNetConfig] = None,
                 params: Optional[Params] = None,
                 label_data: Optional[Dict[str, List[str]]] = None,
                 segsizes: Sequence[int] = (256,), seed: int = 0,
                 segdiv: str = "undivided"):
        self.cfg = cfg or UPerNetConfig()
        self.params = jax.tree.map(
            jnp.asarray,
            params if params is not None else init_upernet_params(self.cfg, seed))
        self.segsizes = tuple(segsizes)
        assert segdiv in ("undivided", "quad")
        self.segdiv = segdiv
        ld = label_data or default_label_data(self.cfg)
        self._cat_labels = {c: list(ld[c]) for c in CATEGORIES}
        self.scene_names = list(ld.get("scene", []))

        # Flat label space: 0 = '-', then each category's labels 1..n-1.
        self.labels: List[str] = ["-"]
        self.categories: List[str] = ["-"]
        self._flat_offset: Dict[str, int] = {}
        for c in CATEGORIES:
            self._flat_offset[c] = len(self.labels) - 1
            self.labels.extend(self._cat_labels[c][1:])
            self.categories.extend([c] * (len(self._cat_labels[c]) - 1))

        # segdiv='quad': reference-style per-quadrant object pseudo-labels
        # (netdissect/segmenter.py:257-285) — each connected object
        # component is split at its bounding-box midlines and its pixels
        # additionally labeled '<object>-<quadrant>', giving the IoU
        # tallies location-sensitive concepts ("sky-t", "building-l").
        # The divided labels are APPENDED to the flat space (the reference
        # interleaves them after the objects, renumbering materials/parts
        # by divmult — our existing flat numbering stays stable).  The
        # quadrant->suffix blocks follow the reference name table
        # ['t','l','b','r'] (+1N..+4N), which matches its mask geometry —
        # the "# right"/"# left" comments in its expand are swapped, the
        # masks themselves keep left for +2N and right for +4N.
        self._div_base = len(self.labels)
        self._n_obj = len(self._cat_labels["object"]) - 1
        if segdiv == "quad":
            for suffix in ("t", "l", "b", "r"):
                self.labels.extend(
                    f"{lab}-{suffix}" for lab in self._cat_labels["object"][1:])
                self.categories.extend(["part"] * self._n_obj)

        self._probs_jit = partial(
            jax.jit, static_argnames=("size",))(self._probs)

    # -- protocol -----------------------------------------------------------

    def get_label_and_category_names(self) -> Tuple[List[str], List[str]]:
        return list(self.labels), list(self.categories)

    def _probs(self, params, images, *, size: int) -> Dict[str, jnp.ndarray]:
        """softmax probabilities per category at eval ``size``, upsampled
        back to the input resolution."""
        h, w = images.shape[2:]
        # Reference preprocessing (segmenter.py:146-150,163-166): [0,1] RGB
        # -> 0-255 BGR minus channel means, adaptive-avg-pool resize.
        x = images[:, ::-1] * 255.0 - jnp.asarray(
            _BGR_MEAN, images.dtype).reshape(1, 3, 1, 1)
        if (h, w) != (size, size):
            x = adaptive_avg_pool(x, (size, size)) if (h >= size and w >= size) \
                else resize_bilinear(x, (size, size))
        logits = upernet_forward(params, x, self.cfg)
        out = {}
        for c in CATEGORIES:
            p = jax.nn.softmax(logits[c], axis=1)
            out[c] = resize_bilinear(p, (h, w))
        out["scene"] = jax.nn.softmax(logits["scene"], axis=-1)
        return out

    def category_probabilities(self, images) -> Dict[str, jnp.ndarray]:
        """Multi-resolution averaged per-category probabilities
        [B, L_c, H, W] (reference averages predictions over ``segsizes``)."""
        images = jnp.asarray(images)
        acc: Dict[str, jnp.ndarray] = {}
        for s in self.segsizes:
            probs = self._probs_jit(self.params, images, size=int(s))
            for k, v in probs.items():
                acc[k] = acc.get(k, 0) + v
        return {k: v / len(self.segsizes) for k, v in acc.items()}

    def segment_batch(self, images, downsample: int = 1) -> jnp.ndarray:
        """images [B,3,H,W] in [0,1] -> flat labels [B, C, H', W'] with
        C = n_categories (+2 quadrant channels under ``segdiv='quad'``)."""
        probs = self.category_probabilities(jnp.asarray(images))
        maps = []
        for c in CATEGORIES:
            p = probs[c][:, :, ::downsample, ::downsample]
            lab = jnp.argmax(p, axis=1)
            flat = jnp.where(lab == 0, 0, lab + self._flat_offset[c])
            maps.append(flat)
        segs = jnp.stack(maps, axis=1)
        if self.segdiv == "quad":
            obj_local = np.asarray(segs[:, 0]) - self._flat_offset["object"]
            obj_local = np.where(np.asarray(segs[:, 0]) == 0, 0, obj_local)
            div = expand_segment_quad(obj_local, self._n_obj)
            # local quadrant pseudo-label q*N + o  ->  flat appended block
            div = np.where(div > 0, div - self._n_obj - 1 + self._div_base, 0)
            segs = jnp.concatenate([segs, jnp.asarray(div)], axis=1)
        return segs

    def class_probability(self, images, classnum: int) -> jnp.ndarray:
        """Differentiable per-pixel probability of one flat label
        (``SegmenterBase.class_probability`` protocol, used by ACE)."""
        self._check_classnum(classnum)
        self._check_not_divided(classnum)
        cat = self.categories[classnum]
        local = classnum - self._flat_offset[cat]
        return self.category_probabilities(jnp.asarray(images))[cat][:, local]

    def predict_single_class(self, images, classnum: int,
                             downsample: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(probability, mask) for one flat label — the ACE objective's
        signal (reference ``segmenter.predict_single_class``).  One network
        pass: the label map derives from the same probabilities."""
        self._check_classnum(classnum)
        self._check_not_divided(classnum)
        cat = self.categories[classnum]
        local = classnum - self._flat_offset[cat]
        probs = self.category_probabilities(jnp.asarray(images))
        p = probs[cat][:, local, ::downsample, ::downsample]
        pc = probs[cat][:, :, ::downsample, ::downsample]
        lab = jnp.argmax(pc, axis=1)
        flat = jnp.where(lab == 0, 0, lab + self._flat_offset[cat])
        return p, flat == classnum


def component_masks(seg_map: np.ndarray):
    """Yield boolean masks of the connected same-valued regions of a 2-D
    integer label map (background 0 excluded), 8-connected — the semantics
    of the reference's skimage ``component_masks``
    (netdissect/segmenter.py:472-481).  One intended divergence: the
    reference iterates ``range(1, num)`` over skimage's 1..num component
    ids, silently dropping the last component of every image — all
    components are yielded here."""
    from scipy import ndimage
    eight = np.ones((3, 3), dtype=bool)
    for value in np.unique(seg_map):
        if value == 0:
            continue
        labeled, num = ndimage.label(seg_map == value, structure=eight)
        for comp in range(1, num + 1):
            yield labeled == comp


def expand_segment_quad(obj_maps: np.ndarray, num_labels: int) -> np.ndarray:
    """Reference quad subdivision (netdissect/segmenter.py:257-285) on a
    batch of LOCAL object maps [B, H, W] (labels 1..num_labels, 0 = none).

    Every connected component is split at its bounding-box midlines; the
    two returned channels [B, 2, H, W] carry the component's label offset
    by its quadrant block — channel 0: top (+1*N) / bottom (+3*N),
    channel 1: right (+2*N) / left (+4*N) — i.e. value ``o + q*N``.
    Pixels that received no offset (background) are zeroed, mirroring the
    reference's too-small-component cleanup.  Host-side on purpose:
    connected-component labeling is data-dependent sequential work the
    reference also runs on CPU."""
    b, h, w = obj_maps.shape
    out = np.repeat(obj_maps[:, None].astype(np.int64), 2, axis=1)
    for i in range(b):
        for mask in component_masks(obj_maps[i]):
            rows = np.flatnonzero(mask.any(axis=1))
            cols = np.flatnonzero(mask.any(axis=0))
            top, bottom = rows[0], rows[-1]
            left, right = cols[0], cols[-1]
            vmid = (top + bottom + 1) // 2
            hmid = (left + right + 1) // 2
            quad = np.repeat(mask[None], 4, axis=0)
            quad[0, vmid:, :] = False   # keeps rows < vmid: top    (+1*N)
            quad[1, :, hmid:] = False   # keeps cols < hmid: left   (+2*N)
            quad[2, :vmid, :] = False   # keeps rows >= vmid: bottom (+3*N)
            quad[3, :, :hmid] = False   # keeps cols >= hmid: right  (+4*N)
            out[i, 0] += quad[0] * num_labels + quad[2] * (3 * num_labels)
            out[i, 1] += quad[1] * (2 * num_labels) + quad[3] * (4 * num_labels)
    out[out <= num_labels] = 0          # never-offset pixels carry no concept
    return out


def import_torch_upernet(encoder_state, decoder_state,
                         cfg: UPerNetConfig) -> Params:
    """Build params from the reference's two torch checkpoints
    (``encoder_epoch_40.pth`` / ``decoder_epoch_40.pth``).

    The encoder translates via :func:`segmodel.import_torch_resnet`; decoder
    tensors map by position (ppm convs, fpn laterals/smooths, fusion, heads).
    Missing decoder keys fall back to random init so partially-matching
    checkpoints still load (loudly).
    """
    from ganspace_tpu.dissection.segmodel import import_torch_resnet, fold_bn

    params = init_upernet_params(cfg)

    def np_(state, k):
        v = state[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    enc = import_torch_resnet(encoder_state, cfg.resnet)
    for k, v in enc.items():
        params[f"encoder.{k}"] = v

    missing = []
    name_map = _decoder_name_map(cfg)
    for dst, (conv_key, bn_key) in name_map.items():
        wk = f"{conv_key}.weight"
        if wk not in decoder_state:
            missing.append(wk)
            continue
        params[f"{dst}.weight"] = np_(decoder_state, wk)
        if bn_key is not None:
            s, b = fold_bn(np_(decoder_state, f"{bn_key}.weight"),
                           np_(decoder_state, f"{bn_key}.bias"),
                           np_(decoder_state, f"{bn_key}.running_mean"),
                           np_(decoder_state, f"{bn_key}.running_var"))
            params[f"{dst}.bn.scale"] = s
            params[f"{dst}.bn.bias"] = b
        elif f"{conv_key}.bias" in decoder_state:
            params[f"{dst}.bias"] = np_(decoder_state, f"{conv_key}.bias")
    if missing:
        print(f"import_torch_upernet: {len(missing)} decoder tensors not "
              f"found (kept random init): {missing[:5]}...")
    return params


def _decoder_name_map(cfg: UPerNetConfig):
    """dst-param -> (torch conv key, torch bn key or None), following the
    reference decoder's layout (``upsegmodel/models.py``)."""
    m = {}
    for i in range(len(cfg.ppm_scales)):
        m[f"ppm.conv{i}"] = (f"ppm_conv.{i}.0", f"ppm_conv.{i}.1")
    m["ppm.fusion"] = ("ppm_last_conv.0", "ppm_last_conv.1")
    for i in range(3):
        m[f"fpn.lateral{i}"] = (f"fpn_in.{i}.0", f"fpn_in.{i}.1")
        m[f"fpn.smooth{i}"] = (f"fpn_out.{i}.0.0", f"fpn_out.{i}.0.1")
    m["fuse"] = ("conv_fusion.0", "conv_fusion.1")
    for head in ("object", "part", "material"):
        m[f"head.{head}.conv"] = (f"{head}_head.0.0", f"{head}_head.0.1")
        m[f"head.{head}"] = (f"{head}_head.1", None)
    m["head.scene.conv"] = ("scene_head.0.0", "scene_head.0.1")
    m["head.scene"] = ("scene_head.2", None)
    return m


# ---------------------------------------------------------------------------
# Single-category semantic segmenter over the ADE20K scene-parsing family
# (reference ``segmenter.py:286-430`` ``SemanticSegmenter``, which consumes
# ``segmodel/models.py`` nets via ModelBuilder)
# ---------------------------------------------------------------------------

# torchvision-standard normalization the reference applies after mapping
# its [-1,1] inputs to [0,1] (``segmenter.py:404-408``).
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class SemanticSegmenter(SegmenterBase):
    """Flat single-category semantic segmentation (ADE150-style).

    Wraps a ``segmodel.build_segmodel`` net (dilated ResNet + PPM/C1
    bilinear decoder): multi-size inference with softmax-probability voting
    (``raw_seg_prediction``, reference ``segmenter.py:394-430``), imagenet
    input normalization, and the dissection readout protocol.  Flat label 0
    is '-' (unlabeled); net class k maps to flat label k+1.
    """

    def __init__(self, arch_encoder: str = "resnet50_dilated8",
                 arch_decoder: str = "ppm_bilinear",
                 params=None, labels: Optional[List[str]] = None,
                 num_class: Optional[int] = None,
                 segsizes: Sequence[int] = (256,), category: str = "object",
                 seed: int = 0, segdiv: str = "undivided"):
        from ganspace_tpu.dissection import segmodel as _sm
        if num_class is None:
            num_class = (len(labels) if labels else 150)
        init, fwd, cfg = _sm.build_segmodel(arch_encoder, arch_decoder,
                                            num_class=num_class, seed=seed)
        self.cfg = cfg
        self._forward = fwd
        self.params = jax.tree.map(jnp.asarray,
                                   params if params is not None else init)
        self.segsizes = tuple(segsizes)
        assert segdiv in ("undivided", "quad")
        self.segdiv = segdiv
        names = list(labels) if labels else [f"class-{i}" for i in range(num_class)]
        self.labels = ["-"] + names
        self.categories = ["-"] + [category] * num_class
        # naive quad subdivision (reference segmenter.py:348-361): divided
        # pseudo-labels appended per quadrant block t/l/b/r
        self._div_base = len(self.labels)
        self._n_base = num_class
        if segdiv == "quad":
            for suffix in ("t", "l", "b", "r"):
                self.labels.extend(f"{n}-{suffix}" for n in names)
                self.categories.extend([category] * num_class)
        self._probs_jit = partial(jax.jit, static_argnames=("size",))(self._probs)

    def get_label_and_category_names(self) -> Tuple[List[str], List[str]]:
        return list(self.labels), list(self.categories)

    def _probs(self, params, images, *, size: int) -> jnp.ndarray:
        h, w = images.shape[2:]
        x = (images - jnp.asarray(_IMAGENET_MEAN, images.dtype).reshape(1, 3, 1, 1)) \
            / jnp.asarray(_IMAGENET_STD, images.dtype).reshape(1, 3, 1, 1)
        if (h, w) != (size, size):
            x = adaptive_avg_pool(x, (size, size)) if (h >= size and w >= size) \
                else resize_bilinear(x, (size, size))
        logits = self._forward(params, x, seg_size=(h, w))
        return jax.nn.softmax(logits, axis=1)

    def class_probabilities(self, images) -> jnp.ndarray:
        """Multi-size averaged class probabilities [B, num_class, H, W]."""
        images = jnp.asarray(images)
        acc = 0
        for s in self.segsizes:
            acc = acc + self._probs_jit(self.params, images, size=int(s))
        return acc / len(self.segsizes)

    def segment_batch(self, images, downsample: int = 1) -> jnp.ndarray:
        """images [B,3,H,W] in [0,1] -> flat labels [B, 1(+2 quad), H', W']."""
        p = self.class_probabilities(images)[:, :, ::downsample, ::downsample]
        segs = (jnp.argmax(p, axis=1) + 1)[:, None]
        # getattr: tolerate instances wired without __init__ (tests/pickles)
        if getattr(self, "segdiv", "undivided") == "quad":
            div = expand_segment_quad(np.asarray(segs[:, 0]), self._n_base)
            div = np.where(div > 0, div - self._n_base - 1 + self._div_base, 0)
            segs = jnp.concatenate([segs, jnp.asarray(div)], axis=1)
        return segs

    def class_probability(self, images, classnum: int) -> jnp.ndarray:
        self._check_classnum(classnum)
        self._check_not_divided(classnum)
        return self.class_probabilities(images)[:, classnum - 1]

    def predict_single_class(self, images, classnum: int,
                             downsample: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        self._check_classnum(classnum)
        self._check_not_divided(classnum)
        probs = self.class_probabilities(images)[:, :, ::downsample, ::downsample]
        p = probs[:, classnum - 1]
        mask = jnp.argmax(probs, axis=1) + 1 == classnum
        return p, mask
