"""Semantic-segmentation network: ResNet encoder + UPerNet decoder.

TPU-native re-design of the reference's unified-parsing segmentation model
(``netdissect/upsegmodel/models.py:441`` + ``resnet.py`` backbone, ~1800 LoC
of torch modules): a deep-stem ResNet trunk feeding a UPerNet decoder
(PrRoI pyramid pooling on the deepest stage + FPN lateral fusion) with
object / part / material / scene heads.

Dataflow mirrors the reference exactly (validated by
``tests/test_upernet_parity.py`` against the torch original):

* stem: three 3x3 convs 3->w->w->2w, first strided (``resnet.py:103-115``);
* bottleneck stages with 1x1-strided downsample projections;
* PPM: PrRoI pooling of c5 over the full-image ROI at scales (1,2,3,6),
  bilinear upsample back to c5 size, THEN 1x1 conv+BN+ReLU
  (``models.py:280-289,352-357`` — pool -> interpolate -> conv order matters
  because the ReLU does not commute with interpolation);
* FPN top-down: f = lateral(c_i) + upsample(f), smoothed copies collected
  (``models.py:365-375``);
* heads: scene on the PPM output (global pool), material on P2, object and
  part on the 4-level fusion (``models.py:315-338,378-394``).

Design notes (vs the torch original):

* **Functional, params-dict style** like every generator in this framework:
  ``init_*`` builds a flat ``{name: ndarray}`` dict, ``*_forward`` is a pure
  jittable function.  No module tree, no hooks.
* **Inference-only**: batch-norm is folded to a per-channel scale/bias at
  import time (``fold_bn``), so the hot path is conv+scale+relu — exactly
  what XLA fuses onto the MXU.  The reference's SynchronizedBatchNorm
  machinery (a multi-GPU training artifact) has no TPU equivalent to build.
* **NCHW layout** end-to-end to match the generators; upsampling uses
  ``jax.image.resize`` (bilinear, half-pixel centers == torch
  ``align_corners=False``); the PPM pooling reuses :mod:`ops.prroi`, the
  same op the reference's CUDA PrRoIPool2D implements.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ganspace_tpu.ops.precision import get_precision
from ganspace_tpu.ops.prroi import prroi_pool2d

Params = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, dilation: int = 1,
           padding: str | int = "SAME") -> jnp.ndarray:
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=get_precision())


def scale_bias(x: jnp.ndarray, params: Params, name: str) -> jnp.ndarray:
    """Folded-BN affine: y = x * scale + bias (per channel)."""
    s = jnp.asarray(params[f"{name}.scale"], x.dtype).reshape(1, -1, 1, 1)
    b = jnp.asarray(params[f"{name}.bias"], x.dtype).reshape(1, -1, 1, 1)
    return x * s + b


def fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    """Fold BN running stats into (scale, bias)."""
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(x, x.shape[:2] + tuple(hw), method="bilinear")


def adaptive_avg_pool(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d``: exact mean pooling when the target
    divides the input, integral-based fractional bins otherwise (this is
    what the reference's image-downsize path uses, ``segmenter.py:166``)."""
    h, w = x.shape[2], x.shape[3]
    th, tw = hw
    if h == th and w == tw:
        return x
    if h % th == 0 and w % tw == 0:
        kh, kw = h // th, w // tw
        y = lax.reduce_window(x, 0.0, lax.add, (1, 1, kh, kw), (1, 1, kh, kw),
                              "VALID")
        return y / (kh * kw)
    # Fractional bins via the integral image (same math as torch's
    # adaptive pooling: bin p covers [floor(p*h/th), ceil((p+1)*h/th))).
    integ = jnp.pad(jnp.cumsum(jnp.cumsum(x, 2), 3),
                    ((0, 0), (0, 0), (1, 0), (1, 0)))
    ys = np.floor(np.arange(th) * h / th).astype(int)
    ye = np.ceil((np.arange(th) + 1) * h / th).astype(int)
    xs = np.floor(np.arange(tw) * w / tw).astype(int)
    xe = np.ceil((np.arange(tw) + 1) * w / tw).astype(int)
    area = (ye - ys)[:, None] * (xe - xs)[None, :]
    out = (integ[:, :, ye][:, :, :, xe] - integ[:, :, ys][:, :, :, xe]
           - integ[:, :, ye][:, :, :, xs] + integ[:, :, ys][:, :, :, xs])
    return out / jnp.asarray(area, x.dtype)


def _he(rs: np.random.RandomState, *shape) -> np.ndarray:
    fan_in = int(np.prod(shape[1:]))
    return (rs.randn(*shape) * np.sqrt(2.0 / max(fan_in, 1))).astype(np.float32)


def _init_conv_bn(p: Params, rs, name: str, cin: int, cout: int, k: int):
    p[f"{name}.weight"] = _he(rs, cout, cin, k, k)
    p[f"{name}.bn.scale"] = np.ones((cout,), np.float32)
    p[f"{name}.bn.bias"] = np.zeros((cout,), np.float32)


def conv_bn_relu(x, p: Params, name: str, stride=1, dilation=1) -> jnp.ndarray:
    k = p[f"{name}.weight"].shape[-1]
    pad = dilation * (k - 1) // 2
    y = conv2d(x, jnp.asarray(p[f"{name}.weight"]), stride, dilation, pad)
    return jax.nn.relu(scale_bias(y, p, f"{name}.bn"))


# ---------------------------------------------------------------------------
# ResNet encoder
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ResNetConfig:
    """ResNet-v1 with the 3-conv deep stem used by the reference's encoder
    (``upsegmodel/resnet.py:103-115``: 3->64->64->128, first conv strided).
    ``blocks=(3,4,6,3), width=64`` = the reference's resnet50.

    ``dilate_scale`` (0/8/16) reproduces the second encoder family,
    ``segmodel/models.py:225-270`` ``ResnetDilated``: strided 3x3 convs in
    the late stages become stride-1 dilated convs (output stride 8/16
    instead of 32), the variant the ADE20K scene-parsing decoders consume."""
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    expansion: int = 4
    dilate_scale: int = 0

    def stage_dilation(self, si: int) -> int:
        """_nostride_dilate's per-stage dilate factor (0 = stride normally)."""
        if self.dilate_scale == 8:
            return {2: 2, 3: 4}.get(si, 0)
        if self.dilate_scale == 16:
            return {3: 2}.get(si, 0)
        return 0

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.width * (2 ** i) * self.expansion
                     for i in range(len(self.blocks)))


def init_resnet_params(cfg: ResNetConfig, seed: int = 0) -> Params:
    rs = np.random.RandomState(seed)
    p: Params = {}
    w = cfg.width
    _init_conv_bn(p, rs, "stem.conv1", 3, w, 3)
    _init_conv_bn(p, rs, "stem.conv2", w, w, 3)
    _init_conv_bn(p, rs, "stem.conv3", w, 2 * w, 3)
    cin = 2 * w
    for si, n in enumerate(cfg.blocks):
        planes = w * (2 ** si)
        cout = planes * cfg.expansion
        for bi in range(n):
            base = f"layer{si + 1}.{bi}"
            _init_conv_bn(p, rs, f"{base}.conv1", cin, planes, 1)
            _init_conv_bn(p, rs, f"{base}.conv2", planes, planes, 3)
            _init_conv_bn(p, rs, f"{base}.conv3", planes, cout, 1)
            if cin != cout:
                _init_conv_bn(p, rs, f"{base}.downsample", cin, cout, 1)
            cin = cout
    return p


def _bottleneck(x, p: Params, base: str, stride: int,
                dilation: int = 1) -> jnp.ndarray:
    y = conv_bn_relu(x, p, f"{base}.conv1")
    y = conv_bn_relu(y, p, f"{base}.conv2", stride=stride, dilation=dilation)
    y = conv2d(y, jnp.asarray(p[f"{base}.conv3.weight"]), 1, 1, 0)
    y = scale_bias(y, p, f"{base}.conv3.bn")
    if f"{base}.downsample.weight" in p:
        x = conv2d(x, jnp.asarray(p[f"{base}.downsample.weight"]), stride, 1, 0)
        x = scale_bias(x, p, f"{base}.downsample.bn")
    elif stride != 1:
        x = x[:, :, ::stride, ::stride]
    return jax.nn.relu(x + y)


def resnet_features(params: Params, x: jnp.ndarray,
                    cfg: ResNetConfig) -> Dict[str, jnp.ndarray]:
    """x [B,3,H,W] -> {'c2': /4, 'c3': /8, 'c4': /16, 'c5': /32} (late
    stages keep their resolution when ``dilate_scale`` is set)."""
    y = conv_bn_relu(x, params, "stem.conv1", stride=2)
    y = conv_bn_relu(y, params, "stem.conv2")
    y = conv_bn_relu(y, params, "stem.conv3")
    # torch MaxPool2d(3, stride=2, padding=1)
    y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                          ((0, 0), (0, 0), (1, 1), (1, 1)))
    feats = {}
    for si, n in enumerate(cfg.blocks):
        stride = 1 if si == 0 else 2
        dil = cfg.stage_dilation(si)
        for bi in range(n):
            if dil:
                # ``_nostride_dilate`` (segmodel/models.py:257-270): the
                # formerly-strided conv gets dilation d/2, the rest d.
                y = _bottleneck(y, params, f"layer{si + 1}.{bi}", 1,
                                max(dil // 2, 1) if bi == 0 else dil)
            else:
                y = _bottleneck(y, params, f"layer{si + 1}.{bi}",
                                stride if bi == 0 else 1)
        feats[f"c{si + 2}"] = y
    return feats


# ---------------------------------------------------------------------------
# UPerNet decoder (PPM + FPN) with unified-parsing heads
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UPerNetConfig:
    resnet: ResNetConfig = field(default_factory=ResNetConfig)
    fpn_dim: int = 512
    ppm_dim: int = 512         # PPM branch width (fixed 512 in the reference
                               # regardless of fpn_dim, models.py:283)
    ppm_scales: Tuple[int, ...] = (1, 2, 3, 6)
    n_objects: int = 336       # unified-parsing label counts
    n_parts: int = 153
    n_materials: int = 26
    n_scenes: int = 365


def init_upernet_params(cfg: UPerNetConfig, seed: int = 0) -> Params:
    rs = np.random.RandomState(seed + 1)
    p = {f"encoder.{k}": v
         for k, v in init_resnet_params(cfg.resnet, seed).items()}
    chans = cfg.resnet.stage_channels
    d = cfg.fpn_dim
    # PPM: one 1x1 conv per pooling scale on c5, then a fusion 3x3
    for i in range(len(cfg.ppm_scales)):
        _init_conv_bn(p, rs, f"ppm.conv{i}", chans[-1], cfg.ppm_dim, 1)
    _init_conv_bn(p, rs, "ppm.fusion",
                  chans[-1] + cfg.ppm_dim * len(cfg.ppm_scales), d, 3)
    # FPN lateral 1x1s for c2..c4 + post-merge 3x3s
    for i, c in enumerate(chans[:-1]):
        _init_conv_bn(p, rs, f"fpn.lateral{i}", c, d, 1)
        _init_conv_bn(p, rs, f"fpn.smooth{i}", d, d, 3)
    _init_conv_bn(p, rs, "fuse", d * len(chans), d, 3)
    # Heads: conv3x3+BN+ReLU then a 1x1 classifier each (models.py:315-338)
    for head, n in (("object", cfg.n_objects), ("part", cfg.n_parts),
                    ("material", cfg.n_materials)):
        _init_conv_bn(p, rs, f"head.{head}.conv", d, d, 3)
        p[f"head.{head}.weight"] = _he(rs, n, d, 1, 1)
        p[f"head.{head}.bias"] = np.zeros((n,), np.float32)
    _init_conv_bn(p, rs, "head.scene.conv", d, d, 3)
    p["head.scene.weight"] = _he(rs, cfg.n_scenes, d, 1, 1)
    p["head.scene.bias"] = np.zeros((cfg.n_scenes,), np.float32)
    return p


def _head(pix, params: Params, name: str) -> jnp.ndarray:
    y = conv_bn_relu(pix, params, f"{name}.conv")
    y = conv2d(y, jnp.asarray(params[f"{name}.weight"]), 1, 1, 0)
    return y + jnp.asarray(params[f"{name}.bias"], y.dtype).reshape(1, -1, 1, 1)


def upernet_forward(params: Params, x: jnp.ndarray,
                    cfg: UPerNetConfig) -> Dict[str, jnp.ndarray]:
    """x [B,3,H,W] (reference-normalized) -> logits dict:
    object/part [B,L,H/4,W/4] on the fusion, material [B,L,H/4,W/4] on P2,
    scene [B,n_scenes] on the PPM output (``models.py:341-394``)."""
    enc = {k[len("encoder."):]: v for k, v in params.items()
           if k.startswith("encoder.")}
    feats = resnet_features(enc, x, cfg.resnet)
    c2, c3, c4, c5 = feats["c2"], feats["c3"], feats["c4"], feats["c5"]

    # Pyramid pooling on c5: PrRoI full-image pool -> upsample -> conv
    # (the conv runs at full c5 resolution, after the interpolation —
    # reference models.py:352-357).
    b, _, h5, w5 = c5.shape
    roi = jnp.concatenate([
        jnp.arange(b, dtype=c5.dtype)[:, None],
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, w5, h5], c5.dtype), (b, 4)),
    ], axis=1)
    ppm_out = [c5]
    for i, s in enumerate(cfg.ppm_scales):
        pooled = prroi_pool2d(c5, roi, s, s)
        up = resize_bilinear(pooled, (h5, w5))
        ppm_out.append(conv_bn_relu(up, params, f"ppm.conv{i}"))
    f5 = conv_bn_relu(jnp.concatenate(ppm_out, axis=1), params, "ppm.fusion")

    out: Dict[str, jnp.ndarray] = {}
    # Scene head reads the PPM output directly (models.py:378-379).
    y = conv_bn_relu(f5, params, "head.scene.conv")
    pooled = jnp.mean(y, axis=(2, 3))
    w_s = jnp.asarray(params["head.scene.weight"], pooled.dtype)
    out["scene"] = pooled @ w_s.reshape(w_s.shape[0], -1).T \
        + jnp.asarray(params["head.scene.bias"], pooled.dtype)

    # FPN top-down: the raw sum propagates; smoothed copies are collected.
    laterals = [conv_bn_relu(c, params, f"fpn.lateral{i}")
                for i, c in enumerate((c2, c3, c4))]
    fpn = [f5]
    top = f5
    for i in (2, 1, 0):
        top = laterals[i] + resize_bilinear(top, laterals[i].shape[2:])
        fpn.insert(0, conv_bn_relu(top, params, f"fpn.smooth{i}"))

    # Material head reads P2 (models.py:381-383).
    out["material"] = _head(fpn[0], params, "head.material")

    # Object/part heads read the 4-level fusion at c2 resolution.
    hw = fpn[0].shape[2:]
    fused = jnp.concatenate([fpn[0]] + [resize_bilinear(f, hw)
                                        for f in fpn[1:]], axis=1)
    pix = conv_bn_relu(fused, params, "fuse")
    out["object"] = _head(pix, params, "head.object")
    out["part"] = _head(pix, params, "head.part")
    return out


# ---------------------------------------------------------------------------
# Torch checkpoint import
# ---------------------------------------------------------------------------

def import_torch_resnet(state: Dict[str, "np.ndarray"],
                        cfg: ResNetConfig) -> Params:
    """Translate a torch deep-stem ResNet ``state_dict`` (the reference
    encoder's naming, ``upsegmodel/resnet.py``) into folded params."""
    def np_(k):
        v = state[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    p: Params = {}

    def put(dst: str, conv_key: str, bn_key: str):
        p[f"{dst}.weight"] = np_(f"{conv_key}.weight")
        s, b = fold_bn(np_(f"{bn_key}.weight"), np_(f"{bn_key}.bias"),
                       np_(f"{bn_key}.running_mean"),
                       np_(f"{bn_key}.running_var"))
        p[f"{dst}.bn.scale"] = s
        p[f"{dst}.bn.bias"] = b

    put("stem.conv1", "conv1", "bn1")
    put("stem.conv2", "conv2", "bn2")
    put("stem.conv3", "conv3", "bn3")
    for si, n in enumerate(cfg.blocks):
        for bi in range(n):
            src = f"layer{si + 1}.{bi}"
            dst = f"layer{si + 1}.{bi}"
            for ci in (1, 2, 3):
                put(f"{dst}.conv{ci}", f"{src}.conv{ci}", f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in state:
                put(f"{dst}.downsample", f"{src}.downsample.0",
                    f"{src}.downsample.1")
    return p


# ---------------------------------------------------------------------------
# ADE20K scene-parsing decoders (the reference's SECOND seg-model family:
# ``segmodel/models.py`` — dilated encoder + PPM/C1 bilinear decoders, the
# nets the classifier-dissection path consumes via ``ModelBuilder``).
# Deep-supervision branches are training-only and omitted: at inference
# PPMBilinearDeepsup/C1BilinearDeepSup compute exactly the main branch
# (``models.py:443-467``).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PPMBilinearConfig:
    """``PPMBilinear`` (``segmodel/models.py:355-403``)."""
    resnet: ResNetConfig = field(
        default_factory=lambda: ResNetConfig(dilate_scale=8))
    num_class: int = 150
    ppm_dim: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)

    @property
    def fc_dim(self) -> int:
        return self.resnet.stage_channels[-1]


def init_ppm_params(cfg: PPMBilinearConfig, seed: int = 0) -> Params:
    rs = np.random.RandomState(seed)
    p: Params = {f"encoder.{k}": v
                 for k, v in init_resnet_params(cfg.resnet, seed).items()}
    for i in range(len(cfg.pool_scales)):
        _init_conv_bn(p, rs, f"decoder.ppm.{i}", cfg.fc_dim, cfg.ppm_dim, 1)
    cat = cfg.fc_dim + len(cfg.pool_scales) * cfg.ppm_dim
    _init_conv_bn(p, rs, "decoder.conv_last", cat, cfg.ppm_dim, 3)
    p["decoder.classifier.weight"] = _he(rs, cfg.num_class, cfg.ppm_dim, 1, 1)
    p["decoder.classifier.bias"] = np.zeros((cfg.num_class,), np.float32)
    return p


def _split(params: Params, prefix: str) -> Params:
    n = len(prefix)
    return {k[n:]: v for k, v in params.items() if k.startswith(prefix)}


def ppm_bilinear_forward(params: Params, x: jnp.ndarray,
                         cfg: PPMBilinearConfig,
                         seg_size: Tuple[int, int] | None = None) -> jnp.ndarray:
    """x [B,3,H,W] -> class logits [B,num_class,h,w] (h=H/dilate_scale); with
    ``seg_size`` the logits are bilinearly resized first (the reference then
    softmaxes — left to the caller, like ``upernet_forward``)."""
    enc = _split(params, "encoder.")
    dec = _split(params, "decoder.")
    c5 = resnet_features(enc, x, cfg.resnet)["c5"]
    hw = c5.shape[2:]
    outs = [c5]
    for i, scale in enumerate(cfg.pool_scales):
        y = adaptive_avg_pool(c5, (scale, scale))
        y = conv_bn_relu(y, dec, f"ppm.{i}")
        outs.append(resize_bilinear(y, hw))
    y = jnp.concatenate(outs, axis=1)
    y = conv_bn_relu(y, dec, "conv_last")
    y = conv2d(y, jnp.asarray(dec["classifier.weight"]), 1, 1, 0)
    y = y + jnp.asarray(dec["classifier.bias"], y.dtype).reshape(1, -1, 1, 1)
    if seg_size is not None:
        y = resize_bilinear(y, seg_size)
    return y


@dataclass(frozen=True)
class C1BilinearConfig:
    """``C1Bilinear`` (``segmodel/models.py:327-352``): one conv-bn-relu at
    fc_dim/4 then a 1x1 classifier."""
    resnet: ResNetConfig = field(
        default_factory=lambda: ResNetConfig(dilate_scale=8))
    num_class: int = 150

    @property
    def fc_dim(self) -> int:
        return self.resnet.stage_channels[-1]


def init_c1_params(cfg: C1BilinearConfig, seed: int = 0) -> Params:
    rs = np.random.RandomState(seed)
    p: Params = {f"encoder.{k}": v
                 for k, v in init_resnet_params(cfg.resnet, seed).items()}
    _init_conv_bn(p, rs, "decoder.cbr", cfg.fc_dim, cfg.fc_dim // 4, 3)
    p["decoder.classifier.weight"] = _he(rs, cfg.num_class, cfg.fc_dim // 4, 1, 1)
    p["decoder.classifier.bias"] = np.zeros((cfg.num_class,), np.float32)
    return p


def c1_bilinear_forward(params: Params, x: jnp.ndarray,
                        cfg: C1BilinearConfig,
                        seg_size: Tuple[int, int] | None = None) -> jnp.ndarray:
    enc = _split(params, "encoder.")
    dec = _split(params, "decoder.")
    c5 = resnet_features(enc, x, cfg.resnet)["c5"]
    y = conv_bn_relu(c5, dec, "cbr")
    y = conv2d(y, jnp.asarray(dec["classifier.weight"]), 1, 1, 0)
    y = y + jnp.asarray(dec["classifier.bias"], y.dtype).reshape(1, -1, 1, 1)
    if seg_size is not None:
        y = resize_bilinear(y, seg_size)
    return y


def import_torch_segmodel(encoder_state, decoder_state, cfg) -> Params:
    """Translate reference ``ModelBuilder`` encoder/decoder ``state_dict``s
    (``segmodel/models.py``) into folded params for the forwards above."""
    def np_(state, k):
        v = state[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    p: Params = {f"encoder.{k}": v
                 for k, v in import_torch_resnet(encoder_state, cfg.resnet).items()}

    def put(dst, conv_key, bn_key):
        p[f"decoder.{dst}.weight"] = np_(decoder_state, f"{conv_key}.weight")
        s, b = fold_bn(np_(decoder_state, f"{bn_key}.weight"),
                       np_(decoder_state, f"{bn_key}.bias"),
                       np_(decoder_state, f"{bn_key}.running_mean"),
                       np_(decoder_state, f"{bn_key}.running_var"))
        p[f"decoder.{dst}.bn.scale"] = s
        p[f"decoder.{dst}.bn.bias"] = b

    if isinstance(cfg, PPMBilinearConfig):
        # torch Sequential indices: ppm.{i} = [pool, conv, bn, relu];
        # conv_last = [conv, bn, relu, dropout, classifier].
        for i in range(len(cfg.pool_scales)):
            put(f"ppm.{i}", f"ppm.{i}.1", f"ppm.{i}.2")
        put("conv_last", "conv_last.0", "conv_last.1")
        p["decoder.classifier.weight"] = np_(decoder_state, "conv_last.4.weight")
        p["decoder.classifier.bias"] = np_(decoder_state, "conv_last.4.bias")
    else:
        # C1Bilinear: cbr = conv3x3_bn_relu Sequential [conv, bn, relu].
        put("cbr", "cbr.0", "cbr.1")
        p["decoder.classifier.weight"] = np_(decoder_state, "conv_last.weight")
        p["decoder.classifier.bias"] = np_(decoder_state, "conv_last.bias")
    return p


def build_segmodel(arch_encoder: str = "resnet50_dilated8",
                   arch_decoder: str = "ppm_bilinear",
                   num_class: int = 150, seed: int = 0):
    """Mirror of the reference ``ModelBuilder`` arch-name surface
    (``segmodel/models.py:65-185``): returns ``(params, forward, cfg)``
    with ``forward(params, x, seg_size=None) -> logits``.  Deepsup arch
    names map to the same inference nets."""
    blocks = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}
    name = arch_encoder.replace("_dilated8", "").replace("_dilated16", "")
    dilate = 8 if arch_encoder.endswith("dilated8") else (
        16 if arch_encoder.endswith("dilated16") else 0)
    if name not in blocks:
        raise ValueError(f"Unknown encoder arch {arch_encoder}")
    rn = ResNetConfig(blocks=blocks[name], dilate_scale=dilate)
    dec = arch_decoder.replace("_deepsup", "")
    if dec == "ppm_bilinear":
        cfg = PPMBilinearConfig(resnet=rn, num_class=num_class)
        return init_ppm_params(cfg, seed), partial(ppm_bilinear_forward, cfg=cfg), cfg
    if dec == "c1_bilinear":
        cfg = C1BilinearConfig(resnet=rn, num_class=num_class)
        return init_c1_params(cfg, seed), partial(c1_bilinear_forward, cfg=cfg), cfg
    raise ValueError(f"Unknown decoder arch {arch_decoder}")
