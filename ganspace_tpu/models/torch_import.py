"""Reference-checkpoint importers.

Converts the four checkpoint formats the reference consumes into this
framework's flat numpy param dicts:

* **StyleGAN2** — rosinality-fork ``.pt`` with ``g_ema`` + ``latent_avg``
  (reference ``models/wrappers.py:163-165``).  Our parameter names equal the
  ``g_ema`` keys; the import squeezes the grouped-conv leading dim and drops
  fixed buffers (blur kernels, noises).
* **StyleGAN1** — lernapparat-format ``.pt`` state dict (reference
  ``models/stylegan/model.py:392-393``); names match 1:1.
* **BigGAN-deep** — HuggingFace ``pytorch_model.bin``.  Spectral-norm weights
  are **baked**: at eval time torch computes ``W = W_orig / sigma`` with
  ``sigma = u^T W v`` from the stored power-iteration vectors, a constant —
  so the division happens once at import instead of every forward.
* **ProGAN** — GANDissect ``.pth`` (reference ``netdissect/proggan.py:15-28``);
  names match 1:1, architecture inferred from weight shapes.

All loaders accept a path (via torch.load) or an in-memory state dict and
return plain numpy — JAX-side code never sees torch objects.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32) if t.dtype != np.float32 else t
    return t.detach().cpu().numpy().astype(np.float32)


def _load_state(path_or_dict):
    if isinstance(path_or_dict, dict):
        return path_or_dict
    import torch
    return torch.load(path_or_dict, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# StyleGAN2 (rosinality format)
# ---------------------------------------------------------------------------

def import_stylegan2(path_or_dict) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """-> (params, latent_avg).  Input: {'g_ema': state_dict, 'latent_avg': t}."""
    ckpt = _load_state(path_or_dict)
    state = ckpt.get("g_ema", ckpt)
    latent_avg = _to_np(ckpt["latent_avg"]) if "latent_avg" in ckpt \
        else np.zeros((512,), np.float32)

    params: Dict[str, np.ndarray] = {}
    for key, value in state.items():
        v = _to_np(value)
        if key.startswith("noises.") or ".blur.kernel" in key or key.endswith(".kernel"):
            continue  # fixed buffers rebuilt locally
        if re.search(r"(^|\.)conv\.weight$", key) and v.ndim == 5:
            v = v[0]  # grouped-conv leading dim [1, out, in, k, k] -> [out, in, k, k]
        params[key] = v
    return params, latent_avg


# ---------------------------------------------------------------------------
# StyleGAN1 (lernapparat format)
# ---------------------------------------------------------------------------

def import_stylegan(path_or_dict) -> Dict[str, np.ndarray]:
    state = _load_state(path_or_dict)
    params = {}
    for key, value in state.items():
        if ".intermediate.kernel" in key or key.endswith("blur.kernel"):
            continue  # fixed [1,2,1] blur, rebuilt locally
        v = _to_np(value)
        if key.endswith(".const") and v.ndim == 4:
            pass
        params[key] = v
    return params


# ---------------------------------------------------------------------------
# BigGAN (HuggingFace format, spectral norm baked)
# ---------------------------------------------------------------------------

def bake_spectral_norm(w_orig: np.ndarray, u: np.ndarray,
                       v: np.ndarray | None = None) -> np.ndarray:
    """W_orig / sigma with sigma = u^T W_mat v (torch eval-mode semantics).

    If ``v`` is absent (older torch checkpoints store only ``u``), it is the
    deterministic ``normalize(W_mat^T u)`` torch recomputes each forward.
    """
    w_mat = w_orig.reshape(w_orig.shape[0], -1)
    if v is None:
        v = w_mat.T @ u
        v = v / max(np.linalg.norm(v), 1e-12)
    sigma = float(u @ w_mat @ v)
    return (w_orig / sigma).astype(np.float32)


def import_biggan(path_or_dict) -> Dict[str, np.ndarray]:
    state = {k: _to_np(v) for k, v in _load_state(path_or_dict).items()}
    params: Dict[str, np.ndarray] = {}
    seen_sn = set()
    for key, value in state.items():
        if key.endswith(".weight_orig"):
            base = key[:-len(".weight_orig")]
            u = state.get(base + ".weight_u")
            v = state.get(base + ".weight_v")
            params[base + ".weight"] = bake_spectral_norm(value, u, v)
            seen_sn.add(base)
        elif key.endswith((".weight_u", ".weight_v")):
            continue
        else:
            params[key] = value
    return params


# ---------------------------------------------------------------------------
# ProGAN (GANDissect format)
# ---------------------------------------------------------------------------

def import_progan(path_or_dict) -> Tuple[Dict[str, np.ndarray], Tuple[int, ...]]:
    """-> (params, sizes schedule inferred from the conv shapes)."""
    state = _load_state(path_or_dict)
    if "state_dict" in state:
        state = state["state_dict"]
    if any(re.fullmatch(r"features\.\d+\.conv\.weight", k) for k in state):
        # "old pytorch" naming (reference proggan.py:271-298)
        from ganspace_tpu.models.tf_import import import_progan_old_pt
        return import_progan_old_pt(state)
    params = {k: _to_np(v) for k, v in state.items()}

    # Infer the feature-depth schedule (reference proggan.py
    # sizes_from_state_dict): layer1 conv is [s1, s0, 4, 4]; each odd
    # layer >= 3 is a NormUpscaleConvBlock whose out-channels define the
    # next schedule entry.
    n_layers = max(int(re.findall(r"\d+", k)[0])
                   for k in params if re.fullmatch(r"layer\d+\.conv\.weight", k))
    w1 = params["layer1.conv.weight"]
    sizes = [w1.shape[1], w1.shape[0]]
    for i in range(3, n_layers + 1, 2):
        sizes.append(params[f"layer{i}.conv.weight"].shape[0])
    return params, tuple(sizes)


# ---------------------------------------------------------------------------
# GAN-zoo DCGAN (facebookresearch/pytorch_GAN_zoo hub format)
# ---------------------------------------------------------------------------

def import_ganzoo_dcgan(path_or_dict):
    """-> (params, DCGANConfig).  Input: a ``pytorch_GAN_zoo`` checkpoint —
    the full hub save dict (``{'config', 'netG', 'netD', ...}``) or the
    generator state dict alone (the reference consumes these via
    ``torch.hub.load('facebookresearch/pytorch_GAN_zoo:hub', ...)``,
    ``models/wrappers.py:438-466``; its ``test()`` path runs ``netG``).

    The mapping is ORDER-driven, not name-driven: the zoo GNet is a flat
    transposed-conv trunk (format layer 1->4 px, 2x upsampling stages, RGB
    outlayer) with eval-mode BatchNorm between stages — exactly our local
    ``dcgan.synthesize`` graph — so modules are classified by their tensors
    (4-d ``weight`` = ConvTranspose2d; ``running_mean`` present = BatchNorm)
    and bound in state-dict insertion order (= module execution order),
    which survives any renaming across zoo versions.
    """
    state = _load_state(path_or_dict)
    for key in ("netG", "state_dict"):
        if isinstance(state.get(key), dict):
            state = state[key]
            break

    # Group leaves by module prefix, preserving insertion order.
    modules: Dict[str, dict] = {}
    for k, v in state.items():
        prefix, _, leaf = k.rpartition(".")
        modules.setdefault(prefix, {})[leaf] = v

    params: Dict[str, np.ndarray] = {}
    ci = -1
    for prefix, leaves in modules.items():
        if "running_mean" in leaves:                      # BatchNorm2d
            if ci < 0:
                raise ValueError(
                    f"zoo DCGAN state dict: BatchNorm module {prefix!r} "
                    f"precedes any transposed conv")
            for src, dst in (("weight", "weight"), ("bias", "bias"),
                             ("running_mean", "running_mean"),
                             ("running_var", "running_var")):
                params[f"bn{ci}.{dst}"] = _to_np(leaves[src])
        elif "weight" in leaves and _to_np(leaves["weight"]).ndim == 4:
            w = _to_np(leaves["weight"])                  # [in, out, k, k]
            if w.shape[2:] != (4, 4):
                raise ValueError(
                    f"zoo DCGAN conv {prefix!r} has kernel {w.shape[2:]}, "
                    f"expected (4, 4)")
            ci += 1
            params[f"deconv{ci}.weight"] = w
            params[f"deconv{ci}.bias"] = (
                _to_np(leaves["bias"]) if leaves.get("bias") is not None
                else np.zeros((w.shape[1],), np.float32))
    if ci < 1:
        raise ValueError("zoo DCGAN state dict: fewer than two transposed "
                         "convs found — not a GNet checkpoint?")

    from ganspace_tpu.models.dcgan import DCGANConfig
    z_total = params["deconv0.weight"].shape[0]
    cond = 20 if z_total > 20 else 0   # last 20 dims (wrappers.py:457-461)
    cfg = DCGANConfig(latent_dim=z_total - cond, cond_dim=cond,
                      base_channels=params["deconv0.weight"].shape[1],
                      resolution=4 * 2 ** ci)
    return params, cfg
