"""Edit-strip engine (reference ``notebooks/notebook_utils.py``).

The core edit-application routine shared by the visualizer, the notebooks and
the interactive viewer: apply a component as

  * a **latent** offset over a contiguous window of per-layer latent slots
    (StyleGAN W+ style / BigGAN layer-wise z):
        z[i] = z - zeroing_offset + sigma * lat_stdev * z_comp
    for i in [layer_start, layer_end)   (reference ``notebook_utils.py:86-90``)
  * and/or an **activation** offset injected at the tapped layer:
        edit_layer(layer, offset = sigma * act_stdev * x_comp - zeroing_offset)
    (reference ``notebook_utils.py:92-95``)

The *centered* variant first projects the sample onto the component and
subtracts, so sigma=0 lands exactly on the mean (``notebook_utils.py:68-81``).

Batching strategy mirrors the reference (``notebook_utils.py:40-47``): batch
over strip frames when there are few latents, over latents otherwise.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ganspace_tpu.models.base import InstrumentedModel


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v ** 2, axis=-1, keepdims=True) + 1e-8)


def create_strip(inst, mode, layer, latents, x_comp, z_comp, act_stdev, lat_stdev,
                 sigma, layer_start, layer_end, num_frames=5, as_uint8=False,
                 max_batch=None):
    """Apply edit to given latents, return a strip of images per latent.

    ``as_uint8=True`` quantizes frames on device before readback (HWC uint8
    instead of float [0,1]) — for callers that write 8-bit outputs anyway.
    ``max_batch`` caps the frames per forward (reference
    ``notebook_utils.py:40-47`` frame-block batching): long sweeps at high
    resolution must not materialize every frame's activations at once."""
    return _create_strip_impl(inst, mode, layer, latents, x_comp, z_comp,
                              act_stdev, lat_stdev, None, None, sigma,
                              layer_start, layer_end, num_frames, center=False,
                              as_uint8=as_uint8, max_batch=max_batch)


def create_strip_centered(inst, mode, layer, latents, x_comp, z_comp, act_stdev,
                          lat_stdev, act_mean, lat_mean, sigma, layer_start,
                          layer_end, num_frames=5, as_uint8=False,
                          max_batch=None):
    """Strip where the sample is centered along the component first."""
    return _create_strip_impl(inst, mode, layer, latents, x_comp, z_comp,
                              act_stdev, lat_stdev, act_mean, lat_mean, sigma,
                              layer_start, layer_end, num_frames, center=True,
                              as_uint8=as_uint8, max_batch=max_batch)


def _create_strip_impl(inst, mode, layer, latents, x_comp, z_comp, act_stdev,
                       lat_stdev, act_mean, lat_mean, sigma, layer_start,
                       layer_end, num_frames, center, as_uint8=False,
                       max_batch=None):
    if not isinstance(latents, list):
        latents = list(latents)
    latents = [jnp.asarray(l) if np.asarray(l).ndim > 1 else jnp.asarray(l)[None]
               for l in latents]

    max_lat = inst.model.get_max_latents()
    if layer_end < 0 or layer_end > max_lat:
        layer_end = max_lat
    layer_start = int(np.clip(layer_start, 0, layer_end))

    x_comp = jnp.asarray(x_comp)
    if x_comp.ndim >= 3 and x_comp.shape[1] == 1:
        # Spatial components are cached as [c, *sample_shape] with the
        # annotation's placeholder batch dim (sample_shape[0] == 1); collapse
        # it so the per-frame offset batches to [frames, C, H, W].
        x_comp = x_comp[:, 0]
    z_comp = jnp.asarray(z_comp)
    if z_comp.ndim >= 3 and z_comp.shape[1] == 1:
        z_comp = z_comp[:, 0]      # same placeholder collapse for lat_comp
    act_stdev = jnp.asarray(act_stdev)
    lat_stdev = jnp.asarray(lat_stdev)
    if act_mean is not None:
        act_mean = jnp.asarray(act_mean)
    if lat_mean is not None:
        lat_mean = jnp.asarray(lat_mean)

    sigma_range = np.linspace(-sigma, sigma, num_frames, dtype=np.float32)
    frames: List[List[np.ndarray]] = [[] for _ in range(len(latents))]

    for i_lat, z_single in enumerate(latents):
        zeroing_offset_act = 0
        zeroing_offset_lat = 0
        if center:
            if mode == "activation":
                # Center along the activation before applying the offset
                # (reference notebook_utils.py:71-77).  partial_forward
                # suffices — the retained value is identical to a full
                # forward's (the tested partial==full invariant) and the
                # image the reference computes here is discarded anyway.
                inst.close()
                inst.retain_layer(layer)
                inst.model.partial_forward(z_single, layer)
                value = inst.retained_features()[layer]
                dotp = jnp.sum((value - act_mean) * _normalize(x_comp),
                               axis=-1, keepdims=True)
                zeroing_offset_act = _normalize(x_comp) * dotp
            else:
                # Shift latent to lie on the mean along the component
                # (reference notebook_utils.py:79-81).
                dotp = jnp.sum((z_single - lat_mean) * _normalize(z_comp),
                               axis=-1, keepdims=True)
                zeroing_offset_lat = dotp * _normalize(z_comp)

        # Batch strip frames through the forward in max_batch-sized chunks
        # (all at once by default): replicate the latent num_frames times and
        # apply a per-frame sigma.  The reference loops frame blocks of its
        # VRAM-probed max_batch (notebook_utils.py:40-47); here the tail
        # chunk pads up to the chunk size so every chunk reuses ONE jit
        # signature, then the padding is sliced off after readback.
        n_base = z_single.shape[0]
        z_batch = jnp.repeat(z_single, num_frames, axis=0)
        sig = jnp.asarray(np.tile(sigma_range, n_base))

        inst.remove_edits()
        total = num_frames * n_base
        z = z_batch
        if mode in ("latent", "both"):
            delta = z_comp * sig.reshape([-1] + [1] * (z_comp.ndim - 1)) * lat_stdev
            zoff = (jnp.repeat(zeroing_offset_lat, num_frames, axis=0)
                    if center and mode != "activation" else 0)
            z_list = [z_batch] * max_lat
            for i in range(layer_start, layer_end):
                z_list[i] = z_batch - zoff + delta
            z = z_list

        act_offset = None
        if mode in ("activation", "both"):
            comp_batch = jnp.repeat(x_comp, total, axis=0) \
                if x_comp.shape[0] == 1 else jnp.broadcast_to(
                    x_comp, (total,) + x_comp.shape[1:])
            delta = comp_batch * sig.reshape([-1] + [1] * (comp_batch.ndim - 1))
            aoff = (jnp.repeat(zeroing_offset_act, num_frames, axis=0)
                    if center and mode == "activation" else 0)
            act_offset = np.asarray(delta * act_stdev - aoff)

        bs = total if not max_batch else min(int(max_batch), total)

        def pad(a, n):
            return a if n == 0 else jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (n,) + a.shape[1:])])

        chunks = []
        for s in range(0, total, bs):
            e = min(s + bs, total)
            n_pad = bs - (e - s)
            z_chunk = ([pad(zl[s:e], n_pad) for zl in z]
                       if isinstance(z, list) else pad(z[s:e], n_pad))
            inst.remove_edits()
            if act_offset is not None:
                off = act_offset[s:e]
                if n_pad:
                    off = np.concatenate(
                        [off, np.broadcast_to(off[-1:], (n_pad,) + off.shape[1:])])
                inst.edit_layer(layer, offset=off)
            img = inst.model.sample_np(z_chunk, uint8=as_uint8)
            if img.ndim == 3:
                img = img[None]
            chunks.append(img[:e - s])
        img_batch = chunks[0] if len(chunks) == 1 else np.concatenate(chunks)
        for j in range(num_frames):
            frames[i_lat].append(img_batch[j])

        inst.remove_edits()

    return frames


def save_frames(title, model_name, rootdir, frames, strip_width=10):
    """Grid + per-strip PNG writer (reference ``notebook_utils.py:175-200``)."""
    from os import makedirs

    from PIL import Image

    from ganspace_tpu.utils import pad_frames, prettify_name, to_uint8

    test_name = prettify_name(title)
    outdir = f"{rootdir}/{model_name}/{test_name}"
    makedirs(outdir, exist_ok=True)

    max_h = 512
    real_h = frames[0][0].shape[0]
    ratio = min(1.0, max_h / real_h)

    strips = [np.hstack(strip) for strip in frames[:strip_width]]
    if len(strips) >= strip_width:
        left_col = np.vstack(strips[0:strip_width // 2])
        right_col = np.vstack(strips[strip_width // 2:strip_width])
        pad_val = 255 if left_col.dtype == np.uint8 else 1
        grid = np.hstack([left_col,
                          np.full_like(left_col[:, :30], pad_val), right_col])
        im = Image.fromarray(to_uint8(grid))
        im = im.resize((int(ratio * im.size[0]), int(ratio * im.size[1])),
                       Image.LANCZOS)
        im.save(f"{outdir}/{test_name}_all.png")
    else:
        print("Too few strips to create grid, creating just strips!")

    for ex_num, strip in enumerate(frames[:strip_width]):
        im = Image.fromarray(to_uint8(np.hstack(pad_frames(strip))))
        im = im.resize((int(ratio * im.size[0]), int(ratio * im.size[1])),
                       Image.LANCZOS)
        im.save(f"{outdir}/{test_name}_{ex_num}.png")
