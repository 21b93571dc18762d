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
                 sigma, layer_start, layer_end, num_frames=5, as_uint8=False):
    """Apply edit to given latents, return a strip of images per latent.

    ``as_uint8=True`` quantizes frames on device before readback (HWC uint8
    instead of float [0,1]) — for callers that write 8-bit outputs anyway."""
    return _create_strip_impl(inst, mode, layer, latents, x_comp, z_comp,
                              act_stdev, lat_stdev, None, None, sigma,
                              layer_start, layer_end, num_frames, center=False,
                              as_uint8=as_uint8)


def create_strip_centered(inst, mode, layer, latents, x_comp, z_comp, act_stdev,
                          lat_stdev, act_mean, lat_mean, sigma, layer_start,
                          layer_end, num_frames=5, as_uint8=False):
    """Strip where the sample is centered along the component first."""
    return _create_strip_impl(inst, mode, layer, latents, x_comp, z_comp,
                              act_stdev, lat_stdev, act_mean, lat_mean, sigma,
                              layer_start, layer_end, num_frames, center=True,
                              as_uint8=as_uint8)


def _create_strip_impl(inst, mode, layer, latents, x_comp, z_comp, act_stdev,
                       lat_stdev, act_mean, lat_mean, sigma, layer_start,
                       layer_end, num_frames, center, as_uint8=False):
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

        # Batch ALL strip frames through one forward: replicate the latent
        # num_frames times and apply a per-frame sigma — a single jitted
        # call instead of the reference's frame-block loop.
        n_base = z_single.shape[0]
        z_batch = jnp.repeat(z_single, num_frames, axis=0)
        sig = jnp.asarray(np.tile(sigma_range, n_base))

        inst.remove_edits()
        z = z_batch
        if mode in ("latent", "both"):
            delta = z_comp * sig.reshape([-1] + [1] * (z_comp.ndim - 1)) * lat_stdev
            zoff = (jnp.repeat(zeroing_offset_lat, num_frames, axis=0)
                    if center and mode != "activation" else 0)
            z_list = [z_batch] * max_lat
            for i in range(layer_start, layer_end):
                z_list[i] = z_batch - zoff + delta
            z = z_list

        if mode in ("activation", "both"):
            comp_batch = jnp.repeat(x_comp, num_frames * n_base, axis=0) \
                if x_comp.shape[0] == 1 else jnp.broadcast_to(
                    x_comp, (num_frames * n_base,) + x_comp.shape[1:])
            delta = comp_batch * sig.reshape([-1] + [1] * (comp_batch.ndim - 1))
            aoff = (jnp.repeat(zeroing_offset_act, num_frames, axis=0)
                    if center and mode == "activation" else 0)
            inst.edit_layer(layer, offset=np.asarray(delta * act_stdev - aoff))

        img_batch = inst.model.sample_np(z, uint8=as_uint8)
        if img_batch.ndim == 3:
            img_batch = img_batch[None]
        for j in range(num_frames):
            frames[i_lat].append(img_batch[j])

        inst.remove_edits()

    return frames


def save_frames(title, model_name, rootdir, frames, strip_width=10):
    """Grid + per-strip PNG writer (reference ``notebook_utils.py:175-200``)."""
    from os import makedirs

    from PIL import Image

    from ganspace_tpu.utils import pad_frames, prettify_name

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
        grid = np.hstack([left_col, np.ones_like(left_col[:, :30]), right_col])
        im = Image.fromarray((255 * grid).astype(np.uint8))
        im = im.resize((int(ratio * im.size[0]), int(ratio * im.size[1])),
                       Image.LANCZOS)
        im.save(f"{outdir}/{test_name}_all.png")
    else:
        print("Too few strips to create grid, creating just strips!")

    for ex_num, strip in enumerate(frames[:strip_width]):
        im = Image.fromarray(np.uint8(255 * np.hstack(pad_frames(strip))))
        im = im.resize((int(ratio * im.size[0]), int(ratio * im.size[1])),
                       Image.LANCZOS)
        im.save(f"{outdir}/{test_name}_{ex_num}.png")
