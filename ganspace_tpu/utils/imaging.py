"""Small host-side image helpers (reference ``utils.py:19-41``)."""

from __future__ import annotations

import string

import numpy as np

_VALID = set("-_" + string.ascii_letters + string.digits)


def prettify_name(name: str) -> str:
    """Filesystem-safe name: replace anything outside [-_a-zA-Z0-9] with '_'."""
    return "".join(c if c in _VALID else "_" for c in name)


def pad_frames(strip, pad_fract_horiz: int = 64, pad_fract_vert: int = 0, pad_value=None):
    """Interleave white padding bars between frames of a strip.

    Matches reference ``utils.py:26-41``: horizontal padding is 1/64 of frame
    width by default; pad value is 1.0 for float images, dtype-max for ints.
    """
    dtype = strip[0].dtype
    if pad_value is None:
        pad_value = 1.0 if dtype in (np.float32, np.float64) else np.iinfo(dtype).max

    frames = [strip[0]]
    for frame in strip[1:]:
        if pad_fract_horiz > 0:
            frames.append(pad_value * np.ones(
                (frame.shape[0], frame.shape[1] // pad_fract_horiz, 3), dtype=dtype))
        elif pad_fract_vert > 0:
            frames.append(pad_value * np.ones(
                (frame.shape[0] // pad_fract_vert, frame.shape[1], 3), dtype=dtype))
        frames.append(frame)
    return frames


def to_uint8(img01: np.ndarray) -> np.ndarray:
    """[0,1] float image -> uint8 (uint8 input passes through unchanged)."""
    img01 = np.asarray(img01)
    if img01.dtype == np.uint8:
        return img01
    return (255.0 * np.clip(img01, 0.0, 1.0) + 0.5).astype(np.uint8)


_quantize_nhwc = None


def device_uint8_nhwc(img):
    """Device-side [B,3,H,W] float [0,1] -> [B,H,W,3] uint8: quantize BEFORE
    readback, so rendered frames cross to the host at 1/4 the bytes (on
    tunneled/remote device links the frame copy, not synthesis, dominates
    grid/video rendering).  The jitted quantizer is module-cached so repeated
    frame readbacks skip re-tracing (jax import stays lazy for host-only
    callers)."""
    global _quantize_nhwc
    if _quantize_nhwc is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _q(x):
            x = jnp.clip(jnp.transpose(x, (0, 2, 3, 1)), 0.0, 1.0)
            return (x * 255.0 + 0.5).astype(jnp.uint8)

        _quantize_nhwc = _q
    return _quantize_nhwc(img)
