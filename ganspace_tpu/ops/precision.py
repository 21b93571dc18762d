"""Global matmul/conv precision policy.

XLA's DEFAULT precision runs f32 contractions through the MXU's bf16 datapath
(and similarly reduced paths on CPU), which costs ~3 decimal digits per
product — too coarse for component-parity with the float32 reference.
All ganspace_tpu ops therefore thread an explicit ``lax.Precision``:

  * HIGHEST (default): true f32 accumulation; required for >0.99 component
    cosine parity against the PyTorch reference.
  * DEFAULT: bf16 MXU passes; ~2-8x faster synthesis, fine for previews and
    the interactive viewer.

Switch globally with ``set_precision('default'|'highest')`` or temporarily
with the ``precision(...)`` context manager.

CAVEAT: the precision is read at TRACE time. Already-jitted signatures keep
the precision they were traced with — switch precision BEFORE the first
forward of a given shape (or construct a fresh model) for it to take effect.
"""

from __future__ import annotations

import contextlib

from jax import lax

_PRECISION = lax.Precision.HIGHEST

_NAMES = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def get_precision() -> lax.Precision:
    return _PRECISION


def set_precision(p) -> None:
    global _PRECISION
    _PRECISION = _NAMES[p] if isinstance(p, str) else p


@contextlib.contextmanager
def precision(p):
    old = get_precision()
    set_precision(p)
    try:
        yield
    finally:
        set_precision(old)


# --------------------------------------------------------------------------
# Activation storage dtype (orthogonal to matmul precision)
# --------------------------------------------------------------------------
# DEFAULT matmul precision alone only switches the MXU datapath; activations
# remain float32, so memory-bound stages (blurs, upsamples, epilogues) see
# no speedup.  Opting into bfloat16 *storage* halves HBM traffic end-to-end
# through the synthesis network.  Off by default: it changes output numerics
# (~1e-2 relative), fine for previews/throughput but not for parity runs.

_SYNTH_DTYPE = None  # None -> float32 activations


def get_synth_dtype():
    """Activation storage dtype for generator synthesis, or None for f32."""
    return _SYNTH_DTYPE


def set_synth_dtype(dt) -> None:
    """dt: None / 'float32' for full precision, 'bfloat16' for half storage."""
    global _SYNTH_DTYPE
    if dt is None or dt == "float32":
        _SYNTH_DTYPE = None
    elif dt == "bfloat16":
        import jax.numpy as jnp
        _SYNTH_DTYPE = jnp.bfloat16
    else:
        _SYNTH_DTYPE = dt


def synth_dtype_name():
    """Active storage policy as a canonical dtype-name string (or None) —
    the static jit-cache key the generators thread through ``synthesize``.
    Read per call so scoping ``synth_dtype(...)`` works on warm traces."""
    if _SYNTH_DTYPE is None:
        return None
    import numpy as np
    return np.dtype(_SYNTH_DTYPE).name


@contextlib.contextmanager
def synth_dtype(dt):
    old = _SYNTH_DTYPE
    set_synth_dtype(dt)
    try:
        yield
    finally:
        set_synth_dtype(old)
