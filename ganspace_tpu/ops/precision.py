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
