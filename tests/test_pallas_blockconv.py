"""Exact-im2col Pallas block conv: interpret-mode parity vs the XLA
block-space formulation (and, transitively via ``tests/test_s2d.py``, vs
the plain pixel conv).  Interpret mode validates the kernel on any backend
— the guard exists so the kernel can be evaluated off this relay
(``GANSPACE_PALLAS_CONV=1``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ganspace_tpu.ops import s2d
from ganspace_tpu.ops.pallas.blockconv import (
    conv3x3_blocks_pallas,
    conv3x3_patch_kernel,
    supported,
)


@pytest.mark.parametrize("b,hw,c,co", [
    (2, 16, 8, 8),      # tiny (interpret-only channel count)
    (1, 16, 32, 16),    # 4C = 128: the 1024px tail channel count
    (1, 8, 64, 64),     # 4C = 256: the 512px tail channel count
    (2, 8, 4, 12),      # non-square channel map
])
def test_interpret_parity(b, hw, c, co):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, hw, hw, c).astype(np.float32))
    w = jnp.asarray((rs.randn(co, c, 3, 3) * 0.1).astype(np.float32))
    xb = s2d.to_blocks(x)
    ref = s2d.conv3x3_blocks(xb, w)
    got = conv3x3_blocks_pallas(xb, w, interpret=True)
    assert got.shape == (b, hw // 2, hw // 2, 4 * co)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert err < 1e-5, err


def test_patch_kernel_flop_count():
    """The packed kernel carries 9/16 nonzero slots per output phase —
    the exact receptive field, not the 36-slot structural-zero layout."""
    w = jnp.asarray(np.random.RandomState(1).randn(4, 4, 3, 3), jnp.float32)
    k16 = np.asarray(conv3x3_patch_kernel(w))
    assert k16.shape == (16 * 4, 4 * 4)
    nz = np.abs(k16.reshape(16, 4, 4, 4)) > 0   # (slot, c, phase, o)
    per_phase = nz.any(axis=(1, 3)).sum(0)
    assert (per_phase == 9).all(), per_phase


def test_supported_shapes():
    assert supported(32) and supported(64) and supported(128)
    # 4C%128==0 alone is not enough: C must also pack registers evenly
    assert not supported(96) and not supported(160)
    assert not supported(8) and not supported(48)


def test_guard_routes(monkeypatch):
    """GANSPACE_PALLAS_CONV=1 routes supported channel counts through the
    Pallas kernel (interpret-patched here so the test runs on CPU)."""
    import ganspace_tpu.ops.pallas.blockconv as bc

    calls = []
    orig = bc.conv3x3_blocks_pallas
    monkeypatch.setattr(
        bc, "conv3x3_blocks_pallas",
        lambda x, w, **kw: calls.append(1) or orig(x, w, interpret=True))
    monkeypatch.setenv("GANSPACE_PALLAS_CONV", "1")
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 8, 32).astype(np.float32))
    w = jnp.asarray((rs.randn(8, 32, 3, 3) * 0.1).astype(np.float32))
    xb = s2d.to_blocks(x)
    y = s2d.conv3x3_blocks(xb, w)
    assert calls == [1]
    monkeypatch.setenv("GANSPACE_PALLAS_CONV", "0")
    ref = s2d.conv3x3_blocks(xb, w)
    assert float(jnp.abs(y - ref).max()) < 1e-4
