"""Batch autotuning from XLA compiled memory analysis (replaces the
reference's CUDA VRAM probe, ``decomposition.py:49-74``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganspace_tpu.decomposition import (
    _analyzed_batch_size,
    _hbm_bytes,
    get_max_batch_size,
)
from ganspace_tpu.models import get_instrumented_model


@pytest.fixture(scope="module")
def sg2_1024():
    from ganspace_tpu.models.stylegan2 import StyleGAN2

    m = StyleGAN2(class_name="ffhq")   # full-size 1024px, random init
    m.use_w()
    return m


def test_chosen_batch_stays_under_budget(sg2_1024, monkeypatch):
    """The analyzed HBM at the CHOSEN batch must stay within the budget
    for a 1024px conv tap (VERDICT r2 item 6's done-criterion)."""
    monkeypatch.setenv("GANSPACE_HBM_BYTES", str(4 << 30))
    monkeypatch.setenv("GANSPACE_HBM_FRACTION", "0.4")
    m = sg2_1024
    b = _analyzed_batch_size(m, "convs.2")
    assert b is not None and b >= 4 and (b & (b - 1)) == 0  # pow2

    # Re-analyze at the chosen batch.  XLA:CPU's analysis omits
    # argument/output buffers, so account the full footprint explicitly:
    # analyzed peak + params + the [b, D] activation block itself.
    fn, pack = m.pure_acts_fn_p("convs.2")
    pack_s = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pack)
    lat_s = jax.ShapeDtypeStruct((b, 512), jnp.float32)
    out_s = jax.eval_shape(fn, pack_s, lat_s)
    compiled = jax.jit(fn).lower(pack_s, lat_s).compile()
    ma = compiled.memory_analysis()
    params_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                       for x in jax.tree.leaves(pack))
    footprint = (ma.peak_memory_in_bytes
                 + max(0, params_bytes - ma.argument_size_in_bytes)
                 + max(0, int(np.prod(out_s.shape)) * out_s.dtype.itemsize
                       - ma.output_size_in_bytes))
    budget = 0.4 * (4 << 30)
    assert footprint <= budget * 1.25, (footprint, budget)


def test_budget_scales_choice(sg2_1024, monkeypatch):
    """A tighter HBM budget must choose a smaller (or equal) batch."""
    m = sg2_1024
    monkeypatch.setenv("GANSPACE_HBM_BYTES", str(8 << 30))
    b_large = _analyzed_batch_size(m, "convs.6")
    monkeypatch.setenv("GANSPACE_HBM_BYTES", str(1 << 30))
    b_small = _analyzed_batch_size(m, "convs.6")
    assert b_small is not None and b_large is not None
    assert b_small < b_large


def test_registry_memoizes(sg2_1024, monkeypatch):
    monkeypatch.setenv("GANSPACE_HBM_BYTES", str(4 << 30))
    m = sg2_1024
    import time
    b1 = _analyzed_batch_size(m, "convs.2")
    t0 = time.time()
    b2 = _analyzed_batch_size(m, "convs.2")
    assert b1 == b2
    assert time.time() - t0 < 0.5  # registry hit: no compile


def test_env_disable_falls_back_to_heuristic(monkeypatch):
    monkeypatch.setenv("GANSPACE_AUTOTUNE_B", "0")
    from ganspace_tpu.models.stylegan2 import SG2Config, StyleGAN2

    cfg = SG2Config(resolution=16, channels=((4, 32), (8, 32), (16, 16)))
    m = StyleGAN2("cat", cfg=cfg)
    assert _analyzed_batch_size(m, "convs.0") is None


def test_production_flow_uses_analysis(monkeypatch):
    """get_max_batch_size prefers the analyzed size when a pure tap path
    exists (the heuristic remains only as fallback)."""
    from ganspace_tpu.models.base import InstrumentedModel
    from ganspace_tpu.models.stylegan2 import SG2Config, StyleGAN2

    monkeypatch.setenv("GANSPACE_HBM_BYTES", str(1 << 28))  # 256 MB
    cfg = SG2Config(resolution=16, channels=((4, 32), (8, 32), (16, 16)))
    m = StyleGAN2("cat", cfg=cfg)
    inst = InstrumentedModel(m)
    b = get_max_batch_size(inst, layer_name="convs.0")
    assert b == _analyzed_batch_size(m, "convs.0")
    # disabled -> heuristic value (a fixed function of feature shape)
    monkeypatch.setenv("GANSPACE_AUTOTUNE_B", "0")
    b_h = get_max_batch_size(inst, layer_name="convs.0")
    assert b_h >= 4


def test_confirm_shrinks_superlinear_extrapolation(monkeypatch):
    """VERDICT r3 item 8's done-criterion: a workload whose memory grows
    superlinearly in batch — the b=32 linear extrapolation overshoots the
    budget, and the confirm lowering at the chosen size must catch it and
    shrink until the ANALYZED footprint fits."""
    hbm = 64 << 20  # 64 MB
    monkeypatch.setenv("GANSPACE_HBM_BYTES", str(hbm))
    monkeypatch.setenv("GANSPACE_HBM_FRACTION", "0.4")

    class QuadModel:
        """Output is [b, b]: footprint ~ b^2, so per-sample cost measured at
        b=32 wildly underestimates the cost at the extrapolated batch."""
        name = "quad-test"
        model_name = "quad-test"

        def get_latent_dims(self):
            return 64

        def pure_acts_fn_p(self, layer_name):
            def fn(pack, z):
                return jnp.dot(z, z.T) + pack["bias"]
            return fn, {"bias": np.zeros((), np.float32)}

    b = _analyzed_batch_size(QuadModel(), "any")
    assert b is not None
    budget = 0.4 * hbm
    # linear extrapolation would have chosen the 4096 clamp (32 KB probe
    # footprint): the confirmed batch must actually fit
    assert b < 4096
    assert b * b * 4 <= budget * 1.25, (b, budget)


def test_hbm_bytes_env_override(monkeypatch):
    monkeypatch.setenv("GANSPACE_HBM_BYTES", "123456789")
    assert _hbm_bytes() == 123456789
