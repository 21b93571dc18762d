"""Streamed npz writer: pipelined DMA + zip write must be byte-compatible
with np.savez (same keys, dtypes, values; np.load reads both identically)."""

import pytest
import numpy as np
import jax.numpy as jnp

from ganspace_tpu.decomposition import _stream_npz


def test_stream_npz_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    comp = rs.randn(7, 96).astype(np.float32)          # odd c: uneven chunks
    small = {
        "act_mean": rs.randn(1, 96).astype(np.float32),
        "act_stdev": rs.rand(7).astype(np.float32),
        "_meta": np.bytes_(b'{"device_rng": true}'),
    }
    out_shape = (7, 1, 6, 4, 4)                        # metadata-only reshape
    path = tmp_path / "streamed.npz"
    _stream_npz(path, small, "act_comp", jnp.asarray(comp), out_shape,
                chunks=3)

    ref = tmp_path / "plain.npz"
    np.savez(ref, act_comp=comp.reshape(out_shape), **small)

    with np.load(path) as got, np.load(ref) as want:
        assert set(got.files) == set(want.files)
        for k in want.files:
            g, w = got[k], want[k]
            assert g.dtype == w.dtype and g.shape == w.shape, k
            if g.dtype.kind == "f":
                np.testing.assert_array_equal(g, w)


def test_stream_npz_single_chunk_and_many(tmp_path):
    comp = np.arange(2 * 8, dtype=np.float32).reshape(2, 8)
    for chunks in (1, 16):                              # chunks > rows clamps
        p = tmp_path / f"c{chunks}.npz"
        _stream_npz(p, {}, "act_comp", jnp.asarray(comp), (2, 8),
                    chunks=chunks)
        with np.load(p) as z:
            np.testing.assert_array_equal(z["act_comp"], comp)


@pytest.mark.slow
def test_pipeline_streamed_cache_readable(tmp_path, monkeypatch):
    """Force the uncompressed (streamed) path on a small end-to-end run and
    check the cache np.loads with the exact reference key set."""
    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models import get_instrumented_model

    monkeypatch.setenv("GANSPACE_OUTPUT_DIR", str(tmp_path))
    monkeypatch.setenv("GANSPACE_FUSED_ACTS", "1")
    monkeypatch.setenv("GANSPACE_CACHE_COMPRESS", "0")
    cfg = Config(model="DCGAN", layer="deconv3", estimator="ipca",
                 components=4, n=256, batch_size=256)
    inst = get_instrumented_model(cfg, use_w=False)
    path = get_or_compute(cfg, inst, force_recompute=True)
    with np.load(path) as z:
        assert {"act_comp", "act_mean", "act_stdev", "lat_comp", "lat_mean",
                "lat_stdev", "var_ratio", "random_stdevs"} <= set(z.files)
        comp = z["act_comp"]
        assert comp.dtype == np.float32 and comp.shape[0] == 4
        norms = np.linalg.norm(comp.reshape(4, -1), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
