"""Native image-writer pool: build, async PNG correctness, error counting."""

import numpy as np
import pytest
from PIL import Image

from ganspace_tpu.native import ImageWriterPool


def test_async_png_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    imgs = {f"im{i}.png": rs.randint(0, 256, (37, 53, 3), dtype=np.uint8)
            for i in range(8)}
    with ImageWriterPool(4) as pool:
        assert pool.native, "native build expected in this environment"
        for name, img in imgs.items():
            pool.save_png(tmp_path / name, img)
        pool.wait()
        assert pool.errors() == 0
    for name, img in imgs.items():
        loaded = np.asarray(Image.open(tmp_path / name))
        assert np.array_equal(loaded, img), name


def test_grayscale_and_rgba(tmp_path):
    rs = np.random.RandomState(1)
    gray = rs.randint(0, 256, (16, 16), dtype=np.uint8)
    rgba = rs.randint(0, 256, (16, 16, 4), dtype=np.uint8)
    with ImageWriterPool(2) as pool:
        pool.save_png(tmp_path / "g.png", gray)
        pool.save_png(tmp_path / "a.png", rgba)
        pool.wait()
        assert pool.errors() == 0
    assert np.array_equal(np.asarray(Image.open(tmp_path / "g.png")), gray)
    assert np.array_equal(np.asarray(Image.open(tmp_path / "a.png")), rgba)


def test_raw_write_and_error_count(tmp_path):
    with ImageWriterPool(2) as pool:
        pool.save_raw(tmp_path / "blob.bin", b"hello fastio")
        # invalid directory -> counted error, no exception
        pool.save_raw(tmp_path / "no_such_dir" / "x.bin", b"nope")
        pool.wait()
        assert pool.errors() == 1
    assert (tmp_path / "blob.bin").read_bytes() == b"hello fastio"


def test_rejects_float(tmp_path):
    with ImageWriterPool(1) as pool:
        with pytest.raises(ValueError):
            pool.save_png(tmp_path / "f.png", np.zeros((4, 4, 3), np.float32))
