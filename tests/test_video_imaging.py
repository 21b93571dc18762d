"""Host-side video/GIF writers and image helpers
(reference ``visualize.py:41-76``, ``utils.py:19-41``)."""

import os
import stat

import numpy as np
import pytest
from PIL import Image

from ganspace_tpu.utils.imaging import pad_frames, prettify_name, to_uint8
from ganspace_tpu.utils.video import make_gif, make_mp4


def _frames(n=3, h=8, w=12):
    rs = np.random.RandomState(0)
    return [rs.rand(h, w, 3).astype(np.float32) for _ in range(n)]


def test_make_gif(tmp_path):
    out = tmp_path / "sweep.gif"
    make_gif(_frames(), duration_secs=1.0, outname=out)
    with Image.open(out) as im:
        assert im.n_frames == 3
        assert im.size == (12, 8)  # PIL size is (W, H)


def test_make_mp4_falls_back_to_gif_without_ffmpeg(tmp_path, monkeypatch):
    monkeypatch.setattr("ganspace_tpu.utils.video.shutil.which",
                        lambda name: None)
    make_mp4(_frames(), duration_secs=1.0, outname=tmp_path / "sweep.mp4")
    assert (tmp_path / "sweep.gif").exists()
    assert not (tmp_path / "sweep.mp4").exists()


def test_make_mp4_ffmpeg_invocation(tmp_path, monkeypatch):
    """Drive the real pipe protocol against a stub ffmpeg: frame geometry
    must be WIDTHxHEIGHT (ffmpeg -s order) and the raw payload must be
    exactly n*h*w*3 bytes of rgb24."""
    stub = tmp_path / "ffmpeg"
    argfile, binfile = tmp_path / "args.txt", tmp_path / "stdin.bin"
    stub.write_text("#!/bin/sh\n"
                    f'printf \'%s\\n\' "$@" > "{argfile}"\n'
                    f'cat > "{binfile}"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr("ganspace_tpu.utils.video.shutil.which",
                        lambda name: str(stub))

    frames = _frames(n=4, h=8, w=12)
    make_mp4(frames, duration_secs=2.0, outname=tmp_path / "out.mp4")

    args = argfile.read_text().splitlines()
    assert args[args.index("-s") + 1] == "12x8"          # WxH, not HxW
    assert args[args.index("-r") + 1] == "2"             # 4 frames / 2 s
    assert args[-1].endswith("out.mp4")
    assert binfile.stat().st_size == 4 * 8 * 12 * 3


def test_make_mp4_fps_floor(tmp_path, monkeypatch):
    """duration > n frames must not produce -r 0 (ffmpeg rejects it)."""
    stub = tmp_path / "ffmpeg"
    argfile = tmp_path / "args.txt"
    stub.write_text("#!/bin/sh\n"
                    f'printf \'%s\\n\' "$@" > "{argfile}"\ncat > /dev/null\n')
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr("ganspace_tpu.utils.video.shutil.which",
                        lambda name: str(stub))
    make_mp4(_frames(n=2), duration_secs=10.0, outname=tmp_path / "o.mp4")
    args = argfile.read_text().splitlines()
    assert int(args[args.index("-r") + 1]) >= 1


def test_pad_frames_float_and_int():
    f32 = [np.zeros((16, 128, 3), np.float32)] * 3
    padded = pad_frames(f32)                      # default: horiz 1/64
    assert len(padded) == 5                        # f, bar, f, bar, f
    assert padded[1].shape == (16, 2, 3)           # 128 // 64
    assert padded[1].max() == padded[1].min() == 1.0

    u8 = [np.zeros((16, 128, 3), np.uint8)] * 2
    padded = pad_frames(u8)
    assert padded[1].dtype == np.uint8 and padded[1][0, 0, 0] == 255

    vert = pad_frames([np.zeros((64, 8, 3), np.float32)] * 2,
                      pad_fract_horiz=0, pad_fract_vert=16)
    assert vert[1].shape == (4, 8, 3)


def test_prettify_name():
    assert prettify_name("conv2/Ada IN: 4x4") == "conv2_Ada_IN__4x4"
    assert prettify_name("ok-name_9") == "ok-name_9"


def test_to_uint8_rounds():
    img = np.array([[-0.1, 0.0, 0.5, 1.0, 1.7]], np.float32)
    out = to_uint8(img)
    assert out.dtype == np.uint8
    assert out.tolist() == [[0, 0, 128, 255, 255]]


def test_video_writers_accept_uint8(tmp_path, monkeypatch):
    """uint8 frames (the device-quantized strip path) pass through the
    writers byte-identical to their float twins."""
    frames_f = _frames(n=3)
    # quantize with the device readback rule (clip + round, as
    # imaging.device_uint8_nhwc / to_uint8) — the float path now uses the
    # same rule, so both renderings must be byte-identical
    frames_u = [(np.clip(f, 0, 1) * 255 + 0.5).astype(np.uint8)
                for f in frames_f]
    make_gif(frames_u, 1.0, tmp_path / "u8.gif")
    with Image.open(tmp_path / "u8.gif") as im:
        assert im.n_frames == 3

    stub = tmp_path / "ffmpeg"
    binfile = tmp_path / "stdin.bin"
    stub.write_text(f'#!/bin/sh\ncat > "{binfile}"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr("ganspace_tpu.utils.video.shutil.which",
                        lambda name: str(stub))
    make_mp4(frames_u, 1.0, tmp_path / "u8.mp4")
    raw_u8 = binfile.read_bytes()
    make_mp4(frames_f, 1.0, tmp_path / "f32.mp4")
    assert binfile.read_bytes() == raw_u8


def test_to_uint8_passthrough():
    u8 = np.array([[0, 128, 255]], np.uint8)
    assert to_uint8(u8) is u8
