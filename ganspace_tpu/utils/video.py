"""Video/GIF writers (reference ``visualize.py:41-76``).

``make_mp4`` pipes raw RGB frames into ffmpeg/libx264 exactly like the
reference when ffmpeg is on PATH; otherwise it falls back to an animated GIF
(PIL) so sweep videos still render in minimal environments.
"""

from __future__ import annotations

import shutil
import subprocess as sp
from pathlib import Path

import numpy as np
from PIL import Image

# clip+round quantization, uint8 passthrough — the SAME rule as the
# device-side readback path (imaging.device_uint8_nhwc), so a sweep rendered
# float vs as_uint8 writes byte-identical frames.
from ganspace_tpu.utils.imaging import to_uint8 as _u8


def make_gif(imgs, duration_secs: float, outname):
    frames = [Image.fromarray(_u8(x)) for x in imgs]
    head, *tail = frames
    ms_per_frame = 1000 * duration_secs / len(imgs)
    head.save(str(Path(outname).with_suffix(".gif")), format="GIF",
              append_images=tail, save_all=True, duration=ms_per_frame, loop=0)


def make_mp4(imgs, duration_secs: float, outname):
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        print(f"ffmpeg not found; writing GIF instead for {outname}")
        return make_gif(imgs, duration_secs, outname)

    assert len(imgs[0].shape) == 3, "Invalid shape of frame data"
    h, w = imgs[0].shape[0:2]
    fps = max(1, int(len(imgs) / duration_secs))

    # ffmpeg -s takes WIDTHxHEIGHT. (The reference passes shape[0]x[1] =
    # HxW, visualize.py:61 — harmless for its square frames but garbled for
    # padded strips; fixed here rather than replicated.)
    command = [
        ffmpeg, "-y", "-f", "rawvideo", "-vcodec", "rawvideo",
        "-s", f"{w}x{h}", "-pix_fmt", "rgb24",
        "-r", f"{fps}", "-i", "-", "-an", "-c:v", "libx264",
        "-preset", "slow", "-crf", "17",
        str(Path(outname).with_suffix(".mp4")),
    ]
    frame_data = np.concatenate([_u8(x).reshape(-1) for x in imgs])
    with sp.Popen(command, stdin=sp.PIPE, stdout=sp.PIPE, stderr=sp.PIPE) as p:
        ret = p.communicate(frame_data.tobytes())
        if p.returncode != 0:
            print(ret[1].decode("utf-8"))
            raise sp.CalledProcessError(p.returncode, command)
