"""Checkpoint location + loading glue.

The reference auto-downloads checkpoints into ``models/checkpoints/`` or
``$GANCONTROL_CHECKPOINT_DIR`` (reference ``wrappers.py:154-155, 312-313,
484-485, 541-542``).  This environment is zero-egress, so the same directory
layout is honored for files the user provides; absent a checkpoint, models
fall back to seeded random initialization with a one-line notice (tests and
benchmarks run that way by design).

Expected layout (identical to the reference):
    $GANCONTROL_CHECKPOINT_DIR/
      stylegan2/stylegan2_<class>_<res>.pt      (rosinality format)
      stylegan/stylegan_<class>_<res>.pt        (lernapparat format)
      progan/<class>_lsun.pth                   (GANDissect format)
      biggan-deep-<res>/pytorch_model.bin       (HuggingFace format)

TF-era originals are also accepted and converted on the fly, without a
TensorFlow runtime (see ``tf_import.py``):
      stylegan/stylegan_<class>_<res>.pkl            (NVlabs dnnlib pickle)
      stylegan/karras2019stylegan-<class>-<res>x<res>.pkl
      progan/<class>_lsun.pkl                        (karras2018 tfutil pickle)
      biggan-deep-<res>/tf_weights.npz               (TF-Hub variable dump)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def checkpoint_root() -> Path:
    return Path(os.environ.get("GANCONTROL_CHECKPOINT_DIR",
                               Path(__file__).parent / "checkpoints"))


def find_checkpoint(relative: str) -> Optional[Path]:
    path = checkpoint_root() / relative
    return path if path.is_file() else None


def note_random_init(name: str, relative: str) -> None:
    print(f"[{name}] no checkpoint at {checkpoint_root() / relative}; "
          f"using seeded random initialization")
