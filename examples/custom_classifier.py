"""Bring-your-own-classifier walkthrough for the dissection CLI's
``--features`` mode (reference ``ClassifierSegRunner``,
``netdissect/dissection.py:1529``, reached via ``--model`` without ``--gan``).

The reference dissects the conv units of an arbitrary torch classifier by
hooking a named layer and tallying thresholded unit masks against broden
ground truth.  Here a "classifier layer" is just a **pure function**
``images [B,3,H,W] float [0,1] -> activations [B,U,h,w]``, and the CLI
imports a *factory* for it:

    python -m ganspace_tpu.dissection \
        --features examples.custom_classifier:features \
        --broden dataset/broden --layer conv2 --samples 64

``features(layer)`` below returns a jitted random-init conv stack tapped at
``layer`` — swap in any feature extractor (including a torch model wrapped
to consume/produce numpy) with the same signature.

    python examples/custom_classifier.py          # self-contained demo run
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

LAYERS = ("conv1", "conv2", "conv3")
_WIDTHS = {"conv1": 16, "conv2": 32, "conv3": 64}


def _params(seed: int = 0):
    rs = np.random.RandomState(seed)
    params, c_in = {}, 3
    for name in LAYERS:
        c_out = _WIDTHS[name]
        w = rs.randn(c_out, c_in, 3, 3).astype(np.float32)
        params[name] = w * np.sqrt(2.0 / (c_in * 9))
        c_in = c_out
    return params


@partial(jax.jit, static_argnames=("layer",))
def _forward(params, x, layer: str):
    """Strided conv stack; jit-specializing on the tap name lets XLA
    dead-code-eliminate every stage after it (same trick as the
    generators' partial_forward)."""
    for name in LAYERS:
        w = jnp.asarray(params[name])
        x = jax.lax.conv_general_dilated(x, w, (2, 2), "SAME")
        x = jax.nn.relu(x)
        if name == layer:
            return x
    raise KeyError(layer)


def features(layer: str | None = None):
    """The ``--features`` factory: ``factory(layer) -> features_fn``."""
    layer = layer or "conv2"
    if layer not in LAYERS:
        raise SystemExit(f"unknown layer {layer!r}; choose from {LAYERS}")
    params = _params()
    fn = lambda images: _forward(params, jnp.asarray(images), layer)  # noqa: E731
    fn.__name__ = layer
    return fn


def main() -> int:
    import tempfile

    from ganspace_tpu.dissection.__main__ import main as dissect_main
    from ganspace_tpu.dissection.broden import write_synthetic_broden

    tmp = Path(tempfile.mkdtemp(prefix="custom_classifier_"))
    broden = write_synthetic_broden(tmp / "broden", n_images=8, size=32)
    rc = dissect_main([
        "--features", "examples.custom_classifier:features",
        "--broden", str(broden),
        "--layer", "conv2",
        "--samples", "8", "--batch", "4",
        "--rank-all-labels",
        "--outdir", str(tmp / "out"),
    ])
    print(f"outputs under {tmp / 'out'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
