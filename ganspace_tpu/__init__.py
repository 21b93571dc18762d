"""ganspace-tpu: TPU-native framework for discovering interpretable GAN controls.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
harskish/ganspace (GANSpace: Discovering Interpretable GAN Controls,
NeurIPS 2020).  The compute path is pure JAX: generators are stage-indexed
pure functions specialized per tap point (the compiler dead-code-eliminates
everything past the tap, replacing the reference's hand-unrolled
``partial_forward``, reference ``models/wrappers.py:40-42``), edits are a
pytree argument added at the tap (replacing the monkey-patch hook runtime in
``netdissect/nethook.py``), and the decomposition estimators stream
activations through sharded sufficient statistics psum-reduced over ICI.
"""

__version__ = "0.1.0"

from ganspace_tpu.config import Config

__all__ = ["Config", "__version__"]
