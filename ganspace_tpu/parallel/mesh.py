"""Device-mesh setup and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.4); the TPU-native
scale-out axes are:

* **data parallelism** for synthesis — the latent batch shards over the
  ``data`` mesh axis; parameters replicate (all supported generators are
  <~100M params).  XLA propagates the sharding through the jitted synthesis
  with no per-model code.
* **feature parallelism** for estimator statistics — activation blocks and
  estimator state shard along the feature (D) axis, so every Gram/moment
  contraction becomes per-shard partial matmuls + an ICI ``psum`` inserted by
  XLA (SURVEY.md §5 long-context: the 1M-sample x 786k-dim stream is this
  codebase's analog of sequence parallelism).

Between the two stages a resharding ([n, D] batch-sharded -> feature-sharded)
rides ICI as an all-to-all; ``reshard_for_estimator`` makes it explicit.

Single-device (or no-mesh) callers get identity behaviour throughout.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DEFAULT_MESH: Optional[Mesh] = None


def get_mesh(shape: Optional[str] = None, devices=None) -> Mesh:
    """Build (and memoize) the global device mesh.

    ``shape`` is the CLI ``--mesh`` string: '8' or '4x2'; default = all
    devices on a 1-D ``data`` axis.
    """
    global _DEFAULT_MESH
    if shape is None and devices is None and _DEFAULT_MESH is not None:
        return _DEFAULT_MESH
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape:
        dims = tuple(int(s) for s in shape.lower().split("x"))
    else:
        dims = (devices.size,)
    if int(np.prod(dims)) != devices.size:
        raise ValueError(f"Mesh shape {dims} does not match {devices.size} devices")
    axis_names = ("data",) if len(dims) == 1 else ("data", "model")[:len(dims)]
    mesh = Mesh(devices.reshape(dims), axis_names)
    if shape is None and _DEFAULT_MESH is None:
        _DEFAULT_MESH = mesh
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[n, ...] arrays sharded along the sample axis."""
    return NamedSharding(mesh, P("data"))


def feature_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """[..., D] arrays sharded along the trailing feature axis."""
    spec = [None] * (ndim - 1) + ["data"]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh]):
    """Place a host batch onto the mesh, sharded along axis 0 (no-op without
    a mesh).  Pads nothing: callers keep batch % n_devices == 0."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.numpy.asarray(x)
    return jax.device_put(x, batch_sharding(mesh))


def reshard_for_estimator(x, mesh: Optional[Mesh]):
    """[n, D] batch-sharded -> feature-sharded (ICI all-to-all under jit)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return x
    return jax.device_put(x, feature_sharding(mesh, 2))
