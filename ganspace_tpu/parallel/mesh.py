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
    devices on a 1-D ``data`` axis.  A shape smaller than the host's device
    count uses the first ``prod(shape)`` devices (e.g. ``--mesh 4`` on an
    8-chip pod slice).
    """
    global _DEFAULT_MESH
    if shape is None and devices is None and _DEFAULT_MESH is not None:
        return _DEFAULT_MESH
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape:
        dims = tuple(int(s) for s in shape.lower().split("x"))
        need = int(np.prod(dims))
        if need > devices.size:
            raise ValueError(
                f"Mesh shape {dims} needs {need} devices, have {devices.size}")
        devices = devices.reshape(-1)[:need]
    else:
        dims = (devices.size,)
    axis_names = ("data",) if len(dims) == 1 else ("data", "model")[:len(dims)]
    mesh = Mesh(devices.reshape(dims), axis_names)
    if shape is None and _DEFAULT_MESH is None:
        _DEFAULT_MESH = mesh
    return mesh


def pipeline_mesh(shape: Optional[str] = None) -> Optional[Mesh]:
    """Mesh for the production pipeline, or ``None`` for single-device runs.

    ``None`` shape -> all devices (1-D ``data`` axis); a 1-device result
    collapses to ``None`` so single-chip callers keep identity behaviour
    (no resharding device_puts anywhere on the hot path).
    """
    if shape is None and len(jax.devices()) == 1:
        return None
    mesh = get_mesh(shape)
    return None if mesh.devices.size == 1 else mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[n, ...] arrays sharded along the sample axis."""
    return NamedSharding(mesh, P("data"))


def feature_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """[..., D] arrays sharded along the trailing feature axis.

    The feature dimension splits over ALL mesh axes (on a 2-D ``data x model``
    mesh the estimator state shards D over both), maximizing per-chip HBM
    headroom for the [D, D] / [D, l] statistics."""
    axes = mesh.axis_names[0] if len(mesh.axis_names) == 1 else tuple(mesh.axis_names)
    spec = [None] * (ndim - 1) + [axes]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh]):
    """Place a batch onto the mesh, sharded along axis 0 (no-op without a
    mesh).  Batches that don't divide the ``data`` axis stay unsharded —
    callers on the hot path keep batch % n_devices == 0."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.numpy.asarray(x)
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
    if x.shape[0] % n_data != 0:
        return jax.numpy.asarray(x)
    return jax.device_put(x, batch_sharding(mesh))


def reshard_for_estimator(x, mesh: Optional[Mesh]):
    """[n, D] batch-sharded -> feature-sharded (ICI all-to-all under jit)."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return x
    return jax.device_put(x, feature_sharding(mesh, 2))
