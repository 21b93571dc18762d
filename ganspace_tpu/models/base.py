"""Generator base contract + functional tap/edit instrumentation.

The reference implements layer capture by monkey-patching ``layer.forward`` on
torch modules (``netdissect/nethook.py:15-266``) and early exit by
hand-unrolled ``partial_forward`` methods (``models/wrappers.py:40-42``).
Neither mechanism survives ``jax.jit``.  The TPU-native design:

* every generator's synthesis is ONE pure function, annotated with named
  **tap points** (reference-compatible torch module paths);
* ``retain``/``stop_at``/edit-keys are *static* jit arguments — requesting a
  tap specializes the computation and XLA dead-code-eliminates all later
  stages, so ``partial_forward`` costs nothing extra to maintain;
* edits are traced array arguments applied at the tap exactly like the
  reference hook (``nethook.py:211-231``):
      retained <- x (pre-edit, detached)
      x <- x * (1 - ablation) + replacement * ablation
      x <- x + offset

``InstrumentedModel`` is a thin host-side bag of (retain set, edit dict) that
models consult when called — mirroring the public API of
``nethook.InstrumentedModel`` (``retain_layer``, ``retained_features``,
``edit_layer``, ``remove_edits``, ``close``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Edits
# ---------------------------------------------------------------------------

EDIT_FIELDS = ("ablation", "replacement", "offset")


def _match_rank(v: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Reference broadcast rule (``nethook.make_matching_tensor``,
    ``nethook.py:243-266``): missing dims are filled as
    (1, *v.shape, 1, ...) — leading batch dim, trailing spatial dims."""
    v = jnp.asarray(v, dtype=x.dtype)
    if v.ndim < x.ndim:
        v = v.reshape((1,) + v.shape + (1,) * (x.ndim - v.ndim - 1))
    return v


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n", "d"))
def _device_normal(key, n: int, d: int) -> jnp.ndarray:
    return jax.random.normal(key, (n, d), jnp.float32)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _device_normal_sharded(n: int, d: int, sharding):
    """Batch-sharded device gaussians: each chip generates only its shard
    (jit with ``out_shardings`` — no broadcast, no reshard)."""
    return jax.jit(lambda key: jax.random.normal(key, (n, d), jnp.float32),
                   out_shardings=sharding)


def apply_edit(x: jnp.ndarray, edit: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Ablation/replacement then offset, as in ``nethook.py:219-231``."""
    a = edit.get("ablation")
    if a is not None:
        a = _match_rank(a, x)
        x = x * (1 - a)
        r = edit.get("replacement")
        if r is not None:
            x = x + _match_rank(r, x) * a
    b = edit.get("offset")
    if b is not None:
        x = x + _match_rank(b, x)
    return x


class TapState:
    """Per-trace mutable carrier for retained activations and early exit.

    Created inside the jitted function each trace; all control decisions
    (which taps retain / edit / stop) are Python-level constants during
    tracing, so the compiled program contains only the live stages.
    """

    __slots__ = ("retain", "edits", "stop_at", "retained", "stopped")

    def __init__(self, retain: Tuple[str, ...], edits: Dict[str, Dict[str, jnp.ndarray]],
                 stop_at: Optional[str]):
        self.retain = frozenset(retain)
        self.edits = edits or {}
        self.stop_at = stop_at
        self.retained: Dict[str, jnp.ndarray] = {}
        self.stopped = False

    def needs(self, name: str) -> bool:
        """True if tapping ``name`` has any visible effect (retain/edit/stop).

        Lets layout-transformed execution paths (e.g. the space-to-depth
        tail, ``ops/s2d.py``) skip the conversion back to the reference NCHW
        layout when nobody is watching the tap."""
        return name in self.retain or name in self.edits or name == self.stop_at

    def tap(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        if name in self.retain:
            self.retained[name] = x
        e = self.edits.get(name)
        if e is not None:
            x = apply_edit(x, e)
        if name == self.stop_at:
            self.stopped = True
        return x


def canonical_tap(tap_names: Sequence[str], layer_name: str) -> str:
    """Resolve a user layer path to the canonical tap that covers it.

    The reference matches by substring in execution order
    (``wrappers.py:243-255``), which mis-fires for e.g. ``convs.10`` vs
    ``convs.1``; we match on exact name or dotted-prefix boundary instead.
    An exact name always wins — e.g. ``epi1`` is its own tap even though the
    earlier sub-tap ``epi1.top_epi.noise`` would also prefix-match.
    """
    for t in tap_names:
        if layer_name == t:
            return t
    for t in tap_names:
        if layer_name.startswith(t + ".") or t.startswith(layer_name + "."):
            return t
    raise ValueError(
        f"Layer '{layer_name}' not found. Available taps:\n" + "\n".join(tap_names))


# ---------------------------------------------------------------------------
# Generator base
# ---------------------------------------------------------------------------

class BaseGenerator(ABC):
    """Public surface mirroring reference ``BaseModel`` (``wrappers.py:27-94``)."""

    def __init__(self, model_name: str, class_name: Optional[str]):
        self.model_name = model_name
        self.outclass = class_name
        self.inst: Optional["InstrumentedModel"] = None  # set by InstrumentedModel

    # -- abstract -----------------------------------------------------------
    @abstractmethod
    def forward(self, x) -> jnp.ndarray:
        """Full forward; output mapped [-1,1] -> [0,1], shape [B,3,H,W]."""

    @abstractmethod
    def partial_forward(self, x, layer_name: str) -> None:
        """Run only up to ``layer_name`` (activations land in ``self.inst``)."""

    @abstractmethod
    def sample_latent(self, n_samples: int = 1, seed=None, truncation=None) -> jnp.ndarray:
        """Seeded host-side latent sampling (see ``ganspace_tpu.sampling``)."""

    @abstractmethod
    def tap_names(self) -> Tuple[str, ...]:
        """Canonical tap points in execution order."""

    # -- defaults (reference wrappers.py:49-94) -----------------------------
    def get_max_latents(self) -> int:
        return 1

    def latent_space_name(self) -> str:
        return "Z"

    def get_latent_shape(self) -> Tuple[int, ...]:
        # Cached per latent space: the probe costs a sample_latent round
        # trip (~50 ms through a remote chip) and callers re-ask every run.
        key = (self.latent_space_name(), self.outclass)
        cache = getattr(self, "_latent_shape_cache", None)
        if cache is None:
            cache = self._latent_shape_cache = {}
        if key not in cache:
            cache[key] = tuple(np.asarray(self.sample_latent(1)).shape)
        return cache[key]

    def get_latent_dims(self) -> int:
        return int(np.prod(self.get_latent_shape()))

    def set_output_class(self, new_class):
        self.outclass = new_class

    def sample_np(self, z=None, n_samples: int = 1, seed=None,
                  uint8: bool = False) -> np.ndarray:
        """Generate images, return clipped HWC numpy in [0,1] (squeezed).

        ``uint8=True`` quantizes ON DEVICE and reads back uint8 — 4x less
        transfer for consumers that write 8-bit images/videos anyway (the
        visualize CLI); the default float path is unchanged.

        After ``place_on_mesh`` the latent batch shards over the ``data``
        axis here, so batch rendering (visualize grids, edit strips, MP4
        sweeps) runs data-parallel across the mesh."""
        if z is None:
            z = self.sample_latent(n_samples, seed=seed)
        mesh = getattr(self, "_mesh", None)
        if isinstance(z, list):
            z = [self._shard_latents(l, mesh) for l in z]
        else:
            z = self._shard_latents(z, mesh)
        img = self.forward(z)
        if uint8:
            from ganspace_tpu.utils.imaging import device_uint8_nhwc
            return np.asarray(device_uint8_nhwc(img)).squeeze()
        img_np = np.asarray(jnp.transpose(img, (0, 2, 3, 1)))
        return np.clip(img_np, 0.0, 1.0).squeeze()

    def get_conditional_state(self, z):
        return None

    def set_conditional_state(self, z, c):
        return z

    def pure_acts_fn_p(self, layer_name: str):
        """``(fn, pack)`` where ``fn(pack, latents) -> activations [n, -1]``
        is the pure tap function with its weights as an EXPLICIT pytree
        argument, or None when the model has no pure path.

        Passing weights as operands (not closure constants) matters on TPU:
        baked constants get re-serialized into MLIR on every trace and blow
        up persistent-cache entries (measured on StyleGAN2-1024: 22 s
        trace->MLIR + a 168 MB cache entry with baked params vs sub-second
        and ~10 MB with explicit operands)."""
        return None

    def pure_acts_fn(self, layer_name: str):
        """Pure ``fn(latents) -> activations [n, -1]`` at the tap, traceable
        inside an outer jit/scan, or None when the model has no pure path
        (the decomposition then uses the instrumented per-batch loop)."""
        fp = self.pure_acts_fn_p(layer_name)
        if fp is None:
            return None
        fn, pack = fp
        return lambda lat: fn(pack, lat)

    def latents_from_gaussian_p(self):
        """``(fn, pack)`` with ``fn(pack, gauss) -> primary-space latents``,
        transform weights as operands (None when the model has no gaussian
        stream).  Identity for Z-primary models; W-primary models override
        with the pack-parameterized mapping network."""
        if self._gaussian_latent_dim() is None:
            return None
        return (lambda pack, z: z), ()

    def device_latents_fn_p(self):
        """``(fn, pack)`` with ``fn(pack, key, n) -> latents [n, ...]`` in
        the PRIMARY latent space, traceable inside jit/scan with any
        transform weights as operands (``pack``).  None when the model has
        no in-trace sampler.  This is what the fused decomposition streams
        and the scanned regression draw from — the default composes the
        gaussian draw with ``latents_from_gaussian_p``; models with
        non-gaussian latents (BigGAN truncnorm) override."""
        dim = self._gaussian_latent_dim()
        if dim is None:
            return None
        lf = self.latents_from_gaussian_p()
        if lf is None:
            return None
        lfn, lpack = lf

        def fn(pack, key, n):
            return lfn(pack, jax.random.normal(key, (n, dim), jnp.float32))
        return fn, lpack

    # -- threaded pre-sampling ------------------------------------------------
    def _gaussian_latent_dim(self) -> Optional[int]:
        """Raw host-gaussian dim when ``sample_latent`` is 'global-stream
        seed -> RandomState gaussian [-> device transform]'; None otherwise
        (e.g. BigGAN's truncnorm)."""
        return None

    def _latents_from_gaussian(self, z: jnp.ndarray) -> jnp.ndarray:
        """Device transform applied to the raw gaussian draw (identity for
        Z-primary models; the mapping network for W)."""
        return z

    def place_on_mesh(self, mesh) -> None:
        """Replicate device state over the mesh for data-parallel synthesis.

        Parameters/constants replicate (all supported generators are
        <~100M params, SURVEY.md §2.4); the latent batch shards over the
        ``data`` axis, and XLA propagates that sharding through the jitted
        synthesis with no per-model code.  Covers every attr the jitted
        cores consume (``params``/``consts``/``latent_avg``/``v_class``);
        idempotent, and a no-op for host-only models.
        """
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        for attr in ("params", "consts", "latent_avg", "v_class"):
            v = getattr(self, attr, None)
            if v is not None:
                setattr(self, attr, jax.tree.map(
                    lambda a: jax.device_put(a, rep), v))
        self._mesh = mesh

    @staticmethod
    def _shard_latents(z, mesh):
        from ganspace_tpu.parallel.mesh import shard_batch
        z = jnp.asarray(z)
        return z if mesh is None else shard_batch(z, mesh)

    def sample_latents_device(self, n_batches: int, batch_size: int,
                              seed: int, sharding=None):
        """Device-side latent stream: batch ``i`` is generated entirely in
        HBM from ``fold_in(PRNGKey(seed), i)`` (fused with the mapping
        network where one exists) — zero host->device latent traffic.

        This is the TPU-native default for the decomposition sampling loop;
        the host-numpy path (``sample_latents_prefetched``) remains for
        bit-exact parity with reference caches (``GANSPACE_DEVICE_RNG=0``).
        Returns None when the model has no device sampler (then the driver
        falls back to the host path).
        """
        dim = self._gaussian_latent_dim()
        if dim is None:
            return None
        key = jax.random.PRNGKey(int(seed))
        normal = (_partial(_device_normal, n=batch_size, d=dim)
                  if sharding is None
                  else _device_normal_sharded(batch_size, dim, sharding))
        return [self._latents_from_gaussian(
                    normal(jax.random.fold_in(key, i)))
                for i in range(n_batches)]

    def sample_latents_prefetched(self, n_batches: int, batch_size: int):
        """``n_batches`` seedless ``sample_latent(batch_size)`` calls, with
        values AND global-RNG usage bit-identical to the sequential loop —
        but the host gaussian draws run threaded in one native call
        (``native/src/fastrand.cpp``).  This is the decomposition driver's
        pre-sampling fast path; numpy's legacy generator is single-threaded
        and otherwise dominates host time at N=1M."""
        dim = self._gaussian_latent_dim()
        if dim is None:
            return [self.sample_latent(batch_size) for _ in range(n_batches)]
        seeds = [np.random.randint(np.iinfo(np.int32).max)
                 for _ in range(n_batches)]
        from ganspace_tpu.native import normal_batches
        zs = normal_batches(seeds, batch_size * dim)
        return [self._latents_from_gaussian(
                    jnp.asarray(z.reshape(batch_size, dim))) for z in zs]

    # -- instrumentation plumbing ------------------------------------------
    def _instrumentation(self):
        """(retain tuple, edits dict, after-run callback) from the wrapper."""
        if self.inst is None:
            return (), {}, None
        return self.inst._retain_tuple(), self.inst._edit_tree(), self.inst._store_retained

    def resolve_tap(self, layer_name: str) -> str:
        return canonical_tap(self.tap_names(), layer_name)


class InstrumentedModel:
    """Host-side retention/edit state, API-compatible with the reference
    ``nethook.InstrumentedModel`` where it matters to the pipeline."""

    def __init__(self, model: BaseGenerator):
        self.model = model
        model.inst = self
        self._retained: Dict[str, Any] = {}
        self._edits: Dict[str, Dict[str, np.ndarray]] = {}
        # When set, _edit_tree returns this pytree verbatim (values may be
        # tracers) — the differentiable path used by ACE optimization.
        self._edit_override: Optional[Dict[str, Dict[str, Any]]] = None
        # feature/input/output shape annotations (modelconfig.py:110-144)
        self.feature_shape: Dict[str, Tuple[int, ...]] = {}
        self.input_shape: Optional[Tuple[int, ...]] = None
        self.output_shape: Optional[Tuple[int, ...]] = None

    # -- retention ----------------------------------------------------------
    def retain_layer(self, layername: str):
        self.retain_layers([layername])

    def retain_layers(self, layernames):
        for name in layernames:
            canon = self.model.resolve_tap(name)  # validate
            del canon
            if name not in self._retained:
                self._retained[name] = None

    def stop_retaining_layers(self, layernames):
        for name in layernames:
            self._retained.pop(name, None)

    def retained_features(self) -> Dict[str, jnp.ndarray]:
        return dict(self._retained)

    def retained_layer(self, aka=None, clear=False):
        if aka is None:
            aka = next(iter(self._retained))
        result = self._retained[aka]
        if clear:
            self._retained[aka] = None
        return result

    # -- edits --------------------------------------------------------------
    def edit_layer(self, layername: str, ablation=None, replacement=None, offset=None):
        self.model.resolve_tap(layername)  # validate
        if ablation is None and replacement is not None:
            ablation = 1.0
        e = self._edits.setdefault(layername, {})
        if ablation is not None:
            e["ablation"] = np.asarray(ablation, dtype=np.float32)
        if replacement is not None:
            e["replacement"] = np.asarray(replacement, dtype=np.float32)
        if offset is not None:
            e["offset"] = np.asarray(offset, dtype=np.float32)

    def remove_edits(self, layername=None, remove_offset=True, remove_replacement=True):
        names = [layername] if layername is not None else list(self._edits)
        for name in names:
            e = self._edits.get(name)
            if e is None:
                continue
            if remove_replacement:
                e.pop("ablation", None)
                e.pop("replacement", None)
            if remove_offset:
                e.pop("offset", None)
            if not e:
                del self._edits[name]

    def close(self):
        """Reference ``close()`` unhooks everything; here: clear all state."""
        self._retained.clear()
        self._edits.clear()

    # -- model-facing -------------------------------------------------------
    def _retain_tuple(self) -> Tuple[str, ...]:
        # Canonical tap names, sorted for a stable jit cache key.
        return tuple(sorted({self.model.resolve_tap(n) for n in self._retained}))

    def _edit_tree(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        if self._edit_override is not None:
            return {self.model.resolve_tap(n): dict(e)
                    for n, e in self._edit_override.items()}
        return {
            self.model.resolve_tap(name): {k: jnp.asarray(v) for k, v in e.items()}
            for name, e in self._edits.items() if e
        }

    def _store_retained(self, tap_outputs: Dict[str, jnp.ndarray]):
        for user_name in self._retained:
            canon = self.model.resolve_tap(user_name)
            if canon in tap_outputs:
                self._retained[user_name] = tap_outputs[canon]
