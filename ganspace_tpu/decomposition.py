"""End-to-end decomposition pipeline (reference ``decomposition.py``).

Sample latents -> run the generator to the tap layer -> stream activations
into an estimator -> regress components back to latent space -> cache as a
compressed ``.npz`` whose keys AND filename scheme match the reference
(``decomposition.py:332-341, 384-394``), so downstream tooling is drop-in
compatible.

TPU-native deltas from the reference pipeline:

* batch size comes from a static HBM-footprint estimate instead of CUDA
  VRAM probing (``decomposition.py:49-74``) — shapes are known ahead of time;
* activations NEVER round-trip to the host on the streaming path: the
  partial-forward output feeds ``fit_partial`` directly in HBM (the reference
  copies every minibatch to CPU for sklearn, ``decomposition.py:245-267``);
* the latent regression accumulates normal equations (c x c Gram psum-able
  over the mesh) instead of materializing a [n, c] matrix for LAPACK gelsd
  (``decomposition.py:77-139``);
* data parallelism: latent batches are sharded over the device mesh; the
  estimator's feature-axis sharding turns its contractions into per-shard
  matmuls + ICI psums (see ``estimators/ipca.py``).

RNG discipline is bit-compatible (seed map ``decomposition.py:34-37``,
host-side numpy draws — see ``ganspace_tpu.sampling``).
"""

from __future__ import annotations

import datetime
import os
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np
import jax as _jax
import jax.numpy as jnp

from ganspace_tpu.config import Config
from ganspace_tpu.estimators import get_estimator
from ganspace_tpu.estimators.utils import mm
from ganspace_tpu.models import get_instrumented_model
from ganspace_tpu.models.base import InstrumentedModel
from ganspace_tpu.ops.precision import precision as _precision_ctx
from ganspace_tpu.ops.precision import synth_dtype as _synth_dtype_ctx
from ganspace_tpu.parallel.mesh import (
    batch_sharding,
    feature_sharding,
    pipeline_mesh,
    shard_batch,
)
from ganspace_tpu.sampling import (
    SEED_LINREG,
    SEED_SAMPLING,
    random_directions,
    random_directions_device,
)

#: --dtype flag -> matmul/conv precision policy (ops/precision.py): float32
#: runs true-f32 contractions (component parity with the reference);
#: bfloat16 uses the MXU's native bf16 datapath (fast previews / big sweeps).
_DTYPE_PRECISION = {"float32": "highest", "bfloat16": "default"}

get_random_dirs = random_directions  # reference-compatible alias

# Activation budget per minibatch for the static batch-size rule (bytes).
_ACT_BUDGET_BYTES = int(os.environ.get("GANSPACE_ACT_BUDGET", 256 * 1024 * 1024))


def _fused_acts_registry() -> Optional[str]:
    """Path of the fused-stream sentinel registry, colocated with (and
    partitioned like) the persistent compile cache; None when uncached."""
    import jax
    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not cache_dir:
        return None
    return os.path.join(cache_dir, "ganspace_fused_acts.json")


def _fused_acts_info(key: str) -> dict:
    """Recorded facts about a fused-stream workload: {} when unseen,
    else at least {"compiled": True}, plus "policy_refines" (bool/None) —
    whether the adaptive policy kept the refine sweep the last time this
    exact workload ran (the signal behind the bf16-first-pass choice).
    Legacy True entries (pre-r5) decode as {"compiled": True}.  Reads and
    writes go through the shared JSON registry helpers (_registry_get /
    _registry_put — same atomic tmp+replace discipline as the batch-size
    memo)."""
    v = _registry_get(_fused_acts_registry(), key)
    if v is True:
        return {"compiled": True}
    return v if isinstance(v, dict) else {}


def _fused_acts_cached(key: str) -> bool:
    """True when THIS workload's fused scan program has compiled to
    completion on this machine before: re-tracing it is then a disk hit in
    the persistent compile cache, so the per-block dispatch saving is pure
    profit.  Keyed by model/layer/shape/estimator — a cached scan for a
    different workload says nothing about this one's compile cost."""
    return bool(_fused_acts_info(key))


def _record_fused_acts(key: str, info: Optional[dict] = None) -> None:
    """Mark a fused-stream workload as compiled, merging any extra facts
    (see _fused_acts_info)."""
    path = _fused_acts_registry()
    if path is None:
        return
    _registry_put(path, key, {**_fused_acts_info(key), "compiled": True,
                              **(info or {})})


#: Device-kind -> HBM bytes (per chip).  memory_stats() is empty on some
#: plugin backends (axon), so the table is the fallback behind it.
_HBM_BY_KIND = {
    "TPU v2": 8 << 30, "TPU v3": 16 << 30, "TPU v4": 32 << 30,
    "TPU v5 lite": 16 << 30, "TPU v5e": 16 << 30, "TPU v5": 95 << 30,
    "TPU v5p": 95 << 30, "TPU v6 lite": 32 << 30, "TPU v6e": 32 << 30,
}


def _hbm_bytes() -> int:
    env = os.environ.get("GANSPACE_HBM_BYTES")
    if env:
        return int(env)
    import jax
    dev = jax.devices()[0]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    if stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    kind = getattr(dev, "device_kind", "")
    for prefix, size in sorted(_HBM_BY_KIND.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            return size
    return 16 << 30


_AUTOTUNE_MEMO: dict = {}


def _autotune_registry() -> Optional[str]:
    import jax
    cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not cache_dir:
        return None
    return os.path.join(cache_dir, "ganspace_autotune_b.json")


def _registry_get(path: Optional[str], key: str):
    import json
    if path is None or not os.path.isfile(path):
        return None
    try:
        with open(path) as f:
            return json.load(f).get(key)
    except (OSError, ValueError):
        return None


def _registry_put(path: Optional[str], key: str, value) -> None:
    import json
    if path is None:
        return
    try:
        entries = {}
        if os.path.isfile(path):
            with open(path) as f:
                entries = json.load(f)
        entries[key] = value
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, path)
    except (OSError, ValueError):
        pass


def _analyzed_batch_size(model, layer_name: str) -> Optional[int]:
    """Exact batch sizing from XLA's compiled memory analysis.

    Lowers the pure tap function (weights as operands) at a probe batch,
    reads ``Executable.memory_analysis().peak_memory_in_bytes``, and scales
    the activation footprint linearly to fill ``GANSPACE_HBM_FRACTION``
    (default 0.4) of the chip's HBM — the analog of the reference's
    "largest batch under 50% of VRAM" CUDA probe (``decomposition.py:57-74``)
    but exact and probe-free at runtime: one AOT compile per workload, its
    result memoized in a registry beside the persistent compile cache.
    Returns None (caller falls back to the heuristic) for models without a
    pure tap path or when lowering fails.
    """
    if os.environ.get("GANSPACE_AUTOTUNE_B", "1") == "0":
        return None
    try:
        fp = model.pure_acts_fn_p(layer_name)
    except Exception:
        return None
    if fp is None:
        return None
    import jax

    fn, pack = fp
    frac = float(os.environ.get("GANSPACE_HBM_FRACTION", 0.4))
    hbm = _hbm_bytes()
    from ganspace_tpu.ops.precision import synth_dtype_name
    kind = getattr(jax.devices()[0], "device_kind", "unknown")
    key = "|".join([getattr(model, "name", model.model_name), layer_name,
                    str(synth_dtype_name()), kind, f"hbm{hbm}", f"f{frac}"])
    if key in _AUTOTUNE_MEMO:          # in-process memo: the registry file
        return _AUTOTUNE_MEMO[key]     # may be absent (no compile cache dir)
    reg = _autotune_registry()
    cached = _registry_get(reg, key)
    if cached:
        _AUTOTUNE_MEMO[key] = int(cached)
        return int(cached)

    dim = model.get_latent_dims()
    params_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                       for x in jax.tree.leaves(pack))
    b_probe = 32
    try:
        pack_s = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pack)
        lat_s = jax.ShapeDtypeStruct((b_probe, dim), jnp.float32)
        out_s = jax.eval_shape(fn, pack_s, lat_s)
        compiled = jax.jit(fn).lower(pack_s, lat_s).compile()
        peak = int(compiled.memory_analysis().peak_memory_in_bytes)
    except Exception as e:
        print(f"batch autotune: memory analysis unavailable ({e!r}); "
              f"using heuristic")
        return None
    # Peak counts arguments (params) + batch-scaled activations on TPU;
    # XLA:CPU's analysis omits argument/output buffers, so floor the
    # per-sample cost at two copies of the tap activation row itself
    # (the feature map + its flattened view).
    act_bytes = max(peak - params_bytes, peak // 8, 1)
    row_bytes = int(np.prod(out_s.shape[1:])) * out_s.dtype.itemsize
    per_sample = max(act_bytes / b_probe, 2 * row_bytes)
    b = int((frac * hbm - params_bytes) / per_sample)
    b = max(4, min(4096, b))
    b = 1 << (b.bit_length() - 1)

    def footprint_at(bb: int) -> Optional[int]:
        """Whole-program footprint analyzed at batch ``bb``: XLA's peak plus
        any argument/output buffers the backend's analysis omits (XLA:CPU
        reports those as zero; on TPU the max() terms vanish)."""
        try:
            lat_b = jax.ShapeDtypeStruct((bb, dim), jnp.float32)
            out_b = jax.eval_shape(fn, pack_s, lat_b)
            ma = jax.jit(fn).lower(pack_s, lat_b).compile().memory_analysis()
            out_bytes = int(np.prod(out_b.shape)) * out_b.dtype.itemsize
            return (int(ma.peak_memory_in_bytes)
                    + max(0, params_bytes - int(ma.argument_size_in_bytes))
                    + max(0, out_bytes - int(ma.output_size_in_bytes)))
        except Exception as e:
            print(f"batch autotune: confirm lowering failed at b={bb} "
                  f"({e!r}); keeping the extrapolated size")
            return None

    # Confirm the extrapolation at the CHOSEN size: XLA's fusion/remat
    # choices can change with batch, so peak(B) != (B/32) * peak(32) in
    # general.  One more AOT lowering per workload (the confirmed value is
    # memoized below, and the lowering itself lands in the persistent
    # compile cache); halve until the analyzed footprint of THAT program
    # fits the budget.
    budget = frac * hbm
    while b > 4:
        confirmed = footprint_at(b)
        if confirmed is None or confirmed <= budget:
            break
        print(f"batch autotune: confirm at B={b} analyzed "
              f"{confirmed / 1e9:.2f} GB > budget {budget / 1e9:.2f} GB; "
              f"halving")
        b //= 2
    print(f"batch autotune: peak {peak / 1e9:.2f} GB @ b={b_probe} "
          f"(params {params_bytes / 1e9:.2f} GB) -> B={b} confirmed "
          f"(~{(params_bytes + b * per_sample) / 1e9:.1f} GB of "
          f"{frac:.0%} x {hbm >> 30} GB HBM)")
    _AUTOTUNE_MEMO[key] = b
    _registry_put(reg, key, b)
    return b


def get_max_batch_size(inst: InstrumentedModel, device=None, layer_name=None,
                       analyze: bool = True) -> int:
    """Batch sizing replacing the reference's CUDA VRAM probe.

    Primary path: exact per-signature HBM accounting from XLA's compiled
    memory analysis (``_analyzed_batch_size``).  Fallback (no pure tap
    path / analysis unavailable): bound the per-sample footprint by a few
    times the largest feature map up to the tap and size the minibatch to a
    fixed budget.  Both clamp to [4, 4096] and round to a power of two for
    stable jit cache reuse.
    """
    model = inst.model
    if analyze and layer_name is not None:
        analyzed = _analyzed_batch_size(model, layer_name)
        if analyzed is not None:
            return analyzed
    if layer_name is not None and inst.feature_shape.get(layer_name) is not None:
        feat_elems = int(np.prod(inst.feature_shape[layer_name][1:]))
    else:
        res = getattr(model, "resolution", 256)
        feat_elems = 3 * res * res
    # partial forward keeps ~4 live feature maps of comparable size
    per_sample = max(feat_elems, 512) * 4 * 4
    b = int(_ACT_BUDGET_BYTES // max(per_sample, 1))
    b = max(4, min(4096, b))
    return 1 << (b.bit_length() - 1)


# ---------------------------------------------------------------------------
# Latent regression (reference decomposition.py:77-148)
# ---------------------------------------------------------------------------

def linreg_lstsq(comp_np, mean_np, stdev_np, inst: InstrumentedModel, config):
    """Solve min_M ||M A - Z|| where A are stdev-scaled PCA coordinates.

    Streaming normal equations: G = sum A_b^T A_b (c x c), R = sum A_b^T Z_b
    (c x latent_dims) accumulate on device block by block; the tiny SPD solve
    replaces the reference's host-side gelsd on a [n, c] matrix.
    """
    print("Performing least squares regression", flush=True)
    np.random.seed(SEED_LINREG)

    model = inst.model
    comp = jnp.asarray(comp_np, jnp.float32)
    mean = jnp.asarray(mean_np, jnp.float32)
    stdev = jnp.asarray(stdev_np, jnp.float32)

    # Same minibatch size as the fit sweep when the user pinned one
    # (the reference's linreg reuses compute()'s global B).
    batch = config.batch_size or get_max_batch_size(inst,
                                                    layer_name=config.layer)
    # A pinned batch larger than the sample budget must not zero out the
    # accumulation loop (G would stay singular -> NaN directions).
    batch = min(batch, max(10_000, config.n))
    n_samp = max(10_000, config.n) // batch * batch
    n_comp = comp.shape[0]
    latent_dims = model.get_latent_dims()

    g = jnp.zeros((n_comp, n_comp), jnp.float32)
    r = jnp.zeros((n_comp, latent_dims), jnp.float32)
    z_sum = jnp.zeros((latent_dims,), jnp.float32)

    comp_flat = comp.reshape(n_comp, -1)
    layer = config.layer
    mesh = pipeline_mesh(getattr(config, "mesh_shape", None))

    import jax as _jax

    # Fused scanned regression: generation (device RNG) + synthesis-to-tap +
    # projection + normal-equation update in chunk-sized scan dispatches —
    # the regression analog of the fit stream.  Falls back to the eager
    # per-batch loop for models without a pure tap path or under
    # GANSPACE_DEVICE_RNG=0 (bit-exact host draws).
    # Same amortization policy as the fused fit stream: the scan-wrapped
    # synthesis compile only pays off above GANSPACE_FUSED_ACTS_MIN_N
    # samples (afterwards it's a persistent-cache disk hit either way);
    # small runs keep the eager loop that reuses partial_forward's
    # already-compiled program.
    fused_env = os.environ.get("GANSPACE_FUSED_ACTS", "auto")
    fused_min_n = int(os.environ.get("GANSPACE_FUSED_ACTS_MIN_N", 20_000))
    want_fused = (fused_env == "1"
                  or (fused_env == "auto" and n_samp >= fused_min_n))
    fp = lat_fp = None
    if want_fused and os.environ.get("GANSPACE_DEVICE_RNG", "1") == "1":
        try:
            fp = model.pure_acts_fn_p(layer)
            lat_fp = model.device_latents_fn_p()
        except Exception:
            fp = lat_fp = None
    if fp is not None and lat_fp is not None:
        from functools import partial as _partial
        fn, pack = fp
        lat_fn, lat_pack = lat_fp
        key0 = _jax.random.PRNGKey(SEED_LINREG)
        batch_sh = batch_sharding(mesh) if mesh is not None else None

        @_partial(_jax.jit, static_argnames=("k",))
        def scan_pass(carry, i0, pack, lat_pack, comp_flat, mean, stdev, *, k):
            def body(c, i):
                gg, rr, zs = c
                # the model draws its own primary-space latents in-trace
                # (gaussian+mapping, truncnorm, ...), transform weights as
                # operands; the same latents feed synthesis AND the target
                lat = lat_fn(lat_pack, _jax.random.fold_in(key0, i0 + i),
                             batch)
                if batch_sh is not None:
                    lat = _jax.lax.with_sharding_constraint(lat, batch_sh)
                a = fn(pack, lat)
                coords = (mm(a - mean[None, :], comp_flat.T)
                          / jnp.where(stdev > 0, stdev, 1.0)[None, :])
                zf = lat.reshape(lat.shape[0], -1)
                return (gg + mm(coords.T, coords), rr + mm(coords.T, zf),
                        zs + jnp.sum(zf, axis=0)), None
            carry, _ = _jax.lax.scan(body, carry, jnp.arange(k))
            return carry

        chunk = 16
        n_blocks = n_samp // batch
        carry, i = (g, r, z_sum), 0
        while i < n_blocks:
            k = min(chunk, n_blocks - i)
            carry = scan_pass(carry, jnp.int32(i), pack, lat_pack, comp_flat,
                              mean.reshape(-1), stdev, k=k)
            i += k
        g, r, z_sum = carry
    else:
        @_jax.jit
        def accumulate(g, r, z_sum, act, z):
            # One program per batch (project + three reductions): on a mesh
            # the whole step is a single collective program instead of six
            # eager ops, each its own cross-device rendezvous.
            coords = (mm(act - mean.reshape(1, -1), comp_flat.T)
                      / jnp.where(stdev > 0, stdev, 1.0)[None, :])
            zf = z.reshape(z.shape[0], -1)
            return (g + mm(coords.T, coords), r + mm(coords.T, zf),
                    z_sum + jnp.sum(zf, axis=0))

        # Serialize collective programs ONLY on emulated meshes: there,
        # async dispatch stacks many in-flight all-reduces and the N virtual
        # devices (sharing few cores) starve the rendezvous of live threads
        # — XLA:CPU aborts after its 40 s timeout.  On real TPU meshes the
        # runtime pipelines collectives fine, and a per-batch sync would
        # forfeit the async-dispatch overlap of synthesis and reduction.
        emulated = mesh is not None and mesh.devices.flat[0].platform == "cpu"
        for _ in range(n_samp // batch):
            z = shard_batch(model.sample_latent(batch), mesh)
            model.partial_forward(z, layer)
            act = inst.retained_features()[layer].reshape(batch, -1)
            g, r, z_sum = accumulate(g, r, z_sum, act, jnp.asarray(z))
            if emulated:
                _jax.block_until_ready(g)

    # M^T = (A^T A)^-1 A^T Z ; rows of M^T are the latent-space directions.
    # Tiny relative ridge: a zero-variance component makes G singular
    # (guarded coords above are ~0 there) — 1e-10*mean-diag is invisible
    # for healthy spectra and keeps the solve finite for degenerate ones.
    ridge = 1e-10 * jnp.trace(g) / g.shape[0]
    m_t = np.asarray(jnp.linalg.solve(
        g + ridge * jnp.eye(g.shape[0], dtype=g.dtype), r))
    z_comp = m_t[:n_comp, :]
    z_mean = np.asarray(z_sum)[None, :] / n_samp
    return z_comp, z_mean


#: bf16-datapath sensitivity constant.  Activation rounding is RELATIVE
#: noise (bf16 half-ulp = 2^-9), so the covariance perturbation couples
#: component i to a neighbor j as E_ij ~ eps * sqrt(lambda_i lambda_j) and
#: the rotation angle is theta_i ~ eps_rel / rel_gap_i — the ABSOLUTE-gap
#: model fails by 100x across spectrum shapes, the relative-gap model
#: holds within ~10x.  2e-3 conservatively covers the CPU calibration
#: sweep (5 spectrum shapes x 3 seeds, measured eps_rel 1e-5..2.4e-4) AND
#: both production TPU datapoints (flat conv tap min cos 0.9891 at rel
#: gap ~0.9% -> eps_rel 1.3e-3; decay leg 0.9999 at 7.8% -> 1.1e-3, both
#: inflated by sketch/sample noise the bound must also absorb).
BF16_EPS_REL = 2e-3


def bf16_component_bounds(evals, n_components: int) -> np.ndarray:
    """Per-component |cos| lower-bound estimates for bf16-datapath runs.

    ``evals``: descending eigenvalue estimates of the fitted scatter
    (ideally >= n_components + 1 of them).  Component i's bound is
    cos(min(BF16_EPS_REL / rel_gap_i, pi/2)) with rel_gap_i the smaller
    adjacent relative eigengap; components whose neighbors are unresolved
    get bound 0 (no information — not analysis grade)."""
    ev = np.maximum(np.asarray(evals, np.float64), 1e-300)
    n = len(ev)
    c = n_components
    bounds = np.zeros(c)
    for i in range(min(c, n)):
        rel_lo = 1.0 - ev[i] / ev[i - 1] if i > 0 else np.inf
        rel_hi = 1.0 - ev[i + 1] / ev[i] if i + 1 < n else np.nan
        if np.isnan(rel_hi):          # spectrum stops at c: no lower gap
            continue
        rel_gap = max(min(rel_lo, rel_hi), 1e-12)
        bounds[i] = np.cos(min(BF16_EPS_REL / rel_gap, np.pi / 2.0))
    return bounds


def regression_from_moments(comp_np, mean_np, stdev_np, reg):
    """Closed-form latent regression from cross-moments accumulated INSIDE
    the fit sweeps (``IPCAEstimator.fit_stream(with_reg=True)``) — zero
    extra synthesis.

    The normal equations are ``G M = R`` with ``G = sum coords coords^T``
    and ``R = sum coords z^T``, ``coords_i = diag(1/sigma) C (a_i - mu)``
    (reference ``decomposition.py:77-139`` solves the same system via host
    gelsd over a third sampling sweep).  ``R`` follows exactly from the raw
    moments: ``R = diag(1/sigma) C (sum a z^T - mu sum z^T)``.  For ``G`` we
    use the estimator's own model, ``G = (n-1) I``: EXACT for the moments
    tier (its components are exact eigenvectors of the accumulated scatter,
    with stdev^2 = eigenvalue/(n-1), so cross-terms vanish), and consistent
    to the sketch accuracy (>0.995 per-component cosine post-refine) for the
    Nystrom tier.  Since ``_compute`` row-normalizes ``z_comp`` right after,
    the diagonal scale cancels entirely — only (tiny) off-diagonal mixing
    distinguishes this from the exact solve.  Measured against the explicit
    exact-G lstsq over the same stream (tests/test_fused_linreg.py): min
    per-component |cos| > 0.9999 on the tiny cases AND 0.999999 at the
    production shape D=65536 on the Nystrom+refine tier (c=32, n=4000,
    ``test_fused_linreg_production_shape_error_bound``)."""
    xz, z_sum, n_reg = reg
    print(f"Regression from fused cross-moments ({n_reg} samples, "
          f"no extra sweep)", flush=True)
    comp = jnp.asarray(comp_np, jnp.float32).reshape(comp_np.shape[0], -1)
    mean = jnp.asarray(mean_np, jnp.float32).reshape(-1)
    stdev = jnp.asarray(stdev_np, jnp.float32)
    r, gram = _reg_solve(comp, mean, stdev, xz, z_sum)
    z_comp = np.asarray(r) / max(float(n_reg) - 1.0, 1.0)
    z_mean = np.asarray(z_sum)[None, :] / max(float(n_reg), 1.0)
    _warn_if_not_orthonormal_gram(np.asarray(gram))
    return z_comp, z_mean


@_jax.jit
def _reg_solve(comp, mean, stdev, xz, z_sum):
    """One program for the whole closed-form solve (+ the gram for the
    orthonormality check): each eager op costs a dispatch round trip
    (~30 ms through a relay), and there are six of them here."""
    # zero-stdev components (rank-deficient stream) carry no direction:
    # divide by 1 instead of 0 so their rows stay finite (and end up ~0)
    safe = jnp.where(stdev > 0, stdev, 1.0)
    r = (mm(comp, xz)
         - jnp.outer(mm(comp, mean[:, None])[:, 0], z_sum)) / safe[:, None]
    return r, mm(comp, comp.T)


def _warn_if_not_orthonormal(comp) -> None:
    """Reference decomposition.py:141-148's sanity check, contracted on
    device (a host [c, D] gram costs ~1 s single-core at D=131k; the device
    one reads back c*c floats — and never forces the components to host)."""
    _warn_if_not_orthonormal_gram(
        np.asarray(mm(jnp.asarray(comp), jnp.asarray(comp).T)))


def _warn_if_not_orthonormal_gram(m: np.ndarray) -> None:
    if not np.allclose(m, np.identity(m.shape[0]), atol=1e-3):
        print(f"WARNING: Computed basis is not orthonormal "
              f"(determinant={np.linalg.det(m)})")


def regression(comp, mean, stdev, inst, config):
    _warn_if_not_orthonormal(comp)
    return linreg_lstsq(comp, mean, stdev, inst, config)


def _partial_dump_name(dump_name: Path, config_n: int, n_fitted: int) -> Path:
    """Interrupt-time filename: swap the ``_n{N}`` token for the fitted count
    (reference ``decomposition.py:268-274``).

    The cache filename encodes ``config.n`` (see ``component_cache_name``),
    NOT the batch-rounded ``n_total`` — matching on the wrong token would be
    a silent no-op whenever ``n % batch != 0``, saving a partial
    decomposition under the full-run cache name.
    """
    return dump_name.parent / dump_name.name.replace(
        f"_n{config_n}", f"_n{n_fitted}", 1)


def _stream_npz(path, small_arrays: dict, stream_key: str, dev_arr,
                out_shape, chunks: int = 8) -> None:
    """np.savez-compatible writer that pipelines the big-array DMA with the
    zip write.

    ``dev_arr`` (a [c, D] float device array) becomes the ``stream_key``
    entry with logical shape ``out_shape`` (same row-major bytes — the
    reshape is metadata-only).  Its rows are split into ``chunks`` slices
    whose device->host copies are ALL initiated asynchronously up front, so
    the relay moves chunk i+1 while the host CRCs and writes chunk i —
    on a tunneled chip the 42 MB conv-tap component transfer (~35 MB/s
    relay) and the uncompressed zip write (~70 MB/s disk) are the two
    biggest post-fit costs, and this overlaps them.  np.load reads the
    result identically to an np.savez file."""
    import zipfile
    from numpy.lib import format as npf

    dev_arr = jnp.asarray(dev_arr, jnp.float32)
    c = dev_arr.shape[0]
    k = max(1, min(chunks, c))
    bounds = [(i * c) // k for i in range(k + 1)]
    slices = [dev_arr[b0:b1] for b0, b1 in zip(bounds, bounds[1:]) if b1 > b0]
    for s in slices:
        s.copy_to_host_async()
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED, allowZip64=True) as zf:
        for name, arr in small_arrays.items():
            with zf.open(name + ".npy", "w") as fp:
                npf.write_array(fp, np.asarray(arr), allow_pickle=False)
        with zf.open(stream_key + ".npy", "w", force_zip64=True) as fp:
            npf.write_array_header_1_0(fp, {
                "descr": "<f4", "fortran_order": False,
                "shape": tuple(int(s) for s in out_shape)})
            for s in slices:
                host = np.ascontiguousarray(np.asarray(s), dtype=np.float32)
                fp.write(memoryview(host).cast("B"))


# ---------------------------------------------------------------------------
# Main computation (reference decomposition.py:150-358)
# ---------------------------------------------------------------------------

def compute(config, dump_name: Path, instrumented_model: Optional[InstrumentedModel]):
    """Run the decomposition under the config's precision policy (--dtype);
    an unset dtype means float32 (component parity with the reference)."""
    dtype = getattr(config, "dtype", None) or "float32"
    if dtype not in _DTYPE_PRECISION:
        raise ValueError(f"--dtype {dtype!r}: expected 'float32' or 'bfloat16'")
    prec = _DTYPE_PRECISION[dtype]
    # Also pin f32 activation storage: a viewer process sets the bf16
    # preview policy globally, and components fit on preview-grade
    # activations must never reach the persisted npz cache.
    with _precision_ctx(prec), _synth_dtype_ctx(None):
        return _compute(config, dump_name, instrumented_model)


def _compute(config, dump_name: Path, instrumented_model: Optional[InstrumentedModel]):
    timestamp = lambda: datetime.datetime.now().strftime("%d.%m %H:%M")  # noqa: E731
    print(f"[{timestamp()}] Computing", dump_name.name)
    canonical_name = dump_name.name   # the full-run cache filename

    np.random.seed(0)
    layer_key = config.layer

    if instrumented_model is None:
        inst = get_instrumented_model(config.model, config.output_class, layer_key)
        model = inst.model
    else:
        print("Reusing InstrumentedModel instance")
        inst = instrumented_model
        model = inst.model
        inst.remove_edits()
        model.set_output_class(config.output_class)

    if config.use_w:
        print("Using W latent space")
        model.use_w()

    # Device mesh (SURVEY.md §2.4 — the primary scale-out axis): the latent
    # stream shards over 'data' (data-parallel synthesis, params replicated),
    # estimator statistics shard over the feature axis so their contractions
    # become per-shard matmuls + ICI psums.  Single-device runs keep identity
    # behaviour throughout (mesh=None).
    mesh = pipeline_mesh(getattr(config, "mesh_shape", None))
    n_data = int(mesh.shape["data"]) if mesh is not None else 1
    if mesh is not None and config.n < mesh.devices.size:
        mesh, n_data = None, 1  # tiny smoke runs: not worth sharding
    if mesh is not None:
        model.place_on_mesh(mesh)
        print(f"Mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    batch_sh = batch_sharding(mesh) if mesh is not None else None

    inst.retain_layer(layer_key)
    z_probe = model.sample_latent(1)
    model.partial_forward(z_probe, layer_key)
    feat_probe = inst.retained_features()[layer_key]
    if feat_probe is None:
        # Mapping-output tap in W mode: the mapping is not executed so the
        # tap cannot fire — but the "features" there ARE the W latents
        # (the reference reads a stale Z-mode annotation here; this is the
        # deliberate version of the same shape).
        sample_shape = tuple(np.asarray(z_probe).shape)
    else:
        sample_shape = tuple(np.asarray(feat_probe).shape)
    sample_dims = int(np.prod(sample_shape))
    print("Feature shape:", sample_shape)

    input_shape = model.get_latent_shape()
    input_dims = model.get_latent_dims()

    # LOCAL clamp: mutating config.components here would desync the cache
    # filename (computed from the unclamped value in get_or_compute) and
    # change the cache key between calls on the same config object.
    n_components = min(config.components, sample_dims)
    if n_components < config.components:
        print(f"WARNING: clamping components {config.components} -> "
              f"{n_components} (feature dim {sample_dims}); the cache "
              f"filename keeps the requested count")
    # Feature-sharded estimator state when D splits evenly over the mesh
    # (uneven D falls back to replicated state; the batch stays sharded).
    feat_sh = None
    if mesh is not None and sample_dims % mesh.devices.size == 0:
        feat_sh = feature_sharding(mesh)
    transformer = get_estimator(config.estimator, n_components,
                                config.sparsity, feature_sharding=feat_sh)

    x_global_mean = None

    # Decomposition on non-Gaussian latent space (reference decomposition.py:239)
    samples_are_latents = (layer_key in ("g_mapping", "style")
                           and model.latent_space_name() == "W")

    # Static batch-size selection (no VRAM probing needed on TPU).
    if config.batch_size:
        batch = config.batch_size
    elif samples_are_latents:
        batch = 4096  # mapping-only workload: keep the MXU fed
    else:
        batch = get_max_batch_size(inst, layer_name=layer_key)

    # Round N down to full batches (reference behaviour) — but never below
    # one batch: for small-N runs (tiny models, smoke tests) shrink the batch
    # instead of silently computing on zero samples.
    batch = min(batch, config.n)
    if mesh is not None:
        # Keep minibatches evenly shardable over the data axis.
        batch = max(n_data, batch // n_data * n_data)
    n_total = config.n // batch * batch

    if not transformer.batch_support:
        budget = 20 * 1_000_000_000
        feat_bytes = sample_dims * np.dtype("float64").itemsize
        if n_total > budget // feat_bytes:
            print("WARNING: estimator does not support batching, given config "
                  "will use {:.1f} GB memory.".format(feat_bytes / 1e9 * n_total))

    if config.estimator == "ica":
        lapack_max_n = np.floor_divide(np.iinfo(np.int32).max // 4, sample_dims)
        if n_total > lapack_max_n:
            raise RuntimeError(f"Matrices too large for ICA, please use N <= {lapack_max_n}")

    print("B={}, N={}, dims={}, N/dims={:.1f}".format(
        batch, n_total, sample_dims, n_total / sample_dims), flush=True)

    # Must not depend on chosen batch size (reproducibility)
    nb = max(batch, max(2_000, 3 * n_components))

    samples = None
    if not transformer.batch_support:
        # Deliberately n_total + nb rows with the tail left zero, and the fit
        # below runs over ALL rows — byte-for-byte the reference's behaviour
        # (``decomposition.py:224,267,278-285``: it allocates N+NB, fills
        # ceil(N/NB)*NB rows, then fits on "all samples"), kept so non-batch
        # estimator outputs match reference caches exactly.
        samples = np.zeros((n_total + nb, sample_dims), dtype=np.float32)

    np.random.seed(config.seed or SEED_SAMPLING)

    # Pre-sample every latent up front so the fit stream is independent of
    # later RNG use (reference decomposition.py:229-236).  Unlike the
    # reference (host RAM round-trip for sklearn), latent batches stay
    # DEVICE-resident when they fit in HBM: host work is only the seeded
    # numpy draw, which async dispatch overlaps with the mapping network of
    # the previous batch.  Values and RNG order are identical either way.
    n_lat = ((n_total + nb - 1) // batch + 1) * batch
    lat_bytes = n_lat * int(np.prod(input_shape[1:])) * 4
    on_device = lat_bytes < int(os.environ.get("GANSPACE_LATENT_HBM_BUDGET",
                                               8 * 1024 ** 3))
    # Device-side RNG by default: latents are generated in HBM (fused with
    # the mapping net), so the sampling phase moves ZERO bytes host->device.
    # GANSPACE_DEVICE_RNG=0 restores the reference's host-numpy draws for
    # bit-exact parity with caches produced by the reference pipeline.
    # Statistically the two streams are equivalent: at n=200k on a random
    # generator, device-vs-host component cosines match the host
    # seed1-vs-seed7 control profile (divergence only inside near-degenerate
    # eigenspaces), and explained-variance ratios agree to ~1e-4.
    device_rng = os.environ.get("GANSPACE_DEVICE_RNG", "1") == "1"
    # The fused W-space path (below) regenerates latents inside the fit
    # stream — no pre-sampling or latent storage at all.
    fused = (samples_are_latents and device_rng
             and transformer.batch_support
             and hasattr(transformer, "fit_stream")
             and getattr(transformer, "_use_moments", lambda d: False)(sample_dims)
             and model.device_latents_fn_p() is not None)
    # Fused ACTIVATION stream: generation + synthesis-to-tap + sketch update
    # scanned in chunk-sized units (models exposing a pure tap function).
    # Weights ride as scan-program operands (pure_acts_fn_p), not baked
    # constants — see models/base.py.
    acts_fp = None if samples_are_latents else model.pure_acts_fn_p(layer_key)
    streamable = (getattr(transformer, "_use_moments", lambda d: False)(sample_dims)
                  or getattr(transformer, "_use_nystrom", lambda d: False)(sample_dims))
    # GANSPACE_FUSED_ACTS: 1=on, 0=off, auto (default) = on when the fused
    # scan program is already in the persistent compile cache, OR when the
    # run is big enough to amortize compiling it once
    # (GANSPACE_FUSED_ACTS_MIN_N, default 20k samples).  The fused stream
    # saves ~20ms dispatch per block but costs one scan-wrapped synthesis
    # compile (minutes on remotely-attached chips; measured 109s grouped vs
    # 174s fused cold on a 50k conv-tap run, identical results) — after the
    # first big run records the key, every later run gets the fused path as
    # a pure disk hit.
    fused_env = os.environ.get("GANSPACE_FUSED_ACTS", "auto")
    fused_min_n = int(os.environ.get("GANSPACE_FUSED_ACTS_MIN_N", 20_000))
    # "reg2" token: the scan program carries the regression cross-moments
    # (fused linreg), so sentinels recorded for the old program shape must
    # not claim its compile is cached.  The dtype token matters the same
    # way: --dtype bakes the matmul precision into every traced op, so an
    # f32 sentinel says nothing about the bf16 program's compile cost.
    fused_key = "|".join([config.model, str(config.output_class), layer_key,
                          f"b{batch}", f"D{sample_dims}",
                          transformer.get_param_str(),
                          getattr(config, "dtype", None) or "float32",
                          "reg2" if os.environ.get("GANSPACE_FUSED_LINREG",
                                                   "1") == "1" else "reg0",
                          # rand-moment accumulators change the scanned
                          # program shape exactly like the reg moments do
                          # (rand2 = Chan mean/M2 carry, r5)
                          "rand2" if os.environ.get("GANSPACE_FUSED_RAND",
                                                    "1") == "1" else "rand0"])
    fused_on = (fused_env == "1"
                or (fused_env == "auto"
                    and (_fused_acts_cached(fused_key)
                         or n_total >= fused_min_n)))
    fused_acts = (fused_on
                  and acts_fp is not None and device_rng and streamable
                  and hasattr(transformer, "fit_stream")
                  and model.device_latents_fn_p() is not None
                  and batch >= n_components)
    latent_chunks = []
    host_latents = None if (on_device or fused or fused_acts) else np.zeros(
        (n_lat, *input_shape[1:]), dtype=np.float32)
    # Which stream ACTUALLY produced the samples (for the provenance
    # sidecar): the env flag is only a request — the pre-sampling path falls
    # back to host numpy when latents exceed the HBM budget or the model has
    # no device sampler.
    device_rng_used = fused or fused_acts
    if not (fused or fused_acts):
        prefetched = None
        if on_device and device_rng:
            prefetched = model.sample_latents_device(
                n_lat // batch, batch, seed=config.seed or SEED_SAMPLING,
                sharding=batch_sh)
        device_rng_used = prefetched is not None
        if prefetched is None:
            prefetched = model.sample_latents_prefetched(n_lat // batch, batch)
        for i, z in enumerate(prefetched):
            if on_device:
                latent_chunks.append(shard_batch(
                    jnp.asarray(z).reshape(batch, *input_shape[1:]), mesh))
            else:
                host_latents[i * batch:(i + 1) * batch] = np.asarray(z).reshape(
                    batch, *input_shape[1:])

    def latent_slice(start, stop):
        if on_device:
            i0, i1 = start // batch, -(-stop // batch)
            block = (latent_chunks[i0] if i1 - i0 == 1
                     else jnp.concatenate(latent_chunks[i0:i1], axis=0))
            return block[start - i0 * batch:stop - i0 * batch]
        return shard_batch(host_latents[start:stop], mesh)

    canceled = False
    gi = 0
    bf16_pass1 = False          # set by the fused_acts branch; lands in _meta
    bf16_pass1_aborted = False  # interrupted before the f32 refine completed
    # Fuse up to GROUP streaming blocks into one lax.scan dispatch
    # (bit-identical update order; see IPCAEstimator.fit_partial_blocks).
    # Dispatch latency — not FLOPs — dominates the tiny per-block SVD, so
    # grouping is the main throughput lever on the 1M-sample runs.
    group_size = int(os.environ.get("GANSPACE_IPCA_GROUP", 25))
    # Cap the group by HBM: stacked pending blocks are [group, nb, D].
    group_bytes = int(os.environ.get("GANSPACE_GROUP_BYTES", 2 * 1024 ** 3))
    block_bytes = nb * sample_dims * 4
    group_size = max(1, min(group_size, group_bytes // max(block_bytes, 1)))
    can_group = (group_size > 1 and transformer.batch_support
                 and hasattr(transformer, "fit_partial_blocks"))
    pending: list = []

    # Fully-fused fast path for the samples-are-latents W-space runs:
    # generation (device RNG), the mapping network, and the exact-moments
    # update all ride ONE lax.scan program per chunk (the same fit_stream
    # machinery as the conv-tap path) — ~10 dispatches for a 1M-sample run
    # instead of ~750 eager block updates (each dispatch is a queue round
    # trip; on the tunneled chip that overhead alone was ~15 s, and the
    # r4 per-unit generate-then-fit pairing still left ~0.1 s of
    # dispatch-bubble drain the scan removes).  The random-direction stdev
    # baselines ride the same scan (rand_dirs), replacing the post-fit
    # projection pass.  The RNG stream folds the seed per NB-block, so
    # results are invariant to the chunk/group size (the r4 unit stream
    # depended on it).
    if fused:
        import jax as _jax
        seed0 = config.seed or SEED_SAMPLING
        lat_fn, lat_pack = model.device_latents_fn_p()
        # Large stream blocks: the W mapping at nb=4096 is ~1 ms of device
        # compute, so a scan at NB granularity pays ~6 ms/iteration of scan
        # overhead 245 times (measured 1.5 s vs 0.2 s of real compute at
        # n=1M).  64k-sample blocks put ~100 ms of gemms in each iteration;
        # small runs keep >=8 blocks for partial-save granularity.
        nb_w = min(int(os.environ.get("GANSPACE_W_STREAM_NB", 65536)),
                   max(nb, n_total // 8))

        def block_fn(pack, k):
            lat = lat_fn(pack, k, nb_w).reshape(nb_w, -1)
            if feat_sh is not None:
                # batch-generated latents -> feature-sharded estimator
                # (all-to-all over ICI, inside the same compiled program)
                lat = _jax.lax.with_sharding_constraint(lat, feat_sh)
            return lat

        want_rand = os.environ.get("GANSPACE_FUSED_RAND", "1") == "1"
        rdirs_dev = (random_directions_device(n_components, sample_dims)
                     if want_rand else None)
        # FLOOR to whole nb_w blocks; the remainder streams at the
        # original NB granularity under a distinct key stream.  A plain
        # ceil at nb_w would fit up to nb_w-1 (~6%) EXTRA samples beyond
        # the advertised N — the non-fused paths' contract is an overshoot
        # strictly under one NB block.
        n_stream_blocks = n_total // nb_w
        rem = n_total - n_stream_blocks * nb_w
        n_tail_blocks = -(-rem // nb) if rem else 0
        key0 = _jax.random.PRNGKey(seed0)
        key_tail = _jax.random.PRNGKey(seed0 + 1_000_003)
        print(f"Fitting fused latent stream: {n_stream_blocks} blocks of "
              f"{nb_w}"
              + (f" + {n_tail_blocks} of {nb}" if n_tail_blocks else "")
              + (" (+rand moments)" if want_rand else ""), flush=True)

        def tail_block_fn(pack, k):
            lat = lat_fn(pack, k, nb).reshape(nb, -1)
            if feat_sh is not None:
                lat = _jax.lax.with_sharding_constraint(lat, feat_sh)
            return lat
        # Scan-program reuse across runs (IPCAEstimator._scan_cache): the
        # token must pin everything the traced closure captures — workload
        # identity (fused_key), stream block size, mesh layout, and the
        # model knobs baked into the pure fns (truncation, s2d tail).
        stream_token = "|".join([
            fused_key, "Wstream", f"nbw{nb_w}",
            f"mesh{sorted(mesh.shape.items()) if mesh is not None else None}",
            f"tr{getattr(model, 'truncation', None)}",
            f"s2d{getattr(model, '_s2d', None)}"])
        try:
            if n_stream_blocks and not transformer.fit_stream(
                    block_fn, n_stream_blocks, key0,
                    chunk=8, consts=lat_pack, rand_dirs=rdirs_dev,
                    cache_token=stream_token):
                raise RuntimeError(
                    "fused latent stream unavailable for this estimator")
            if n_tail_blocks and not transformer.fit_stream(
                    tail_block_fn, n_tail_blocks, key_tail,
                    chunk=8, consts=lat_pack, rand_dirs=rdirs_dev,
                    cache_token=stream_token + f"|tail{nb}"):
                raise RuntimeError(
                    "fused latent tail stream unavailable for this estimator")
            x_block = None
            if getattr(transformer, "rand_moments", lambda: None)() is None:
                # Baselines did not ride the scan: one jitted block for them.
                x_block = _jax.jit(block_fn)(lat_pack,
                                             _jax.random.fold_in(key0, 0))
        except KeyboardInterrupt:
            n_fitted = getattr(transformer, "n_samples_seen_", 0)
            dump_name = _partial_dump_name(dump_name, config.n, n_fitted)
            print(f'Saving current state to "{dump_name.name}" before exiting')
            canceled = True
            x_block = None
    elif fused_acts:
        import jax as _jax
        seed0 = config.seed or SEED_SAMPLING
        acts_pure, acts_pack = acts_fp
        lat_fn, lat_pack = model.device_latents_fn_p()
        stream_pack = (lat_pack, acts_pack)
        # Piggyback the latent regression's raw cross-moments (sum x z^T,
        # sum z) on the fit sweeps: the same latents already feed synthesis,
        # so the regression's own synthesis sweep (a full third pass over
        # max(10k, n) samples) disappears.  GANSPACE_FUSED_LINREG=0 restores
        # the separate sweep (reference-style fresh SEED_LINREG samples).
        want_reg = os.environ.get("GANSPACE_FUSED_LINREG", "1") == "1"

        def make_stream_fn(acts_fn):
            def _fn(pack, k):
                lpk, apk = pack
                # primary-space latents drawn in-trace by the model
                # (gaussian + mapping for W models, truncnorm for BigGAN),
                # weights as operands
                lat = lat_fn(lpk, k, batch)
                if batch_sh is not None:
                    lat = _jax.lax.with_sharding_constraint(lat, batch_sh)
                a = acts_fn(apk, lat)
                if feat_sh is not None:
                    # batch-sharded synthesis -> feature-sharded estimator
                    # (all-to-all over ICI, inside the same compiled program)
                    a = _jax.lax.with_sharding_constraint(a, feat_sh)
                if want_reg:
                    return a, lat.reshape(lat.shape[0], -1)
                return a
            return _fn

        block_fn = make_stream_fn(acts_pure)

        n_stream_blocks = -(-n_total // batch)
        key0 = _jax.random.PRNGKey(seed0)
        # Ride the random-direction stdev baselines on the same scan: the
        # projection moments cost one [nb, D]x[D, c] gemm per block
        # (negligible next to synthesis) and make the post-fit extra
        # synthesis block + 2 GB centering unnecessary (measured ~0.6 s of
        # the conv-tap tail).  GANSPACE_FUSED_RAND=0 restores the separate
        # 5000-sample baseline for A/B.
        want_rand = os.environ.get("GANSPACE_FUSED_RAND", "1") == "1"
        rdirs_dev = (random_directions_device(n_components, sample_dims)
                     if want_rand else None)
        print(f"Fitting fused activation stream: {n_stream_blocks} blocks "
              f"of {batch}" + (" (+regression moments)" if want_reg else ""),
              flush=True)
        # Same scan-program reuse as the W stream (see stream_token above).
        acts_token = "|".join([
            fused_key, "ActsStream",
            f"mesh{sorted(mesh.shape.items()) if mesh is not None else None}",
            f"tr{getattr(model, 'truncation', None)}",
            f"s2d{getattr(model, '_s2d', None)}"])
        # Reduced-precision first pass (r5): when a PRIOR run of this exact
        # workload recorded that the adaptive policy keeps the refine sweep
        # (flat/random-init spectrum), pass 1 streams bf16-synthesized
        # activations to find the sketch basis ~3x cheaper and the
        # MANDATORY f32 refine pass determines the estimate — measured min
        # per-component cosine 0.99998 vs the all-f32 two-pass at
        # D=131072 (the power iteration on exact data washes out the
        # basis's rounding; docs/PERFORMANCE.md).  Skip-eligible workloads
        # (decaying spectra) keep the faster f32 single pass, and the
        # first-ever run is all-f32 (safe).  GANSPACE_BF16_PASS1=0 opts
        # out; an explicit never-refine policy also disables it (the f32
        # refine pass is load-bearing here).
        bf16_pass1 = (
            os.environ.get("GANSPACE_BF16_PASS1", "1") == "1"
            and (getattr(config, "dtype", None) or "float32") == "float32"
            and getattr(transformer, "_use_nystrom",
                        lambda d: False)(sample_dims)
            and getattr(transformer, "refine_policy", "auto")
            not in ("0", "never", "off", "false")
            and _fused_acts_info(fused_key).get("policy_refines") is True)
        refine_stream = None
        if bf16_pass1:
            from ganspace_tpu.ops.precision import synth_dtype
            with synth_dtype("bfloat16"):
                acts_bf, acts_bf_pack = model.pure_acts_fn_p(layer_key)
            pass1_fn = make_stream_fn(acts_bf)
            pass1_pack = (lat_pack, acts_bf_pack)
            pass1_token = acts_token + "|bf16pass1"
            refine_stream = (block_fn, stream_pack, acts_token)
            print("bf16 first pass (subspace discovery); f32 refine pass "
                  "determines the estimate", flush=True)
        else:
            pass1_fn, pass1_pack, pass1_token = (block_fn, stream_pack,
                                                 acts_token)
        try:
            if not transformer.fit_stream(pass1_fn, n_stream_blocks, key0,
                                          consts=pass1_pack,
                                          with_reg=want_reg,
                                          rand_dirs=rdirs_dev,
                                          cache_token=pass1_token,
                                          refine_stream=refine_stream):
                raise RuntimeError(
                    "fused activation stream unavailable for this estimator")
            x_block = None
            if getattr(transformer, "rand_moments", lambda: None)() is None:
                # Baselines did not ride the scan: synthesize one block for
                # them.  jitted (not eager): eager op-by-op synthesis on a
                # mesh risks XLA's 40 s collective-rendezvous timeout under
                # compile load.
                x_block = _jax.jit(block_fn)(stream_pack,
                                             _jax.random.fold_in(key0, 0))
                if want_reg:
                    x_block = x_block[0]
            # The scan program is now in the persistent compile cache:
            # future runs of this exact workload may auto-enable the fused
            # path (GANSPACE_FUSED_ACTS=auto).  Also record the adaptive
            # policy's decision so the NEXT run can pick its pass-1
            # precision (bf16_pass1 above): policy_refines=True means the
            # refine sweep is load-bearing here and a cheap bf16 first
            # pass pays for itself.
            pws = getattr(transformer, "policy_would_skip", None)
            _record_fused_acts(
                fused_key,
                {} if pws is None else {"policy_refines": not pws})
        except KeyboardInterrupt:
            # fit_stream refines internally: if the interrupt landed in its
            # second pass, fall back to the completed first-pass sketch.
            getattr(transformer, "abort_refine", lambda: None)()
            n_fitted = getattr(transformer, "n_samples_seen_", 0)
            dump_name = _partial_dump_name(dump_name, config.n, n_fitted)
            if bf16_pass1 and not getattr(transformer, "_refined", False):
                # The f32 refine pass was the load-bearing one: an abort
                # that fell back to the bf16 first-pass sketch leaves a
                # PREVIEW-grade result.  Tag the filename with the
                # established _bf16 preview marker — when n_fitted equals
                # config.n the _n token does NOT change, and an untagged
                # save would land at the exact analysis-grade cache path
                # for every later f32 run to silently reuse.
                bf16_pass1_aborted = True
                dump_name = dump_name.with_name(
                    dump_name.name.replace(".npz", "_bf16.npz"))
                print("WARNING: interrupted before the f32 refine pass "
                      "completed — the partial save derives from the bf16 "
                      "first pass (preview grade; saved under the _bf16 "
                      "tag, _meta records bf16_pass1_aborted)",
                      file=sys.stderr)
            print(f'Saving current state to "{dump_name.name}" before exiting')
            canceled = True
            x_block = None

    def flush_pending(final: bool = False) -> bool:
        # Keep jit signatures stable: full groups go through ONE scan shape
        # [group_size, nb, D]; the (rare) tail reuses the per-block
        # signature instead of compiling a fresh scan per tail length.
        if len(pending) == group_size:
            ok = transformer.fit_partial_blocks(jnp.stack(pending))
            pending.clear()
            return ok
        if final:
            while pending:
                if not transformer.fit_partial(pending.pop(0)):
                    return False
        return True

    n_blocks = max(1, -(-n_total // nb))

    def make_block(gi):
        """Assemble one NB-sample activation block (shared by the main fit
        sweep and the sketch-refine sweep)."""
        if samples_are_latents:
            return latent_slice(gi, gi + nb).reshape(nb, -1)
        chunks = []
        for mb in range(0, nb, batch):
            z = latent_slice(gi + mb, gi + mb + batch)
            model.partial_forward(z, layer_key)
            chunks.append(
                inst.retained_features()[layer_key].reshape(batch, -1))
        return jnp.concatenate(chunks, axis=0)[:nb]

    def run_sweep(action, feed):
        """Stream every NB block through ``feed(bi, gi, x_block)``; returns
        the last assembled block (kept for the stdev baselines)."""
        xb = None
        for bi, gi in enumerate(range(0, n_total, nb)):
            xb = make_block(gi)
            if not feed(bi, gi, xb):
                break
            print(f"\r{action} batches (NB={nb}): {bi + 1}/{n_blocks}",
                  end="", flush=True)
        if can_group:
            flush_pending(final=True)
        print()
        return xb

    def feed_grouped(xb):
        pending.append(xb)
        if len(pending) >= group_size:
            return flush_pending()
        return True

    if not (fused or fused_acts):
        x_block = None   # the zeros fallback covers interrupted sweeps
    try:
        if not (fused or fused_acts):
            action = "Fitting" if transformer.batch_support else "Collecting"

            def feed_main(bi, gi, xb):
                if can_group:
                    if bi == 0:
                        # First block initializes the state through the
                        # plain fit_partial signature (first=True compile).
                        return transformer.fit_partial(xb)
                    return feed_grouped(xb)
                if transformer.batch_support:
                    return transformer.fit_partial(xb)
                samples[gi:gi + nb, :] = np.asarray(xb)
                return True

            x_block = run_sweep(action, feed_main)
    except KeyboardInterrupt:
        if not transformer.batch_support:
            sys.exit(1)  # no progress yet
        # Save partial result under a corrected sample count
        # (reference decomposition.py:268-274).  With grouping, count only
        # the samples actually absorbed by the estimator.
        n_fitted = getattr(transformer, "n_samples_seen_", gi)
        dump_name = _partial_dump_name(dump_name, config.n, n_fitted)
        print(f'Saving current state to "{dump_name.name}" before exiting')
        canceled = True

    # Sketch-tier refine pass: the latent stream is kept/regenerable, so one
    # extra synthesis sweep buys a power iteration on the scatter — taking
    # the big-D streaming PCA from ~0.9 to >0.995 per-component cosine vs
    # exact (IPCAEstimator.begin_refine; the fused paths refine inside
    # fit_stream, and the moments/sklearn tiers never need it).  The
    # adaptive policy (should_refine) skips the whole sweep when the
    # first-pass sketch is already resolved — decaying trained-checkpoint
    # spectra typically qualify, random-init plateaus do not.
    if (not canceled and not (fused or fused_acts)
            and transformer.batch_support
            and hasattr(transformer, "begin_refine")
            and getattr(transformer, "should_refine", lambda: True)()
            and transformer.begin_refine()):
        try:
            run_sweep("Refine pass",
                      lambda bi, gi, xb: (feed_grouped(xb) if can_group
                                          else transformer.fit_partial(xb)))
        except KeyboardInterrupt:
            # A partially-accumulated second pass is strictly worse than the
            # completed first-pass sketch: fall back to it and save under
            # the original full-n name.
            pending.clear()
            transformer.abort_refine()
            print("\nRefine pass interrupted — saving the completed "
                  "single-pass estimate before exiting")
            canceled = True

    if not transformer.batch_support:
        x_data = samples
        x_global_mean = x_data.mean(axis=0, keepdims=True, dtype=np.float32)
        x_data -= x_global_mean
        print(f"[{timestamp()}] Fitting whole batch")
        t_start_fit = datetime.datetime.now()
        transformer.fit(x_data)
        print(f"[{timestamp()}] Done in {datetime.datetime.now() - t_start_fit}")
        assert np.all(np.abs(transformer.mean_) < 1e-3), \
            "Mean of normalized data should be zero"
    else:
        if canceled and getattr(transformer, "n_samples_seen_", 0) == 0:
            # Interrupt before ANY data was absorbed (e.g. mid-compile of
            # the first scan chunk): there is nothing to save — the tier
            # state is all-zero and would NaN in mean_/get_components
            # (count=0 divisions) instead of producing a partial cache.
            print("Nothing fitted before the interrupt — exiting without "
                  "a partial save")
            sys.exit(1)
        x_global_mean = transformer.mean_.reshape((1, sample_dims))
        # last block, for stdev baselines — stays on device (for conv taps
        # it can be a 1 GB array; only the [c]-sized stdevs come home)
        if x_block is None:          # interrupted before any block completed
            x_block = jnp.zeros((1, sample_dims), jnp.float32)
        x_data = jnp.asarray(x_block) - jnp.asarray(x_global_mean)

    # Opt-in phase trace (GANSPACE_PHASE_TRACE=1): wall-clock stamps around
    # every post-fit boundary that costs a dispatch round trip or a
    # host<->device transfer, printed to stderr at the end — the tool for
    # attributing the gap between the steady time and the per-block device
    # floor (docs/PERFORMANCE.md roofline row).
    _stamps = [("fit_done", time.perf_counter())] \
        if os.environ.get("GANSPACE_PHASE_TRACE") == "1" else None

    def _stamp(label):
        if _stamps is not None:
            _stamps.append((label, time.perf_counter()))

    # Keep the components ON DEVICE when the estimator can: for conv taps
    # they are c*D-sized ([80, 131072] = 42 MB), and the downstream consumers
    # (regression solve, projections) are device math — only the final npz
    # write needs a host copy, which is started asynchronously here so the
    # transfer overlaps the remaining post-fit compute.
    #
    # Samples-are-latents moments runs take the BUNDLE finish instead: one
    # program + one [4, c] readback carries components, stdev, var_ratio,
    # lat_stdev AND the random baselines (four separate round trips through
    # the relay otherwise — measured ~0.13 s of the 0.56 s steady W leg).
    rand_mom = (getattr(transformer, "rand_moments", lambda: None)()
                if device_rng_used else None)
    bundle_stats = None
    if samples_are_latents:
        bundle = getattr(transformer, "finish_latent_bundle",
                         lambda **_k: None)(rand_moments=rand_mom)
        if bundle is not None:
            x_comp, bundle_stats = bundle
            x_stdev, x_var_ratio = bundle_stats[0], bundle_stats[1]
    if bundle_stats is None:
        try:
            x_comp, x_stdev, x_var_ratio = transformer.get_components(
                device=True)
        except TypeError:             # estimators without the device path
            x_comp, x_stdev, x_var_ratio = transformer.get_components()
    _stamp("get_components")

    assert x_comp.shape[1] == sample_dims \
        and x_comp.shape[0] == n_components \
        and x_global_mean.shape[1] == sample_dims \
        and x_stdev.shape[0] == n_components, "Invalid shape"

    # 'Activations' are really latents in a secondary latent space
    fused_linreg_used = False
    if samples_are_latents:
        z_comp = np.array(x_comp)
        z_global_mean = np.array(x_global_mean)
    else:
        reg = getattr(transformer, "reg_moments", lambda: None)()
        if reg is not None:
            fused_linreg_used = True
            z_comp, z_global_mean = regression_from_moments(
                x_comp, x_global_mean, x_stdev, reg)
        else:
            z_comp, z_global_mean = regression(x_comp, x_global_mean,
                                               x_stdev, inst, config)
    _stamp("regression")

    z_comp = z_comp / np.maximum(
        np.linalg.norm(z_comp, axis=-1, keepdims=True), 1e-30)

    # Random-direction stdev baselines (reference decomposition.py:310-316);
    # the projection contracts over D on device, only [c] stdevs read back.
    # Device-RNG runs also DRAW the directions on device (same fixed seed,
    # threefry stream): the host path costs ~1.3 s of RandomState generation
    # plus a c*D upload for big-D taps.
    if bundle_stats is not None and rand_mom is not None:
        x_stdev_random = bundle_stats[3]
    elif rand_mom is not None:
        # The projections' Chan mean/M2 rode the fused fit scan (same
        # threefry dirs, ALL n samples instead of a 5000-sample block);
        # variance is shift-invariant, so centering by the global mean
        # falls out: Var(R(x-mean)) == Var(Rx) == M2/n.
        _, pm2, n_r = rand_mom
        x_stdev_random = np.asarray(jnp.sqrt(jnp.maximum(pm2 / n_r, 0.0)))
    else:
        if device_rng_used:
            random_dirs = random_directions_device(n_components,
                                                   int(np.prod(sample_shape)))
        else:
            random_dirs = get_random_dirs(n_components,
                                          np.prod(sample_shape))
        n_rand_samples = min(5000, x_data.shape[0])
        x_stdev_random = np.asarray(jnp.std(
            mm(jnp.asarray(random_dirs),
               jnp.asarray(x_data[:n_rand_samples]).T),
            axis=1))
    _stamp("random_stdevs")

    # Inflate back to proper shapes (for easier broadcasting).  The c*D
    # component DMA happens HERE, after every device-math consumer above —
    # issued any earlier it serializes queued device programs behind a ~2 s
    # relay transfer (measured: the regression solve stalled 0.3 -> 2.1 s).
    # Device-resident components are NOT copied back eagerly: the npz writer
    # streams them chunk-by-chunk with async copies so the relay transfer
    # overlaps the zip CRC+write (the two biggest post-fit costs; measured
    # 1.3-1.7 s DMA + 0.6-1.0 s write sequential).
    comp_is_device = not isinstance(x_comp, np.ndarray)
    if not comp_is_device:
        x_comp = np.array(x_comp).reshape(-1, *sample_shape)
    _stamp("component_dma")
    x_global_mean = np.array(x_global_mean).reshape(sample_shape)
    z_comp = z_comp.reshape(-1, *input_shape)
    z_global_mean = z_global_mean.reshape(input_shape)

    # Compute stdev in latent space if non-Gaussian.  For samples-are-
    # latents runs the moments tier already holds the exact full-stream W
    # covariance, so the statistic is a closed-form [c]-sized readback
    # (Var(d.w) = d M2 d / n over ALL n samples) — no fresh 5000-sample
    # synthesis batch (measured 0.37 s of the 0.89 s steady W leg, the
    # single biggest post-fit phase).  Other runs keep the reference's
    # 5000-sample estimate (decomposition.py:324-329); the W batch never
    # leaves the device either way.
    lat_stdev = np.ones_like(x_stdev)
    if config.use_w:
        if bundle_stats is not None:
            lat_stdev = bundle_stats[2]
        elif (pv := (getattr(transformer, "projected_variance",
                             lambda d: None)(z_comp.reshape(-1, input_dims))
                     if samples_are_latents else None)) is not None:
            lat_stdev = np.sqrt(np.maximum(pv, 0.0))
        else:
            ws = jnp.asarray(model.sample_latent(5000)).reshape(5000,
                                                                input_dims)
            coords = mm(jnp.asarray(z_comp.reshape(-1, input_dims),
                                    jnp.float32), ws.T)
            lat_stdev = np.asarray(jnp.std(coords, axis=1))
    _stamp("lat_stdev")

    if canceled and dump_name.name == canonical_name:
        # An interrupted run must NEVER claim the canonical cache path:
        # when the absorbed count happens to equal config.n (e.g. an
        # abort_refine fallback after a complete first pass, with n a
        # batch multiple), the _n{N} partial rename is a no-op and an
        # untagged save would be silently reused as the full-quality
        # result by every later run.
        dump_name = dump_name.with_name(
            dump_name.name.replace(".npz", "_partial.npz"))
        print(f'Interrupted result claims the full-run name — saving as '
              f'"{dump_name.name}" instead', file=sys.stderr)
    os.makedirs(dump_name.parent, exist_ok=True)
    # bf16 datapath: predict each component's sensitivity to the activation
    # rounding FROM THE FITTED SPECTRUM ITSELF and grade the cache
    # (VERDICT r4 #6) — see bf16_component_bounds.
    bf16_meta = {}
    if getattr(config, "dtype", None) == "bfloat16":
        spec_ev = getattr(transformer, "component_spectrum", lambda: None)()
        if spec_ev is not None:
            bounds = bf16_component_bounds(spec_ev, n_components)
            # full precision: rounding to 4 decimals could turn a 0.98996
            # bound into a stored 0.99, contradicting the grade that
            # consumers (viewer/visualize) recompute from the list
            bf16_meta = {
                "bf16_cos_bounds": [float(b) for b in bounds],
                "bf16_analysis_grade": bool((bounds >= 0.99).all()),
            }
    # Provenance sidecar key (reference keys stay untouched): the filename
    # encodes model/layer/estimator/n, but NOT which RNG stream produced the
    # samples — record it so mixed-provenance caches are detectable
    # (see get_or_compute's mismatch warning).
    import json as _json
    meta = _json.dumps({
        "device_rng": device_rng_used,
        "dtype": getattr(config, "dtype", None) or "float32",
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "fused_linreg": fused_linreg_used,
        # Adaptive-refine decision (sketch tier only; None elsewhere):
        # True = the calibrated policy skipped the second data sweep.
        "refine_skipped": getattr(transformer, "refine_skipped", None),
        "refine_stats": getattr(transformer, "refine_stats", None),
        # True when pass 1 streamed bf16-synthesized activations and the
        # (mandatory) f32 refine pass determined the estimate — still
        # f32-grade components (min cos 0.99998 vs all-f32 two-pass)
        # UNLESS bf16_pass1_aborted is also True (interrupt before the
        # refine completed: the save derives from the bf16 first pass and
        # is filed under the _bf16 preview tag).
        "bf16_pass1": bf16_pass1,
        "bf16_pass1_aborted": bf16_pass1_aborted,
        **bf16_meta,
    })
    # Atomic write (temp + rename): an interrupt mid-savez must never leave
    # a truncated zip at the cache path get_or_compute would blindly reuse.
    tmp_name = dump_name.with_name(
        f"{dump_name.stem}.{os.getpid()}.tmp.npz")
    # Compression pays only for small caches: float components are
    # near-incompressible (measured: 7.6 s of zlib to shave 7% off a
    # conv-tap cache), so big-D caches store uncompressed — np.load reads
    # both identically.  GANSPACE_CACHE_COMPRESS=1 forces zlib always.
    cache_bytes = 4 * x_comp.size + z_comp.nbytes + x_global_mean.nbytes
    force = os.environ.get("GANSPACE_CACHE_COMPRESS")
    use_zlib = (force == "1") if force in ("0", "1") \
        else cache_bytes <= 8 * 1024 * 1024
    _savez = np.savez_compressed if use_zlib else np.savez
    if getattr(config, "dtype", None) == "bfloat16":
        # The _bf16 filename tag keeps these out of f32 cache hits; the
        # spectrum-derived per-component bounds (written to _meta above)
        # decide whether the warning is advisory or a refusal of
        # analysis-grade labeling.
        if bf16_meta.get("bf16_analysis_grade") is True:
            print("Note: bfloat16-datapath components — the fitted "
                  "spectrum's eigengaps bound every component's cosine vs "
                  "float32 at >= 0.99 (per-component bounds in _meta "
                  "bf16_cos_bounds)", file=sys.stderr)
        elif bf16_meta:
            bad = sum(b < 0.99 for b in bf16_meta["bf16_cos_bounds"])
            print(f"WARNING: bfloat16-datapath components are NOT "
                  f"analysis-grade here: {bad}/{n_components} "
                  f"components sit on eigengaps too small to bound their "
                  f"rotation under bf16 rounding (per-component bounds in "
                  f"_meta bf16_cos_bounds; measured dips to ~0.989 on such "
                  f"spectra).  Re-run without --dtype bfloat16 for "
                  f"analysis-grade components", file=sys.stderr)
        else:
            print("Note: bfloat16-datapath components (preview precision) — "
                  "per-component cosine vs float32 can dip to ~0.989 on "
                  "flat-spectrum models; re-run without --dtype bfloat16 "
                  "for analysis-grade components", file=sys.stderr)
    _stamp("save_prep")
    small_arrays = {
        "act_mean": x_global_mean.astype(np.float32),
        "act_stdev": np.asarray(x_stdev, np.float32),
        "lat_comp": z_comp.astype(np.float32),
        "lat_mean": z_global_mean.astype(np.float32),
        "lat_stdev": lat_stdev.astype(np.float32),
        "var_ratio": np.asarray(x_var_ratio, np.float32),
        "random_stdevs": x_stdev_random.astype(np.float32),
        "_meta": np.bytes_(meta.encode()),
    }
    wrote = False
    if comp_is_device and not use_zlib:
        try:
            _stream_npz(tmp_name, small_arrays, "act_comp", x_comp,
                        (x_comp.shape[0], *sample_shape))
            wrote = True
        except Exception as e:       # sharding/runtime corner: plain path
            print(f"streamed npz write unavailable ({e}); "
                  "falling back to buffered write", file=sys.stderr)
    if not wrote:
        if comp_is_device:
            x_comp = np.array(x_comp).reshape(-1, *sample_shape)
        _savez(tmp_name, act_comp=x_comp.astype(np.float32), **small_arrays)
    os.replace(tmp_name, dump_name)
    _stamp("npz_write")
    if _stamps is not None:
        t0, prev = _stamps[0][1], _stamps[0][1]
        lines = []
        for label, t in _stamps[1:]:
            lines.append(f"  {label:18s} +{t - prev:7.3f}s (t={t - t0:7.3f})")
            prev = t
        print("post-fit phase trace:\n" + "\n".join(lines), file=sys.stderr)

    if canceled:
        sys.exit(1)

    if instrumented_model is None:
        inst.close()


# ---------------------------------------------------------------------------
# Cache layer (reference decomposition.py:360-402)
# ---------------------------------------------------------------------------

def component_cache_name(config) -> str:
    """Exact reference filename scheme (``decomposition.py:384-392``) for
    default-precision runs; ``--dtype bfloat16`` (a TPU-only extension the
    reference has no analog of) appends a ``_bf16`` tag so preview-precision
    components can never be picked up by an f32 cache hit."""
    transformer = get_estimator(config.estimator, config.components, config.sparsity)
    return "{}-{}_{}_{}_n{}{}{}{}.npz".format(
        config.model.lower(),
        (config.output_class or "None").replace(" ", "_"),
        config.layer.lower(),
        transformer.get_param_str(),
        config.n,
        "_w" if config.use_w else "",
        f"_seed{config.seed}" if config.seed else "",
        "_bf16" if getattr(config, "dtype", None) == "bfloat16" else "",
    )


def get_or_compute(config, model: Optional[InstrumentedModel] = None,
                   submit_config=None, force_recompute: bool = False) -> Path:
    """Return the cached component file path, computing it if needed."""
    if submit_config is not None:
        basedir = Path(submit_config.run_dir)
    else:
        basedir = Path(os.environ.get("GANSPACE_OUTPUT_DIR", Path.cwd()))

    if config.n is None:
        raise RuntimeError("Must specify number of samples with -n=XXX")
    if model is not None and not isinstance(model, InstrumentedModel):
        raise RuntimeError('Passed model has to be wrapped in "InstrumentedModel"')
    if config.use_w and "StyleGAN" not in config.model:
        raise RuntimeError(f"Cannot change latent space of non-StyleGAN model {config.model}")

    dump_path = basedir / "cache" / "components" / component_cache_name(config)
    if not dump_path.is_file() or force_recompute \
            or not _cache_file_readable(dump_path):
        print("Not cached")
        t_start = datetime.datetime.now()
        compute(config, dump_path, model)
        print("Total time:", datetime.datetime.now() - t_start)
    else:
        _warn_on_provenance_mismatch(dump_path, config)
    return dump_path


def _cache_file_readable(dump_path: Path) -> bool:
    """True if the cached npz opens and holds the component keys; a corrupt
    file (e.g. interrupted write by an older, non-atomic version) recomputes
    instead of poisoning every later run."""
    try:
        with np.load(dump_path, allow_pickle=False) as d:
            return "act_comp" in d.files and "lat_comp" in d.files
    except Exception as e:
        print(f"Warning: cached {dump_path.name} is unreadable ({e!r}); "
              f"recomputing")
        return False


def _prospective_mesh_desc(config) -> Optional[dict]:
    """The mesh axis->size map a ``compute()`` of this config would use
    (mirrors the tiny-run collapse guard at the top of ``_compute``)."""
    mesh = pipeline_mesh(getattr(config, "mesh_shape", None))
    if mesh is not None and config.n < mesh.devices.size:
        mesh = None
    return dict(mesh.shape) if mesh is not None else None


def _warn_on_provenance_mismatch(dump_path: Path, config) -> None:
    """Device-RNG vs host-RNG streams, and meshed vs single-device
    reductions, are statistically equivalent but not bit-identical; flag a
    cache hit produced under a different mode so cross-run comparisons
    aren't silently mixed (files with no provenance key —
    reference-pipeline exports — are accepted as-is)."""
    try:
        with np.load(dump_path, allow_pickle=False) as d:
            if "_meta" not in d.files:
                return
            import json as _json
            meta = _json.loads(d["_meta"].item().decode())
    except Exception:
        return
    current_rng = os.environ.get("GANSPACE_DEVICE_RNG", "1") == "1"
    cached_rng = meta.get("device_rng")
    if cached_rng is not None and cached_rng != current_rng:
        print(f"WARNING: {dump_path.name} was computed with "
              f"{'device' if cached_rng else 'host'}-side RNG but this run "
              f"uses {'device' if current_rng else 'host'}-side RNG "
              f"(GANSPACE_DEVICE_RNG); components are statistically "
              f"equivalent, not bit-identical. Use --force or a fresh "
              f"output dir for a like-for-like cache.")
    if "mesh" in meta and meta["mesh"] != _prospective_mesh_desc(config):
        print(f"WARNING: {dump_path.name} was computed on mesh "
              f"{meta['mesh'] or 'single-device'} but this run would use "
              f"{_prospective_mesh_desc(config) or 'single-device'}; "
              f"sharded reductions reassociate floating point, so the "
              f"cached components differ from a fresh run at the ~1e-4 "
              f"level. Use --force for a like-for-like cache.")
