"""Streaming (incremental) PCA, device-resident and mesh-shardable.

TPU-native replacement for the reference's sklearn ``IncrementalPCA`` tier
(reference ``estimators.py:55-81``) — the only ``batch_support=True``
estimator and the workhorse for 1M-sample runs.  The per-block update
reproduces sklearn's ``partial_fit`` arithmetic exactly:

  1. Chan-style incremental mean/variance update (the same numerically-stable
     scheme the reference's dissection toolkit uses in
     ``netdissect/runningstats.py:575-632``);
  2. stack  M = [ s ⊙ V_old ; X_centered ; mean-correction row ]  with the
     correction  sqrt(n_seen * n_batch / n_total) * (mean_old - mean_batch);
  3. SVD of M and retention of the top-c right singular vectors with
     sklearn's Vt-based sign convention.

The SVD is computed from the smaller Gram of M (k x k or D x D) so the O(k*D)
contraction lands on the MXU as one large matmul instead of a LAPACK
bidiagonalization; only the dominant triplets are consumed, where the
squared-condition precision loss of the Gram trick is negligible.

Multi-chip: all state ([D]-vectors, [c, D] components) and incoming blocks
are sharded along the FEATURE axis.  Every contraction in the update reduces
over D, so under jit XLA turns the Gram products into per-shard partial
matmuls + an ICI psum; the k x k eigh stays replicated.  The sample axis is
how activations arrive from data-parallel synthesis — an all_to_all reshards
[n, D] from batch-sharded to feature-sharded at the estimator boundary
(see ``parallel/mesh.py``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ganspace_tpu.estimators.utils import gram_svd, mm


class _IPCAState(NamedTuple):
    mean: jnp.ndarray            # [D]
    var: jnp.ndarray             # [D]
    components: jnp.ndarray      # [c, D]
    singular_values: jnp.ndarray  # [c]
    explained_variance: jnp.ndarray        # [c]
    explained_variance_ratio: jnp.ndarray  # [c]


@partial(jax.jit, static_argnames=("n_components",))
def _partial_fit_scan(state: _IPCAState, blocks: jnp.ndarray,
                      n_seen0: jnp.ndarray, *, n_components: int) -> _IPCAState:
    """k sequential streaming updates fused into ONE dispatch.

    ``blocks`` is [k, n, D]; the scan body is the exact per-block update, so
    the result is bit-identical to k ``fit_partial`` calls — but the host
    pays one dispatch (and, under the remote TPU tunnel, one round trip)
    per k blocks instead of per block.  This is the throughput lever for the
    1M-sample runs: dispatch latency, not FLOPs, dominates the small
    per-block SVD.
    """
    def body(carry, x):
        st, n_seen = carry
        new = _partial_fit_math(st, x, n_seen, n_components=n_components,
                                first=False)
        return (new, n_seen + jnp.asarray(float(x.shape[0]), x.dtype)), None

    (state, _), _ = jax.lax.scan(body, (state, n_seen0), blocks)
    return state


def _partial_fit_math(state: _IPCAState, x: jnp.ndarray, n_seen: jnp.ndarray,
                      *, n_components: int, first: bool) -> _IPCAState:
    n, d = x.shape
    n_batch = jnp.asarray(float(n), x.dtype)
    batch_mean = jnp.mean(x, axis=0)
    batch_var = jnp.var(x, axis=0)

    if first:
        n_total = n_batch
        new_mean, new_var = batch_mean, batch_var
        m = x - batch_mean
    else:
        n_total = n_seen + n_batch
        # Chan parallel-update of mean and (population) variance.
        delta = batch_mean - state.mean
        new_mean = state.mean + delta * (n_batch / n_total)
        m2 = (state.var * n_seen + batch_var * n_batch
              + jnp.square(delta) * (n_seen * n_batch / n_total))
        new_var = m2 / n_total
        x_c = x - batch_mean
        mean_corr = jnp.sqrt((n_seen / n_total) * n_batch) * (state.mean - batch_mean)
        m = jnp.concatenate([
            state.singular_values[:, None] * state.components,
            x_c,
            mean_corr[None, :],
        ], axis=0)

    s, vt = gram_svd(m, n_components)
    explained_variance = jnp.square(s) / (n_total - 1.0)
    explained_variance_ratio = jnp.square(s) / jnp.sum(new_var * n_total)
    return _IPCAState(new_mean, new_var, vt, s,
                      explained_variance, explained_variance_ratio)


_partial_fit = partial(jax.jit, static_argnames=("n_components", "first"))(
    _partial_fit_math)


class _NystromState(NamedTuple):
    count: jnp.ndarray        # scalar
    s: jnp.ndarray            # [D] running sum of x
    sq: jnp.ndarray           # scalar: running sum of ||x||^2
    y: jnp.ndarray            # [D, l] = (sum x x^T) @ omega


@jax.jit
def _nystrom_update(state: _NystromState, x: jnp.ndarray,
                    omega: jnp.ndarray) -> _NystromState:
    """Single-pass randomized sketch for big-D streaming PCA.

    Per block: two MXU gemms (x@omega [n,l], x.T@(x@omega) [D,l]) and a sum —
    no factorization.  The sklearn-mirror update needs an eigh of a
    (c+nb+1)-sized Gram per block, which is minutes-per-block territory on
    TPU at nb=4096; the sketch defers ALL factorization to one l x l solve
    in ``_nystrom_finish``.  l = 2c oversampling — the same rate as the
    reference's fbpca randomized-SVD tier (``estimators.py:129-136``).
    """
    xo = mm(x, omega)
    return _NystromState(
        state.count + jnp.asarray(float(x.shape[0]), x.dtype),
        state.s + jnp.sum(x, axis=0),
        state.sq + jnp.sum(jnp.square(x)),
        state.y + mm(x.T, xo))


@jax.jit
def _sketch_grams(state: _NystromState, omega: jnp.ndarray):
    """Device half of every sketch factorization: the centered sketch
    Y = M2c @ Omega [D, l], its omega-Gram m = Omega^T Y [l, l], and the
    exact centered total energy (scalar) — all the O(D) gemm work.

    The l x l factorizations themselves run on HOST in float64
    (``_pinv_sqrt_psd`` / ``_eigh_desc``).  The f32 shifted-Cholesky they
    replace goes numerically indefinite on spectrally-shaped streams
    (the centered Gram spans ~16 decades at D=131072), yielding an
    all-NaN refine test matrix — and ``jnp.linalg.eigh`` on a non-finite
    operand does not return NaN on TPU, it CRASHES the TPU runtime
    (BENCH_r04 ``convtap_decay_error``; minimal repro pinned in
    tests/test_nystrom_robust.py).  Host f64 with relative clamping is
    NaN-impossible and costs one [l, l] readback once per fit."""
    n = state.count
    mu = state.s / n
    y = state.y - n * jnp.outer(mu, mm(mu[None, :], omega)[0])
    m = mm(omega.T, y)
    total = state.sq - n * jnp.sum(jnp.square(mu))
    return y, 0.5 * (m + m.T), total


@jax.jit
def _whitened_gram(y: jnp.ndarray, w: jnp.ndarray):
    """f = Y @ W [D, l] (whitened centered sketch) and its Gram f^T f."""
    f = mm(y, w)
    g = mm(f.T, f)
    return f, 0.5 * (g + g.T)


def _check_finite_gram(m: np.ndarray) -> None:
    """Refuse non-finite sketch Grams with a Python error.

    A NaN/Inf activation stream would otherwise flow into an eigh whose
    TPU lowering kills the worker process on non-finite input (see
    ``_sketch_grams``); the [l, l] Gram is where any stream NaN first
    becomes host-visible, so this is the single cheap choke point."""
    if not np.all(np.isfinite(m)):
        raise FloatingPointError(
            "non-finite sketch statistics: the activation stream contains "
            "NaN/Inf (eigh on non-finite input crashes the TPU runtime, so "
            "the factorization is refused host-side instead)")


def _pinv_sqrt_psd(m: np.ndarray, tol_rel: Optional[float] = None) -> np.ndarray:
    """Symmetric pseudo-inverse square root of a noisy-PSD matrix (f64 host).

    Eigendirections below ``tol_rel * max_eig`` are f32-gemm noise of the
    sketch, not signal — they are DROPPED (scale 0), never shift-damped or
    amplified.  Default tolerance = l * eps_f32, the Gram's accumulation
    noise floor."""
    _check_finite_gram(m)
    if tol_rel is None:
        tol_rel = m.shape[0] * float(np.finfo(np.float32).eps)
    e, v = np.linalg.eigh(m.astype(np.float64))
    emax = float(e[-1]) if e.size else 0.0
    if emax <= 0.0:
        return np.zeros_like(m, dtype=np.float64)
    keep = e > tol_rel * emax
    vk = v[:, keep]
    return (vk / np.sqrt(e[keep])) @ vk.T


def _eigh_desc(g: np.ndarray):
    """Host f64 eigh, descending — of the [l, l] whitened Gram."""
    _check_finite_gram(g)
    e, v = np.linalg.eigh(np.asarray(g).astype(np.float64))
    return e[::-1], v[:, ::-1]


def _noise_floor_scale(e: np.ndarray) -> np.ndarray:
    """e^{-1/2} with sub-noise eigenvalues zeroed (their columns carry no
    f32-resolvable signal; zero columns are inert downstream)."""
    emax = float(e[0]) if e.size else 0.0
    return np.where(e > max(emax, 0.0) * 1e-12,
                    1.0 / np.sqrt(np.maximum(e, 1e-300)), 0.0)


def _sketch_factor(state: _NystromState, omega: jnp.ndarray):
    """The shared factorization behind spectrum/range/finish:
    ``(f [D, l] device, e desc f64, v desc f64, total float)`` with
    f = Yc W the whitened centered sketch and (e, v) the eigenpairs of
    f^T f — two [D, l] gemms + host f64 l x l eigendecompositions.
    Estimator methods reach it through ``_sketch_factor_cached`` so the
    should_refine -> begin_refine -> finish sequence on an UNCHANGED
    sketch factorizes once, not three times."""
    y, m, total = _sketch_grams(state, omega)
    w = _pinv_sqrt_psd(np.asarray(m))
    f, g = _whitened_gram(y, jnp.asarray(w, jnp.float32))
    e, v = _eigh_desc(np.asarray(g))
    return f, e, v, float(total)


def _nystrom_spectrum(state: _NystromState, omega: jnp.ndarray):
    """(evals [l] desc np, total float) — the sketch's own eigenvalue
    estimates of the centered scatter plus the EXACT centered energy, the
    inputs of the adaptive-refine convergence statistics.  Same Nyström
    algebra as ``_nystrom_finish`` but eigenvalues only."""
    _, e, _, total = _sketch_factor(state, omega)
    return np.maximum(e, 0.0), total


def _nystrom_range(state: _NystromState, omega: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of the centered first-pass sketch — gemms on
    device, the l x l eigendecompositions on host f64 (no [D, l] QR, so
    the feature axis stays sharded).  Used as the test matrix of the
    refine pass: streaming the data once more against this basis is one
    power iteration on the centered scatter, which squares the sketch's
    convergence ratios (measured: l=4c goes from ~0.9 to >0.995
    per-component cosine on production-shape conv taps,
    tests/test_nystrom_production.py)."""
    f, e, v, _ = _sketch_factor(state, omega)
    return _range_from_factor(f, e, v)


def _range_from_factor(f, e, v) -> jnp.ndarray:
    proj = v * _noise_floor_scale(e)[None, :]
    return mm(f, jnp.asarray(proj, jnp.float32))


@jax.jit
def _flip_cols_to_components(u: jnp.ndarray) -> jnp.ndarray:
    from ganspace_tpu.estimators.utils import svd_flip_vt
    return svd_flip_vt(u.T)


def _nystrom_finish(state: _NystromState, omega: jnp.ndarray,
                    *, n_components: int):
    """Nyström eigen-approximation of the centered covariance from the
    sketch: C ~= Y (Omega^T Y)^+ Y^T with Y = M2c @ Omega (Tropp et al.,
    fixed-rank PSD approximation).  Returns (components [c, D] device,
    stdev [c] np, var_ratio [c] np)."""
    f, e, v, total = _sketch_factor(state, omega)
    return _finish_from_factor(f, e, v, total, float(state.count),
                               n_components)


def _finish_from_factor(f, e, v, total, count, n_components):
    ec = e[:n_components]
    proj = v[:, :n_components] * _noise_floor_scale(ec)[None, :]
    u = mm(f, jnp.asarray(proj, jnp.float32))        # [D, c]
    comp = _flip_cols_to_components(u)               # [c, D]
    denom = max(count - 1.0, 1.0)
    explained = np.maximum(ec, 0.0) / denom
    total_var = total / denom
    ratio = explained / max(total_var, 1e-30)
    return comp, np.sqrt(explained), ratio


class _MomentsState(NamedTuple):
    count: jnp.ndarray           # scalar
    mean: jnp.ndarray            # [D]
    m2: jnp.ndarray              # [D, D] centered scatter (sum (x-mu)(x-mu)^T)


@jax.jit
def _moments_update(state: _MomentsState, x: jnp.ndarray) -> _MomentsState:
    """Chan-stable streaming moments — ONE gemm per block, no eigh.

    The eigendecomposition happens once, in ``get_components``: for small D
    (W/Z spaces, D<=8k) this replaces the per-block SVD of the sklearn-mirror
    path with pure MXU work, and is *exact* covariance PCA rather than an
    incremental approximation (SURVEY.md §7: "a plain distributed
    moments+eigh estimator suffices" for the samples-are-latents path).
    """
    n = jnp.asarray(float(x.shape[0]), x.dtype)
    batch_mean = jnp.mean(x, axis=0)
    xc = x - batch_mean
    gram = mm(xc.T, xc)
    new_count = state.count + n
    delta = batch_mean - state.mean
    new_mean = state.mean + delta * (n / new_count)
    new_m2 = state.m2 + gram + jnp.outer(delta, delta) * (state.count * n / new_count)
    return _MomentsState(new_count, new_mean, new_m2)


@jax.jit
def _all_finite(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(jnp.isfinite(x))


@jax.jit
def _proj_variance(state: _MomentsState, dirs: jnp.ndarray) -> jnp.ndarray:
    """Population variance of the stream's projections onto ``dirs``
    [k, D] rows — exact from the centered scatter: Var(d.x) = d M2 d / n."""
    return jnp.sum(mm(dirs, state.m2) * dirs, axis=1) / state.count


@jax.jit
def _moments_evals(state: _MomentsState) -> jnp.ndarray:
    """All eigenvalues of the fitted covariance, descending."""
    cov = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    return jnp.linalg.eigvalsh(cov)[::-1]


@partial(jax.jit, static_argnames=("n_components", "want_rand"))
def _moments_finish_bundle(state: _MomentsState, rand_mean, rand_m2, rand_n,
                           *, n_components: int, want_rand: bool):
    """Everything a samples-are-latents run reads after the fit, in ONE
    program: components (device), then a [4, c] stats pack — stdev,
    var_ratio, lat_stdev (exact projection stdev of the components over
    the full stream), random-direction stdev baselines.  One dispatch +
    one small readback replaces four round trips (measured ~0.13 s of the
    0.56 s steady 1M W leg through the relay)."""
    comp, stdev, ratio = _moments_finish(state, n_components=n_components)
    # components are unit rows, so they ARE the latent directions: their
    # full-stream projection variance is the W-space lat_stdev.
    pv = jnp.sum(mm(comp, state.m2) * comp, axis=1) / state.count
    rstd = (jnp.sqrt(jnp.maximum(rand_m2 / jnp.maximum(rand_n, 1.0), 0.0))
            if want_rand else jnp.zeros_like(stdev))
    stats = jnp.stack([stdev, ratio, jnp.sqrt(jnp.maximum(pv, 0.0)), rstd])
    return comp, stats


@partial(jax.jit, static_argnames=("n_components",))
def _moments_finish(state: _MomentsState, *, n_components: int):
    """(components [c, D], stdev [c], var_ratio [c]) from the moments."""
    from ganspace_tpu.estimators.utils import svd_flip_vt, topk_eigh_desc
    cov = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    evals, evecs = topk_eigh_desc(cov)
    evals = jnp.maximum(evals, 0.0)
    comp = svd_flip_vt(evecs[:, :n_components].T)
    var_ratio = evals[:n_components] / jnp.maximum(jnp.sum(evals), 1e-30)
    return comp, jnp.sqrt(evals[:n_components]), var_ratio


class IPCAEstimator:
    """Protocol-compatible with reference ``IPCAEstimator`` (``estimators.py:55-81``)."""

    #: feature dims up to this use the exact-moments fast path (D x D scatter
    #: in HBM: 8192^2 f32 = 256 MB); beyond it, the sklearn-mirror updates.
    MOMENTS_MAX_D = 8192

    #: Adaptive-refine policy thresholds, calibrated on a 40-case spectrum
    #: sweep (flat / exp r∈[0.8,0.995] / power-law / plateau-at-cut /
    #: noise-floor / degenerate-pair shapes x 3 seeds; docs/PERFORMANCE.md
    #: "adaptive refine").  Every calibration case with single-pass
    #: min-cosine >= 0.99 vs exact PCA had sketch_tail_frac <= 0.0099; every
    #: failure had >= 0.0159 — except spectra with a plateau straddling the
    #: component cut (tail_frac 0.0093, min-cos 0.91), which the eigengap
    #: guard catches (plateau: rel gap 0.0024 vs >= 0.029 for all safe skips).
    REFINE_TAIL_FRAC = 0.012
    REFINE_MIN_GAP = 0.02

    def __init__(self, n_components: int, whiten: bool = False,
                 feature_sharding=None, mode: str = "auto",
                 refine: Optional[str] = None):
        self.n_components = n_components
        # Refine policy is INSTANCE state, fixed at construction: ``refine``
        # ("auto" / "always"/"1" / "never"/"0") wins, else the
        # GANSPACE_IPCA_REFINE env var is read ONCE here — ambient env
        # mutations after construction no longer change estimator behavior
        # mid-fit (ADVICE/VERDICT r4: call-time env reads were a library
        # footgun and made provenance the only reliable record).
        import os
        self.refine_policy = (refine if refine is not None
                              else os.environ.get("GANSPACE_IPCA_REFINE",
                                                  "auto")).strip().lower()
        self.whiten = whiten  # reference always runs whiten=False
        self.batch_support = True
        self.n_samples_seen_ = 0
        self._state: Optional[_IPCAState] = None
        self._moments: Optional[_MomentsState] = None
        self._nystrom: Optional[_NystromState] = None
        self._omega: Optional[jnp.ndarray] = None
        self._refined = False
        self._pre_refine = None  # first-pass snapshot while a refine runs
        #: Set by should_refine(): True when the adaptive policy (or an
        #: explicit never) skipped the second sweep, False when a refine ran,
        #: None while undecided / not applicable (moments & sklearn tiers).
        self.refine_skipped = None
        #: Convergence statistics the auto decision was made from.
        self.refine_stats = None
        #: What the AUTO policy decided/would decide (True = skip-eligible),
        #: independent of whether a refine actually ran — the signal callers
        #: persist to choose next run's pass-1 precision.  None = undecided.
        self.policy_would_skip = None
        # Regression cross-moments piggybacked on the fit sweeps
        # (fit_stream with_reg=True): (sum x z^T [D, zdim], sum z [zdim], n).
        self._reg = None
        # Random-projection moments piggybacked the same way
        # (fit_stream rand_dirs=R [c, D]): (mean Rx [c], sum-of-squared-
        # deviations M2 [c], n), Chan-combined per block INSIDE the scan.
        # Variance is shift-invariant, so the caller's centered random-
        # direction stdev baselines fall out over the FULL stream — and the
        # centered accumulation never hits the raw-moment f32 cancellation
        # (E[p]^2 can rival Var(p) along a random direction at n~1e6;
        # ADVICE r4).
        self._rand = None
        self._sharding = feature_sharding
        assert mode in ("auto", "sklearn", "moments", "nystrom")
        self.mode = mode
        # Sketch oversampling l=4c.  Single-pass, this reaches ~0.9
        # per-component cosine on real conv-tap spectra; with the refine
        # pass (begin_refine — one power iteration over the regenerated
        # stream, the production default) every component lands >0.99 vs
        # exact PCA (measured at D=131072, tests/test_nystrom_production.py).
        self.oversample = max(4 * n_components, n_components + 32)
        # sklearn default batch size used by fit() (estimators.py:59)
        self.batch_size = max(100, 2 * n_components)

    def _use_moments(self, d: int) -> bool:
        if self.mode == "moments":
            return True
        if self.mode != "auto":
            return False
        import os
        return d <= int(os.environ.get("GANSPACE_IPCA_MOMENTS_MAX_D",
                                       self.MOMENTS_MAX_D))

    def _use_nystrom(self, d: int) -> bool:
        if self.mode == "nystrom":
            return True
        # auto: big-D streams use the single-pass sketch — the sklearn-mirror
        # tier's per-block Gram eigh is minutes/block at nb=4096 on TPU.
        return self.mode == "auto" and not self._use_moments(d)

    def get_param_str(self) -> str:
        return "ipca_c{}{}".format(self.n_components, "_w" if self.whiten else "")

    # -- streaming ----------------------------------------------------------
    def _shard_for(self, ndim: int):
        """Rank-matched feature sharding (state vectors are rank 1,
        components/batches rank 2; all shard along the trailing D axis)."""
        if self._sharding is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = self._sharding.spec[-1]
        return NamedSharding(self._sharding.mesh,
                             P(*([None] * (ndim - 1) + [axis])))

    def _placed(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self._shard_for(x.ndim)
        return jax.device_put(x, s) if s is not None else x

    def _placed_rows(self, x: jnp.ndarray) -> jnp.ndarray:
        """Shard axis 0 (for [D, l] sketch tensors whose feature axis leads)."""
        if self._sharding is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = self._sharding.spec[-1]
        return jax.device_put(
            x, NamedSharding(self._sharding.mesh,
                             P(*((axis,) + (None,) * (x.ndim - 1)))))

    def _sketch_factor_cached(self):
        """Memoized _sketch_factor for the CURRENT sketch state: the
        should_refine -> begin_refine -> get_components sequence reads the
        same unchanged sketch, so the [D, l] gemms + host eighs run once.
        Keyed by buffer identity (strong ref held, so no id recycling)."""
        c = getattr(self, "_sf_cache", None)
        if c is not None and c[0] is self._nystrom.y:
            return c[1]
        out = _sketch_factor(self._nystrom, self._omega)
        self._sf_cache = (self._nystrom.y, out)
        return out

    def sketch_convergence(self) -> Optional[dict]:
        """Convergence statistics of the first-pass sketch, from its own
        l x l spectrum (no extra data pass):

        * ``sketch_tail_frac`` — centered energy NOT captured by the l-dim
          sketch subspace, as a fraction of the exact total.  Measures how
          much of the spectrum the sketch has resolved; a flat spectrum
          leaves ~1-l/D unresolved, a fast-decaying one ~0.
        * ``min_rel_gap_topc`` — smallest relative eigengap among the top-c
          estimated eigenvalues; guards against plateaus straddling the
          component cut, where subspace rotation error hides inside a tiny
          tail fraction.

        None when no sketch is live or it has seen no data."""
        if self._nystrom is None or float(self._nystrom.count) == 0.0:
            return None
        _, evals, _, total = self._sketch_factor_cached()
        ev = np.maximum(np.asarray(evals, np.float64), 1e-30)
        c = min(self.n_components, len(ev))
        # Gaps among pairs (0,1)..(c-1,c): the CUT-BOUNDARY pair (c-1, c)
        # is included — a degenerate pair straddling the component cut is
        # exactly the rotation hazard this guard exists for (with l >= 2c
        # the sketch always estimates ev[c]).
        hi = min(c + 1, len(ev))
        return {
            "sketch_tail_frac":
                float(max(total - float(ev.sum()), 0.0) / max(total, 1e-30)),
            "min_rel_gap_topc":
                float(np.min(1.0 - ev[1:hi] / ev[:hi - 1])) if hi > 1 else 1.0,
        }

    def should_refine(self) -> bool:
        """Decide whether the sketch tier's second data pass is worth a full
        extra synthesis sweep (``GANSPACE_IPCA_REFINE``: ``auto`` default /
        ``1``/``always`` / ``0``/``never``).

        ``auto`` skips the refine sweep only when the completed first-pass
        sketch is already resolved: ``sketch_tail_frac <= 0.012`` AND
        ``min_rel_gap_topc >= 0.02`` (thresholds calibrated so every skip in
        the 40-case spectrum sweep keeps per-component min-cosine >= 0.99 vs
        exact PCA — see REFINE_TAIL_FRAC above).  Real trained-checkpoint
        conv-tap spectra decay and typically qualify; random-init plateau
        spectra do not and keep the second pass.  Records the decision in
        ``refine_skipped`` / ``refine_stats`` for provenance and bench."""
        mode = self.refine_policy
        if self._nystrom is None or self._refined:
            return False
        if mode in ("0", "never", "off", "false"):
            self.refine_skipped = True
            return False
        if mode in ("1", "always", "on", "true"):
            self.refine_skipped = False
            return True
        stats = self.sketch_convergence()
        if stats is None:
            return False
        skip = (stats["sketch_tail_frac"] <= self.REFINE_TAIL_FRAC
                and stats["min_rel_gap_topc"] >= self.REFINE_MIN_GAP)
        self.refine_skipped = bool(skip)
        self.policy_would_skip = bool(skip)
        self.refine_stats = stats
        return not skip

    def begin_refine(self, force: bool = False) -> bool:
        """Arm the sketch tier's second data pass (power iteration).

        Returns True when re-streaming the SAME activation stream through
        ``fit_partial`` will improve the estimate: the test matrix becomes
        the orthonormal range of the first-pass sketch and accumulation
        restarts.  Callers with regenerable streams (seeded latents — zero
        storage cost, one extra synthesis sweep) should gate the sweep on
        ``should_refine()`` — the adaptive policy that skips it when the
        first-pass sketch is already converged; the moments and sklearn
        tiers never need it.  ``refine="never"`` (or GANSPACE_IPCA_REFINE=0
        at construction) forces the single-pass sketch everywhere —
        except under ``force=True`` (the mandatory full-precision pass of
        the reduced-precision-first-pass contract, see fit_stream)."""
        mode = self.refine_policy
        if self._nystrom is None or self._refined:
            return False
        if not force and mode in ("0", "never", "off", "false"):
            return False
        if self.refine_skipped is None:
            self.refine_skipped = False   # direct callers bypass the policy
        d, l = self._nystrom.y.shape
        # Snapshot the completed first-pass sketch so an interrupted refine
        # sweep can fall back to it (abort_refine) instead of saving a
        # strictly-worse partial second pass.
        self._pre_refine = (self._nystrom, self._omega, self.n_samples_seen_,
                            self._reg, self._rand)
        f, e, v, _ = self._sketch_factor_cached()
        self._omega = _range_from_factor(f, e, v)
        # Free the whitened [D, l] factor before the refine sweep runs: at
        # production shape it pins ~170 MB of HBM the second synthesis
        # pass can use (the pass-1 state itself stays alive via
        # _pre_refine for abort fallback).
        self._sf_cache = None
        self._nystrom = _NystromState(
            jnp.asarray(0.0),
            self._placed(jnp.zeros((d,), jnp.float32)),
            jnp.asarray(0.0),
            self._placed_rows(jnp.zeros((d, l), jnp.float32)))
        if self._reg is not None:
            # The refine pass streams the SAME key-derived samples: restart
            # the cross-moment accumulation so it isn't double-counted (the
            # refine-pass accumulation replaces the first pass's, which is
            # equal in exact arithmetic).
            xz, zs, _ = self._reg
            self._reg = (jnp.zeros_like(xz), jnp.zeros_like(zs), 0)
        if self._rand is not None:
            # Same restart logic as _reg: the refine pass re-streams the
            # identical key-derived samples.
            ps, ps2, _ = self._rand
            self._rand = (jnp.zeros_like(ps), jnp.zeros_like(ps2), 0)
        self.n_samples_seen_ = 0
        self._refined = True
        return True

    def abort_refine(self) -> None:
        """Undo an in-progress refine pass (Ctrl-C mid-sweep): restore the
        full first-pass sketch, which any partial second pass is strictly
        worse than.  No-op unless ``begin_refine`` armed a pass that hasn't
        been completed/cleared."""
        snap = getattr(self, "_pre_refine", None)
        if snap is None:
            return
        (self._nystrom, self._omega, self.n_samples_seen_, self._reg,
         self._rand) = snap
        self._pre_refine = None
        self._refined = False
        self.refine_skipped = None   # the armed pass never completed

    def _maybe_init_tier(self, d: int) -> None:
        """Allocate the moments/sketch state on first contact with the
        feature dimensionality (no-op when a tier is already live or the
        sklearn-mirror tier applies)."""
        if not (self._state is None and self._moments is None
                and self._nystrom is None):
            return
        if self._use_moments(d):
            self._moments = _MomentsState(
                jnp.asarray(0.0),
                self._placed(jnp.zeros((d,), jnp.float32)),
                self._placed(jnp.zeros((d, d), jnp.float32)))
        elif self._use_nystrom(d):
            l = min(self.oversample, d)
            # [D, l] tensors carry the feature axis FIRST: shard rows.
            self._omega = self._placed_rows(jax.random.normal(
                jax.random.PRNGKey(0xA5), (d, l), jnp.float32))
            self._nystrom = _NystromState(
                jnp.asarray(0.0),
                self._placed(jnp.zeros((d,), jnp.float32)),
                jnp.asarray(0.0),
                self._placed_rows(jnp.zeros((d, l), jnp.float32)))

    def fit_partial(self, x) -> bool:
        x = jnp.asarray(x, dtype=jnp.float32)
        n, d = x.shape
        if n < self.n_components:
            print(f"\nIPCA error: n_samples={n} < n_components={self.n_components}")
            return False
        x = self._placed(x)
        self._maybe_init_tier(d)
        if self._moments is not None:
            self._moments = _moments_update(self._moments, x)
            self.n_samples_seen_ += n
            return True
        if self._nystrom is not None:
            self._nystrom = _nystrom_update(self._nystrom, x, self._omega)
            self.n_samples_seen_ += n
            return True
        first = self._state is None
        if first:
            zeros_d = jnp.zeros((d,), jnp.float32)
            zeros_c = jnp.zeros((self.n_components,), jnp.float32)
            self._state = _IPCAState(zeros_d, zeros_d,
                                     jnp.zeros((self.n_components, d), jnp.float32),
                                     zeros_c, zeros_c, zeros_c)
            if self._sharding is not None:
                self._state = _IPCAState(
                    *(self._placed(a) if a.ndim and a.shape[-1] == d else a
                      for a in self._state))
        self._state = _partial_fit(
            self._state, x, jnp.asarray(float(self.n_samples_seen_), jnp.float32),
            n_components=self.n_components, first=first)
        self.n_samples_seen_ += n
        return True

    def fit_partial_blocks(self, blocks) -> bool:
        """Fused streaming update over ``blocks`` [k, n, D] in one device
        dispatch.  On the sklearn-mirror tier the scan is bit-identical to
        k ``fit_partial`` calls in order; the moments/sketch tiers reduce
        the concatenation instead (associative update — mathematically
        equivalent, fp-reassociated)."""
        blocks = jnp.asarray(blocks, dtype=jnp.float32)
        k, n, d = blocks.shape
        if n < self.n_components:
            print(f"\nIPCA error: n_samples={n} < n_components={self.n_components}")
            return False
        if (self._moments is not None or self._nystrom is not None
                or (self._state is None
                    and (self._use_moments(d) or self._use_nystrom(d)))):
            # Moments/sketches are associative: stacked blocks reduce in one
            # pair of gemms over the concatenation.
            return self.fit_partial(blocks.reshape(k * n, d))
        if self._state is None:
            if not self.fit_partial(blocks[0]):
                return False
            blocks = blocks[1:]
            k -= 1
        if k == 0:
            return True
        blocks = self._placed(blocks) if self._sharding is not None else blocks
        self._state = _partial_fit_scan(
            self._state, blocks,
            jnp.asarray(float(self.n_samples_seen_), jnp.float32),
            n_components=self.n_components)
        self.n_samples_seen_ += k * n
        return True

    #: token -> (scan_chunk jit fn, wrapped block_fn): fresh closures would
    #: retrace the scanned program on EVERY fit (measured 0.5 s warm /
    #: 90 s first compile per run of the 1M W leg).  Callers that can attest
    #: "same program" (model/layer/shapes/flags) pass cache_token and the
    #: compiled scan is reused across estimator instances.  Bounded: one
    #: entry per distinct workload in the process.
    _scan_cache: dict = {}
    #: token -> eval_shape result of the stream probe (same contract).
    _probe_cache: dict = {}

    def _build_scan(self, block_fn, tier, with_reg, want_rand, chunk,
                    nb, d, cache_token):
        """(scan_chunk, block_fn) for one stream program — cache-reused by
        token (see fit_stream's cache_token contract)."""
        tok = (None if cache_token is None else
               (cache_token, tier, with_reg, want_rand, chunk,
                nb, d, self.n_components))
        cached = self._scan_cache.get(tok) if tok is not None else None
        if cached is not None:
            return cached

        @partial(jax.jit, static_argnames=("k",))
        def scan_chunk(state, reg, rand, rn0, omega, rdirs, i0, key, consts,
                       *, k):
            def body(carry, i):
                st, *acc = carry
                out = block_fn(consts, jax.random.fold_in(key, i0 + i))
                x, z = out if with_reg else (out, None)
                new = (_moments_update(st, x) if tier == "moments"
                       else _nystrom_update(st, x, omega))
                acc_out = []
                if with_reg:
                    rxz, rzs = acc[0]
                    acc_out.append((rxz + mm(x.T, z),
                                    rzs + jnp.sum(z, axis=0)))
                if want_rand:
                    # Chan parallel combine per block: centered accumulation
                    # (never the raw-moment E[p^2]-E[p]^2 cancellation).
                    pm, pm2 = acc[-1]
                    p = mm(x, rdirs.T)                      # [nb, c]
                    bm = jnp.mean(p, axis=0)
                    bm2 = jnp.sum(jnp.square(p - bm), axis=0)
                    nb_f = jnp.float32(p.shape[0])
                    # samples already combined = rn0 (before this chunk)
                    # + i full blocks within it (i is the LOCAL scan index)
                    cnt = rn0 + i.astype(jnp.float32) * nb_f
                    newc = cnt + nb_f
                    delta = bm - pm
                    acc_out.append((pm + delta * (nb_f / newc),
                                    pm2 + bm2 + jnp.square(delta)
                                    * (cnt * nb_f / newc)))
                return (new, *acc_out), None
            init = ((state,) + ((reg,) if with_reg else ())
                    + ((rand,) if want_rand else ()))
            out, _ = jax.lax.scan(body, init, jnp.arange(k))
            state = out[0]
            reg = out[1] if with_reg else reg
            rand = out[-1] if want_rand else rand
            return state, reg, rand

        if tok is not None:
            self._scan_cache[tok] = (scan_chunk, block_fn)
        return scan_chunk, block_fn

    def fit_stream(self, block_fn, n_blocks: int, key, *, chunk: int = 16,
                   consts=None, with_reg: bool = False,
                   rand_dirs=None, cache_token=None,
                   refine_stream=None) -> bool:
        """Fused fit over a key-derived block stream.

        ``block_fn(key) -> [nb, D]`` must be pure/traceable (generation +
        synthesis up to the tap).  Block ``i`` uses ``fold_in(key, i)``.
        With ``consts`` (a pytree of model weights) the signature is
        ``block_fn(consts, key)`` and the weights enter the scanned program
        as OPERANDS — closure-captured weights would be baked into the
        module as constants, re-serialized on every trace (22 s for
        StyleGAN2-1024) and bloating the persistent-cache entry by the full
        parameter size.
        Each scanned chunk runs ``chunk`` blocks of synthesis + update in ONE
        dispatch; the tail reuses the eager per-block path.  Only the
        moments/nystrom tiers stream this way (their updates are
        order-independent); the sklearn-mirror tier returns False and the
        caller falls back to the batched loop.

        ``with_reg=True`` changes the block contract to
        ``block_fn(consts, key) -> (x [nb, D], z [nb, zdim])`` and
        additionally accumulates the latent-regression cross-moments
        ``sum x z^T`` / ``sum z`` inside the SAME scan — the raw moments the
        latent regression needs (reference ``decomposition.py:77-139``),
        making its separate synthesis sweep unnecessary (read them back via
        ``reg_moments``).  Raw moments are component-independent, so they
        are exact no matter what estimate the tier finally produces.

        ``rand_dirs`` ([c, D], unit rows) additionally accumulates Chan-
        stable mean/M2 of the projections ``x @ rand_dirs.T`` inside the
        scan (read back via ``rand_moments``).  Variance is
        shift-invariant, so the caller's centered random-direction stdev
        baselines (reference ``decomposition.py:310-316``) fall out of
        these over the FULL stream — replacing a dedicated synthesis
        block + [nb, D] centering with one [c]-sized readback.

        ``cache_token``: hashable workload identity (model/layer/shape/
        flag string).  When provided, the jitted scan program — AND the
        block_fn traced into it — are reused from a class-level cache for
        subsequent fits with the same token, eliminating the per-fit
        retrace (~0.5 s warm on the 1M W leg).  Callers must guarantee a
        token uniquely determines the block_fn's STRUCTURE (weights ride
        in ``consts`` as operands and may differ; mesh layout, shapes,
        dtypes, and all flags must be part of the token).

        ``refine_stream``: ``(block_fn2, consts2, cache_token2)`` — a
        DIFFERENT program for the sketch tier's second pass, which then
        runs UNCONDITIONALLY (the adaptive skip is bypassed; its decision
        is still computed and recorded in ``policy_would_skip`` /
        ``refine_stats``).  This is the reduced-precision-first-pass
        contract: pass 1 may stream bf16-synthesized activations to find
        the subspace cheaply, and the mandatory full-precision refine pass
        determines the final estimate — measured min per-component cosine
        0.99998 vs an all-f32 two-pass at D=131072 (the power iteration on
        exact data washes out the sketch basis's rounding).  Both block
        fns must derive the SAME sample stream from the key.
        """
        if n_blocks <= 0:
            return True
        if consts is None:
            consts, block_fn = (), (lambda _c, k, _fn=block_fn: _fn(k))
        # Shape-only probe: initialize the tier state WITHOUT running the
        # first block eagerly — eager synthesis executes op-by-op, and on a
        # meshed run each tiny op is its own collective program (measured:
        # XLA's 40 s cross-device rendezvous can time out under compile
        # load, aborting the process).  Everything streams through the
        # jitted scans below instead.  Tokened callers skip the re-probe
        # (tracing the synthesis for shapes costs ~60 ms per run).
        shape = (self._probe_cache.get(cache_token)
                 if cache_token is not None else None)
        if shape is None:
            shape = jax.eval_shape(block_fn, consts,
                                   jax.random.fold_in(key, 0))
            if cache_token is not None:
                self._probe_cache[cache_token] = shape
        if with_reg:
            shape, z_shape = shape
        nb, d = shape.shape
        if nb < self.n_components:
            print(f"\nIPCA error: n_samples={nb} < "
                  f"n_components={self.n_components}")
            return False
        self._maybe_init_tier(d)
        if self._moments is None and self._nystrom is None:
            return False                      # sklearn tier: no fused stream
        if with_reg and self._reg is None:
            self._reg = (self._placed_rows(
                jnp.zeros((d, z_shape.shape[1]), jnp.float32)),
                jnp.zeros((z_shape.shape[1],), jnp.float32), 0)
        want_rand = rand_dirs is not None
        if want_rand:
            # [c, D]: trailing feature axis, same sharding as batches.
            rand_dirs = self._placed(jnp.asarray(rand_dirs, jnp.float32))
            if self._rand is None:
                zc = jnp.zeros((rand_dirs.shape[0],), jnp.float32)
                self._rand = (zc, zc, 0)

        tier = "moments" if self._moments is not None else "nystrom"

        # The scanned program's carry holds ONLY live accumulators — no
        # dead placeholder zeros.  Everything run-specific (PRNG key, block
        # offset, weights, accumulator values) enters as an OPERAND so the
        # program can be reused across fits via the class-level scan cache;
        # the closure captures only token-determined structure (block_fn,
        # tier, flags).
        scan_chunk, block_fn = self._build_scan(
            block_fn, tier, with_reg, want_rand, chunk, nb, d, cache_token)
        refine = None
        if refine_stream is not None and tier == "nystrom":
            bf2, consts2, tok2 = refine_stream
            if consts2 is None:
                consts2, bf2 = (), (lambda _c, k, _fn=bf2: _fn(k))
            refine = (self._build_scan(bf2, tier, with_reg, want_rand,
                                       chunk, nb, d, tok2)[0], consts2)
        return self._run_stream(scan_chunk, n_blocks, nb, key, chunk,
                                consts, with_reg, want_rand, rand_dirs,
                                refine=refine)

    def _run_stream(self, scan_chunk, n_blocks, nb, key, chunk,
                    consts, with_reg, want_rand, rand_dirs,
                    refine=None) -> bool:
        """Drive a (possibly cache-reused) scanned stream program: the main
        pass, then — sketch tier only — the adaptive refine pass (or the
        MANDATORY refine program when ``refine=(scan2, consts2)``)."""
        tier = "moments" if self._moments is not None else "nystrom"

        def run_pass(scan, cs) -> None:
            # Full chunks share one scan program; the tail gets its own
            # static length (one extra compile, disk-cached) — no block is
            # ever synthesized eagerly.
            i = 0
            while i < n_blocks:
                k = min(chunk, n_blocks - i)
                reg_in = self._reg[:2] if with_reg else ()
                rand_in = self._rand[:2] if want_rand else ()
                rn0 = jnp.float32(self._rand[2]) if want_rand else 0
                rdirs = rand_dirs if want_rand else 0
                if tier == "moments":
                    self._moments, reg_out, rand_out = scan(
                        self._moments, reg_in, rand_in, rn0, 0, rdirs,
                        jnp.int32(i), key, cs, k=k)
                else:
                    self._nystrom, reg_out, rand_out = scan(
                        self._nystrom, reg_in, rand_in, rn0, self._omega,
                        rdirs, jnp.int32(i), key, cs, k=k)
                if with_reg:
                    self._reg = (*reg_out, self._reg[2] + k * nb)
                if want_rand:
                    self._rand = (*rand_out, self._rand[2] + k * nb)
                self.n_samples_seen_ += k * nb
                i += k

        run_pass(scan_chunk, consts)
        if self._nystrom is None:
            return True
        if refine is not None:
            # Reduced-precision-first-pass contract: the full-precision
            # refine pass is LOAD-BEARING (it determines the estimate), so
            # the adaptive skip is bypassed — but its decision is still
            # computed and recorded for provenance/the caller's sentinel.
            stats = self.sketch_convergence()
            self.refine_stats = stats
            self.policy_would_skip = bool(
                stats is not None
                and stats["sketch_tail_frac"] <= self.REFINE_TAIL_FRAC
                and stats["min_rel_gap_topc"] >= self.REFINE_MIN_GAP)
            if self.begin_refine(force=True):
                self.refine_skipped = False
                run_pass(*refine)
                # The refine COMPLETED: drop the fallback snapshot so a
                # later abort_refine (e.g. an interrupt landing in the
                # caller's post-fit work, still inside its try) cannot
                # roll the finished pass back to the first-pass sketch.
                self._pre_refine = None
            return True
        # Sketch tier: the key-derived stream is regenerable, so a second
        # sweep buys a power iteration on the scatter — but only when the
        # adaptive policy says the first-pass sketch isn't already resolved
        # (should_refine; skipping saves the whole second synthesis sweep,
        # ~1.4x end-to-end on decaying-spectrum conv taps).
        if self.should_refine() and self.begin_refine():
            run_pass(scan_chunk, consts)
            self._pre_refine = None      # completed: see above
        return True

    def reg_moments(self):
        """Latent-regression cross-moments accumulated by
        ``fit_stream(with_reg=True)``: ``(sum x z^T [D, zdim],
        sum z [zdim], n)`` over the last completed pass's samples —
        or None when no fused stream carried them."""
        if self._reg is None or self._reg[2] == 0:
            return None
        return self._reg

    def finish_latent_bundle(self, rand_moments=None):
        """Samples-are-latents finish: ``(components [c, D] device,
        stats np [4, c])`` with rows (stdev, var_ratio, lat_stdev,
        random_stdevs — zeros unless ``rand_moments`` is passed).  One
        dispatch + one readback (see ``_moments_finish_bundle``); None off
        the moments tier."""
        if self._moments is None or float(self._moments.count) == 0.0:
            return None
        if not bool(_all_finite(self._moments.m2)):
            raise FloatingPointError(
                "non-finite moment statistics: the activation stream "
                "contains NaN/Inf (eigh on non-finite input crashes the "
                "TPU runtime, so the factorization is refused)")
        self._pre_refine = None
        want_rand = rand_moments is not None
        zc = jnp.zeros((self.n_components,), jnp.float32)
        rm, rm2, rn = (rand_moments if want_rand else (zc, zc, 0))
        comp, stats = _moments_finish_bundle(
            self._moments, rm, rm2, jnp.float32(rn),
            n_components=self.n_components, want_rand=want_rand)
        return comp, np.asarray(stats)

    def component_spectrum(self) -> Optional[np.ndarray]:
        """Descending eigenvalue estimates of the fitted scatter, at least
        ``n_components + 1`` of them where the tier resolves that many —
        the input of per-component sensitivity bounds (bf16 datapath
        grading).  Moments tier: exact covariance eigenvalues; sketch
        tier: the l-dim Nyström estimates.  None on the sklearn tier
        (its singular values stop at c) or before any data."""
        if self._moments is not None and float(self._moments.count) > 0.0:
            ev = np.asarray(_moments_evals(self._moments), np.float64)
            return np.maximum(ev, 0.0)
        if self._nystrom is not None and float(self._nystrom.count) > 0.0:
            # reuses the factor get_components just computed (memoized)
            _, ev, _, _ = self._sketch_factor_cached()
            return np.maximum(np.asarray(ev, np.float64), 0.0)
        return None

    def projected_variance(self, dirs) -> Optional[np.ndarray]:
        """Exact population variance of the FULL stream's projections onto
        ``dirs`` [k, D], from the moments tier's centered scatter — the
        closed form behind the W-space ``lat_stdev`` (reference
        ``decomposition.py:324-329`` re-synthesizes 5000 samples for the
        same statistic; here it is one [k]-sized readback over all n
        samples).  None on the sketch/sklearn tiers."""
        if self._moments is None or float(self._moments.count) == 0.0:
            return None
        return np.asarray(_proj_variance(
            self._moments, self._placed(jnp.asarray(dirs, jnp.float32))))

    def rand_moments(self):
        """Random-projection moments accumulated by
        ``fit_stream(rand_dirs=R)``: ``(mean Rx [c], M2 [c], n)`` with
        ``M2`` the Chan sum of squared deviations (``Var = M2/n``), over
        the last completed pass's samples — or None when no fused stream
        carried them."""
        if self._rand is None or self._rand[2] == 0:
            return None
        return self._rand

    def fit(self, x):
        x = np.asarray(x)
        for i in range(0, x.shape[0], self.batch_size):
            chunk = x[i:i + self.batch_size]
            if chunk.shape[0] >= self.n_components:
                self.fit_partial(chunk)

    # -- results ------------------------------------------------------------
    @property
    def mean_(self) -> np.ndarray:
        if self._moments is not None:
            return np.asarray(self._moments.mean)
        if self._nystrom is not None:
            return np.asarray(self._nystrom.s / self._nystrom.count)
        return np.asarray(self._state.mean)

    @property
    def components_(self) -> np.ndarray:
        return self.get_components()[0]

    def get_components(self, device: bool = False):
        """Final (components [c, D], stdev [c], var_ratio [c]).

        ``device=True`` keeps the [c, D] components as a device array —
        for big-D taps that's tens of MB the caller may never need on the
        host (regression/projections are device math); the stdev/var_ratio
        vectors come back as numpy either way."""
        # Consuming the estimate finalizes any completed refine pass: the
        # fallback snapshot must not outlive it (abort_refine would
        # otherwise revert a GOOD refined state later).
        self._pre_refine = None
        out = lambda c: jnp.asarray(c) if device else np.asarray(c)  # noqa: E731
        if self._moments is not None:
            if not bool(_all_finite(self._moments.m2)):
                raise FloatingPointError(
                    "non-finite moment statistics: the activation stream "
                    "contains NaN/Inf (eigh on non-finite input crashes the "
                    "TPU runtime, so the factorization is refused)")
            comp, stdev, var_ratio = _moments_finish(
                self._moments, n_components=self.n_components)
            # one [2, c] readback instead of two round trips
            stats = np.asarray(jnp.stack([stdev, var_ratio]))
            return out(comp), stats[0], stats[1]
        if self._nystrom is not None:
            f, e, v, total = self._sketch_factor_cached()
            comp, stdev, var_ratio = _finish_from_factor(
                f, e, v, total, float(self._nystrom.count),
                self.n_components)
            return out(comp), np.asarray(stdev), np.asarray(var_ratio)
        stdev = np.sqrt(np.asarray(self._state.explained_variance))  # already sorted
        var_ratio = np.asarray(self._state.explained_variance_ratio)
        # PCA outputs are normalized
        return out(self._state.components), stdev, var_ratio
