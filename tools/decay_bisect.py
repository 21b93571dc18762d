"""Stage-isolated repro harness for the conv-tap decay TPU-worker crash.

``BENCH_r04.json`` recorded ``convtap_decay_error: UNAVAILABLE: TPU worker
process crashed`` — the third crash signature in the decaying-spectrum
fused-scan path (see bench.py:302-324, estimators/ipca.py:628-631 for the
two prior mitigations).  This harness runs ONE candidate program per
process so the crashing stage can be identified by elimination:

    python tools/decay_bisect.py <stage>

Stages (each = fused decay-shaped fit stream + the named tail):

    scan      fused pass only (REFINE=never, no spectrum/finish programs)
    spectrum  scan + sketch_convergence (_nystrom_spectrum: chol+eigvalsh)
    finish    scan + get_components (_nystrom_finish: chol+eigh+gemm)
    auto      scan + adaptive policy + finish   (the bench's timed leg)
    always    scan + forced refine (+_nystrom_range) + second pass + finish
    full      the complete bench leg (_bench_convtap_decay, reps from env)

Env: GANSPACE_BENCH_CONVTAP_N (default 50000), DECAY_DTYPE=float32|bfloat16.

Exit status: 0 = stage completed; nonzero/killed = crash reproduced here.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ganspace_tpu.config import Config
    from ganspace_tpu.models import get_instrumented_model
    from ganspace_tpu.ops.precision import synth_dtype

    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="convs.2",
                 estimator="ipca", components=80, n=1000)
    inst = get_instrumented_model(cfg, use_w=False)
    inst.model.use_z()
    model = inst.model

    nb = int(os.environ.get("GANSPACE_BENCH_DECAY_NB", 4096))
    tap = os.environ.get("GANSPACE_BENCH_CONVTAP_LAYER", "convs.2")
    dtype_name = os.environ.get("DECAY_DTYPE", "float32")
    if dtype_name == "bfloat16":
        with synth_dtype("bfloat16"):
            fn, pack = model.pure_acts_fn_p(tap)
        out_dtype = jnp.bfloat16
    else:
        fn, pack = model.pure_acts_fn_p(tap)
        out_dtype = jnp.float32
    zdim = model.get_latent_dims()
    d_dim = jax.eval_shape(
        fn, pack, jax.ShapeDtypeStruct((nb, zdim), jnp.float32)).shape[1]
    r = float(os.environ.get("GANSPACE_BENCH_DECAY_R", 0.96))
    shaping = jnp.asarray(np.maximum(r ** np.arange(d_dim), 1e-4)
                          .astype(np.float32))

    def block_fn(consts, key):
        pk, shape_vec = consts
        z = jax.random.normal(key, (nb, zdim), jnp.float32)
        x = fn(pk, z).astype(jnp.float32) * shape_vec
        return x.astype(out_dtype)

    return model, block_fn, (pack, shaping), nb, d_dim


def run_stage(stage: str) -> None:
    import jax

    from ganspace_tpu.estimators import get_estimator

    n = int(os.environ.get("GANSPACE_BENCH_CONVTAP_N", 50_000))
    c = 80
    model, block_fn, consts, nb, d_dim = build()
    n_blocks = -(-n // nb)
    print(f"[bisect] stage={stage} D={d_dim} n_blocks={n_blocks} "
          f"dtype={os.environ.get('DECAY_DTYPE', 'float32')}", flush=True)

    if stage == "full":
        import bench
        out = bench._bench_convtap_decay(model, 1)
        print("[bisect] full leg OK:", out, flush=True)
        return

    mode = {"scan": "never", "spectrum": "never", "finish": "never",
            "range": "never", "refine_scan": "never",
            "auto": "auto", "always": "always"}[stage]
    os.environ["GANSPACE_IPCA_REFINE"] = mode
    est = get_estimator("ipca", c)
    key = jax.random.PRNGKey(5)
    t0 = time.perf_counter()
    assert est.fit_stream(block_fn, n_blocks, key, consts=consts)
    jax.block_until_ready(est._nystrom.y)
    print(f"[bisect] fit stream done in {time.perf_counter() - t0:.2f}s "
          f"(refine_skipped={est.refine_skipped})", flush=True)

    if stage in ("range", "refine_scan"):
        import numpy as np

        from ganspace_tpu.estimators.ipca import _nystrom_range
        q = _nystrom_range(est._nystrom, est._omega)
        jax.block_until_ready(q)
        qn = np.asarray(q)
        tiny = np.abs(qn[qn != 0])
        print(f"[bisect] range OK: Q {qn.shape} nan={np.isnan(qn).sum()} "
              f"inf={np.isinf(qn).sum()} min|.|={tiny.min():.3e} "
              f"denormal={(tiny < 1.1754944e-38).sum()}", flush=True)
        if stage == "refine_scan":
            # policy is instance state pinned at construction (r5): re-arm
            # the already-fitted estimator directly
            est.refine_policy = "always"
            assert est.begin_refine()
            est2_t0 = time.perf_counter()
            assert est.fit_stream(block_fn, n_blocks, key, consts=consts)
            jax.block_until_ready(est._nystrom.y)
            print(f"[bisect] refine pass done in "
                  f"{time.perf_counter() - est2_t0:.2f}s", flush=True)
    elif stage == "spectrum":
        stats = est.sketch_convergence()
        print(f"[bisect] spectrum OK: {stats}", flush=True)
    elif stage in ("finish", "auto", "always"):
        comp = est.get_components(device=True)[0]
        jax.block_until_ready(comp)
        import numpy as np
        print(f"[bisect] finish OK: comp norm[0]="
              f"{float(np.linalg.norm(np.asarray(comp[0]))):.4f} "
              f"stats={est.refine_stats}", flush=True)
    print(f"[bisect] stage {stage} COMPLETED", flush=True)


if __name__ == "__main__":
    run_stage(sys.argv[1] if len(sys.argv) > 1 else "full")
