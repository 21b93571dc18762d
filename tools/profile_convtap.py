"""Phase-level wall-clock profile of the conv-tap decomposition leg.

Times the production path (bench.py's convtap leg: StyleGAN2-1024 tapped
at convs.2, D=131072, n=50k, Nystrom+refine, fused stream + fused linreg).
Fit-sweep boundaries (pass 1 vs refine pass, adaptive-refine decision) are
probed via estimator monkeypatches; the post-fit tail (components, the
regression solve, baselines, the c*D DMA, the npz write) comes from the
pipeline's built-in ``GANSPACE_PHASE_TRACE=1`` stamps.

Run alone (one host core — concurrent CPU work skews dispatch timing):

    python tools/profile_convtap.py [n]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_STAMPS: list[tuple[str, float]] = []


def stamp(label: str) -> None:
    _STAMPS.append((label, time.perf_counter()))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    os.environ["GANSPACE_PHASE_TRACE"] = "1"
    import jax

    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models import get_instrumented_model

    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="convs.2",
                 estimator="ipca", components=80, n=n)
    inst = get_instrumented_model(cfg, use_w=False)
    inst.model.use_z()

    from ganspace_tpu.estimators.ipca import IPCAEstimator

    orig_stream = IPCAEstimator.fit_stream
    orig_should = IPCAEstimator.should_refine

    def fit_stream(self, block_fn, n_blocks, key, **kw):
        stamp("fit_stream:enter")
        orig_begin = self.begin_refine

        def begin_refine(*a, **kw):
            jax.block_until_ready(self._nystrom.y)
            stamp("pass1:device_done")
            r = orig_begin(*a, **kw)
            stamp("begin_refine:done")
            return r

        self.begin_refine = begin_refine
        ok = orig_stream(self, block_fn, n_blocks, key, **kw)
        jax.block_until_ready(self._nystrom.y)
        stamp("fit_stream:device_done")
        return ok

    def should_refine(self):
        stamp("should_refine:enter")
        r = orig_should(self)
        stamp("should_refine:done")   # includes the spectrum readback sync
        return r

    IPCAEstimator.fit_stream = fit_stream
    IPCAEstimator.should_refine = should_refine

    with tempfile.TemporaryDirectory() as tmp:
        os.environ["GANSPACE_OUTPUT_DIR"] = tmp
        t0 = time.perf_counter()
        get_or_compute(cfg, inst, force_recompute=True)
        print(f"warm run: {time.perf_counter() - t0:.2f}s", flush=True)

        for rep in range(int(os.environ.get("REPS", "2"))):
            _STAMPS.clear()
            stamp("start")
            t0 = time.perf_counter()
            path = get_or_compute(cfg, inst, force_recompute=True)
            stamp("end")
            total = time.perf_counter() - t0
            print(f"\n=== rep {rep}: total {total:.2f}s "
                  f"(fit-sweep stamps below; post-fit tail printed above "
                  f"by GANSPACE_PHASE_TRACE) ===")
            prev = _STAMPS[0][1]
            for label, t in _STAMPS[1:]:
                print(f"  {label:24s} +{t - prev:7.3f}s "
                      f"(t={t - _STAMPS[0][1]:7.3f})")
                prev = t
            print(f"  npz size: {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
