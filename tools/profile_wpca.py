"""Phase-level wall-clock profile of the headline 1M-sample W-space leg.

VERDICT r4 weak #6: the steady W-PCA run (0.7 s median) sits ~6x above its
~0.1 s device-compute floor with no phase attribution.  This instruments
the production path (bench.py's W leg: StyleGAN2-FFHQ, use_w, ipca c=80,
moments tier, fused unit stream) the same way tools/profile_convtap.py
does the conv-tap leg: stamps at every fit-loop boundary plus the
pipeline's built-in ``GANSPACE_PHASE_TRACE=1`` post-fit stamps.

Run alone (one host core — concurrent CPU work skews dispatch timing):

    python tools/profile_wpca.py [n]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    os.environ["GANSPACE_PHASE_TRACE"] = "1"
    import jax

    from ganspace_tpu.config import Config
    from ganspace_tpu.decomposition import get_or_compute
    from ganspace_tpu.models import get_instrumented_model

    cfg = Config(model="StyleGAN2", output_class="ffhq", layer="style",
                 estimator="ipca", components=80, n=n, use_w=True)
    inst = get_instrumented_model(cfg, use_w=True)
    inst.model.use_w()
    model = inst.model

    # Instrument the scanned W stream (r5 path): wrap fit_stream to split
    # host dispatch time from device drain, and the bundle finish to stamp
    # its program+readback cost.  (The r4 hooks — sample_latents_device /
    # fit_partial / get_components — never fire on this path anymore.)
    from ganspace_tpu.estimators.ipca import IPCAEstimator

    orig_stream = IPCAEstimator.fit_stream
    orig_bundle = IPCAEstimator.finish_latent_bundle

    def fit_stream(self, block_fn, n_blocks, key, **kw):
        stamp(f"fit_stream:enter[{n_blocks}blk]")
        ok = orig_stream(self, block_fn, n_blocks, key, **kw)
        stamp("fit_stream:dispatched")
        jax.block_until_ready(self._moments or self._nystrom or self._state)
        stamp("fit:device_drained")
        return ok

    def finish_latent_bundle(self, rand_moments=None):
        out = orig_bundle(self, rand_moments=rand_moments)
        stamp("finish_bundle:done")
        return out

    IPCAEstimator.fit_stream = fit_stream
    IPCAEstimator.finish_latent_bundle = finish_latent_bundle

    with tempfile.TemporaryDirectory() as tmp:
        os.environ["GANSPACE_OUTPUT_DIR"] = tmp
        t0 = time.perf_counter()
        get_or_compute(cfg, inst, force_recompute=True)
        print(f"warm run: {time.perf_counter() - t0:.2f}s", flush=True)

        for rep in range(int(os.environ.get("REPS", "3"))):
            _STAMPS.clear()
            stamp("start")
            t0 = time.perf_counter()
            path = get_or_compute(cfg, inst, force_recompute=True)
            stamp("end")
            total = time.perf_counter() - t0
            print(f"\n=== rep {rep}: total {total:.3f}s ===")
            prev = _STAMPS[0][1]
            for label, t in _STAMPS[1:]:
                print(f"  {label:36s} +{t - prev:7.3f}s "
                      f"(t={t - _STAMPS[0][1]:7.3f})")
                prev = t
            print(f"  npz size: {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
