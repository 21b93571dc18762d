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

    # Instrument the fused unit stream: wrap the device sampler and the
    # estimator's fit_partial to stamp dispatch-side boundaries, and sync
    # the moments state after the loop to split "host dispatch time" from
    # "device drain".
    from ganspace_tpu.estimators.ipca import IPCAEstimator

    orig_sample = type(model).sample_latents_device
    orig_fitp = IPCAEstimator.fit_partial
    orig_getc = IPCAEstimator.get_components

    def sample_latents_device(self, n_batches, batch_size, seed, sharding=None):
        stamp(f"gen_dispatch:enter[{n_batches}x{batch_size}]")
        out = orig_sample(self, n_batches, batch_size, seed, sharding)
        stamp("gen_dispatch:done")
        return out

    def fit_partial(self, x):
        ok = orig_fitp(self, x)
        stamp(f"fit_partial:dispatched[{x.shape[0]}]")
        return ok

    def get_components(self, device=False):
        jax.block_until_ready(self._moments or self._state)
        stamp("fit:device_drained")
        out = orig_getc(self, device=device)
        stamp("get_components:done")
        return out

    type(model).sample_latents_device = sample_latents_device
    IPCAEstimator.fit_partial = fit_partial
    IPCAEstimator.get_components = get_components

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
