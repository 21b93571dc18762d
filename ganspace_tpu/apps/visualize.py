"""Batch visualizer CLI (reference ``visualize.py``).

Loads-or-computes components, then renders:

* per-component summary grids at +-sigma for each applicable edit mode
  ('latent' vs 'activation', pruned to 'latent' only when W-space makes them
  identical — reference ``visualize.py:237-240``);
* random-direction baseline grids using the PC stdevs
  (``visualize.py:268-279``);
* N random-sample grids;
* ``--video``: per-component sweep videos (150 frames, sigma and 3*sigma),
  MP4 via ffmpeg when available, GIF otherwise.

Output tree matches the reference: ``out/{model}/{layer}/{est}/{comp,inst,summ}``
(``visualize.py:212-218``).  Grids are composed with numpy/PIL (labels in
filenames) rather than matplotlib figures.

Usage:
    python -m ganspace_tpu.apps.visualize --model StyleGAN2 --class ffhq \
        --layer style --use_w --est ipca -c 80 -n 300000 [--video]
"""

from __future__ import annotations

import datetime
import os
import sys
from os import makedirs
from pathlib import Path
from types import SimpleNamespace

import numpy as np
from PIL import Image

import jax.numpy as jnp

from ganspace_tpu.config import Config
from ganspace_tpu.decomposition import get_max_batch_size, get_or_compute, get_random_dirs
from ganspace_tpu.edit import create_strip_centered
from ganspace_tpu.models import get_instrumented_model
from ganspace_tpu.sampling import SEED_VISUALIZATION
from ganspace_tpu.utils import pad_frames, to_uint8
from ganspace_tpu.utils.video import make_mp4


def make_grid(inst, layer_key, latent, lat_mean, lat_comp, lat_stdev, act_mean,
              act_comp, act_stdev, scale=1, n_rows=10, n_cols=5,
              edit_type="latent", max_batch=None):
    """Rows of centered edit strips, one per component (reference
    ``visualize.py:79-120`` minus the matplotlib chrome)."""
    inst.remove_edits()
    rows = []
    for r in range(n_rows):
        out_batch = create_strip_centered(
            inst, edit_type, layer_key, [latent],
            act_comp[r:r + 1], lat_comp[r:r + 1], act_stdev[r], lat_stdev[r],
            act_mean, lat_mean, scale, 0, -1, n_cols,
            as_uint8=True,      # quantize on device: 4x less readback
            max_batch=max_batch)[0]
        rows.append(out_batch[:n_cols])
    inst.remove_edits()
    return rows


def save_grid_image(rows, outpath):
    strips = [np.hstack(pad_frames([np.atleast_3d(img) for img in row]))
              for row in rows]
    grid = np.vstack(strips)
    Image.fromarray(to_uint8(grid)).save(outpath)


def main(args=None):
    args = args if isinstance(args, Config) else Config().from_args(args)
    t_start = datetime.datetime.now()
    timestamp = lambda: datetime.datetime.now().strftime("%d.%m %H:%M")  # noqa: E731
    print(f"[{timestamp()}] {args.model}, {args.layer}, {args.estimator}")

    np.random.seed(0)
    layer_key = args.layer
    layer_name = layer_key

    basedir = Path(os.environ.get("GANSPACE_OUTPUT_DIR", Path.cwd()))
    outdir = basedir / "out"

    inst = get_instrumented_model(args.model, args.output_class, layer_key,
                                  use_w=args.use_w)
    model = inst.model
    # --mesh: data-parallel rendering — params replicate over the mesh and
    # every sample_np batch (grids, strips, sweeps) shards over 'data'.
    from ganspace_tpu.parallel.mesh import pipeline_mesh
    mesh = pipeline_mesh(getattr(args, "mesh_shape", None))
    if mesh is not None:
        model.place_on_mesh(mesh)
        print(f"Mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    feature_shape = inst.feature_shape[layer_key]
    latent_shape = model.get_latent_shape()
    print("Feature shape:", feature_shape)

    # Layout of activations (visualize.py:159-165)
    if len(feature_shape) != 4:  # non-spatial
        axis_mask = np.ones(len(feature_shape), dtype=np.int32)
    else:
        axis_mask = np.array([0, 1, 1, 1])  # whole activation volume
    sample_shape = np.array(feature_shape) * axis_mask
    sample_shape[sample_shape == 0] = 1

    dump_name = get_or_compute(args, inst)
    data = np.load(dump_name, allow_pickle=False)
    t = SimpleNamespace(
        X_comp=jnp.asarray(data["act_comp"]),
        X_global_mean=jnp.asarray(data["act_mean"]),
        X_stdev=jnp.asarray(data["act_stdev"]),
        Z_comp=jnp.asarray(data["lat_comp"]),
        Z_global_mean=jnp.asarray(data["lat_mean"]),
        Z_stdev=jnp.asarray(data["lat_stdev"]),
    )
    x_var_ratio = data["var_ratio"]
    n_comp = data["act_comp"].shape[0]
    cache_device_rng = None
    if "_meta" in data.files:
        import json as _json
        try:
            _meta = _json.loads(bytes(data["_meta"].item()).decode())
            cache_device_rng = _meta.get("device_rng")
            # Surface the spectrum-derived bf16 grading (written at
            # decomposition time) to anyone visualizing a _bf16 cache.
            if _meta.get("bf16_analysis_grade") is False:
                bad = sum(b < 0.99
                          for b in _meta.get("bf16_cos_bounds", []))
                print(f"WARNING: visualizing NON-analysis-grade bfloat16 "
                      f"components ({bad}/{n_comp} below the 0.99 cosine "
                      f"bound; see _meta bf16_cos_bounds)", file=sys.stderr)
        except (ValueError, AttributeError):
            pass
    data.close()

    # Rendering runs the FULL forward (image-sized activations), not the
    # partial-to-tap the analyzed sizing models — keep the output-size
    # heuristic here.
    max_batch = args.batch_size or get_max_batch_size(inst, layer_name=layer_key,
                                                      analyze=False)
    print("Batch size:", max_batch)
    print(f"[{timestamp()}] Creating visualizations")

    np.random.seed(SEED_VISUALIZATION)

    est_id = f"spca_{args.sparsity}" if args.estimator == "spca" else args.estimator
    outdir_comp = outdir / model.name / layer_key.lower() / est_id / "comp"
    outdir_inst = outdir / model.name / layer_key.lower() / est_id / "inst"
    outdir_summ = outdir / model.name / layer_key.lower() / est_id / "summ"
    for d in (outdir_comp, outdir_inst, outdir_summ):
        makedirs(d, exist_ok=True)

    sparsity = np.mean(np.asarray(t.X_comp) == 0)
    print(f"Sparsity: {sparsity:.2f}")

    def get_edit_name(mode):
        if mode == "activation":
            is_stylegan = "StyleGAN" in args.model
            is_w = layer_key in ("style", "g_mapping")
            return "W" if (is_stylegan and is_w) else "ACT"
        if mode == "latent":
            return model.latent_space_name()
        if mode == "both":
            return "BOTH"
        raise RuntimeError(f"Unknown edit mode {mode}")

    # Only visualize applicable edit modes (visualize.py:237-240)
    if args.use_w and layer_key in ("style", "g_mapping"):
        edit_modes = ["latent"]  # activation edit is identical
    else:
        edit_modes = ["activation", "latent"]

    n_rows = min(14, n_comp)

    # Summary grid, real components
    for edit_mode in edit_modes:
        rows = make_grid(inst, layer_key, t.Z_global_mean, t.Z_global_mean,
                         t.Z_comp, t.Z_stdev, t.X_global_mean, t.X_comp,
                         t.X_stdev, scale=args.sigma, edit_type=edit_mode,
                         n_rows=n_rows, max_batch=max_batch)
        save_grid_image(rows, outdir_summ / f"components_{get_edit_name(edit_mode)}.jpg")

    if args.make_video:
        components = min(15, n_comp)
        instances = 150
        for sigma in [args.sigma, 3 * args.sigma]:
            for c in range(components):
                for edit_mode in edit_modes:
                    rows = make_grid(inst, layer_key, t.Z_global_mean,
                                     t.Z_global_mean, t.Z_comp[c:c + 1],
                                     t.Z_stdev[c:c + 1], t.X_global_mean,
                                     t.X_comp[c:c + 1], t.X_stdev[c:c + 1],
                                     n_rows=1, n_cols=instances, scale=sigma,
                                     edit_type=edit_mode,
                                     max_batch=max_batch)
                    frames = rows[0]
                    frames = frames + frames[::-1]
                    make_mp4(frames, 5, outdir_comp /
                             f"{get_edit_name(edit_mode)}_sigma{sigma}_comp{c}.mp4")

    # Summary grid, random directions with the PC stdevs (visualize.py:268-279).
    # Pick the SAME stream the decomposition's random_stdevs baselines used:
    # the cache's recorded provenance decides (a device-RNG-env run can still
    # fall back to host draws when the model has no device sampler, and the
    # cache may predate the current env) — env is only the tiebreak for
    # meta-less caches.  See sampling.random_directions_device.
    use_device_dirs = cache_device_rng if cache_device_rng is not None \
        else os.environ.get("GANSPACE_DEVICE_RNG", "1") == "1"
    if use_device_dirs:
        from ganspace_tpu.sampling import random_directions_device
        _dirs = random_directions_device
    else:
        _dirs = get_random_dirs
    rand_act = jnp.asarray(_dirs(n_comp, int(np.prod(sample_shape)))
                           .reshape(-1, *sample_shape))
    rand_z = jnp.asarray(_dirs(n_comp, int(np.prod(inst.input_shape)))
                         .reshape(-1, *latent_shape))
    for edit_mode in edit_modes:
        rows = make_grid(inst, layer_key, t.Z_global_mean, t.Z_global_mean,
                         rand_z, t.Z_stdev, t.X_global_mean, rand_act,
                         t.X_stdev, scale=args.sigma, edit_type=edit_mode,
                         n_rows=n_rows, max_batch=max_batch)
        save_grid_image(rows, outdir_summ / f"random_dirs_{get_edit_name(edit_mode)}.jpg")

    # Random instances with components applied
    n_random_imgs = 10
    latents = model.sample_latent(n_samples=n_random_imgs)
    for img_idx in range(n_random_imgs):
        z = latents[img_idx][None, ...]
        for edit_mode in edit_modes:
            rows = make_grid(inst, layer_key, z, t.Z_global_mean, t.Z_comp,
                             t.Z_stdev, t.X_global_mean, t.X_comp, t.X_stdev,
                             scale=args.sigma, edit_type=edit_mode,
                             n_rows=n_rows, max_batch=max_batch)
            save_grid_image(rows, outdir_summ /
                            f"samp{img_idx}_real_{get_edit_name(edit_mode)}.jpg")

        if args.make_video:
            components = min(5, n_comp)
            instances = 150
            for sigma in [args.sigma, 3 * args.sigma]:
                for edit_mode in edit_modes:
                    for c in range(components):
                        rows = make_grid(inst, layer_key, z, t.Z_global_mean,
                                         t.Z_comp[c:c + 1], t.Z_stdev[c:c + 1],
                                         t.X_global_mean, t.X_comp[c:c + 1],
                                         t.X_stdev[c:c + 1], n_rows=1,
                                         n_cols=instances, scale=sigma,
                                         edit_type=edit_mode,
                                         max_batch=max_batch)
                        frames = rows[0]
                        frames = frames + frames[::-1]
                        make_mp4(frames, 5, outdir_inst /
                                 f"{get_edit_name(edit_mode)}_sigma{sigma}_"
                                 f"img{img_idx}_comp{c}.mp4")

    # Browsable gallery per output dir (the reference ships its lightbox
    # only with the netdissect tools; the grids benefit just as much).
    from ganspace_tpu.tools.lightbox import write_lightbox
    for d in (outdir_comp, outdir_inst, outdir_summ):
        if any(p.suffix.lower() in (".jpg", ".png", ".gif") for p in d.iterdir()):
            write_lightbox(d, title=f"{model.name}/{layer_key}/{est_id} "
                                    f"{d.name}")

    print("Done in", datetime.datetime.now() - t_start)


if __name__ == "__main__":
    main()
