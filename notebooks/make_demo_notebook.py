"""Build (and optionally execute) ``notebooks/Ganspace_tpu.ipynb`` — the
interactive-notebook equivalent of the reference's ``Ganspace_colab.ipynb``:
discover components, apply layer-windowed edits, export a named direction,
and register a custom generator, all through the public API.

The notebook is generated from this script so it stays in sync with the API;
``--execute`` runs it headless (nbclient) and saves the outputs in place.

    python notebooks/make_demo_notebook.py [--execute]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import nbformat as nbf

HERE = Path(__file__).resolve().parent

MD = [
    # --- 0: header -----------------------------------------------------------
    """# GANSpace on TPU — end-to-end walkthrough

Notebook equivalent of the reference's ``Ganspace_colab.ipynb``: discover
interpretable GAN controls with PCA on internal activations, apply them as
layer-windowed edits, export named directions, and bring your own generator.

Everything below runs **offline**: without checkpoints the models use seeded
random initialization (drop reference-format checkpoints into
``$GANCONTROL_CHECKPOINT_DIR`` for real imagery — see ``docs/MIGRATION.md``).
The tiny sample counts keep the notebook executable in minutes on CPU; on a
TPU the same calls run the sharded production pipeline.""",
    # --- 1 -------------------------------------------------------------------
    """## 1. Discover components

``get_or_compute`` is the whole pipeline: sample latents → run the generator
*up to* the chosen layer (``partial_forward`` — jit-specialized, XLA removes
later stages) → stream activations through an estimator → regress components
back to latent space → cache as an ``.npz`` (reference-compatible keys and
filename).""",
    # --- 2 -------------------------------------------------------------------
    """## 2. Apply edits

``create_strip_centered`` applies component ``i`` over a latent-layer window:
the sample is first projected onto the component and re-centered, then walked
``±sigma`` standard deviations (reference ``notebook_utils.py:68-81``).""",
    # --- 3 -------------------------------------------------------------------
    """## 3. Export a named direction

Directions are ``.pkl`` files with full provenance (model, estimator, layer
window, σ-range — reference ``interactive.py:526-578``); the interactive
viewer (``python -m ganspace_tpu.apps.interactive ... --inputs <dir>``) loads
them back.""",
    # --- 4 -------------------------------------------------------------------
    """## 4. Bring your own generator

A custom model is a **pure, stage-indexed synthesis function** wrapped in
``BaseGenerator`` and registered by name — no framework-source edits (the
reference requires patching ``get_model``).  ``examples/custom_model.py`` is
the complete walkthrough; here we just register and drive it.""",
    # --- 5 -------------------------------------------------------------------
    """## Where to next

* batch rendering and sweep videos: ``python -m ganspace_tpu.apps.visualize``
* live sliders / layer windows: ``python -m ganspace_tpu.apps.interactive``
* unit dissection vs segmentation: ``python -m ganspace_tpu.dissection``
* reproduction of all 10 paper figures: ``python notebooks/run_all.py``""",
]

CODE = [
    # --- setup (goes after MD[0]) -------------------------------------------
    """import os, sys, tempfile
from pathlib import Path

root = Path.cwd() if (Path.cwd() / "ganspace_tpu").is_dir() else Path.cwd().parent
sys.path.insert(0, str(root))
os.environ.setdefault("GANSPACE_OUTPUT_DIR",
                      tempfile.mkdtemp(prefix="ganspace_demo_"))

import numpy as np
import matplotlib.pyplot as plt

from ganspace_tpu.config import Config
from ganspace_tpu.decomposition import get_or_compute
from ganspace_tpu.models import get_instrumented_model""",
    # --- 1: decomposition ----------------------------------------------------
    """inst = get_instrumented_model("DCGAN", None, "deconv1")
config = Config(model="DCGAN", layer="deconv1", estimator="ipca",
                components=6, n=512, batch_size=64)
npz_path = get_or_compute(config, inst)
data = np.load(npz_path)
print(npz_path.name)
print("explained variance ratio:", np.round(data["var_ratio"], 3))""",
    # --- 2: edits ------------------------------------------------------------
    """from ganspace_tpu.edit import create_strip_centered

n_show, n_frames = 3, 7
z = inst.model.sample_latent(1, seed=3)
strips = [create_strip_centered(            # one component per call
    inst, "latent", "deconv1", [z],
    data["act_comp"][c], data["lat_comp"][c],
    data["act_stdev"][c], data["lat_stdev"][c],
    data["act_mean"], data["lat_mean"],
    sigma=2.0, layer_start=0, layer_end=inst.model.get_max_latents(),
    num_frames=n_frames)[0] for c in range(n_show)]

fig, axes = plt.subplots(n_show, 1, figsize=(2 * n_frames, 2 * n_show))
for c, ax in enumerate(np.atleast_1d(axes)):
    ax.imshow(np.clip(np.hstack([np.asarray(f) for f in strips[c]]), 0, 1))
    ax.set_ylabel(f"component {c}")
    ax.set_xticks([]); ax.set_yticks([])
fig.suptitle("component sweeps, -2\\u03c3 .. +2\\u03c3 (random-init model)")
plt.show()""",
    # --- 3: direction export -------------------------------------------------
    """from ganspace_tpu.directions import (direction_params, export_direction,
                                     load_named_components)

params = direction_params(
    name="demo direction", sigma_range=2.0, component_index=0,
    act_comp=data["act_comp"][0], lat_comp=data["lat_comp"][0],
    latent_space=inst.model.latent_space_name(),
    act_stdev=data["act_stdev"][0], lat_stdev=data["lat_stdev"][0],
    model_name="DCGAN", output_class="None", estimator="ipca",
    components=6, samples=512, layer="deconv1", component_class="None",
    edit_type="latent", truncation=1.0, edit_start=0,
    edit_end=inst.model.get_max_latents(), example_seed=3)
direction_dir = Path(os.environ["GANSPACE_OUTPUT_DIR"]) / "out" / "directions"
pkl = export_direction(params, direction_dir)
print("exported:", pkl.name)
print("reloaded:", [d["name"] for d in
                    load_named_components(direction_dir, "DCGAN", "None")])""",
    # --- 4: custom model -----------------------------------------------------
    """import importlib.util

spec = importlib.util.spec_from_file_location(
    "custom_model", root / "examples" / "custom_model.py")
custom = importlib.util.module_from_spec(spec)
sys.modules["custom_model"] = custom   # dataclasses resolve via sys.modules
spec.loader.exec_module(custom)

from ganspace_tpu.models import register_model, unregister_model

register_model("ToyGAN", custom.ToyGenerator)
try:
    toy = get_instrumented_model("ToyGAN", None, "fc2")
    toy_cfg = Config(model="ToyGAN", layer="fc2", estimator="ipca",
                     components=4, n=256, batch_size=64)
    toy_npz = np.load(get_or_compute(toy_cfg, toy))
    img = toy.model.sample_np(toy.model.sample_latent(1, seed=1))
    plt.figure(figsize=(2, 2)); plt.imshow(np.clip(img, 0, 1))
    plt.title("ToyGAN sample"); plt.xticks([]); plt.yticks([]); plt.show()
    print("ToyGAN var_ratio:", np.round(toy_npz["var_ratio"], 3))
finally:
    unregister_model("ToyGAN")""",
]


def build() -> nbf.NotebookNode:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    cells = [nbf.v4.new_markdown_cell(MD[0]),
             nbf.v4.new_code_cell(CODE[0])]
    for md, code in zip(MD[1:5], CODE[1:]):
        cells.append(nbf.v4.new_markdown_cell(md))
        cells.append(nbf.v4.new_code_cell(code))
    cells.append(nbf.v4.new_markdown_cell(MD[5]))
    nb.cells = cells
    return nb


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true",
                    help="run the notebook headless and save outputs")
    ap.add_argument("--out", default=str(HERE / "Ganspace_tpu.ipynb"))
    args = ap.parse_args(argv)

    nb = build()
    if args.execute:
        from nbclient import NotebookClient
        client = NotebookClient(nb, timeout=1200,
                                resources={"metadata": {"path": str(HERE)}})
        client.execute()
    nbf.write(nb, args.out)
    print(f"wrote {args.out}" + (" (executed)" if args.execute else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
