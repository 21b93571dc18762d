"""Run the full figure-reproduction suite
(reference: the 10 notebooks listed in ``README.md:63-72``).

    python notebooks/run_all.py --tiny        # offline smoke of every figure
    python notebooks/run_all.py               # full models (needs checkpoints)
"""

import importlib
import sys
from pathlib import Path

# runnable from anywhere without installing the package
_HERE = Path(__file__).resolve().parent
for p in (str(_HERE), str(_HERE.parent)):
    if p not in sys.path:
        sys.path.insert(0, p)

FIGURES = [
    "figure_pca_illustration",
    "figure_teaser",
    "figure_pca_cleanup",
    "figure_style_content_sep",
    "figure_supervised_comp",
    "figure_first_20_pcs",
    "figure_edit_zoo",
    "figure_biggan_style_resampling",
    "figure_biggan_style_mixing",
    "figure_biggan_edit_transferability",
]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    failed = []
    for name in FIGURES:
        print(f"\n=== {name} ===", flush=True)
        try:
            mod = importlib.import_module(name)
            mod.main(argv)
        except Exception as e:
            print(f"FAILED {name}: {type(e).__name__}: {e}")
            failed.append(name)
    if failed:
        print(f"\n{len(failed)} figure(s) failed: {failed}")
        return 1
    print(f"\nall {len(FIGURES)} figures written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
