"""PCA illustration on synthetic 2-D data
(reference ``notebooks/figure_pca_illustration.ipynb``: a correlated Gaussian
point cloud with its principal axes, plus the same cloud in PCA coordinates).

    python notebooks/figure_pca_illustration.py
"""

import numpy as np

from notebook_init import OUTDIR, parse_args


def main(argv=None):
    args = parse_args(argv)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rs = np.random.RandomState(args.seed)
    cov = np.array([[2.5, 1.6], [1.6, 1.8]])
    pts = rs.multivariate_normal([0, 0], cov, size=400)

    # PCA via the framework's estimator (same code path as the pipeline)
    from ganspace_tpu.estimators import get_estimator
    est = get_estimator("pca", 2)
    est.fit(pts.astype(np.float32))
    comp, stdev, _ = est.get_components()
    mean = pts.mean(0)

    fig, axes = plt.subplots(1, 2, figsize=(9, 4.2))
    axes[0].scatter(pts[:, 0], pts[:, 1], s=6, alpha=0.4, c="#4a90d9")
    for i, c in enumerate(comp):
        v = c * stdev[i] * 2
        axes[0].annotate("", xy=mean + v, xytext=mean,
                         arrowprops=dict(arrowstyle="->", lw=2, color="C3"))
        axes[0].text(*(mean + v * 1.15), f"PC{i}", color="C3")
    axes[0].set_title("data with principal axes")
    axes[0].set_aspect("equal")

    coords = (pts - mean) @ comp.T / stdev
    axes[1].scatter(coords[:, 0], coords[:, 1], s=6, alpha=0.4, c="#4a90d9")
    axes[1].set_title("PCA coordinates (whitened)")
    axes[1].set_aspect("equal")

    outdir = OUTDIR if args.outdir is None else __import__("pathlib").Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    out = outdir / "pca_illustration.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
