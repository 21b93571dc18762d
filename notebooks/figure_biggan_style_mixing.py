"""BigGAN style-mixing grid
(reference ``notebooks/figure_biggan_style_mixing.ipynb``: content latents on
one axis, style latents on the other; each cell takes the row's latent for
the early layer slots and the column's for the rest).

    python notebooks/figure_biggan_style_mixing.py --tiny
"""

from notebook_init import parse_args, save_figure_grid, setup


def main(argv=None):
    args = parse_args(argv, model="BigGAN-128", output_class="husky",
                      layer="generator.gen_z", components=8, n=512)
    ns = setup(args, use_w=False)
    model = ns.model
    max_lat = model.get_max_latents()
    split = max(1, max_lat // 2)

    content_seeds = [1, 2, 3]
    style_seeds = [41, 42, 43]

    header = [model.sample_np(model.sample_latent(1, seed=s))
              for s in style_seeds]
    rows = [header]
    for cs in content_seeds:
        z_c = model.sample_latent(1, seed=cs)
        row = []
        for ss in style_seeds:
            z_s = model.sample_latent(1, seed=ss)
            z = [z_c] * split + [z_s] * (max_lat - split)
            row.append(model.sample_np(z))
        rows.append(row)
    return save_figure_grid(rows, ns.outdir / "biggan_style_mixing.png")


if __name__ == "__main__":
    main()
