"""Port of the reference layer-wise latent API contract
(``tests/layerwise_z_test.py``): models report >1 latent slots, accept a
per-layer latent list in partial_forward, and duplicating a single latent
across every slot reproduces the single-latent forward within 0.1%.
"""

import numpy as np
import pytest

from helpers import tiny_biggan, tiny_stylegan, tiny_stylegan2

B = 2


@pytest.mark.parametrize("factory", [tiny_biggan, tiny_stylegan, tiny_stylegan2],
                         ids=["BigGAN-128", "StyleGAN", "StyleGAN2"])
def test_layerwise_z(factory):
    model = factory()
    n_latents = model.get_max_latents()
    assert n_latents > 1, "Model reports max_latents=1"

    np.random.seed(1234)
    latents = [model.sample_latent(B, seed=1234) for _ in range(5)]

    # partial_forward supports layerwise latent lists
    last_layer = model.tap_names()[-1]
    model.partial_forward(n_latents * [latents[0]], last_layer)

    # layerwise == broadcast
    for z in latents:
        np.random.seed(0)
        out1 = np.asarray(model.forward(z))
        np.random.seed(0)
        out2 = np.asarray(model.forward(n_latents * [z]))
        dist_rel = np.abs(out1 - out2).sum() / np.abs(out1).sum()
        assert dist_rel < 1e-3, f"Layerwise latent mode broken: diff={dist_rel*100}%"
