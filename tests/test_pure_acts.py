"""pure_acts_fn parity: the pure tap function must reproduce the
instrumented partial_forward's retained features for every model family."""

import numpy as np
import pytest

from ganspace_tpu.models.base import InstrumentedModel

from helpers import TINY_FACTORIES

CASES = [
    ("StyleGAN2", "convs.0"),
    ("StyleGAN", "g_synthesis.blocks.8x8.conv0_up"),
    ("ProGAN", "layer2"),
    ("BigGAN-128", "generator.layers.1.conv_1"),
    ("DCGAN", "deconv1"),
]


@pytest.mark.parametrize("name,layer", CASES)
def test_pure_acts_matches_instrumented(name, layer):
    model = TINY_FACTORIES[name]()
    inst = InstrumentedModel(model)
    fn = model.pure_acts_fn(layer)
    assert fn is not None, f"{name} has no pure tap fn"

    z = model.sample_latent(3, seed=11)
    pure = np.asarray(fn(z))

    inst.retain_layer(layer)
    model.partial_forward(z, layer)
    ref = np.asarray(inst.retained_features()[layer]).reshape(3, -1)
    assert pure.shape == ref.shape
    assert np.allclose(pure, ref, atol=1e-4), np.abs(pure - ref).max()
