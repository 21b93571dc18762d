"""Port of the reference's load-bearing correctness test
(``tests/partial_forward_test.py``): for a matrix of (model, layer) configs,

  (a) negative: different inputs give different retained features;
  (b) determinism: two forwards of the same z retain identical features
      (all model randomness must be seeded away);
  (c) equivalence: partial_forward retained features == full forward retained
      features.
"""

import numpy as np
import pytest

from ganspace_tpu.models.base import InstrumentedModel

from helpers import PARTIAL_FORWARD_MATRIX, TINY_FACTORIES

SEED = 1369
SAMPLES = 20
B = 5


def _compare(inst, model, layer, z1, z2):
    np.random.seed(0)
    inst._retained[layer] = None
    model.partial_forward(z1, layer)
    assert inst._retained[layer] is not None, "Layer not retained (partial)"
    feat_partial = np.asarray(inst._retained[layer]).reshape(-1).copy()

    np.random.seed(0)
    inst._retained[layer] = None
    model.forward(z2)
    assert inst._retained[layer] is not None, "Layer not retained (full)"
    feat_full = np.asarray(inst.retained_features()[layer]).reshape(-1).copy()

    return np.sum(np.abs(feat_partial - feat_full))


@pytest.mark.parametrize("model_name,layers", PARTIAL_FORWARD_MATRIX,
                         ids=[m for m, _ in PARTIAL_FORWARD_MATRIX])
def test_partial_forward(model_name, layers):
    model = TINY_FACTORIES[model_name]()
    inst = InstrumentedModel(model)

    for layer in layers:
        inst.retain_layer(layer)

        # Negative: partial and full on different inputs should differ.
        z_dummy = model.sample_latent(B, seed=0)
        z1 = np.zeros_like(np.asarray(z_dummy))
        z2 = np.ones_like(np.asarray(z_dummy))
        assert _compare(inst, model, layer, z1, z2) > 1e-8, \
            f"{layer}: partial and full should differ, but do not"

        # Determinism: model randomness must be seeded away.
        z1 = model.sample_latent(1, seed=1)
        inst._retained[layer] = None
        model.forward(z1)
        feat1 = np.asarray(inst._retained[layer]).reshape(-1)
        model.forward(z1)
        feat2 = np.asarray(inst._retained[layer]).reshape(-1)
        diff = np.sum(np.abs(feat1 - feat2))
        assert diff < 1e-8, f"Layer {layer} output contains randomness, diff={diff}"

        # Positive: partial == full.
        np.random.seed(SEED)
        latents = np.asarray(model.sample_latent(SAMPLES, seed=SEED))
        for i in range(0, SAMPLES, B):
            z = latents[i:i + B]
            diff = _compare(inst, model, layer, z, z)
            assert diff < 1e-5, f"{layer}: partial and full forward differ by {diff}"


@pytest.mark.slow
def test_batch_composition_invariance():
    """Eval-mode normalization discipline: a sample's activations and image
    must not depend on its batch-mates (the reference runs every generator
    under model.eval(), wrappers.py:696 — BatchNorm uses running stats, so
    row i of a batch-N forward equals a batch-1 forward of that row).
    Regression test for DCGAN, whose BatchNorm once used batch statistics."""
    for name, factory in TINY_FACTORIES.items():
        model = factory()
        z = model.sample_latent(4, seed=9)
        full = np.asarray(model.forward(z))
        one = np.asarray(model.forward(np.asarray(z)[2:3]))
        # Loose bound: XLA may pick batch-size-dependent conv algorithms
        # (float reassociation, ~1e-5 through deep instance-norm chains);
        # structural batch-stat leakage shows up orders of magnitude larger.
        err = np.abs(full[2:3] - one).max()
        assert err < 1e-3, f"{name}: batch-composition dependence {err}"
