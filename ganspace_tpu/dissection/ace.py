"""Ablation-based causal effect (ACE) optimization.

TPU-native re-design of the reference's door-editing experiments
(``netdissect/aceoptimize.py``, 934 LoC): find the per-unit ablation vector
``alpha in [0,1]^U`` at one generator layer that most suppresses a target
segmentation class in the generated images, under an L1 sparsity budget:

    min_alpha  E_z[ mean p_class(G(z; x_layer * (1 - alpha))) ] + l1 * |alpha|_1

The reference optimizes this with torch autograd through generator +
segmenter; here the whole objective — generator synthesis with the ablation
applied at the tap, the UPerNet segmenter's class probability, and the
penalty — is one pure JAX function, differentiated with ``jax.grad`` and
stepped with optax Adam + projection onto [0,1] (the reference's clamp).
The ablation enters through ``InstrumentedModel``'s differentiable edit
override, so the same edit semantics (``x * (1 - a)``, ``nethook.py:219``)
are used for optimization and for evaluation.

``ablation_effect`` is the evaluation half (reference ``evalablate.py`` /
``fullablate.py``): ablate the top-k units of a ranking and measure the
remaining class presence.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ganspace_tpu.models.base import InstrumentedModel


def _class_presence(segmenter, images: jnp.ndarray, classnum: int) -> jnp.ndarray:
    """Differentiable mean probability of ``classnum`` over all pixels
    (``SegmenterBase.class_probability`` protocol)."""
    return jnp.mean(segmenter.class_probability(images, classnum))


def _forward_with_ablation(inst: InstrumentedModel, tap: str, z, alpha_spatial):
    inst._edit_override = {tap: {"ablation": alpha_spatial}}
    try:
        return inst.model.forward(z)
    finally:
        inst._edit_override = None


def ace_optimize(inst: InstrumentedModel, layer: str, segmenter,
                 classnum: int, *, n_batches: int = 4, batch: int = 4,
                 steps: int = 50, lr: float = 0.05, l1: float = 0.005,
                 seed: int = 1, init: Optional[np.ndarray] = None,
                 progress: bool = False) -> Dict:
    """Returns {'ablation': [U] in [0,1], 'ranking': units by strength,
    'loss_history': [steps], 'baseline': untouched class presence}."""
    model = inst.model
    tap = model.resolve_tap(layer)

    # Probe the tap for the unit count.
    inst.retain_layer(layer)
    z0 = model.sample_latent(batch, seed=seed)
    model.partial_forward(z0, layer)
    feat = inst.retained_features()[layer]
    units = feat.shape[1] if feat.ndim >= 2 else feat.shape[-1]
    spatial_rank = feat.ndim

    zs = [model.sample_latent(batch, seed=seed + 1 + i)
          for i in range(n_batches)]

    def alpha_to_spatial(alpha):
        # [U] -> broadcastable against [B, U, h, w] (or [B, U])
        return alpha.reshape((1, units) + (1,) * (spatial_rank - 2))

    def objective(alpha, z):
        img = _forward_with_ablation(inst, tap, z, alpha_to_spatial(alpha))
        presence = _class_presence(segmenter, img, classnum)
        return presence + l1 * jnp.sum(jnp.abs(alpha)), presence

    grad_fn = jax.value_and_grad(objective, has_aux=True)

    alpha = jnp.asarray(init, jnp.float32) if init is not None \
        else jnp.zeros((units,), jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(alpha)

    baseline = float(np.mean([
        np.asarray(_class_presence(segmenter, model.forward(z), classnum))
        for z in zs]))

    history = []
    for step in range(steps):
        z = zs[step % len(zs)]
        (loss, presence), g = grad_fn(alpha, z)
        updates, opt_state = opt.update(g, opt_state)
        alpha = jnp.clip(optax.apply_updates(alpha, updates), 0.0, 1.0)
        history.append(float(loss))
        if progress and step % 10 == 0:
            print(f"ace step {step}: loss {float(loss):.5f} "
                  f"presence {float(presence):.5f}")

    alpha_np = np.asarray(alpha)
    return {
        "ablation": alpha_np,
        "ranking": np.argsort(-alpha_np),
        "loss_history": history,
        "baseline": baseline,
        "classnum": classnum,
        "layer": layer,
        "units": units,
    }


def ablation_effect(inst: InstrumentedModel, layer: str, segmenter,
                    classnum: int, ranking: Sequence[int], *,
                    ks: Sequence[int] = (0, 1, 2, 4, 8, 16, 32),
                    n_batches: int = 4, batch: int = 4,
                    seed: int = 99) -> Dict[int, float]:
    """Hard-ablate the top-k ranked units and measure remaining class
    presence (reference ``evalablate.py:248`` / ``fullablate.py:235``);
    returns {k: presence} normalized per-k against k=0."""
    model = inst.model
    tap = model.resolve_tap(layer)
    inst.retain_layer(layer)
    z0 = model.sample_latent(1, seed=seed)
    model.partial_forward(z0, layer)
    feat = inst.retained_features()[layer]
    units = feat.shape[1] if feat.ndim >= 2 else feat.shape[-1]
    spatial_rank = feat.ndim

    zs = [model.sample_latent(batch, seed=seed + 1 + i)
          for i in range(n_batches)]
    out = {}
    for k in ks:
        alpha = np.zeros((units,), np.float32)
        alpha[np.asarray(ranking[:k], np.int64)] = 1.0
        a = jnp.asarray(alpha).reshape((1, units) + (1,) * (spatial_rank - 2))
        vals = []
        for z in zs:
            img = _forward_with_ablation(inst, tap, z, a)
            vals.append(float(np.asarray(
                _class_presence(segmenter, img, classnum))))
        out[int(k)] = float(np.mean(vals))
    return out
