"""Model registry + instrumented-model factory (reference ``models/wrappers.py:651-735``)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax

from ganspace_tpu.config import Config
from ganspace_tpu.models.base import BaseGenerator, InstrumentedModel
from ganspace_tpu.models.stylegan import StyleGAN
from ganspace_tpu.models.stylegan2 import StyleGAN2
from ganspace_tpu.models.biggan import BigGAN
from ganspace_tpu.models.proggan import ProGAN
from ganspace_tpu.models.dcgan import GANZooModel


#: user-registered model factories: name -> callable(output_class, **kwargs)
_CUSTOM_MODELS = {}


def register_model(name: str, factory) -> None:
    """Register a custom generator under ``name`` (the reference's analog is
    loading arbitrary torch.hub GAN-zoo models / the colab custom-model
    import).  ``factory(output_class, **kwargs)`` must return a
    :class:`BaseGenerator`; the whole pipeline (decomposition, visualize,
    dissection, interactive) then accepts ``--model name``."""
    _CUSTOM_MODELS[name] = factory


def unregister_model(name: str) -> None:
    _CUSTOM_MODELS.pop(name, None)


def get_model(name, output_class=None, device=None, **kwargs) -> BaseGenerator:
    """Name -> wrapper dispatch with instance reuse (reference ``wrappers.py:652-684``).

    ``device`` is accepted for call-site compatibility and ignored — JAX owns
    device placement.  A ``Config`` may be passed as the first argument.
    """
    if isinstance(name, Config):
        cfg = name
        kwargs.setdefault("use_w", cfg.use_w)
        return get_model(cfg.model, cfg.output_class, device, **kwargs)

    inst = kwargs.pop("inst", None)
    model = kwargs.pop("model", None)
    if inst or model:
        cached = model or inst.model
        network_same = cached.model_name == name
        outclass_same = cached.outclass == output_class
        can_change_class = "BigGAN" in name
        if network_same and (outclass_same or can_change_class):
            cached.set_output_class(output_class)
            return cached

    kwargs.pop("device", None)
    if name in _CUSTOM_MODELS:
        return _CUSTOM_MODELS[name](output_class, **kwargs)
    if name == "DCGAN":
        return GANZooModel("DCGAN", **_only(kwargs, ("cfg", "params", "init_seed")))
    if name == "ProGAN":
        return ProGAN(output_class, **_only(kwargs, ("resolution", "cfg", "params", "init_seed")))
    if "BigGAN" in name:
        assert "-" in name, "Please specify BigGAN resolution, e.g. BigGAN-512"
        return BigGAN(name.split("-")[-1], class_name=output_class,
                      **_only(kwargs, ("truncation", "cfg", "params", "init_seed")))
    if name == "StyleGAN":
        return StyleGAN(class_name=output_class,
                        **_only(kwargs, ("truncation", "use_w", "cfg", "params", "init_seed")))
    if name == "StyleGAN2":
        return StyleGAN2(class_name=output_class,
                         **_only(kwargs, ("truncation", "use_w", "cfg", "params",
                                          "latent_avg", "init_seed")))
    raise RuntimeError(f"Unknown model {name}")


def _only(kwargs, keys):
    return {k: v for k, v in kwargs.items() if k in keys}


def annotate_model_shapes(inst: InstrumentedModel, layers) -> InstrumentedModel:
    """Shape annotation via ``jax.eval_shape`` — the forward is traced but
    never compiled or executed (replaces the reference's zero-latent dry run,
    ``modelconfig.py:110-144``; on a remote chip a concrete full-resolution
    probe costs a minutes-scale compile for nothing but shapes)."""
    model = inst.model
    z = model.sample_latent(1, seed=0)
    inst.input_shape = tuple(np.asarray(z).shape)
    for layer in layers:
        inst.retain_layer(layer)

    try:
        shapes = {}

        def probe(zz):
            img = model.forward(zz)
            # Tap values are tracers here; only their static shape survives.
            shapes.update({l: tuple(f.shape)
                           for l, f in inst.retained_features().items()
                           if f is not None})
            for l in inst._retained:
                inst._retained[l] = None  # don't leak tracers
            return img

        out = jax.eval_shape(probe, z)
        missing = [l for l in layers if l not in shapes]
        if missing:
            raise ValueError(f"taps not reached abstractly: {missing}")
    except Exception:
        # Models whose forward needs concrete values (host-side control flow)
        # fall back to one real probe at batch 1.
        out = model.forward(z)
        shapes = {l: tuple(np.asarray(inst.retained_features()[l]).shape)
                  for l in layers}
    inst.output_shape = tuple(out.shape)
    for layer in layers:
        inst.feature_shape[layer] = shapes[layer]
    return inst


def get_instrumented_model(name, output_class=None, layers=None, device=None,
                           **kwargs) -> InstrumentedModel:
    """Build + wrap + validate + shape-annotate (reference ``wrappers.py:693-735``)."""
    if isinstance(name, Config):
        cfg = name
        kwargs.setdefault("use_w", cfg.use_w)
        return get_instrumented_model(cfg.model, cfg.output_class, cfg.layer,
                                      device, **kwargs)

    use_w = kwargs.pop("use_w", False)
    model = get_model(name, output_class, device, **kwargs)

    inst = kwargs.get("inst")
    if inst:
        inst.close()

    if not isinstance(layers, (list, tuple)):
        layers = [layers]

    # Verify given layer names against the model's tap table.
    for layer_name in layers:
        model.resolve_tap(layer_name)

    # Reset StyleGANs to Z for shape annotation (reference wrappers.py:713-715).
    if hasattr(model, "use_z"):
        model.use_z()

    inst = InstrumentedModel(model)
    annotate_model_shapes(inst, layers)

    if use_w and hasattr(model, "use_w"):
        model.use_w()
    return inst


__all__ = [
    "get_model",
    "get_instrumented_model",
    "annotate_model_shapes",
    "BaseGenerator",
    "InstrumentedModel",
    "StyleGAN",
    "StyleGAN2",
    "BigGAN",
    "ProGAN",
    "GANZooModel",
]
