"""Tiny randomly-initialized model configs for fast CPU tests.

Mirrors the reference test strategy (SURVEY.md §4): the reference downloads
real checkpoints; here the two load-bearing properties (partial==full,
layerwise==broadcast) are checked on small random models — the properties are
architecture-level, not weight-level.
"""

from ganspace_tpu.models import get_model
from ganspace_tpu.models.biggan import BigGANConfig
from ganspace_tpu.models.dcgan import DCGANConfig
from ganspace_tpu.models.proggan import ProGANConfig
from ganspace_tpu.models.stylegan import SG1Config
from ganspace_tpu.models.stylegan2 import SG2Config


def tiny_stylegan2(**kw):
    cfg = SG2Config(resolution=32, channels=((4, 64), (8, 64), (16, 32), (32, 32)))
    return get_model("StyleGAN2", "ffhq", cfg=cfg, **kw)


def tiny_stylegan(**kw):
    cfg = SG1Config(resolution=32, fmap_base=256)
    return get_model("StyleGAN", "ffhq", cfg=cfg, **kw)


def tiny_progan(**kw):
    cfg = ProGANConfig(sizes=(64, 32, 32, 16))
    return get_model("ProGAN", "bedroom", cfg=cfg, **kw)


def tiny_biggan(**kw):
    cfg = BigGANConfig(output_dim=32, z_dim=16, channel_width=8,
                       layers=((False, 16, 16), (True, 16, 8),
                               (True, 8, 4), (True, 4, 2)),
                       attention_layer_position=2)
    return get_model("BigGAN-128", "husky", cfg=cfg, **kw)


def tiny_dcgan(**kw):
    return get_model("DCGAN", cfg=DCGANConfig(resolution=16, base_channels=64), **kw)


TINY_FACTORIES = {
    "StyleGAN2": tiny_stylegan2,
    "StyleGAN": tiny_stylegan,
    "ProGAN": tiny_progan,
    "BigGAN-128": tiny_biggan,
    "DCGAN": tiny_dcgan,
}

# (factory-name, layers to exercise) — mirrors the reference matrix
# (tests/partial_forward_test.py:57-84) at tiny scale.
PARTIAL_FORWARD_MATRIX = [
    ("StyleGAN2", ["convs.0", "conv1", "to_rgb1", "style", "convs.2.conv"]),
    ("StyleGAN", ["g_synthesis.blocks.8x8.conv0_up",
                  "g_synthesis.blocks.16x16.conv0_up",
                  "g_synthesis.blocks.32x32.epi2.style_mod.lin",
                  "g_synthesis.blocks.8x8.epi1.top_epi.noise",
                  "g_mapping"]),
    ("ProGAN", ["layer2", "layer5"]),
    # NB: 'embeddings' is excluded — its output depends only on the class
    # vector, so the different-inputs negative property cannot hold there.
    ("BigGAN-128", ["generator.layers.1.conv_1", "generator.layers.3.relu",
                    "generator.layers.2.bn_2", "generator.gen_z"]),
]
