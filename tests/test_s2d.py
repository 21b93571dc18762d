"""Space-to-depth tail (ops/s2d.py): exactness vs the plain formulation.

The block-layout convs must be *algebraically identical* to the NCHW ops
they replace (``ops/modconv.py``, ``ops/upfirdn.py``) — same flips, pads and
scales — differing only by float reassociation.  These tests pin that, plus
the full-model equivalence including taps/edits/partial_forward inside the
block-layout region.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ganspace_tpu.ops.modconv import modulated_conv2d
from ganspace_tpu.ops.upfirdn import make_fir_kernel, upsample2x
from ganspace_tpu.ops import s2d

RS = np.random.RandomState(0)
B, C, CO, H = 2, 8, 16, 16


def rel(a, b):
    return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-12))


@pytest.fixture(scope="module")
def data():
    x = jnp.asarray(RS.randn(B, C, H, H).astype(np.float32))
    w3 = jnp.asarray(RS.randn(CO, C, 3, 3).astype(np.float32) * 0.3)
    w1 = jnp.asarray(RS.randn(3, C, 1, 1).astype(np.float32) * 0.3)
    s = jnp.asarray((RS.rand(B, C) + 0.5).astype(np.float32))
    k = make_fir_kernel([1, 3, 3, 1])
    return x, w3, w1, s, k


def test_roundtrip(data):
    x = data[0]
    assert rel(s2d.blocks_to_nchw(s2d.nchw_to_blocks(x)), x) == 0.0


def test_conv3x3_blocks(data):
    x, w3, _, s, _ = data
    xb = s2d.nchw_to_blocks(x)
    for demod in (True, False):
        ref = modulated_conv2d(x, w3, s, demodulate=demod)
        got = s2d.blocks_to_nchw(
            s2d.modulated_conv3x3_blocks(xb, w3, s, demodulate=demod))
        assert rel(got, ref) < 1e-5


def test_upconv_blocks_both_inputs(data):
    x, w3, _, s, k = data
    ref = modulated_conv2d(x, w3, s, upsample=True, blur_kernel=k)
    got_pix = s2d.blocks_to_nchw(s2d.modulated_upconv_blocks(
        jnp.transpose(x, (0, 2, 3, 1)), w3, s, k, pixel_input=True))
    got_blk = s2d.blocks_to_nchw(s2d.modulated_upconv_blocks(
        s2d.nchw_to_blocks(x), w3, s, k, pixel_input=False))
    assert rel(got_pix, ref) < 1e-5
    assert rel(got_blk, ref) < 1e-5


def test_rgb_blocks(data):
    x, _, w1, s, _ = data
    ref = modulated_conv2d(x, w1, s, demodulate=False)
    got = s2d.blocks_to_nchw(
        s2d.modulated_rgb_blocks(s2d.nchw_to_blocks(x), w1, s))
    assert rel(got, ref) < 1e-5


def test_upsample2x_blocks(data):
    x, *_, k = data
    x3 = x[:, :3]
    ref = upsample2x(x3, k)
    got_pix = s2d.blocks_to_nchw(s2d.upsample2x_blocks(
        jnp.transpose(x3, (0, 2, 3, 1)), k, pixel_input=True))
    got_blk = s2d.blocks_to_nchw(
        s2d.upsample2x_blocks(s2d.nchw_to_blocks(x3), k, pixel_input=False))
    assert rel(got_pix, ref) < 1e-5
    assert rel(got_blk, ref) < 1e-5


def test_noise_blocks(data):
    x = data[0]
    nz = jnp.asarray(RS.randn(1, 1, H, H).astype(np.float32))
    ref = x + 0.3 * nz
    got = s2d.blocks_to_nchw(s2d.add_noise_blocks(
        s2d.nchw_to_blocks(x), s2d.noise_to_blocks(nz), jnp.float32(0.3)))
    assert rel(got, ref) == 0.0


# ---------------------------------------------------------------------------
# Full model: s2d tail on vs off
# ---------------------------------------------------------------------------

# Channel map with a small-channel tail so the 64px test model enters block
# layout at res 16 (ch<=64) — exercising entry, block, skip and exit paths.
TINY_CHANNELS = ((4, 128), (8, 128), (16, 32), (32, 16), (64, 16))


@pytest.fixture(scope="module")
def tiny_models():
    from ganspace_tpu.models.stylegan2 import SG2Config, StyleGAN2
    cfg = SG2Config(resolution=64, channels=TINY_CHANNELS)
    m = StyleGAN2(class_name="ffhq", cfg=cfg, init_seed=7)
    assert m._s2d, "s2d tail should be on by default"
    return m


def _forward_both(m, z):
    m._s2d = True
    a = np.asarray(m.forward(z))
    m._s2d = False
    b = np.asarray(m.forward(z))
    m._s2d = True
    return a, b


def test_model_forward_equivalence(tiny_models):
    m = tiny_models
    z = m.sample_latent(3, seed=11)
    a, b = _forward_both(m, z)
    assert np.abs(a - b).max() < 1e-4


def test_synth_dtype_scopes_on_warm_cache(tiny_models):
    """The activation-storage dtype is a static jit argument read per call:
    scoping ``synth_dtype`` must take effect even after the f32 signature
    was already traced, and must fully revert when the scope exits."""
    from ganspace_tpu.ops.precision import synth_dtype
    m = tiny_models
    z = m.sample_latent(2, seed=21)
    ref = np.asarray(m.forward(z))            # warm f32 trace
    with synth_dtype("bfloat16"):
        half = np.asarray(m.forward(z))       # must NOT reuse the f32 trace
    back = np.asarray(m.forward(z))
    assert half.dtype == np.float32           # output contract stays f32
    assert np.abs(half - ref).max() > 1e-5    # bf16 storage actually engaged
    assert np.abs(back - ref).max() == 0.0    # scope exit restores f32


def test_synth_dtype_all_families():
    """bf16 activation storage engages on every family and stays
    preview-grade close to the f32 path (output contract f32)."""
    from ganspace_tpu.ops.precision import synth_dtype
    from ganspace_tpu.models.stylegan import SG1Config, StyleGAN
    from ganspace_tpu.models.proggan import ProGAN, ProGANConfig
    from ganspace_tpu.models.biggan import BigGAN, BigGANConfig

    models = [
        # SG1 engages bf16 only in the s2d tail (see models/stylegan.py), so
        # the config must reach a <=64-channel block at res >= 128.
        StyleGAN(class_name="ffhq", cfg=SG1Config(resolution=256, fmap_base=1024),
                 init_seed=1),
        ProGAN(lsun_class="bedroom", cfg=ProGANConfig(sizes=(64, 64, 32, 16)),
               init_seed=1),
        BigGAN(resolution=128, class_name="husky", init_seed=1,
               cfg=BigGANConfig(output_dim=16, channel_width=8,
                                attention_layer_position=99,
                                layers=((False, 16, 16), (True, 16, 8)))),
    ]
    for m in models:
        z = m.sample_latent(2, seed=7)
        ref = np.asarray(m.forward(z))
        with synth_dtype("bfloat16"):
            half = np.asarray(m.forward(z))
        assert half.dtype == np.float32, type(m).__name__
        rel_err = np.abs(half - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert 0 < rel_err < 0.15, f"{type(m).__name__}: rel err {rel_err}"
        back = np.asarray(m.forward(z))
        assert np.abs(back - ref).max() == 0.0, type(m).__name__


def test_model_tap_and_partial_equivalence(tiny_models):
    from ganspace_tpu.models.base import InstrumentedModel
    m = tiny_models
    inst = InstrumentedModel(m)
    z = m.sample_latent(2, seed=3)
    for layer in ("convs.2", "convs.3.conv", "to_rgbs.1"):
        feats = {}
        for flag in (True, False):
            m._s2d = flag
            inst.retain_layer(layer)
            inst.model.partial_forward(z, layer)
            feats[flag] = np.asarray(inst.retained_features()[layer])
        m._s2d = True
        assert feats[True].shape == feats[False].shape
        assert np.abs(feats[True] - feats[False]).max() < 1e-4, layer


def test_nearestup_conv_blocks(data):
    from jax import lax
    from ganspace_tpu.ops.upfirdn import nearest_upsample2x
    x, w3, *_ = data
    ref = lax.conv_general_dilated(
        nearest_upsample2x(x), w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    got_pix = s2d.blocks_to_nchw(s2d.nearestup_conv_blocks(
        jnp.transpose(x, (0, 2, 3, 1)), w3, pixel_input=True))
    got_blk = s2d.blocks_to_nchw(s2d.nearestup_conv_blocks(
        s2d.nchw_to_blocks(x), w3, pixel_input=False))
    assert rel(got_pix, ref) < 1e-5
    assert rel(got_blk, ref) < 1e-5


def test_progan_model_equivalence():
    from ganspace_tpu.models.proggan import ProGAN, ProGANConfig
    from ganspace_tpu.models.base import InstrumentedModel
    cfg = ProGANConfig(sizes=(128, 128, 64, 32, 16))
    m = ProGAN(lsun_class="bedroom", cfg=cfg, init_seed=3)
    z = m.sample_latent(2, seed=9)
    m._s2d = True
    a = np.asarray(m.forward(z))
    m._s2d = False
    b = np.asarray(m.forward(z))
    m._s2d = True
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 1e-4

    inst = InstrumentedModel(m)
    for layer in ("layer3", "layer5"):
        feats = {}
        for flag in (True, False):
            m._s2d = flag
            inst.retain_layer(layer)
            inst.model.partial_forward(z, layer)
            feats[flag] = np.asarray(inst.retained_features()[layer])
        m._s2d = True
        assert feats[True].shape == feats[False].shape
        assert np.abs(feats[True] - feats[False]).max() < 1e-4, layer


def test_stylegan1_model_equivalence():
    from ganspace_tpu.models.stylegan import SG1Config, StyleGAN
    from ganspace_tpu.models.base import InstrumentedModel
    cfg = SG1Config(resolution=256, fmap_base=1024)
    m = StyleGAN(class_name="ffhq", cfg=cfg, init_seed=5)
    z = m.sample_latent(2, seed=13)
    m._s2d = True
    a = np.asarray(m.forward(z))
    m._s2d = False
    b = np.asarray(m.forward(z))
    m._s2d = True
    assert a.shape == b.shape == (2, 3, 256, 256)
    assert np.abs(a - b).max() < 1e-4

    inst = InstrumentedModel(m)
    for layer in ("g_synthesis.blocks.128x128.conv0_up",
                  "g_synthesis.blocks.256x256.epi2.style_mod.lin",
                  "g_synthesis.blocks.256x256"):
        feats = {}
        for flag in (True, False):
            m._s2d = flag
            inst.retain_layer(layer)
            inst.model.partial_forward(z, layer)
            feats[flag] = np.asarray(inst.retained_features()[layer])
        m._s2d = True
        assert feats[True].shape == feats[False].shape
        assert np.abs(feats[True] - feats[False]).max() < 1e-4, layer


def test_biggan_model_equivalence():
    from ganspace_tpu.models.biggan import BigGAN, BigGANConfig
    from ganspace_tpu.models.base import InstrumentedModel
    cfg = BigGANConfig(output_dim=16, channel_width=8, attention_layer_position=99,
                       layers=((False, 16, 16), (True, 16, 8), (False, 8, 8),
                               (True, 8, 4)))
    m = BigGAN(resolution=128, class_name="husky", cfg=cfg, init_seed=2)
    z = m.sample_latent(2, seed=4)
    m._s2d = True
    a = np.asarray(m.forward(z))
    m._s2d = False
    b = np.asarray(m.forward(z))
    m._s2d = True
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 1e-4

    inst = InstrumentedModel(m)
    for layer in ("generator.layers.1.conv_1", "generator.layers.2",
                  "generator.layers.3.bn_2"):
        feats = {}
        for flag in (True, False):
            m._s2d = flag
            inst.retain_layer(layer)
            inst.model.partial_forward(z, layer)
            feats[flag] = np.asarray(inst.retained_features()[layer])
        m._s2d = True
        assert feats[True].shape == feats[False].shape
        assert np.abs(feats[True] - feats[False]).max() < 1e-4, layer


def test_model_edit_equivalence(tiny_models):
    from ganspace_tpu.models.base import InstrumentedModel
    m = tiny_models
    inst = InstrumentedModel(m)
    z = m.sample_latent(2, seed=5)
    layer = "convs.3"
    shape = None
    m._s2d = True
    inst.retain_layer(layer)
    inst.model.partial_forward(z, layer)
    shape = inst.retained_features()[layer].shape
    offset = jnp.asarray(RS.randn(*shape[1:]).astype(np.float32) * 0.5)
    imgs = {}
    for flag in (True, False):
        m._s2d = flag
        inst.edit_layer(layer, offset=offset)
        imgs[flag] = np.asarray(m.forward(z))
        inst.remove_edits()
    m._s2d = True
    assert np.abs(imgs[True] - imgs[False]).max() < 1e-4


def test_entry_at_final_stage():
    """'car'-shaped configs enter block layout at their LAST pair (512px,
    C=64): entry, one in-tail to_rgb with a pixel skip, and exit all happen
    in a single stage."""
    from ganspace_tpu.models.stylegan2 import SG2Config, StyleGAN2
    cfg = SG2Config(resolution=32,
                    channels=((4, 96), (8, 96), (16, 96), (32, 48)))
    m = StyleGAN2(class_name="ffhq", cfg=cfg, init_seed=9)
    z = m.sample_latent(2, seed=17)
    a, b = _forward_both(m, z)
    assert a.shape == b.shape == (2, 3, 32, 32)
    assert np.abs(a - b).max() < 1e-4
