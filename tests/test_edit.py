"""Edit-engine behaviour (reference ``notebook_utils.py`` semantics)."""

import numpy as np
import pytest

from ganspace_tpu.edit import create_strip, create_strip_centered
from ganspace_tpu.models.base import InstrumentedModel, apply_edit

from helpers import tiny_stylegan2

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    model = tiny_stylegan2()
    inst = InstrumentedModel(model)
    return model, inst


def test_apply_edit_semantics():
    # nethook.py:219-231: x*(1-a) + r*a, then + offset; broadcast rule
    x = jnp.ones((2, 4, 3, 3))
    out = apply_edit(x, {"ablation": jnp.asarray(1.0),
                         "replacement": jnp.asarray(np.full((4,), 5.0, np.float32))})
    assert np.allclose(out, 5.0)
    out = apply_edit(x, {"offset": jnp.asarray(np.full((4,), 2.0, np.float32))})
    assert np.allclose(out, 3.0)
    # channel-first broadcast of a [C] vector
    v = np.arange(4, dtype=np.float32)
    out = np.asarray(apply_edit(x, {"offset": jnp.asarray(v)}))
    assert np.allclose(out[0, :, 0, 0], 1.0 + v)


def test_latent_strip_shapes(setup):
    model, inst = setup
    model.use_z()
    z = model.sample_latent(1, seed=3)
    rs = np.random.RandomState(0)
    z_comp = rs.randn(1, 512).astype(np.float32)
    z_comp /= np.linalg.norm(z_comp)
    frames = create_strip(inst, "latent", "conv1", [z], np.zeros((1, 64, 4, 4)),
                          z_comp, 1.0, 1.0, sigma=2.0, layer_start=0,
                          layer_end=-1, num_frames=5)
    assert len(frames) == 1 and len(frames[0]) == 5
    assert frames[0][0].shape == (32, 32, 3)
    # sigma sweep changes the image; endpoints differ from center
    assert np.abs(frames[0][0] - frames[0][2]).max() > 1e-4
    assert np.abs(frames[0][4] - frames[0][2]).max() > 1e-4


def test_activation_strip_changes_output(setup):
    model, inst = setup
    model.use_z()
    z = model.sample_latent(1, seed=4)
    x_comp = np.random.RandomState(1).randn(1, 64, 4, 4).astype(np.float32)
    x_comp /= np.linalg.norm(x_comp)
    frames = create_strip(inst, "activation", "conv1", [z], x_comp,
                          np.zeros((1, 512), np.float32), 5.0, 1.0, sigma=2.0,
                          layer_start=0, layer_end=-1, num_frames=3)[0]
    assert np.abs(frames[0] - frames[1]).max() > 1e-4
    # edits must not leak into subsequent plain forwards
    img_a = model.sample_np(z)
    inst.remove_edits()
    img_b = model.sample_np(z)
    assert np.array_equal(img_a, img_b)


def test_centered_strip_zero_sigma_on_mean(setup):
    # Centering: at sigma=0 the latent's coordinate along the component is 0
    # (notebook_utils.py:79-81).
    model, inst = setup
    model.use_w()
    w = model.sample_latent(1, seed=5)
    rs = np.random.RandomState(0)
    z_comp = rs.randn(1, 512).astype(np.float32)
    z_comp /= np.linalg.norm(z_comp)
    lat_mean = np.asarray(model.sample_latent(200, seed=6)).mean(0, keepdims=True)

    # centered latent of frame sigma=0 equals w - <w - mean, c> c
    dotp = np.sum((np.asarray(w) - lat_mean) * z_comp)
    w_centered = np.asarray(w) - dotp * z_comp
    frames = create_strip_centered(inst, "latent", "style", [w],
                                   np.zeros((1, 512), np.float32), z_comp,
                                   1.0, 1.0, np.zeros((1, 512), np.float32),
                                   lat_mean, sigma=2.0, layer_start=0,
                                   layer_end=-1, num_frames=3)[0]
    expected_mid = model.sample_np([jnp.asarray(w_centered)] * model.get_max_latents())
    assert np.abs(frames[1] - expected_mid).max() < 1e-4
    model.use_z()


def test_layer_window_limits_effect(setup):
    # Editing only late layers must differ from editing all layers.
    model, inst = setup
    model.use_z()
    z = model.sample_latent(1, seed=7)
    z_comp = np.random.RandomState(2).randn(1, 512).astype(np.float32)
    z_comp /= np.linalg.norm(z_comp)
    full = create_strip(inst, "latent", "conv1", [z], np.zeros((1, 64, 4, 4)),
                        z_comp, 1.0, 1.0, 2.0, 0, -1, 3)[0]
    late = create_strip(inst, "latent", "conv1", [z], np.zeros((1, 64, 4, 4)),
                        z_comp, 1.0, 1.0, 2.0, 4, -1, 3)[0]
    assert np.abs(full[0] - late[0]).max() > 1e-4


def test_cached_component_placeholder_dims(setup):
    """Components loaded from the npz cache keep the annotation's placeholder
    batch dim ([c, 1, C, H, W] spatial / [c, 1, D] latent); the strip engine
    must collapse it instead of broadcasting the forward batch to rank 5
    (regression: visualize CLI on a conv tap crashed in conv_general_dilated)."""
    model, inst = setup
    z = np.asarray(model.sample_latent(1, seed=0))
    feat = (64, 4, 4)
    x_comp = np.random.RandomState(0).randn(1, 1, *feat).astype(np.float32)
    z_comp = np.random.RandomState(1).randn(1, 1, z.shape[-1]).astype(np.float32)
    for mode in ("activation", "latent"):
        frames = create_strip_centered(
            inst, mode, "conv1", [z], x_comp, z_comp, 1.0, 1.0,
            np.zeros((1, *feat), np.float32), np.zeros((1, z.shape[-1]), np.float32),
            2.0, 0, -1, num_frames=3)
        assert len(frames[0]) == 3
        for img in frames[0]:
            assert img.ndim == 3 and img.shape[-1] == 3, img.shape


def test_strip_chunked_matches_unchunked(setup):
    """max_batch chunking (the reference's frame-block batching,
    notebook_utils.py:40-47) must not change any frame, in either edit mode,
    including a non-dividing chunk size (padded tail)."""
    model, inst = setup
    model.use_z()
    z = model.sample_latent(1, seed=7)
    rs = np.random.RandomState(2)
    z_comp = rs.randn(1, 512).astype(np.float32)
    inst.retain_layer("convs.0")
    model.partial_forward(z, "convs.0")
    feat_shape = np.asarray(inst.retained_features()["convs.0"]).shape[1:]
    for mode, x_comp in (("latent", z_comp),
                         ("activation",
                          rs.randn(1, *feat_shape).astype(np.float32))):
        common = dict(sigma=2.0, layer_start=0, layer_end=-1, num_frames=5)
        args = (inst, mode, "convs.0", [z], x_comp, z_comp,
                np.ones(1, np.float32), np.ones(1, np.float32),
                np.zeros_like(x_comp[0]), np.zeros_like(z_comp[0]))
        full = create_strip_centered(*args, **common)[0]
        chunked = create_strip_centered(*args, max_batch=2, **common)[0]
        assert len(full) == len(chunked) == 5
        for a, b in zip(full, chunked):
            assert np.allclose(a, b, atol=1e-5), mode


def test_strip_uint8_matches_quantized_float(setup):
    """as_uint8=True quantizes on device; must equal the quantized float
    frames exactly (same clip+scale+round), for both edit modes."""
    from ganspace_tpu.utils.imaging import to_uint8

    model, inst = setup
    model.use_z()
    z = model.sample_latent(1, seed=5)
    rs = np.random.RandomState(1)
    z_comp = rs.randn(1, 512).astype(np.float32)
    inst.retain_layer("convs.0")
    model.partial_forward(z, "convs.0")
    feat_shape = np.asarray(inst.retained_features()["convs.0"]).shape[1:]
    for mode, x_comp in (("latent", z_comp),
                         ("activation",
                          rs.randn(1, *feat_shape).astype(np.float32))):
        common = dict(sigma=2.0, layer_start=0, layer_end=-1, num_frames=3)
        f32 = create_strip_centered(
            inst, mode, "convs.0", [z], x_comp, z_comp,
            np.ones(1, np.float32), np.ones(1, np.float32),
            np.zeros_like(x_comp[0]), np.zeros_like(z_comp[0]), **common)[0]
        u8 = create_strip_centered(
            inst, mode, "convs.0", [z], x_comp, z_comp,
            np.ones(1, np.float32), np.ones(1, np.float32),
            np.zeros_like(x_comp[0]), np.zeros_like(z_comp[0]),
            as_uint8=True, **common)[0]
        for a, b in zip(f32, u8):
            assert b.dtype == np.uint8
            assert np.array_equal(to_uint8(a), b), mode
