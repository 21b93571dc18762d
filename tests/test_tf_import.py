"""TF-era checkpoint importer tests.

Fabricates NVlabs ``dnnlib``/``tfutil`` pickles and TF-Hub BigGAN variable
mappings in-memory — the same container structure and tensor layouts the
real 2018/2019-era public checkpoints carry — and asserts the importers
recover this framework's params exactly (reference conversion logic:
``models/stylegan/model.py:395-456``, ``netdissect/proggan.py:216-298``,
``pytorch_pretrained_biggan/convert_tf_to_pytorch.py``).
"""

import pickle
import sys
import types

import numpy as np
import pytest

from ganspace_tpu.models.tf_import import (
    bake_spectral_norm_tf,
    import_biggan_tf,
    import_progan_old_pt,
    import_progan_tf,
    import_stylegan_tf,
    read_tf_networks,
)


# ---------------------------------------------------------------------------
# NVlabs pickle fabrication: real module paths, real __getstate__ layout
# ---------------------------------------------------------------------------

class _FabricatedNetwork:
    """Pickles exactly like an NVlabs Network (state-dict protocol)."""

    def __init__(self, state):
        self._state = state

    def __getstate__(self):
        return self._state

    def __setstate__(self, state):
        self._state = state


def _install_fake_nvlabs_modules(monkeypatch, module="dnnlib.tflib.network"):
    """Register dnnlib/tfutil modules so pickling embeds the real GLOBAL
    opcodes (``dnnlib.tflib.network Network`` / ``tfutil Network``)."""
    Network = type("Network", (_FabricatedNetwork,), {"__module__": module})
    for mod_name in ("dnnlib", "dnnlib.tflib", "dnnlib.tflib.network",
                     "tfutil"):
        mod = types.ModuleType(mod_name)
        mod.Network = Network
        monkeypatch.setitem(sys.modules, mod_name, mod)
    sys.modules["dnnlib"].tflib = sys.modules["dnnlib.tflib"]
    sys.modules["dnnlib.tflib"].network = sys.modules["dnnlib.tflib.network"]
    return Network


def _network_state(name, variables, components=None):
    state = {"version": 3, "name": name, "static_kwargs": {},
             "build_module_src": "# source elided", "build_func_name": name,
             "variables": [(k, v) for k, v in variables.items()]}
    if components is not None:
        state["components"] = components
    return state


# ---------------------------------------------------------------------------
# StyleGAN1
# ---------------------------------------------------------------------------

def _hwio(w_oihw):
    return np.ascontiguousarray(w_oihw.transpose(2, 3, 1, 0))


def _sg1_tf_vars(params, cfg):
    """Invert the reference name/weight translation: our params -> the TF
    variable names/layouts of a karras2019 pickle, split mapping/synthesis."""
    mapping, synthesis = {}, {}
    for key, v in params.items():
        if key.startswith("g_mapping.dense"):
            i = int(key.split("dense")[1].split(".")[0])
            leaf = "weight" if key.endswith(".weight") else "bias"
            mapping[f"Dense{i}/{leaf}"] = (np.ascontiguousarray(v.T)
                                           if leaf == "weight" else v)
            continue
        assert key.startswith("g_synthesis.")
        rest = key[len("g_synthesis."):]
        if rest.startswith("torgb."):
            leaf = rest.split(".")[1]
            synthesis[f"ToRGB_lod0/{leaf}"] = (_hwio(v) if leaf == "weight"
                                               else v)
            continue
        _, res, *tail = rest.split(".")
        first = res == "4x4"
        tail = ".".join(tail)
        if tail == "const":
            synthesis[f"{res}/Const/const"] = v
        elif tail == "bias":
            synthesis[f"{res}/Const/bias"] = v
        elif tail.startswith("epi1.") or tail.startswith("epi2."):
            owner = (("Const" if first else "Conv0_up")
                     if tail.startswith("epi1.") else
                     ("Conv" if first else "Conv1"))
            if "noise" in tail:
                synthesis[f"{res}/{owner}/Noise/weight"] = v
            else:
                leaf = tail.split(".")[-1]
                synthesis[f"{res}/{owner}/StyleMod/{leaf}"] = (
                    np.ascontiguousarray(v.T) if leaf == "weight" else v)
        else:  # conv / conv0_up / conv1
            owner = {"conv": "Conv", "conv0_up": "Conv0_up",
                     "conv1": "Conv1"}[tail.split(".")[0]]
            leaf = tail.split(".")[-1]
            synthesis[f"{res}/{owner}/{leaf}"] = (_hwio(v) if leaf == "weight"
                                                  else v)
    return mapping, synthesis


def test_stylegan_tf_pickle_roundtrip(monkeypatch, tmp_path):
    from ganspace_tpu.models.stylegan import SG1Config, init_params

    Network = _install_fake_nvlabs_modules(monkeypatch)
    cfg = SG1Config(resolution=16, fmap_base=128)
    params = init_params(cfg, seed=7)
    mapping, synthesis = _sg1_tf_vars(params, cfg)

    own = {"lod": np.float32(0.0),
           "dlatent_avg": np.zeros((cfg.w_dim,), np.float32),
           # LOD>0 heads and fixed noise inputs must be dropped
           "ToRGB_lod1/weight": np.zeros((1, 1, 3, 8), np.float32),
           "noise0": np.zeros((1, 1, 4, 4), np.float32)}
    # real pickles keep noise inputs + lod INSIDE the synthesis component
    synthesis = dict(synthesis)
    synthesis["noise3"] = np.zeros((1, 1, 8, 8), np.float32)
    synthesis["lod"] = np.float32(0.0)
    gs = Network(_network_state(
        "Gs", own, components={
            "mapping": Network(_network_state("G_mapping", mapping)),
            "synthesis": Network(_network_state("G_synthesis", synthesis))}))
    g = Network(_network_state("G", {}))
    d = Network(_network_state("D", {"score/weight": np.zeros((3, 3)),
                                     }))
    path = tmp_path / "karras2019stylegan-test-16x16.pkl"
    path.write_bytes(pickle.dumps((g, d, gs), protocol=2))

    nets = read_tf_networks(path)
    assert len(nets) == 3

    imported = import_stylegan_tf(str(path))
    assert set(imported) == set(params)
    for k in params:
        assert np.array_equal(imported[k], params[k]), k


def test_stylegan_tf_checkpoint_discovery(monkeypatch, tmp_path):
    """A .pkl dropped in the checkpoint dir loads through the model ctor."""
    import ganspace_tpu.models.stylegan as sg

    Network = _install_fake_nvlabs_modules(monkeypatch)
    cfg = sg.SG1Config(resolution=16, fmap_base=128)
    params = sg.init_params(cfg, seed=3)
    mapping, synthesis = _sg1_tf_vars(params, cfg)
    gs = Network(_network_state("Gs", {}, components={
        "mapping": Network(_network_state("G_mapping", mapping)),
        "synthesis": Network(_network_state("G_synthesis", synthesis))}))

    ckpt_dir = tmp_path / "ckpt"
    (ckpt_dir / "stylegan").mkdir(parents=True)
    (ckpt_dir / "stylegan" / "stylegan_testclass_16.pkl").write_bytes(
        pickle.dumps((gs,), protocol=2))
    monkeypatch.setenv("GANCONTROL_CHECKPOINT_DIR", str(ckpt_dir))
    monkeypatch.setitem(sg.CONFIGS, "testclass", 16)

    model = sg.StyleGAN(class_name="testclass")
    for k in params:
        assert np.array_equal(np.asarray(model.params[k]), params[k]), k
    img = model.sample_np(model.sample_latent(1, seed=0))
    assert img.shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# ProGAN
# ---------------------------------------------------------------------------

def _progan_tf_vars(params, n_layers):
    tf = {}
    for i in range(n_layers):
        res = 4 * (2 ** (i // 2))
        tf_layer = "%dx%d/%s" % (res, res,
                                 "Dense" if i == 0 else
                                 "Conv" if i == 1 else
                                 "Conv0_up" if i % 2 == 0 else "Conv1")
        w = params[f"layer{i + 1}.conv.weight"]
        if i == 0:  # [ch, z, 4, 4] -> dense [z, ch*16], inverse flip/permute
            w = w[:, :, ::-1, ::-1].transpose(1, 0, 2, 3)
            w = np.ascontiguousarray(w.reshape(w.shape[0], -1))
        elif i % 2 == 0:  # conv -> transposed-conv [kh, kw, out, in]
            w = np.ascontiguousarray(
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
        else:
            w = _hwio(w)
        tf[f"{tf_layer}/weight"] = w
        tf[f"{tf_layer}/bias"] = params[f"layer{i + 1}.wscale.b"]
    res = 4 * (2 ** ((n_layers - 1) // 2))
    tf["ToRGB_lod0/weight"] = _hwio(params[f"output_{res}x{res}.conv.weight"])
    tf["ToRGB_lod0/bias"] = params[f"output_{res}x{res}.wscale.b"]
    tf["lod"] = np.float32(0.0)
    return tf


def test_progan_tf_roundtrip(monkeypatch, tmp_path):
    from ganspace_tpu.models.proggan import ProGANConfig, init_params

    Network = _install_fake_nvlabs_modules(monkeypatch, module="tfutil")
    cfg = ProGANConfig(sizes=(64, 32, 32, 16))
    params = init_params(cfg, seed=0)
    n_layers = sum(1 for k in params if k.startswith("layer"))  # 2 per layer
    tf = _progan_tf_vars(params, n_layers // 2)

    # tfutil (2018 repo) pickle: single Network, no components
    net = Network(_network_state("Gs", tf))
    net._state.pop("components", None)
    path = tmp_path / "karras2018-progan.pkl"
    path.write_bytes(pickle.dumps((net, net, net), protocol=2))

    imported, sizes = import_progan_tf(str(path))
    assert sizes == cfg.sizes
    assert set(imported) == set(params)
    for k in params:
        assert np.allclose(imported[k], params[k], atol=0), k


def test_progan_tf_checkpoint_discovery(monkeypatch, tmp_path):
    """Tiny TF pickle drives the full ProGAN ctor (cfg inferred from it)."""
    import ganspace_tpu.models.proggan as pg

    Network = _install_fake_nvlabs_modules(monkeypatch)
    cfg = pg.ProGANConfig(sizes=(64, 32, 32, 16))
    params = pg.init_params(cfg, seed=5)
    tf = _progan_tf_vars(params, sum(1 for k in params
                                     if k.startswith("layer")) // 2)
    ckpt_dir = tmp_path / "ckpt"
    (ckpt_dir / "progan").mkdir(parents=True)
    (ckpt_dir / "progan" / "kitchen_lsun.pkl").write_bytes(
        pickle.dumps((Network(_network_state("Gs", tf)),), protocol=2))
    monkeypatch.setenv("GANCONTROL_CHECKPOINT_DIR", str(ckpt_dir))

    model = pg.ProGAN(lsun_class="kitchen")
    assert model.cfg.sizes == cfg.sizes
    img = model.sample_np(model.sample_latent(1, seed=0))
    assert img.shape == (16, 16, 3)


def test_progan_old_pt_naming():
    from ganspace_tpu.models.proggan import ProGANConfig, init_params
    from ganspace_tpu.models.torch_import import import_progan

    cfg = ProGANConfig(sizes=(64, 32, 32, 16))
    params = init_params(cfg, seed=1)
    n = sum(1 for k in params if k.startswith("layer")) // 2
    res = 4 * (2 ** ((n - 1) // 2))
    old = {}
    for i in range(n):
        old[f"features.{i}.conv.weight"] = params[f"layer{i + 1}.conv.weight"]
        old[f"features.{i}.wscale.b"] = params[f"layer{i + 1}.wscale.b"]
    old["output.conv.weight"] = params[f"output_{res}x{res}.conv.weight"]
    old["output.wscale.b"] = params[f"output_{res}x{res}.wscale.b"]

    for loader in (import_progan_old_pt, import_progan):  # direct + sniffed
        imported, sizes = loader(dict(old))
        assert sizes == cfg.sizes
        assert set(imported) == set(params)
        for k in params:
            assert np.array_equal(imported[k], params[k]), k


# ---------------------------------------------------------------------------
# BigGAN
# ---------------------------------------------------------------------------

def _biggan_tf_vars(params, cfg, rs):
    """Our params -> TF-Hub variable names/layouts + fresh u0 vectors."""
    tf = {}

    def put_lin(tf_base, name, sn=True):
        w = params[f"{name}.weight"]
        tf[f"{tf_base}/w/ema_0.9999"] = np.ascontiguousarray(w.T)
        if sn:
            u = rs.randn(1, w.shape[0]).astype(np.float32)
            tf[f"{tf_base}/u0"] = u / np.linalg.norm(u)
        if f"{name}.bias" in params:
            tf[f"{tf_base}/b/ema_0.9999"] = params[f"{name}.bias"]

    def put_conv(tf_base, name):
        w = params[f"{name}.weight"]
        tf[f"{tf_base}/w/ema_0.9999"] = _hwio(w)
        u = rs.randn(1, w.shape[0]).astype(np.float32)
        tf[f"{tf_base}/u0"] = u / np.linalg.norm(u)
        if f"{name}.bias" in params:
            tf[f"{tf_base}/b/ema_0.9999"] = params[f"{name}.bias"]

    put_lin("linear", "embeddings", sn=False)
    put_lin("Generator/GenZ/G_linear", "generator.gen_z")
    li = 0
    for i, _ in enumerate(cfg.layers):
        if i == cfg.attention_layer_position:
            base = f"generator.layers.{li}"
            tf["Generator/attention/gamma/ema_0.9999"] = params[f"{base}.gamma"]
            for pt_sub, tf_sub in (("snconv1x1_g", "g"),
                                   ("snconv1x1_o_conv", "o_conv"),
                                   ("snconv1x1_phi", "phi"),
                                   ("snconv1x1_theta", "theta")):
                put_conv(f"Generator/attention/{tf_sub}", f"{base}.{pt_sub}")
            li += 1
        blk = f"Generator/GBlock_{i}" if i > 0 else "Generator/GBlock"
        base = f"generator.layers.{li}"
        for j in range(4):
            bn = f"{blk}/BatchNorm_{j}" if j > 0 else f"{blk}/BatchNorm"
            put_lin(f"{bn}/scale", f"{base}.bn_{j}.scale")
            put_lin(f"{bn}/offset", f"{base}.bn_{j}.offset")
            put_conv(f"{blk}/conv{j}", f"{base}.conv_{j}")
        li += 1
    tf["Generator/BatchNorm/scale/ema_0.9999"] = params["generator.bn.weight"]
    tf["Generator/BatchNorm/offset/ema_0.9999"] = params["generator.bn.bias"]
    put_conv("Generator/conv_to_rgb", "generator.conv_to_rgb")
    return tf


def _biggan_tf_to_ours_map(cfg):
    """TF module base -> our param base, for every spectral-normed module."""
    m = {"Generator/GenZ/G_linear": "generator.gen_z",
         "Generator/conv_to_rgb": "generator.conv_to_rgb"}
    li = 0
    for i, _ in enumerate(cfg.layers):
        if i == cfg.attention_layer_position:
            for pt_sub, tf_sub in (("snconv1x1_g", "g"),
                                   ("snconv1x1_o_conv", "o_conv"),
                                   ("snconv1x1_phi", "phi"),
                                   ("snconv1x1_theta", "theta")):
                m[f"Generator/attention/{tf_sub}"] = (
                    f"generator.layers.{li}.{pt_sub}")
            li += 1
        blk = f"Generator/GBlock_{i}" if i > 0 else "Generator/GBlock"
        for j in range(4):
            bn = f"{blk}/BatchNorm_{j}" if j > 0 else f"{blk}/BatchNorm"
            m[f"{bn}/scale"] = f"generator.layers.{li}.bn_{j}.scale"
            m[f"{bn}/offset"] = f"generator.layers.{li}.bn_{j}.offset"
            m[f"{blk}/conv{j}"] = f"generator.layers.{li}.conv_{j}"
        li += 1
    return m


def _biggan_stats_list(params, cfg, rs):
    """BN stats in the reference's consumption order (convert:186-216)."""
    stats = []
    li = 0
    for i, _ in enumerate(cfg.layers):
        if i == cfg.attention_layer_position:
            li += 1
        for j in range(4):
            shape = params[f"generator.layers.{li}.bn_{j}.running_means"].shape
            stats.append((0.1 * rs.randn(*shape)).astype(np.float32))
            stats.append((1.0 + 0.1 * rs.rand(*shape)).astype(np.float32))
        li += 1
    shape = params["generator.bn.running_means"].shape
    stats.append((0.1 * rs.randn(*shape)).astype(np.float32))
    stats.append((1.0 + 0.1 * rs.rand(*shape)).astype(np.float32))
    return stats


@pytest.fixture
def tiny_biggan():
    from ganspace_tpu.models.biggan import BigGANConfig, init_params

    cfg = BigGANConfig(output_dim=16, z_dim=8, channel_width=4,
                       layers=((False, 16, 16), (True, 16, 8)),
                       attention_layer_position=1, n_stats=5)
    return cfg, init_params(cfg, seed=2)


def test_biggan_tf_import_matches_torch_path(tiny_biggan):
    """TF import == torch import of the converter's own output: fabricate
    the HF checkpoint exactly as convert_tf_to_pytorch.py would (one power
    iteration from u0 into weight_u/weight_v buffers); baking it must give
    the same weights as the direct TF bake."""
    import torch

    from ganspace_tpu.models.torch_import import import_biggan

    cfg, params = tiny_biggan
    rs = np.random.RandomState(11)
    tf = _biggan_tf_vars(params, cfg, rs)
    stats = _biggan_stats_list(params, cfg, np.random.RandomState(3))

    got = import_biggan_tf(tf, cfg=cfg, batch_stats=stats)
    assert set(got) == set(params)

    # HF-format equivalent: weight_orig + one-power-iteration u/v buffers,
    # exactly as the converter seeds them (convert_tf_to_pytorch.py:169-183)
    hf = {k: torch.tensor(v) for k, v in got.items()}
    for tf_base, name in _biggan_tf_to_ours_map(cfg).items():
        if f"{tf_base}/u0" not in tf:
            continue
        w_tf = tf[f"{tf_base}/w/ema_0.9999"]
        w = (np.ascontiguousarray(w_tf.T) if w_tf.ndim == 2
             else np.ascontiguousarray(w_tf.transpose(3, 2, 0, 1)))
        u0 = np.squeeze(tf[f"{tf_base}/u0"])
        w_mat = w.reshape(w.shape[0], -1)
        v = w_mat.T @ u0
        v = v / max(np.linalg.norm(v), cfg.eps)
        u = w_mat @ v
        u = u / max(np.linalg.norm(u), cfg.eps)
        del hf[f"{name}.weight"]
        hf[f"{name}.weight_orig"] = torch.tensor(w)
        hf[f"{name}.weight_u"] = torch.tensor(u.astype(np.float32))
        hf[f"{name}.weight_v"] = torch.tensor(v.astype(np.float32))

    from_torch = import_biggan(hf)
    assert set(from_torch) == set(got)
    for k in got:
        assert np.allclose(from_torch[k], got[k], atol=2e-5), k

    # batch-norm stats landed in consumption order
    assert np.array_equal(got["generator.bn.running_means"], stats[-2])
    assert np.array_equal(got["generator.layers.0.bn_0.running_vars"], stats[1])


def test_biggan_tf_depth_inference_rejects_tiny(tiny_biggan, tmp_path):
    cfg, params = tiny_biggan
    tf = _biggan_tf_vars(params, cfg, np.random.RandomState(4))
    with pytest.raises(ValueError, match="GBlocks"):
        import_biggan_tf(tf)  # 2 blocks is not a public 128/256/512 config


def test_biggan_tf_npz_roundtrip(tiny_biggan, tmp_path):
    """npz dump with bundled stats_N arrays -> same result as in-memory."""
    cfg, params = tiny_biggan
    rs = np.random.RandomState(4)
    tf = _biggan_tf_vars(params, cfg, rs)
    stats = _biggan_stats_list(params, cfg, rs)
    bundled = {f"stats_{i}": s for i, s in enumerate(stats)}

    path = tmp_path / "tf_weights.npz"
    np.savez(path, **tf, **bundled)
    got = import_biggan_tf(str(path), cfg=cfg)
    expect = import_biggan_tf(tf, cfg=cfg, batch_stats=stats)
    assert set(got) == set(params)
    for k in got:
        assert np.array_equal(got[k], expect[k]), k


def test_bake_spectral_norm_tf_matches_torch_eval():
    """One-power-iteration bake == torch spectral_norm eval after seeding
    u/v the way the reference converter does."""
    import torch
    import torch.nn as nn
    from torch.nn.functional import normalize

    rs = np.random.RandomState(0)
    w = rs.randn(6, 10).astype(np.float32)
    u0 = rs.randn(6).astype(np.float32)
    u0 /= np.linalg.norm(u0)

    lin = nn.utils.spectral_norm(nn.Linear(10, 6, bias=False), eps=1e-4)
    with torch.no_grad():
        lin.weight_orig.copy_(torch.tensor(w))
        wt = torch.tensor(w)
        v = normalize(torch.mv(wt.t(), torch.tensor(u0)), dim=0, eps=1e-4)
        u = normalize(torch.mv(wt, v), dim=0, eps=1e-4)
        lin.weight_u.copy_(u)
        lin.weight_v.copy_(v)
    lin.eval()
    with torch.no_grad():
        lin(torch.zeros(1, 10))  # weight is (re)computed in forward
        w_eval = lin.weight.numpy()

    baked = bake_spectral_norm_tf(w, u0, eps=1e-4)
    assert np.abs(baked - w_eval).max() < 1e-6


def test_biggan_tf_checkpoint_discovery(tiny_biggan, tmp_path, monkeypatch):
    """A tf_weights.npz in the checkpoint dir loads through the ctor."""
    from ganspace_tpu.models.biggan import BigGAN

    cfg, params = tiny_biggan
    tf = _biggan_tf_vars(params, cfg, np.random.RandomState(9))
    ckpt_dir = tmp_path / "ckpt"
    (ckpt_dir / "biggan-deep-16").mkdir(parents=True)
    np.savez(ckpt_dir / "biggan-deep-16" / "tf_weights.npz", **tf)
    monkeypatch.setenv("GANCONTROL_CHECKPOINT_DIR", str(ckpt_dir))

    model = BigGAN(resolution=16, class_name="husky", cfg=cfg)
    z = model.sample_latent(1, seed=0)
    img = model.sample_np(z)
    assert img.shape[-1] == 3
