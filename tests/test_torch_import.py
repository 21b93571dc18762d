"""Checkpoint importer round-trip tests with synthetic torch state dicts.

No network: reference-format checkpoints are fabricated in-memory (the same
tensor layouts the real files carry) and imported.
"""

import numpy as np
import torch
import torch.nn as nn

from ganspace_tpu.models.torch_import import (
    bake_spectral_norm,
    import_biggan,
    import_progan,
    import_stylegan,
    import_stylegan2,
)


def test_stylegan2_roundtrip():
    from ganspace_tpu.models.stylegan2 import SG2Config, StyleGAN2, init_params

    cfg = SG2Config(resolution=16, channels=((4, 32), (8, 32), (16, 16)))
    params = init_params(cfg, seed=3)
    # fabricate a rosinality-format ckpt: grouped-conv leading dim, noises,
    # blur-kernel buffers, latent_avg
    state = {}
    for k, v in params.items():
        t = torch.tensor(v)
        if k.endswith(".conv.weight"):
            t = t[None]  # [1, out, in, k, k]
        state[k] = t
    state["convs.0.conv.blur.kernel"] = torch.ones(4, 4)
    state["noises.noise_0"] = torch.zeros(1, 1, 4, 4)
    ckpt = {"g_ema": state, "latent_avg": torch.full((512,), 0.25)}

    imported, latent_avg = import_stylegan2(ckpt)
    assert np.allclose(latent_avg, 0.25)
    assert set(imported) == set(params)
    for k in params:
        assert np.array_equal(imported[k], params[k]), k

    # imported params drive the model identically to the originals
    m1 = StyleGAN2("cat", cfg=cfg, params=params)
    m2 = StyleGAN2("cat", cfg=cfg, params=imported, latent_avg=latent_avg)
    z = m1.sample_latent(2, seed=0)
    assert np.array_equal(np.asarray(m1.forward(z)), np.asarray(m2.forward(z)))


def test_stylegan1_roundtrip():
    from ganspace_tpu.models.stylegan import SG1Config, init_params

    cfg = SG1Config(resolution=16, fmap_base=128)
    params = init_params(cfg, seed=1)
    state = {k: torch.tensor(v) for k, v in params.items()}
    state["g_synthesis.blocks.8x8.conv0_up.intermediate.kernel"] = torch.ones(1, 1, 3, 3)
    imported = import_stylegan(state)
    assert set(imported) == set(params)
    for k in params:
        assert np.array_equal(imported[k], params[k]), k


def test_spectral_norm_baking_matches_torch():
    torch.manual_seed(0)
    lin = nn.utils.spectral_norm(nn.Linear(12, 8, bias=False), eps=1e-12)
    lin.train()
    x = torch.randn(4, 12)
    for _ in range(50):  # converge the power iteration (u-only bake relies on it)
        lin(x)
    lin.eval()
    with torch.no_grad():
        w_eff = lin.weight.detach().numpy()  # eval-mode effective weight

    state = {k: v.detach() for k, v in lin.state_dict().items()}
    baked = bake_spectral_norm(state["weight_orig"].numpy(),
                               state["weight_u"].numpy(),
                               state.get("weight_v").numpy()
                               if "weight_v" in state else None)
    assert np.abs(baked - w_eff).max() < 1e-5

    # u-only path (older torch checkpoints)
    baked_u = bake_spectral_norm(state["weight_orig"].numpy(),
                                 state["weight_u"].numpy(), None)
    assert np.abs(baked_u - w_eff).max() < 1e-4


def test_biggan_import_bakes_all_sn():
    from ganspace_tpu.models.biggan import BigGANConfig, init_params

    cfg = BigGANConfig(output_dim=16, z_dim=8, channel_width=4,
                       layers=((False, 16, 16), (True, 16, 8)),
                       attention_layer_position=1)
    params = init_params(cfg, seed=2)
    # fabricate HF-format dict: conv/linear weights become weight_orig + u/v
    state = {}
    rs = np.random.RandomState(0)
    for k, v in params.items():
        if k.endswith(".weight") and ("conv" in k or "gen_z" in k
                                      or ".scale." in k or ".offset." in k):
            w_mat = v.reshape(v.shape[0], -1)
            u = rs.randn(w_mat.shape[0]).astype(np.float32)
            u /= np.linalg.norm(u)
            state[k[:-len(".weight")] + ".weight_orig"] = torch.tensor(v)
            state[k[:-len(".weight")] + ".weight_u"] = torch.tensor(u)
        else:
            state[k] = torch.tensor(v)

    imported = import_biggan(state)
    assert set(imported) == set(params)
    for k, v in params.items():
        base = k[:-len(".weight")] if k.endswith(".weight") else None
        if base is not None and base + ".weight_orig" in {s for s in state}:
            u = state[base + ".weight_u"].numpy()
            expect = bake_spectral_norm(v, u, None)
            assert np.allclose(imported[k], expect), k
        else:
            assert np.array_equal(imported[k], v), k


class _ZooGNet(nn.Module):
    """Torch replica of pytorch_GAN_zoo's DCGAN GNet (format layer 1->4 px,
    2x transposed-conv stages with BatchNorm+ReLU, tanh outlayer) — the
    architecture the reference hub-loads (``wrappers.py:438-466``)."""

    def __init__(self, dim_latent=32, dim_output=3, dim_g=8, depth=2):
        super().__init__()
        from collections import OrderedDict
        curr = dim_g * 2 ** depth
        self.formatLayer = nn.ConvTranspose2d(dim_latent, curr, 4, 1, 0,
                                              bias=False)
        seq = OrderedDict()
        seq["batchNorm0"] = nn.BatchNorm2d(curr)
        seq["relu0"] = nn.ReLU(True)
        for i in range(depth):
            seq[f"convTranspose{i + 1}"] = nn.ConvTranspose2d(
                curr, curr // 2, 4, 2, 1, bias=False)
            seq[f"batchNorm{i + 1}"] = nn.BatchNorm2d(curr // 2)
            seq[f"relu{i + 1}"] = nn.ReLU(True)
            curr //= 2
        seq["outlayer"] = nn.ConvTranspose2d(dim_g, dim_output, 4, 2, 1,
                                             bias=False)
        self.main = nn.Sequential(seq)

    def forward(self, z):
        x = self.formatLayer(z.view(z.shape[0], -1, 1, 1))
        return torch.tanh(self.main(x))


def test_ganzoo_dcgan_import_torch_parity():
    """Full-checkpoint zoo import: architecture inferred from the state
    dict, synthesis matches the torch GNet eval forward."""
    from ganspace_tpu.models.dcgan import GANZooModel
    from ganspace_tpu.models.torch_import import import_ganzoo_dcgan

    torch.manual_seed(3)
    net = _ZooGNet(dim_latent=32, dim_g=8, depth=2)
    # non-trivial eval-mode BN running stats
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()

    ckpt = {"config": {"dimLatentVector": 32},
            "netG": net.state_dict(), "netD": {}}
    params, cfg = import_ganzoo_dcgan(ckpt)
    assert cfg.z_total == 32 and cfg.cond_dim == 20
    assert cfg.resolution == 32  # 4 * 2**(depth+1)

    model = GANZooModel("DCGAN-test", cfg=cfg, params=params)
    z = np.random.RandomState(0).randn(3, 32).astype(np.float32)
    with torch.no_grad():
        ref = 0.5 * (net(torch.tensor(z)) + 1)   # reference forward remap
    ours = np.asarray(model.forward(z))
    assert np.abs(ours - ref.numpy()).max() < 1e-5

    # conditioning slice contract (reference wrappers.py:457-461)
    zc = model.sample_latent(2, seed=1)
    c = model.get_conditional_state(zc)
    assert c.shape == (2, 20)


def test_ganzoo_dcgan_import_name_agnostic():
    """The importer binds by module order/shape, not by key names."""
    from ganspace_tpu.models.torch_import import import_ganzoo_dcgan

    rs = np.random.RandomState(1)
    state = {
        "g.first.weight": torch.tensor(rs.randn(24, 16, 4, 4), dtype=torch.float32),
        "g.norm.weight": torch.ones(16), "g.norm.bias": torch.zeros(16),
        "g.norm.running_mean": torch.zeros(16),
        "g.norm.running_var": torch.ones(16),
        "g.norm.num_batches_tracked": torch.tensor(0),
        "g.last.weight": torch.tensor(rs.randn(16, 3, 4, 4), dtype=torch.float32),
    }
    params, cfg = import_ganzoo_dcgan(state)
    assert set(params) >= {"deconv0.weight", "bn0.running_mean",
                           "deconv1.weight"}
    assert cfg.z_total == 24 and cfg.resolution == 8


def test_progan_import_infers_sizes():
    from ganspace_tpu.models.proggan import ProGANConfig, init_params

    cfg = ProGANConfig(sizes=(64, 32, 32, 16))
    params = init_params(cfg, seed=0)
    state = {k: torch.tensor(v) for k, v in params.items()}
    imported, sizes = import_progan(state)
    assert sizes == (64, 32, 32, 16)
    for k in params:
        assert np.array_equal(imported[k], params[k]), k
