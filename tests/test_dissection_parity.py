"""Cross-stack dissection parity: our dissection engine vs the torch
reference machinery (``netdissect/dissection.py:680-1107``), same model,
same latents, same segmentation rule, same thresholds.

A tiny ProGAN is initialized in this framework, its params exported to the
reference's torch ``ProgressiveGenerator`` (name-compatible state dict),
and both stacks run:

* quantile collection (reference ``collect_quantiles_and_topk`` with its
  ``RunningQuantile`` KLL sketch vs our streaming sketch) — both compared
  against the exact numpy quantiles of the same activation stream;
* the IoU tally (reference ``collect_bincounts`` + ``score_tally_stats``
  vs our ``dissect``) at IDENTICAL per-unit thresholds — intersection /
  activation / label pixel counts and the IoU tables must agree;
* per-unit top-label assignment.

The tap layer is chosen at the output resolution so neither stack
interpolates (upsample = identity), making the tally integer-exact up to
activation-parity noise (<1e-4 relative, ``test_torch_parity.py``).
"""

import importlib.util
import sys
import types
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref_module(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_dissection():
    """Import the reference's ``netdissect.dissection`` module (read-only).

    An empty package shim skips the reference ``__init__`` (which drags in
    the whole toolkit); unused heavy deps of the module itself (torchvision,
    skimage — only touched by the image-writing paths) are stubbed."""
    if "netdissect.dissection" in sys.modules:
        return sys.modules["netdissect.dissection"]
    pkg = types.ModuleType("netdissect")
    pkg.__path__ = [f"{REF}/netdissect"]
    sys.modules.setdefault("netdissect", pkg)
    for name in ("torchvision", "skimage", "skimage.morphology"):
        sys.modules.setdefault(name, types.ModuleType(name))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        import netdissect.dissection as dissection
    return dissection


# --- shared deterministic segmentation rule (label 0 = background) ---------

ANCHORS = np.array([[0.05, 0.05, 0.05], [0.95, 0.95, 0.95],
                    [0.8, 0.15, 0.15], [0.15, 0.8, 0.15],
                    [0.15, 0.15, 0.8], [0.5, 0.5, 0.5]], np.float32)
NAMES = ["black", "white", "red", "green", "blue", "gray"]


def _segment_np(img01: np.ndarray) -> np.ndarray:
    """[B,3,H,W] in [0,1] -> labels [B,H,W] in 1..len(NAMES)."""
    px = np.transpose(img01, (0, 2, 3, 1))
    d = np.sum((px[..., None, :] - ANCHORS) ** 2, axis=-1)
    return np.argmin(d, axis=-1) + 1


class _OurSegmenter:
    labels = ["-"] + NAMES

    def get_label_and_category_names(self):
        return list(self.labels), ["color"] * len(self.labels)

    def segment_batch(self, images):
        import jax.numpy as jnp
        return jnp.asarray(_segment_np(np.clip(np.asarray(images), 0, 1)))


class _TorchColorSegRunner:
    """GeneratorSegRunner-contract runner (reference ``dissection.py:1572``)
    applying the shared color rule to the generator output."""

    def __init__(self):
        self.num_classes = len(NAMES) + 1

    def get_label_and_category_names(self):
        return ([(n, "color") for n in ["-"] + NAMES], ["color"])

    def run_and_segment_batch(self, batch, model, want_bincount=False,
                              want_rgb=False):
        z = batch[0]
        out = model(z)
        img01 = ((out + 1) / 2).clamp(0, 1)
        seg = torch.from_numpy(
            _segment_np(img01.detach().numpy())).long()[:, None]
        bc = None
        if want_bincount:
            index = torch.arange(z.shape[0], dtype=torch.long)
            bc = (seg + index[:, None, None, None] * self.num_classes).view(-1)\
                .bincount(minlength=z.shape[0] * self.num_classes)
            bc = bc.view(z.shape[0], self.num_classes)
        rgb = (img01 * 255).permute(0, 2, 3, 1).byte() if want_rgb else None
        return seg, bc, rgb, out.shape[2:]


class _ZLoader:
    """batch_size-1 loader of fixed z batches (the reference's segloader)."""
    batch_size = 1

    def __init__(self, zs):
        self.zs = zs

    def __iter__(self):
        return iter([(torch.from_numpy(np.asarray(z, np.float32)),)
                     for z in self.zs])

    def __len__(self):
        return len(self.zs)


@pytest.fixture(scope="module")
def stacks():
    """(our InstrumentedModel, torch InstrumentedModel, layer, zs)."""
    from ganspace_tpu.models.base import InstrumentedModel
    from ganspace_tpu.models.proggan import ProGAN, ProGANConfig, init_params

    cfg = ProGANConfig(sizes=(64, 32, 32, 16))
    params = init_params(cfg, seed=4)
    ours = ProGAN(lsun_class="kitchen", cfg=cfg, params=params)
    inst = InstrumentedModel(ours)

    ref_proggan = _load_ref_module(
        "ref_proggan", f"{REF}/netdissect/proggan.py")
    ref_nethook = _load_ref_module(
        "ref_nethook", f"{REF}/netdissect/nethook.py")
    tmodel = ref_proggan.ProgressiveGenerator(sizes=list(cfg.sizes))
    tmodel.load_state_dict({k: torch.tensor(v) for k, v in params.items()})
    tmodel.eval()
    layer = "layer6"        # 16x16 maps at the 16x16 output: no upsampling
    tinst = ref_nethook.InstrumentedModel(tmodel)
    tinst.retain_layer(layer)
    inst.retain_layer(layer)

    n, seed = 16, 1
    zs = [np.asarray(ours.sample_latent(1, seed=seed + i)) for i in range(n)]
    return inst, tinst, layer, zs


def _ref_acts(tinst, layer, zs):
    acts = []
    for z in zs:
        tinst(torch.from_numpy(np.asarray(z, np.float32)))
        acts.append(tinst.retained_features()[layer].detach().numpy())
    return np.concatenate(acts)


def test_quantile_parity(stacks, tmp_path):
    """Both stacks' streaming quantile sketches track the exact quantiles
    of the same activation stream."""
    inst, tinst, layer, zs = stacks
    dissection = _ref_dissection()

    from ganspace_tpu.dissection.dissect import tally_stats

    stats = tally_stats(inst, layer, n_samples=len(zs), batch=1, seed=1)
    torch.manual_seed(0)   # the reference sketch's compression subsamples
    # The reference's state-dict cache writer predates modern numpy's
    # object-array rules; the math under test does not need it.
    monkey = dissection.save_state_dict
    dissection.save_state_dict = lambda *a, **k: None
    try:
        # resolution > the stream size makes the reference sketch exact
        # (its default 1024-sample buffer has ~3-5% tail error here, which
        # would test sketch coarseness rather than parity)
        rq, _topk = dissection.collect_quantiles_and_topk(
            str(tmp_path / "ref"), tinst, _ZLoader(zs),
            _TorchColorSegRunner(), k=8, resolution=8192)
    finally:
        dissection.save_state_dict = monkey
    ref_sketch = rq[layer]

    acts = _ref_acts(tinst, layer, zs)          # [N, U, h, w]
    flat = np.transpose(acts, (0, 2, 3, 1)).reshape(-1, acts.shape[1])
    for q in (0.5, 0.9, 0.995):
        exact = np.quantile(flat, q, axis=0)
        ours_q = np.asarray(stats["quantiles"].quantiles(q))[:, 0]
        ref_q = ref_sketch.quantiles([q]).numpy().reshape(-1)
        scale = np.abs(flat).max()
        assert np.abs(ours_q - exact).max() / scale < 0.02, q
        # the reference sketch's randomized compression carries a larger
        # tail error at this resolution/sample count
        assert np.abs(ref_q - exact).max() / scale < 0.04, q
        # and against each other
        assert np.abs(ours_q - ref_q).max() / scale < 0.05, q


def test_iou_tally_parity(stacks, tmp_path):
    """At identical thresholds, the pixel tally and IoU tables agree."""
    inst, tinst, layer, zs = stacks
    dissection = _ref_dissection()

    from ganspace_tpu.dissection.dissect import dissect

    # Shared per-unit levels: exact 0.995 quantiles of the reference stream.
    acts = _ref_acts(tinst, layer, zs)
    flat = np.transpose(acts, (0, 2, 3, 1)).reshape(-1, acts.shape[1])
    levels_np = np.quantile(flat, 0.995, axis=0).astype(np.float32)

    runner = _TorchColorSegRunner()
    (tmp_path / "refbc" / layer).mkdir(parents=True)   # its npz cache dir
    # The reference's upsample grid math predates torch 1.3's align_corners
    # default flip (its normalized coords divide by (size-1), the
    # align_corners=True convention); restore the written-for semantics so
    # equal-resolution sampling is the identity the reference intends.
    import torch.nn.functional as F
    orig_gs = F.grid_sample
    F.grid_sample = lambda *a, **k: orig_gs(*a, **{**k, "align_corners": True})
    try:
        (iou_scores, _iqr, total_counts, label_counts, act_counts,
         inter_counts) = dissection.collect_bincounts(
            str(tmp_path / "refbc"), tinst, _ZLoader(zs),
            {layer: torch.tensor(levels_np)}, runner)
    finally:
        F.grid_sample = orig_gs

    report = dissect(inst, layer, _OurSegmenter(), n_samples=len(zs),
                     batch=1, seed=1, levels=levels_np)
    ours_iou = np.asarray(report["iou_matrix"])      # [U, L]

    ref_iou = iou_scores[layer].numpy().T            # [L, U] -> [U, L]
    units = ours_iou.shape[0]
    n_px = len(zs) * 16 * 16

    # Label pixel counts (reference counts exclude nothing): compare against
    # our seg_count implied by iou denominators via the raw count tensors.
    ref_inter = inter_counts[layer].numpy().T        # [U, L]
    # Our tally keeps float sums; recover integer-ish counts from the report
    # path by recomputing with the same mask rule.
    #   (direct comparison: reference intersections vs ours)
    from ganspace_tpu.dissection.dissect import upsample_grid  # noqa: F401
    import jax.numpy as jnp
    our_inter = np.zeros_like(ref_inter, dtype=np.float64)
    our_act = np.zeros(units)
    for z in zs:
        inst.model.partial_forward(jnp.asarray(z), layer)
        act = np.asarray(inst.retained_features()[layer])
        img01 = np.clip(np.asarray(inst.model.forward(jnp.asarray(z))), 0, 1)
        seg = _segment_np(img01)
        mask = act > levels_np[None, :, None, None]
        our_act += mask.sum(axis=(0, 2, 3))
        onehot = np.eye(len(NAMES) + 1, dtype=np.float64)[seg]  # [B,H,W,L]
        our_inter += np.einsum("buhw,bhwl->ul", mask.astype(np.float64),
                               onehot)
    # Integer pixel counts must match exactly up to activation-parity noise
    # at the threshold boundary (allow a few flipped pixels).
    assert np.abs(our_inter - ref_inter).max() <= 3, \
        np.abs(our_inter - ref_inter).max()
    assert np.abs(our_act - act_counts[layer].numpy()[0]).max() <= 3

    # IoU tables agree (reference label 0 is skipped on their side; compare
    # real labels only).
    diff = np.abs(ours_iou[:, 1:] - ref_iou[:, 1:]).max()
    assert diff < 5e-3, diff

    # Top-label agreement for clearly-decided units.
    ours_best = np.argmax(ours_iou[:, 1:], axis=1)
    ref_best = np.argmax(ref_iou[:, 1:], axis=1)
    sorted_iou = np.sort(ours_iou[:, 1:], axis=1)
    decided = (sorted_iou[:, -1] - sorted_iou[:, -2]) > 1e-3
    assert decided.sum() >= units // 2
    assert np.array_equal(ours_best[decided], ref_best[decided])

    # Label pixel counts equal on both stacks (exact: same seg rule).
    our_label_counts = np.zeros(len(NAMES) + 1)
    for z in zs:
        img01 = np.clip(np.asarray(inst.model.forward(jnp.asarray(z))), 0, 1)
        our_label_counts += np.bincount(
            _segment_np(img01).reshape(-1), minlength=len(NAMES) + 1)
    assert np.abs(our_label_counts - label_counts.numpy()).max() <= 3
    assert int(total_counts.numpy()[0]) == n_px
