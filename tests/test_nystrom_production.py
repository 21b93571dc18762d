"""Big-D streaming PCA tiers vs exact PCA at production shape.

The sketch tier's accuracy claims were previously measured only on
synthetic decaying spectra; this streams a REAL conv-tap activation stream
at production dimensionality (D = 128*32*32 = 131072, the early-conv scale
of a 1024px generator head) through the streaming tiers at matched sample
counts and compares against the EXACT PCA of the same stream (computed via
the N x N Gram — feasible at test scale, impossible in production).

Measured here (and the reason the refine pass exists, VERDICT r1 weak #7):
single-pass Nyström at l=4c only reaches ~0.88 per-component cosine by
component 8 on these slowly-decaying real spectra; one extra pass against
the orthonormalized first-pass range (``IPCAEstimator.begin_refine``) takes
every component above 0.99 — better than the sklearn-mirror incremental
tier itself, whose trailing components sit near 0.74.
"""

import numpy as np
import pytest

from ganspace_tpu.estimators import IPCAEstimator
from ganspace_tpu.models import get_model
from ganspace_tpu.models.base import InstrumentedModel
from ganspace_tpu.models.stylegan2 import SG2Config

pytestmark = pytest.mark.slow

N, BATCH, C = 1536, 128, 16
TAP = "convs.4"          # 32px stage, 128 ch -> D = 131072


@pytest.fixture(scope="module")
def conv_stream():
    cfg = SG2Config(resolution=32,
                    channels=((4, 128), (8, 128), (16, 128), (32, 128)))
    model = get_model("StyleGAN2", "ffhq", cfg=cfg)
    inst = InstrumentedModel(model)
    inst.retain_layer(TAP)
    batches = []
    for i in range(0, N, BATCH):
        z = model.sample_latent(BATCH, seed=1 + i)
        model.partial_forward(z, TAP)
        batches.append(np.asarray(
            inst.retained_features()[TAP], np.float32).reshape(BATCH, -1))
    return batches


@pytest.fixture(scope="module")
def exact_pca(conv_stream):
    """Ground truth via the N x N Gram of the full centered stream."""
    x = np.concatenate(conv_stream, 0).astype(np.float64)
    xc = x - x.mean(0)
    w, v = np.linalg.eigh(xc @ xc.T)
    idx = np.argsort(w)[::-1][:C]
    comp = (xc.T @ v[:, idx]) / np.sqrt(np.maximum(w[idx], 1e-12))
    stdev = np.sqrt(w[idx] / (N - 1))
    return comp.T.astype(np.float32), stdev.astype(np.float32)


def _cos(a, b):
    return np.abs(np.sum(np.asarray(a) * np.asarray(b), axis=-1))


def test_refined_nystrom_matches_exact_at_production_d(conv_stream, exact_pca):
    d = conv_stream[0].shape[1]
    assert d == 128 * 32 * 32
    comp_true, stdev_true = exact_pca

    ny = IPCAEstimator(C, mode="nystrom")
    for xb in conv_stream:
        ny.fit_partial(xb)
    assert ny.begin_refine()            # production driver does this
    for xb in conv_stream:
        ny.fit_partial(xb)
    assert not ny.begin_refine()        # one power iteration suffices; idempotent

    comp, stdev, _ = ny.get_components()
    cos = _cos(comp_true, comp)
    # North star (BASELINE.md): >0.99 per-component cosine — on ALL
    # components, against exact PCA, at production D.
    assert cos.min() > 0.99, f"per-comp |cos| {cos}"
    assert np.allclose(stdev, stdev_true, rtol=0.02)


def test_sklearn_mirror_top_components_at_production_d(conv_stream, exact_pca):
    comp_true, _ = exact_pca
    sk = IPCAEstimator(C, mode="sklearn")
    for xb in conv_stream:
        sk.fit_partial(xb)
    cos = _cos(comp_true, sk.get_components()[0])
    # The incremental mirror is reference-faithful but not refineable: its
    # top half is solid, the trailing cluster is not (~0.74 at C=16 here).
    assert cos[: C // 2].min() > 0.99, f"per-comp |cos| {cos}"


def test_tier_autoselect_crossover():
    """auto mode: small D -> exact moments, big D -> Nyström sketch."""
    est = IPCAEstimator(4)
    assert est._use_moments(512) and not est._use_nystrom(512)
    assert not est._use_moments(131072) and est._use_nystrom(131072)
