"""Estimator suite numeric golden tests vs sklearn on synthetic data
(rebuild test strategy per SURVEY.md §4)."""

import numpy as np
import pytest
from sklearn.decomposition import PCA, FastICA, IncrementalPCA

from ganspace_tpu.estimators import get_estimator

N, D, C = 2000, 48, 6


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(0)
    basis = np.linalg.qr(rs.randn(D, D))[0]
    scales = np.concatenate([np.linspace(10, 2, 12), 0.1 * np.ones(D - 12)])
    x = ((rs.randn(N, D) * scales) @ basis.T + 5.0).astype(np.float32)
    return x


def cos_rows(a, b):
    return np.abs(np.sum(a * b, -1)
                  / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)))


def test_ipca_matches_sklearn(data):
    # the sklearn-mirror mode is arithmetic-identical to IncrementalPCA
    from ganspace_tpu.estimators.ipca import IPCAEstimator
    ours = IPCAEstimator(C, mode="sklearn")
    sk = IncrementalPCA(C)
    for i in range(0, N, 400):
        assert ours.fit_partial(data[i:i + 400])
        sk.partial_fit(data[i:i + 400])
    comp, stdev, var_ratio = ours.get_components()
    # signed comparison: sign convention must match sklearn's svd_flip
    assert np.abs(comp - sk.components_).max() < 1e-4
    assert np.allclose(stdev, np.sqrt(sk.explained_variance_), rtol=1e-4)
    assert np.allclose(var_ratio, sk.explained_variance_ratio_, atol=1e-5)
    assert np.abs(ours.mean_ - sk.mean_).max() < 1e-4


def test_ipca_fit_full(data):
    from ganspace_tpu.estimators.ipca import IPCAEstimator
    ours = IPCAEstimator(C, mode="sklearn")
    ours.fit(data)
    sk = IncrementalPCA(C, batch_size=ours.batch_size)
    sk.fit(data)
    comp, _, _ = ours.get_components()
    assert cos_rows(comp, sk.components_).min() > 0.999


def test_ipca_rejects_small_batch():
    ours = get_estimator("ipca", C)
    assert not ours.fit_partial(np.zeros((C - 1, D), np.float32))


def test_pca_matches_sklearn(data):
    xc = data - data.mean(0, keepdims=True)
    ours = get_estimator("pca", C)
    ours.fit(xc.copy())
    sk = PCA(C, svd_solver="full")
    sk.fit(xc)
    comp, stdev, var_ratio = ours.get_components()
    assert cos_rows(comp, sk.components_).min() > 0.9999
    assert np.allclose(stdev, np.sqrt(sk.explained_variance_), rtol=1e-2)
    assert np.all(np.abs(ours.mean_) < 1e-3)


def test_fbpca_matches_full_pca(data):
    xc = data - data.mean(0, keepdims=True)
    ours = get_estimator("fbpca", C)
    ours.fit(xc.copy())
    sk = PCA(C, svd_solver="full")
    sk.fit(xc)
    comp, _, _ = ours.get_components()
    assert cos_rows(comp, sk.components_).min() > 0.999
    assert ours.get_param_str() == f"fbpca_c{C}_it2_l{2*C}"


def test_ica_recovers_sources():
    rs = np.random.RandomState(0)
    s = rs.laplace(size=(N, C)).astype(np.float32)
    a = rs.randn(C, D).astype(np.float32)
    x = s @ a
    x -= x.mean(0, keepdims=True)
    ours = get_estimator("ica", C)
    ours.fit(x)
    comp, stdev, var_ratio = ours.get_components()
    sk = FastICA(C, random_state=0, whiten="unit-variance", max_iter=10000)
    sk.fit(x)
    skc = sk.components_ / np.linalg.norm(sk.components_, axis=-1, keepdims=True)
    match = np.abs(comp @ skc.T)
    assert match.max(axis=1).min() > 0.99  # every sklearn IC recovered
    assert np.all(np.diff(stdev) <= 1e-6)  # sorted descending


def test_spca_sparsity_scales_with_alpha(data):
    xc = data - data.mean(0, keepdims=True)
    sparsities = []
    for alpha in (1.0, 5.0):
        est = get_estimator("spca", C, alpha)
        est.fit(xc.copy())
        comp, stdev, _ = est.get_components()
        sparsities.append(np.mean(np.abs(comp) < 1e-8))
        assert np.allclose(np.linalg.norm(comp, axis=1), 1.0, atol=1e-4)
        assert np.all(np.diff(stdev) <= 1e-5)
    assert sparsities[1] > sparsities[0] > 0.05


def test_param_strings():
    # Cache filenames depend on these exact strings (decomposition.py:384-394).
    assert get_estimator("ipca", 80).get_param_str() == "ipca_c80"
    assert get_estimator("pca", 80).get_param_str() == "pca-full_c80"
    assert get_estimator("fbpca", 80).get_param_str() == "fbpca_c80_it2_l160"
    assert get_estimator("ica", 80).get_param_str() == "ica_c80_w"
    assert get_estimator("spca", 80, 10.0).get_param_str() == "spca_c80_a10.0"
    with pytest.raises(RuntimeError):
        get_estimator("nope", 80)


def test_ipca_blocks_matches_sequential():
    """fit_partial_blocks (one lax.scan dispatch) must be numerically
    identical to the same blocks fed through fit_partial one by one."""
    import jax.numpy as jnp
    from ganspace_tpu.estimators.ipca import IPCAEstimator

    rs = np.random.RandomState(0)
    blocks = rs.randn(6, 300, 64).astype(np.float32)

    seq = IPCAEstimator(16, mode="sklearn")
    for b in blocks:
        assert seq.fit_partial(b)

    fused = IPCAEstimator(16, mode="sklearn")
    assert fused.fit_partial_blocks(jnp.asarray(blocks))

    assert seq.n_samples_seen_ == fused.n_samples_seen_ == 1800
    for name in ("mean", "var", "components", "singular_values"):
        a = np.asarray(getattr(seq._state, name))
        b = np.asarray(getattr(fused._state, name))
        assert np.allclose(a, b, atol=1e-4), (name, np.abs(a - b).max())
    cs, ss, _ = seq.get_components()
    cf, sf, _ = fused.get_components()
    cos = np.abs(np.sum(cs * cf, axis=-1))
    assert cos.min() > 0.9999


def test_ipca_moments_mode(data):
    """The small-D fast path (streaming moments + one final eigh) is exact
    covariance PCA; it must agree with sklearn PCA to tight tolerance and
    with sklearn IncrementalPCA to high cosine."""
    from ganspace_tpu.estimators.ipca import IPCAEstimator

    ours = IPCAEstimator(C)            # auto -> moments for D=48
    for i in range(0, N, 400):
        assert ours.fit_partial(data[i:i + 400])
    assert ours._moments is not None and ours._state is None
    comp, stdev, var_ratio = ours.get_components()

    sk = PCA(C, svd_solver="full").fit(data)
    assert cos_rows(comp, sk.components_).min() > 0.9999
    assert np.allclose(stdev, np.sqrt(sk.explained_variance_), rtol=1e-3)
    assert np.allclose(var_ratio, sk.explained_variance_ratio_, atol=1e-4)
    assert np.abs(ours.mean_ - data.mean(0)).max() < 1e-3

    ipca = IncrementalPCA(C)
    for i in range(0, N, 400):
        ipca.partial_fit(data[i:i + 400])
    # IncrementalPCA is itself an approximation; near-degenerate trailing
    # eigenvalues limit this cross-check (the PCA comparison above is the
    # correctness anchor).
    assert cos_rows(comp, ipca.components_).min() > 0.98

    # fused blocks reduce to the same moments
    fused = IPCAEstimator(C)
    assert fused.fit_partial_blocks(data.reshape(5, N // 5, D))
    comp2, _, _ = fused.get_components()
    assert cos_rows(comp, comp2).min() > 0.99999
    assert fused.n_samples_seen_ == N


def test_ipca_nystrom_mode():
    """Big-D tier: single-pass Nystrom sketch must recover the top
    components of a decaying-spectrum stream (cosine vs exact PCA)."""
    from ganspace_tpu.estimators.ipca import IPCAEstimator

    rs = np.random.RandomState(3)
    D2, N2, C2 = 1024, 6000, 8
    basis = np.linalg.qr(rs.randn(D2, D2))[0]
    scales = np.concatenate([np.linspace(20, 5, 16), 0.2 * np.ones(D2 - 16)])
    data = ((rs.randn(N2, D2) * scales) @ basis.T + 1.5).astype(np.float32)

    est = IPCAEstimator(C2, mode="nystrom")
    for i in range(0, N2, 500):
        assert est.fit_partial(data[i:i + 500])
    assert est._nystrom is not None
    comp, stdev, ratio = est.get_components()
    assert comp.shape == (C2, D2)

    sk = PCA(C2, svd_solver="full").fit(data)
    assert cos_rows(comp, sk.components_).min() > 0.99
    assert np.allclose(stdev, np.sqrt(sk.explained_variance_), rtol=0.05)
    assert np.allclose(ratio, sk.explained_variance_ratio_, atol=5e-3)
    assert np.abs(est.mean_ - data.mean(0)).max() < 1e-2

    # blocks path reduces to the same sketch
    est2 = IPCAEstimator(C2, mode="nystrom")
    assert est2.fit_partial_blocks(data.reshape(12, 500, D2))
    comp2, _, _ = est2.get_components()
    assert cos_rows(comp, comp2).min() > 0.9999


def test_nystrom_abort_refine_restores_first_pass():
    """An interrupted refine sweep must fall back to the completed
    single-pass sketch (a partial second pass is strictly worse), and a
    completed refine must NOT be revertible afterwards."""
    from ganspace_tpu.estimators.ipca import IPCAEstimator

    rs = np.random.RandomState(5)
    D, N, C = 512, 4000, 6
    scales = np.concatenate([np.linspace(10, 3, 12), 0.1 * np.ones(D - 12)])
    data = (rs.randn(N, D) * scales).astype(np.float32)

    est = IPCAEstimator(C, mode="nystrom")
    for i in range(0, N, 500):
        assert est.fit_partial(data[i:i + 500])
    first = est.get_components()

    assert est.begin_refine()
    est.fit_partial(data[:500])          # 12.5% of a second pass
    est.abort_refine()
    assert est.n_samples_seen_ == N      # first-pass count restored
    restored = est.get_components()
    for a, b in zip(first, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # abort must be armed again-able: run the refine to completion now
    assert est.begin_refine()
    for i in range(0, N, 500):
        assert est.fit_partial(data[i:i + 500])
    refined = est.get_components()       # consuming finalizes the refine
    est.abort_refine()                   # must be a no-op from here on
    again = est.get_components()
    np.testing.assert_array_equal(np.asarray(refined[0]), np.asarray(again[0]))
    # and the refined estimate genuinely moved off the single-pass sketch
    assert not np.array_equal(np.asarray(refined[0]), np.asarray(first[0]))
