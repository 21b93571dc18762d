"""Multi-device mesh tests on the virtual 8-device CPU mesh.

Validates that the production shardings (data-parallel synthesis,
feature-sharded IPCA with psum'd Grams) execute and match replicated results.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ganspace_tpu.estimators.ipca import IPCAEstimator
from ganspace_tpu.parallel import get_mesh, shard_batch

from helpers import tiny_stylegan2


def test_mesh_setup():
    mesh = get_mesh("8")
    assert mesh.devices.shape == (8,)
    mesh2 = get_mesh("4x2")
    assert mesh2.axis_names == ("data", "model")


def test_feature_sharded_ipca_matches_replicated():
    rs = np.random.RandomState(0)
    x = (rs.randn(1024, 256) * np.linspace(5, 0.5, 256)).astype(np.float32)

    ref = IPCAEstimator(8)
    for i in range(0, 1024, 256):
        ref.fit_partial(x[i:i + 256])
    comp_ref, stdev_ref, _ = ref.get_components()

    mesh = get_mesh()
    feat_sh = NamedSharding(mesh, P(None, "data"))
    est = IPCAEstimator(8, feature_sharding=feat_sh)
    for i in range(0, 1024, 256):
        est.fit_partial(x[i:i + 256])
    comp, stdev, _ = est.get_components()

    assert np.abs(comp - comp_ref).max() < 1e-4
    assert np.allclose(stdev, stdev_ref, rtol=1e-4)


def test_data_parallel_synthesis_matches_single_device():
    model = tiny_stylegan2()
    mesh = get_mesh()
    z = np.asarray(model.sample_latent(16, seed=11))

    img_single = np.asarray(model.forward(jnp.asarray(z)))
    img_sharded = np.asarray(model.forward(shard_batch(z, mesh)))
    assert np.abs(img_single - img_sharded).max() < 1e-5


@pytest.mark.slow
def test_dryrun_entrypoint():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_feature_sharded_nystrom_refine_matches_replicated():
    """Sketch tier + refine pass under feature sharding: the [D, l] sketch,
    the CholQR range finder, and the second pass must all run shard-local
    and match the replicated run."""
    rs = np.random.RandomState(1)
    x = (rs.randn(2048, 4096) * np.linspace(5, 0.5, 4096)).astype(np.float32)

    def run(feat_sh):
        est = IPCAEstimator(8, feature_sharding=feat_sh, mode="nystrom")
        for i in range(0, 2048, 256):
            est.fit_partial(x[i:i + 256])
        assert est.begin_refine()
        for i in range(0, 2048, 256):
            est.fit_partial(x[i:i + 256])
        return est.get_components()

    comp_ref, stdev_ref, _ = run(None)
    mesh = get_mesh()
    comp, stdev, _ = run(NamedSharding(mesh, P(None, "data")))

    assert np.abs(np.abs(np.sum(comp * comp_ref, -1)) - 1).max() < 1e-4
    assert np.allclose(stdev, stdev_ref, rtol=1e-4)
