"""Download helpers, statedict adapters, samplers, zdataset
(reference ``utils.py:44-92``, ``netdissect/{statedict,sampler,zdataset}.py``)."""

import numpy as np
import pytest

from ganspace_tpu.sampling import (
    FixedRandomSubsetSampler, FixedSubsetSampler, z_sample_for_model,
)
from ganspace_tpu.utils.downloads import (
    DownloadUnavailable, download_ckpt, download_manual, url_cache_name,
)
from ganspace_tpu.utils.statedict import (
    flatten_tree, load_state_dict, numpy_state_dict, save_state_dict,
    unflatten_tree,
)

from helpers import tiny_dcgan


def test_statedict_roundtrip(tmp_path):
    tree = {"a": {"w": np.ones((2, 3)), "b": np.zeros(4)},
            "layers": [np.full(2, 7.0), np.full(2, 8.0)]}
    flat = flatten_tree(tree)
    assert set(flat) == {"a.w", "a.b", "layers.0", "layers.1"}
    nested = unflatten_tree(flat)
    assert np.array_equal(nested["a"]["w"], tree["a"]["w"])
    assert np.array_equal(nested["layers"]["1"], tree["layers"][1])
    p = save_state_dict(tmp_path / "s.npz", tree)
    loaded = load_state_dict(p)
    assert np.array_equal(loaded["a.w"], tree["a"]["w"])
    loaded_nested = load_state_dict(p, nested=True)
    assert np.array_equal(loaded_nested["a"]["b"], tree["a"]["b"])


def test_numpy_state_dict():
    torch = pytest.importorskip("torch")
    sd = {"w": torch.ones(2, 2), "b": np.zeros(3)}
    out = numpy_state_dict(sd)
    assert isinstance(out["w"], np.ndarray) and out["w"].shape == (2, 2)


def test_download_offline_behavior(tmp_path):
    dest = tmp_path / "ck.pt"
    # zero-egress: must raise DownloadUnavailable naming the destination
    with pytest.raises(DownloadUnavailable) as e:
        download_ckpt("https://example.invalid/model.pt", dest)
    assert str(dest) in str(e.value)
    # existing file short-circuits without any network call
    dest.write_bytes(b"x")
    assert download_ckpt("https://example.invalid/model.pt", dest) == dest
    # manual fallback, non-interactive: raises when missing, returns when present
    with pytest.raises(DownloadUnavailable):
        download_manual("https://mega.nz/f", tmp_path / "m.pt",
                        interactive=False)
    (tmp_path / "m.pt").write_bytes(b"y")
    assert download_manual("https://mega.nz/f", tmp_path / "m.pt",
                           interactive=False).is_file()


def test_url_cache_name():
    a = url_cache_name("http://x/y")
    b = url_cache_name("http://x/y", etag="abc")
    assert a != b and b.startswith(a)


def test_samplers():
    s = FixedSubsetSampler([5, 3, 9])
    assert list(s) == [5, 3, 9]
    assert len(s) == 3 and s[1] == 3
    assert s.subset([0, 2]).samples == [5, 9]

    r1 = FixedRandomSubsetSampler(100, seed=1)
    r2 = FixedRandomSubsetSampler(100, seed=1)
    assert r1.samples == r2.samples            # deterministic
    assert sorted(r1.samples) == list(range(100))
    labels = {i: i % 2 for i in range(100)}
    evens = r1.class_subset(labels, 0)
    assert all(v % 2 == 0 for v in evens.samples)


def test_z_sample_for_model():
    model = tiny_dcgan()
    z = z_sample_for_model(model, size=7, seed=3)
    assert z.shape == (7, model.get_latent_dims())
    assert np.allclose(z, z_sample_for_model(model, 7, 3))
