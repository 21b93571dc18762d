"""Deterministic dataset subsetting (reference ``netdissect/sampler.py``).

The exact expected sequences below are the reference's own self-test
vectors (``sampler.py:112-134``) — behavioral parity is the contract."""

import numpy as np
import pytest

from ganspace_tpu.dissection.sampler import (
    FixedRandomSubsetSampler,
    FixedSubsetSampler,
    coordinate_sample,
)


def test_fixed_subset_sampler_basics():
    s = FixedSubsetSampler([5, 2, 9])
    assert len(s) == 3 and list(s) == [5, 2, 9] and s[1] == 2
    assert s.dereference([2, 0]) == [9, 5]
    sub = s.subset([2, 0])
    assert list(sub) == [9, 5]


def test_fixed_random_subset_sampler_reference_vectors():
    fss = FixedRandomSubsetSampler(range(10))
    assert len(fss) == 10
    assert list(fss) == [8, 0, 3, 4, 5, 2, 9, 6, 7, 1]
    fss = FixedRandomSubsetSampler(range(10), 3, 8)
    assert len(fss) == 5
    assert list(fss) == [4, 5, 2, 9, 6]
    fss = FixedRandomSubsetSampler([(i, i % 3) for i in range(10)],
                                   class_filter=1)
    assert len(fss) == 3
    assert list(fss) == [4, 7, 1]


def test_coordinate_sample_reference_vectors():
    np.testing.assert_almost_equal(
        coordinate_sample((26, 26), 10, range(101, 102)),
        [[[14, 0, 12, 11, 8, 13, 11, 20, 7, 20],
          [9, 22, 7, 11, 23, 18, 21, 15, 2, 5]]])
    # Resolution independence: halving the resolution halves coordinates.
    np.testing.assert_almost_equal(
        coordinate_sample((13, 13), 10, range(101, 102)),
        [[[7, 0, 6, 5, 4, 6, 5, 10, 3, 10],
          [4, 11, 3, 5, 11, 9, 10, 7, 1, 2]]])
    np.testing.assert_almost_equal(
        coordinate_sample((13, 13), 10, range(100, 102), flat=True),
        [[8, 24, 67, 103, 87, 79, 138, 94, 98, 53],
         [95, 11, 81, 70, 63, 87, 75, 137, 40, 132]])


def test_batches_with_sampler(tmp_path):
    from ganspace_tpu.dissection.broden import (
        BrodenDataset,
        write_synthetic_broden,
    )

    write_synthetic_broden(tmp_path, n_images=6, size=16)
    ds = BrodenDataset(tmp_path)
    sampler = FixedRandomSubsetSampler(ds, end=4, seed=7)
    batches = list(ds.batches(2, sampler=sampler))
    assert sum(b[0].shape[0] for b in batches) == 4
    # order equals the sampler's indices
    direct = [ds[i][0] for i in sampler]
    got = np.concatenate([b[0] for b in batches])
    np.testing.assert_array_equal(got, np.stack(direct))
    # limit caps the sampled sequence
    batches = list(ds.batches(2, limit=2, sampler=sampler))
    assert sum(b[0].shape[0] for b in batches) == 2
    # identical seed -> identical subset on a fresh sampler
    again = FixedRandomSubsetSampler(ds, end=4, seed=7)
    assert list(again) == list(sampler)


def test_classifier_dissection_subset(tmp_path):
    """dissect_classifier over a seeded subset is reproducible and differs
    from the contiguous-prefix run."""
    import jax.numpy as jnp

    from ganspace_tpu.dissection.broden import (
        BrodenDataset,
        write_synthetic_broden,
    )
    from ganspace_tpu.dissection.runners import dissect_classifier

    write_synthetic_broden(tmp_path, n_images=8, size=16)
    ds = BrodenDataset(tmp_path)

    def features_fn(images):
        return jnp.stack([images.mean(axis=1), images[:, 0] - images[:, 1]],
                         axis=1)

    def run(sampler):
        return dissect_classifier(features_fn, ds, ds.labels, batch=4,
                                  limit=4, sampler=sampler)

    r1 = run(FixedRandomSubsetSampler(ds, end=4, seed=3))
    r2 = run(FixedRandomSubsetSampler(ds, end=4, seed=3))
    assert r1["units"][0]["iou"] == r2["units"][0]["iou"]
    assert r1["n_samples"] == 4
