"""Host-side latent sampling with bit-exact reference RNG parity.

The reference draws all latents on the host with numpy and ships them to the
device; the sampling discipline is load-bearing for cache reproducibility:

* every ``sample_latent`` call without an explicit seed first draws
  ``seed = randint(int32_max)`` from the *global* numpy stream (seeded with
  ``SEED_SAMPLING=1`` by the decomposition driver, reference
  ``decomposition.py:34,226-227``), then samples from a fresh
  ``RandomState(seed)`` (reference ``models/wrappers.py:167-179``);
* StyleGAN/StyleGAN2 latents are ``standard_normal(512 * n).reshape(n, 512)``
  (reference ``wrappers.py:172-174``);
* BigGAN latents are scipy ``truncnorm.rvs(-2, 2, size=(n, 128))`` scaled by
  the truncation value (reference ``pytorch_pretrained_biggan/utils.py:21-33``);
* ProGAN latents are ``standard_normal(n * depth).reshape(n, depth)`` from
  ``RandomState(seed)`` directly — NOT via the global stream draw chain
  (reference ``netdissect/zdataset.py:26-40`` — but note the wrapper at
  ``wrappers.py:494-498`` does draw the seed from the global stream).

We replicate those exact draw sequences here, isolated in a ``SeedStream`` so
library code never touches numpy's actual global state.  Sampling ~512 floats
per latent on the host is negligible next to synthesis; the arrays are shipped
to the device afterwards.

Seed map (reference ``decomposition.py:34-37``):
  SAMPLING=1, RANDOM_DIRS=2, LINREG=3, VISUALIZATION=5.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import truncnorm

SEED_SAMPLING = 1
SEED_RANDOM_DIRS = 2
SEED_LINREG = 3
SEED_VISUALIZATION = 5

_INT32_MAX = np.iinfo(np.int32).max


class SeedStream:
    """Stand-in for the reference's use of the global numpy RandomState.

    ``np.random.seed(s)`` followed by ``np.random.randint(int32_max)`` draws
    the same values as ``RandomState(s).randint(int32_max)``, so an isolated
    RandomState reproduces the reference's seed sequence exactly.
    """

    def __init__(self, seed: int):
        self._rs = np.random.RandomState(seed)

    def next_seed(self) -> int:
        return int(self._rs.randint(_INT32_MAX))


def gaussian_latents(n_samples: int, dim: int, seed: int) -> np.ndarray:
    """Reference ``wrappers.py:171-174`` / ``zdataset.py:33-37``.

    Values are bit-identical to
    ``RandomState(seed).standard_normal(dim*n).astype(float32)``; the draw
    itself goes through the native threaded generator
    (``native/src/fastrand.cpp``) when available — the legacy numpy path is
    single-threaded and dominates host time on 1M-sample runs.
    """
    from ganspace_tpu.native import normal_batches
    return normal_batches([seed], dim * n_samples)[0].reshape(n_samples, dim)


def truncated_latents(n_samples: int, dim: int, truncation: float, seed: int) -> np.ndarray:
    """Reference ``pytorch_pretrained_biggan/utils.py:21-33``."""
    state = np.random.RandomState(seed)
    values = truncnorm.rvs(-2, 2, size=(n_samples, dim), random_state=state).astype(np.float32)
    return truncation * values


def z_sample_for_model(model, size: int = 100, seed: int = 1) -> np.ndarray:
    """Seeded z batch matching the model's latent dims
    (reference ``netdissect/zdataset.py:26-40`` ``z_sample_for_model``)."""
    dims = model.get_latent_dims()
    return gaussian_latents(size, dims, seed)


class FixedSubsetSampler:
    """Deterministic index subset (reference ``netdissect/sampler.py``):
    iterate/sample a fixed list of dataset indices."""

    def __init__(self, samples):
        self.samples = list(samples)

    def __iter__(self):
        return iter(self.samples)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    def subset(self, new_subset):
        return FixedSubsetSampler(self.dereference(new_subset))

    def dereference(self, indices):
        return [self.samples[i] for i in indices]


class FixedRandomSubsetSampler(FixedSubsetSampler):
    """Seeded random shuffle of [start, end), optionally filtered — a
    reproducible train/val split helper (reference ``sampler.py``)."""

    def __init__(self, data_source_length: int, start=None, end=None,
                 seed: int = 1):
        rs = np.random.RandomState(seed)
        shuffled = rs.permutation(data_source_length)
        self.start = start or 0
        end = end if end is not None else data_source_length
        super().__init__(shuffled[self.start:end].tolist())

    def class_subset(self, labels, class_filter) -> "FixedSubsetSampler":
        """Keep indices whose label matches ``class_filter``."""
        keep = [i for i, s in enumerate(self.samples)
                if labels[s] == class_filter]
        return self.subset(keep)


def random_directions(components: int, dimensions: int) -> np.ndarray:
    """Unit-norm random baseline directions (reference ``decomposition.py:42-46``)."""
    gen = np.random.RandomState(seed=SEED_RANDOM_DIRS)
    dirs = gen.normal(size=(components, dimensions))
    dirs /= np.sqrt(np.sum(dirs ** 2, axis=1, keepdims=True))
    return dirs.astype(np.float32)


def random_directions_device(components: int, dimensions: int):
    """Device-resident unit-norm baseline directions.

    Same role as :func:`random_directions` but drawn by the device PRNG
    (threefry keyed on the same ``SEED_RANDOM_DIRS`` — deterministic across
    processes/hosts like the host stream, different values).  For big-D
    conv taps the host path costs ~1.3 s of single-core ``RandomState``
    generation plus a D*c-sized host->device upload (~2 s for D=131k
    through a relay); this is microseconds and zero transfer.  Used
    whenever the run is already on device-RNG provenance
    (``GANSPACE_DEVICE_RNG=1``, the default); host-RNG runs keep the
    bit-exact reference stream."""
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(SEED_RANDOM_DIRS)
    dirs = jax.random.normal(key, (components, dimensions), jnp.float32)
    return dirs / jnp.sqrt(jnp.sum(dirs ** 2, axis=1, keepdims=True))
