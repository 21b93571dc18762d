"""Decomposition estimator suite (reference ``estimators.py``).

Five interchangeable backends behind the duck-typed protocol the pipeline
expects (reference ``estimators.py:206-218``):

    fit(X)                      full-batch fit on centered samples
    fit_partial(X) -> bool      streaming update (ipca only)
    get_components() -> (components [c, D], stdev [c], var_ratio [c])
    batch_support : bool
    get_param_str() -> str      cache-filename fragment (exact reference format)
    mean_                       data mean seen by the estimator

All heavy math runs on device; see the individual modules for the
TPU-native formulations.
"""

from ganspace_tpu.estimators.ipca import IPCAEstimator
from ganspace_tpu.estimators.pca import PCAEstimator
from ganspace_tpu.estimators.rsvd import FacebookPCAEstimator
from ganspace_tpu.estimators.ica import ICAEstimator
from ganspace_tpu.estimators.spca import SPCAEstimator


def get_estimator(name: str, n_components: int, alpha: float = 1.0,
                  feature_sharding=None, refine=None):
    """Name -> estimator factory (reference ``estimators.py:206-218``).

    ``feature_sharding`` (a NamedSharding over the feature axis) turns the
    streaming estimator's statistics into mesh-sharded state; the full-batch
    estimators run host-side and ignore it.  ``refine`` pins the sketch
    tier's refine policy ("auto"/"always"/"never") per instance; None
    reads GANSPACE_IPCA_REFINE once at construction."""
    if name == "pca":
        return PCAEstimator(n_components)
    if name == "ipca":
        return IPCAEstimator(n_components, feature_sharding=feature_sharding,
                             refine=refine)
    if name == "fbpca":
        return FacebookPCAEstimator(n_components)
    if name == "ica":
        return ICAEstimator(n_components)
    if name == "spca":
        return SPCAEstimator(n_components, alpha)
    raise RuntimeError("Unknown estimator")


__all__ = [
    "get_estimator",
    "IPCAEstimator",
    "PCAEstimator",
    "FacebookPCAEstimator",
    "ICAEstimator",
    "SPCAEstimator",
]
