from ganspace_tpu.stats.running import (
    RunningCrossCovariance,
    RunningQuantile,
    RunningConditionalQuantile,
    RunningTopK,
    RunningVariance,
)

__all__ = [
    "RunningTopK",
    "RunningQuantile",
    "RunningConditionalQuantile",
    "RunningCrossCovariance",
    "RunningVariance",
]
