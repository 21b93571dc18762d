from ganspace_tpu.dissection.dissect import (
    ColorSegmenter,
    SegmenterBase,
    dissect,
    tally_stats,
    upsample_grid,
)

__all__ = [
    "dissect",
    "tally_stats",
    "upsample_grid",
    "SegmenterBase",
    "ColorSegmenter",
]
