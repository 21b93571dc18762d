from ganspace_tpu.dissection.dissect import (
    ColorSegmenter,
    SegmenterBase,
    dissect,
    tally_stats,
    upsample_grid,
)
from ganspace_tpu.dissection.segmenter import (
    UnifiedParsingSegmenter,
    import_torch_upernet,
)
from ganspace_tpu.dissection.segmodel import (
    ResNetConfig,
    UPerNetConfig,
    init_resnet_params,
    init_upernet_params,
    resnet_features,
    upernet_forward,
)

__all__ = [
    "dissect",
    "tally_stats",
    "upsample_grid",
    "SegmenterBase",
    "ColorSegmenter",
    "UnifiedParsingSegmenter",
    "import_torch_upernet",
    "ResNetConfig",
    "UPerNetConfig",
    "init_resnet_params",
    "init_upernet_params",
    "resnet_features",
    "upernet_forward",
]
