from ganspace_tpu.dissection.dissect import (
    ColorSegmenter,
    SegmenterBase,
    collect_cond_quantiles,
    collect_covariance,
    collect_stats_and_cond_quantiles,
    dissect,
    iqr_max_scores,
    iqr_scores,
    maxiou_scores,
    tally_stats,
    upsample_grid,
)
from ganspace_tpu.dissection.ace import ablation_effect, ace_optimize
from ganspace_tpu.dissection.broden import (
    BrodenDataset,
    MultiSegmentDataset,
    ParallelImageFolders,
    write_synthetic_broden,
)
from ganspace_tpu.dissection.report import generate_report, make_svg_bargraph
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
from ganspace_tpu.dissection.viz import (
    activation_overlay,
    activation_surface,
    plot_max_heatmap,
    plot_tensor_images,
    segment_visualization,
)

__all__ = [
    "dissect",
    "tally_stats",
    "upsample_grid",
    "collect_cond_quantiles",
    "collect_covariance",
    "collect_stats_and_cond_quantiles",
    "iqr_max_scores",
    "iqr_scores",
    "maxiou_scores",
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
    "ace_optimize",
    "ablation_effect",
    "BrodenDataset",
    "write_synthetic_broden",
    "MultiSegmentDataset",
    "ParallelImageFolders",
    "generate_report",
    "make_svg_bargraph",
    "activation_overlay",
    "plot_max_heatmap",
    "plot_tensor_images",
    "activation_surface",
    "segment_visualization",
]
