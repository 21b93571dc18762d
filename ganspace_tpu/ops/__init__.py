from ganspace_tpu.ops.linear import equal_linear, fused_leaky_relu, pixel_norm
from ganspace_tpu.ops.upfirdn import blur2d, make_fir_kernel, upfirdn2d, upsample2x
from ganspace_tpu.ops.modconv import modulated_conv2d
from ganspace_tpu.ops.precision import get_precision, precision, set_precision

__all__ = [
    "equal_linear",
    "fused_leaky_relu",
    "pixel_norm",
    "upfirdn2d",
    "blur2d",
    "upsample2x",
    "make_fir_kernel",
    "modulated_conv2d",
    "get_precision",
    "set_precision",
    "precision",
]
