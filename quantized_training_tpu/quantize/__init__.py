"""Functional quantization transforms (L2/L3 of the framework)."""

from .fake_quant import (
    FakeQuantState,
    fake_quantize,
    init_state,
    straight_through,
    scale_shape_for,
)
from .ops import (
    expand_scale,
    quantize,
    dequantize,
    calculate_mx_qparam,
    quantize_mx,
    linear_mx,
    matmul_mx,
    conv2d_mx,
    filter_outlier,
    outlier_matmul,
    to_csr,
)
from .fold import fold_quantized_weights, strip_weight_specs
from .storage import build_storage, STORAGE_FORMATS
from .gptq import (
    accumulate_gptq,
    build_storage_gptq,
    gptq_quantize,
    hessian_from_inputs,
)
from .smooth import (smoothing_scales, smooth_llama,
                     calibrate_llama_amax, awq_search_llama)
from .config import (
    OpCategory,
    QConfig,
    QuantConfig,
    FUSION_LADDER,
    parse_op_categories,
)

__all__ = [
    "FakeQuantState",
    "fake_quantize",
    "init_state",
    "straight_through",
    "scale_shape_for",
    "expand_scale",
    "quantize",
    "dequantize",
    "calculate_mx_qparam",
    "quantize_mx",
    "linear_mx",
    "matmul_mx",
    "conv2d_mx",
    "filter_outlier",
    "outlier_matmul",
    "to_csr",
    "OpCategory",
    "QConfig",
    "QuantConfig",
    "FUSION_LADDER",
    "parse_op_categories",
    "fold_quantized_weights",
    "strip_weight_specs",
    "build_storage",
    "STORAGE_FORMATS",
    "accumulate_gptq",
    "build_storage_gptq",
    "gptq_quantize",
    "hessian_from_inputs",
    "smoothing_scales",
    "smooth_llama",
    "calibrate_llama_amax",
    "awq_search_llama",
]
