"""quantized_training_tpu: a TPU-native low-precision training & inference
framework (JAX / XLA / Pallas / pjit).

Capabilities mirror the reference quantized-training framework (posit / FP8 /
fpN_eXmY / intN / NF formats; per-tensor, per-channel, microscaling and
group-wise-affine schemes; QAT with gradient quantization; PTQ calibration;
quantized KV-cache serving; an accelerator-oriented compile path) re-designed
TPU-first: functional transforms with explicit state pytrees, Pallas kernels
for the hot dequant-matmul paths, and jax.sharding meshes for scale-out.
"""

__version__ = "0.1.0"

from . import numerics
from .numerics import (
    quantize_to_posit,
    quantize_to_fp8_e4m3,
    quantize_to_fp8_e5m2,
    quantize_elemwise,
    quantize_to_nf,
    quantize_to_int,
    get_quantization_map,
    apply_lut,
    quantize_fn,
)
from .qspec import (
    QScheme,
    QuantizationSpec,
    DerivedQuantizationSpec,
    get_quant_min_max,
)

per_tensor_symmetric = QScheme.PER_TENSOR_SYMMETRIC
per_channel_symmetric = QScheme.PER_CHANNEL_SYMMETRIC
microscaling = QScheme.MICROSCALING
group_wise_affine = QScheme.GROUP_WISE_AFFINE

__all__ = [
    "numerics",
    "quantize_to_posit",
    "quantize_to_fp8_e4m3",
    "quantize_to_fp8_e5m2",
    "quantize_elemwise",
    "quantize_to_nf",
    "quantize_to_int",
    "get_quantization_map",
    "apply_lut",
    "quantize_fn",
    "QScheme",
    "QuantizationSpec",
    "DerivedQuantizationSpec",
    "get_quant_min_max",
    "per_tensor_symmetric",
    "per_channel_symmetric",
    "microscaling",
    "group_wise_affine",
]
