"""Pure-jnp low-precision numerics: the L0 layer of the framework.

Every format is implemented as exact bit manipulation on the float32 image of
the input, jit-able and usable inside Pallas kernels.  The 2**16-entry
bf16-keyed lookup tables (:func:`get_quantization_map`) serve as the
executable specification: tests enumerate all bf16 values and assert the
direct quantizers agree with the reference framework bit-for-bit.
"""

from .posit import (
    quantize_to_posit,
    quantize_to_posit_positive,
    quantize_to_posit_unit,
    quantize_to_posit_fast,
    decode_posit,
    encode_posit,
    posit_max_value,
)
from .fp8 import (
    quantize_to_fp8_e4m3,
    quantize_to_fp8_e5m2,
    quantize_elemwise,
    quantize_to_fp,
    parse_fp_dtype,
    fp_max_norm,
)
from .normal_float import create_normal_map, quantize_to_nf, nf_codebook
from .integer import quantize_to_int, int_range
from .lut import (
    bf16_universe,
    get_quantization_map,
    apply_lut,
    lut_indices,
    quantize_fn,
    quantize_fn_positive,
    quantize_fn_unit,
    dequantize_nf,
)
from .mx import (
    shared_exponents,
    reshape_to_blocks,
    undo_reshape_to_blocks,
    normalize_axes,
)

__all__ = [
    "quantize_to_posit",
    "quantize_to_posit_positive",
    "quantize_to_posit_unit",
    "quantize_to_posit_fast",
    "decode_posit",
    "encode_posit",
    "posit_max_value",
    "quantize_to_fp8_e4m3",
    "quantize_to_fp8_e5m2",
    "quantize_elemwise",
    "quantize_to_fp",
    "parse_fp_dtype",
    "fp_max_norm",
    "create_normal_map",
    "quantize_to_nf",
    "nf_codebook",
    "quantize_to_int",
    "int_range",
    "bf16_universe",
    "get_quantization_map",
    "apply_lut",
    "lut_indices",
    "quantize_fn",
    "quantize_fn_positive",
    "quantize_fn_unit",
    "dequantize_nf",
    "shared_exponents",
    "reshape_to_blocks",
    "undo_reshape_to_blocks",
    "normalize_axes",
]
