"""Arbitrary-width integer fake quantization (intN / uintN).

Round-to-nearest-even (jnp.round) followed by clamping to the format range,
matching the reference's integer LUT entries (reference:
src/quantized_training/fake_quantize.py:43-52).  Values remain float ("fake
quantized"); packing to storage dtypes happens in the storage layer.
"""

import jax
import jax.numpy as jnp

from .bitutils import clamp_keep_zero_sign

__all__ = ["quantize_to_int", "int_range"]


def int_range(nbits: int, signed: bool = True):
    """(quant_min, quant_max) for an intN / uintN format."""
    if signed:
        return -(2 ** (nbits - 1)), 2 ** (nbits - 1) - 1
    return 0, 2 ** nbits - 1


def quantize_to_int(x: jax.Array, nbits: int, signed: bool = True) -> jax.Array:
    """Round-to-nearest-even and saturate to the intN / uintN range.

    Math runs in float32 (bf16 values are exact f32 values, RNE agrees, and
    every produced integer is bf16-representable) — Mosaic only supports the
    f32 VPU ops inside Pallas kernels.
    """
    qmin, qmax = int_range(nbits, signed)
    xf = x.astype(jnp.float32)
    return clamp_keep_zero_sign(jnp.round(xf), qmin, qmax).astype(x.dtype)
