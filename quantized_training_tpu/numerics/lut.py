"""Quantization-map (LUT) factory and dtype dispatch.

The reference framework quantizes through a 2**16-entry bf16-keyed lookup
table built per dtype (reference: src/quantized_training/fake_quantize.py:31-95)
and applies it with a gather (reference: decomposed.py:143-163).  On TPU a
65536-entry gather is memory-bound, so this framework treats the LUT as:

  * the *specification*: ``get_quantization_map(dtype)`` enumerates the exact
    value every bf16 input must map to — tests assert the direct (in-register)
    quantizers agree on all 65536 keys;
  * a CPU/debug fallback: ``apply_lut`` reproduces the reference gather,
    including the sticky-bit trick for float32 inputs (round-to-odd into the
    bf16 key so the bf16-keyed table still rounds correctly).

Production code paths use ``quantize_fn(dtype)``, which returns the direct
bit-manipulation quantizer for the dtype string.
"""

import re
from functools import lru_cache, partial
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import ml_dtypes

from .fp8 import (
    fp_max_norm,
    parse_fp_dtype,
    quantize_elemwise,
    quantize_to_fp8_e4m3,
    quantize_to_fp8_e5m2,
)
from .integer import quantize_to_int
from .normal_float import nf_codebook, quantize_to_nf
from .posit import (
    quantize_to_posit,
    quantize_to_posit_fast,
    quantize_to_posit_positive,
    quantize_to_posit_unit,
)

__all__ = [
    "bf16_universe",
    "get_quantization_map",
    "apply_lut",
    "quantize_fn",
    "quantize_fn_positive",
    "quantize_fn_unit",
    "dequantize_nf",
]


def bf16_universe() -> jax.Array:
    """All 2**16 bf16 bit patterns, in bit order (the LUT key space)."""
    bits = np.arange(2 ** 16, dtype=np.uint16)
    return jnp.asarray(bits.view(ml_dtypes.bfloat16))


_NATIVE_DTYPES = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
}


@lru_cache(maxsize=None)
def quantize_fn(dtype: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Direct elementwise quantizer for a dtype string.

    Supported strings (reference grammar, fake_quantize.py:31-95):
    ``int<N>``, ``uint<N>``, ``e4m3``/``e5m2`` (optionally ``fp8.`` prefixed),
    ``fp<N>_e<X>m<Y>``, ``posit<N>_<E>``, ``nf<K>``/``nf<K>_<B>``, and the
    native float dtypes.  NF formats dequantize through their codebook so the
    returned callable is still value-to-value.
    """
    if dtype is None:
        return lambda x: x

    if dtype in _NATIVE_DTYPES:
        target = _NATIVE_DTYPES[dtype]
        return lambda x: x.astype(target).astype(x.dtype)

    if (m := re.fullmatch(r"int(\d+)", dtype, re.IGNORECASE)):
        return partial(quantize_to_int, nbits=int(m.group(1)), signed=True)

    if (m := re.fullmatch(r"uint(\d+)", dtype, re.IGNORECASE)):
        return partial(quantize_to_int, nbits=int(m.group(1)), signed=False)

    if (m := re.fullmatch(r"(?:fp8\.)?(e4m3|e5m2)", dtype, re.IGNORECASE)):
        fmt = m.group(1).lower()
        return quantize_to_fp8_e4m3 if fmt == "e4m3" else quantize_to_fp8_e5m2

    if re.fullmatch(r"fp(\d+)_e(\d+)m(\d+)", dtype):
        nbits, ebits, mbits = parse_fp_dtype(dtype)
        max_norm = fp_max_norm(dtype)
        unsigned = nbits == ebits + mbits

        def _fp(x, ebits=ebits, mbits=mbits, max_norm=max_norm, unsigned=unsigned):
            if unsigned:  # scale-factor format
                x = jnp.abs(x)
            return quantize_elemwise(
                x, mbits + 2, ebits, max_norm, round_mode="even",
                saturate_normals=True,
            )

        return _fp

    if (m := re.fullmatch(r"posit(\d+)_(\d+)", dtype)):
        nbits, es = int(m.group(1)), int(m.group(2))
        # fast kernel is bit-identical to the reference-shaped one
        # (exhaustively verified) at ~2.5x fewer VPU ops
        return partial(quantize_to_posit_fast, nbits=nbits, es=es)

    if (m := re.fullmatch(r"nf(\d+)(?:_(\d+))?", dtype)):
        k = int(m.group(1))
        int_bits = int(m.group(2)) if m.group(2) else None

        def _nf(x, k=k, int_bits=int_bits):
            indices, values = quantize_to_nf(x, k, int_bits=int_bits)
            return values[indices]

        return _nf

    raise ValueError(f"Unsupported dtype: {dtype}")


@lru_cache(maxsize=None)
def _cached_map(dtype: Optional[str]):
    values = bf16_universe()
    if dtype is None:
        return values
    if dtype in _NATIVE_DTYPES:
        return values.astype(_NATIVE_DTYPES[dtype]).astype(jnp.bfloat16)
    if (m := re.fullmatch(r"nf(\d+)(?:_(\d+))?", dtype)):
        k = int(m.group(1))
        int_bits = int(m.group(2)) if m.group(2) else None
        indices, codebook = quantize_to_nf(values, k, int_bits=int_bits)
        return indices, codebook
    return quantize_fn(dtype)(values)


def get_quantization_map(
    dtype: Optional[str],
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """The 2**16-entry bf16-keyed quantization table for ``dtype``.

    NF formats return ``(indices, codebook)`` like the reference; every other
    format returns a bf16 value table indexed by bf16 bit pattern.
    """
    return _cached_map(dtype)


def lut_indices(x: jax.Array) -> jax.Array:
    """bf16-bit LUT key for each element of ``x``.

    bf16 inputs key directly off their bits.  Wider floats use the top 16
    bits with a sticky OR of the discarded bits into the key LSB
    (round-to-odd), so the bf16-keyed round-to-even table composes into a
    correctly rounded conversion (reference: decomposed.py:147-153).
    """
    if x.dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(x, jnp.int16).astype(jnp.int32)
        return bits & 0xFFFF
    raw = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    idx = jnp.right_shift(raw, 16) & 0xFFFF
    sticky = ((raw & 0xFFFF) != 0).astype(jnp.int32)
    return idx | sticky


def apply_lut(x: jax.Array, qmap: jax.Array) -> jax.Array:
    """Gather-based quantization through a bf16-keyed table (reference
    ``quantized_ops.vmap``).  Output is in ``x.dtype``."""
    out = jnp.take(qmap, lut_indices(x), axis=0)
    return out.astype(x.dtype)


def dequantize_nf(indices: jax.Array, codebook: jax.Array) -> jax.Array:
    """Decode NF codebook indices back to values."""
    return jnp.take(codebook, indices.astype(jnp.int32), axis=0)


@lru_cache(maxsize=None)
def quantize_fn_positive(dtype: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Like :func:`quantize_fn` but specialized for known-non-negative finite
    inputs (softmax probabilities, magnitudes): posit formats dispatch to the
    ~3x-leaner :func:`quantize_to_posit_positive`, everything else to the
    general quantizer (already sign-cheap).  Bit-identical on valid inputs."""
    if dtype is None:
        return lambda x: x
    if (m := re.fullmatch(r"posit(\d+)_(\d+)", dtype)):
        nbits, es = int(m.group(1)), int(m.group(2))
        return partial(quantize_to_posit_positive, nbits=nbits, es=es)
    return quantize_fn(dtype)


@lru_cache(maxsize=None)
def quantize_fn_unit(dtype: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Like :func:`quantize_fn_positive` but for inputs known to lie in
    [0, 1] (softmax probabilities): posit formats dispatch to the further
    specialized :func:`quantize_to_posit_unit` (no sign select, no maxpos
    clamp — the flash kernel's hot path)."""
    if dtype is None:
        return lambda x: x
    if (m := re.fullmatch(r"posit(\d+)_(\d+)", dtype)):
        nbits, es = int(m.group(1)), int(m.group(2))
        # multiplication-form kernel: ~2x fewer VPU op-equivalents than the
        # bit-integer unit kernel (bit-identical; see posit.py).  Building it
        # probes the exact kernel host-side once per (nbits, es) — do that
        # now, outside any Pallas trace.
        from .posit import _unit_mul_chain, quantize_to_posit_unit_mul
        _unit_mul_chain(nbits, es)
        return partial(quantize_to_posit_unit_mul, nbits=nbits, es=es)
    return quantize_fn_positive(dtype)
