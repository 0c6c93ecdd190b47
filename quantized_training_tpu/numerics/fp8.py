"""Bit-exact FP8 (E4M3 / E5M2) and generic fpN_eXmY quantizers.

Same numerics as the reference framework (reference:
src/quantized_training/fp8.py:10-67 for the NVIDIA-style FP8 formats and
:147-203 for the generic element-wise float quantizer adopted from the
Microsoft microscaling code).  The FP8 kernels round on the float32 bit
pattern with guard/sticky round-to-nearest-even and saturate to the format's
max normal; the generic quantizer scales the mantissa into the integer range,
rounds there, and scales back — run in the *input* dtype so that bf16 inputs
reproduce the reference's bf16 lookup tables bit-for-bit.

All functions are pure jnp, jit-able, and safe to call inside Pallas kernels.
"""

import math
import re
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .bitutils import (
    F32_EXP_MASK,
    F32_FRAC_MASK,
    bits_f32,
    clamp_keep_zero_sign,
    f32_bits,
    keep_high_bits_mask,
    low_bits_mask,
    mask_from_shift,
    is_true_zero,
    signum_nonzero,
)

__all__ = [
    "quantize_to_fp8_e4m3",
    "quantize_to_fp8_e5m2",
    "quantize_elemwise",
    "parse_fp_dtype",
    "fp_max_norm",
]


def _quantize_fp8(x: jax.Array, mbits: int, fp8_max: float, fp8_min: float):
    """Shared E4M3/E5M2 kernel: truncate + RNE on float32 bits, saturate."""
    xf = x.astype(jnp.float32)
    raw_bits = f32_bits(xf)
    exp = ((raw_bits & F32_EXP_MASK) >> 23) - 127
    fraction = (raw_bits & F32_FRAC_MASK) | 0x800000

    min_exp = math.floor(math.log2(fp8_min))
    # Number of fraction bits to drop; grows below min_exp (subnormal range).
    nf_shift = 23 - mbits + jnp.maximum(min_exp - exp, 0)

    lb = (fraction & mask_from_shift(nf_shift)) != 0
    gb = (fraction & mask_from_shift(nf_shift - 1)) != 0
    sb = (fraction & low_bits_mask(nf_shift - 1)) != 0
    rb = (lb & gb) | (gb & sb)

    # Reference clamps the mask shift at 23 (keeping sign+exponent intact);
    # deeper-subnormal lanes are flushed to zero below.
    nf_clamped = jnp.minimum(nf_shift, 23)
    out_bits = raw_bits & keep_high_bits_mask(nf_clamped, 23)
    out_bits = jnp.where(rb, out_bits + mask_from_shift(nf_clamped, 23), out_bits)

    out = bits_f32(out_bits)
    out = jnp.clip(out, -fp8_max, fp8_max)
    out = jnp.where(jnp.abs(xf) <= fp8_min * (2.0 ** -(mbits + 1)), 0.0, out)

    out = jnp.where(xf == 0.0, 0.0, out)
    out = jnp.where(jnp.isfinite(xf), out, jnp.nan)
    return out.astype(x.dtype)


def quantize_to_fp8_e4m3(
    x: jax.Array, mbits: int = 3, fp8_max: float = 448.0, fp8_min: float = 2.0 ** -6
) -> jax.Array:
    """Round to NVIDIA-style FP8 E4M3 (max 448, min normal 2^-6)."""
    return _quantize_fp8(x, mbits, fp8_max, fp8_min)


def quantize_to_fp8_e5m2(
    x: jax.Array, mbits: int = 2, fp8_max: float = 57344.0, fp8_min: float = 2.0 ** -14
) -> jax.Array:
    """Round to IEEE-style FP8 E5M2 (max 57344, min normal 2^-14)."""
    return _quantize_fp8(x, mbits, fp8_max, fp8_min)


# ---------------------------------------------------------------------------
# Generic fpN_eXmY element-wise quantizer (microscaling-style)
# ---------------------------------------------------------------------------

def _round_mantissa(a: jax.Array, mode: str, key=None) -> jax.Array:
    """Round a mantissa that has been scaled into the integer range.

    Uses the sign *bit* rather than jnp.sign so that negative values rounding
    to zero produce -0 exactly like torch (sign * floor), even when XLA
    flushes subnormals.  Exact-zero inputs are fixed to +0 by the caller.
    """
    sgn = signum_nonzero(a)
    if mode == "dither":
        # stochastic rounding (reference fp8.py:117-118: floor(|a| + U[0,1)))
        if key is None:
            raise ValueError("round_mode='dither' needs a PRNG key")
        rand = jax.random.uniform(key, a.shape, dtype=jnp.float32).astype(
            a.dtype)
        return sgn * jnp.floor(jnp.abs(a) + rand)
    if mode == "floor":
        return sgn * jnp.floor(jnp.abs(a))
    if mode == "nearest":
        return sgn * jnp.floor(jnp.abs(a) + 0.5)
    if mode == "even":
        abs_a = jnp.abs(a)
        # Half-way cases x.5 where floor(+0.5) would land on an odd integer.
        is_odd_up = (jnp.mod(abs_a - 0.5, 2.0) == 0.0).astype(a.dtype)
        return sgn * (jnp.floor(abs_a + 0.5) - is_odd_up)
    raise ValueError(f"Unrecognized round method {mode}")


def _pow2(e: jax.Array, dtype) -> jax.Array:
    """Exact 2**e for integer-valued e in [-126, 128], via f32 bit assembly."""
    bits = jnp.clip(e.astype(jnp.int32) + 127, 0, 255) << 23
    return bits_f32(bits).astype(dtype)


def _floor_log2(a: jax.Array) -> jax.Array:
    """floor(log2(|a|)) computed the way the reference does: log2 evaluated
    in the input dtype, then floored.

    For bf16 inputs this intentionally reproduces the reference's rounding
    quirk — log2 values within half a bf16 ulp of the next integer round up
    before the floor, shifting the private exponent by one for inputs just
    below large powers of two (and driving near-max bf16 inputs to NaN via
    x / 2**128).  The exhaustive LUT tests pin this behaviour.
    """
    lg = jnp.log2(jnp.abs(a).astype(jnp.float32))
    return jnp.floor(lg.astype(a.dtype).astype(jnp.float32)).astype(a.dtype)


def quantize_elemwise(
    a: jax.Array,
    bits: int,
    exp_bits: int,
    max_norm: float,
    round_mode: str = "nearest",
    saturate_normals: bool = False,
    allow_denorm: bool = True,
    key=None,
) -> jax.Array:
    """Quantize to a float format with ``exp_bits`` exponent / ``bits``
    mantissa bits (mantissa count includes sign and implicit leading one).

    Arithmetic runs in ``a.dtype`` — power-of-two scaling is exact, and the
    rounding additions reproduce the reference's behaviour on bf16 inputs.
    """
    out = a
    if not allow_denorm and exp_bits > 0:
        min_norm = 2.0 ** (2 - 2 ** (exp_bits - 1))
        out = (jnp.abs(a) >= min_norm).astype(a.dtype) * a

    if exp_bits != 0:
        private_exp = _floor_log2(jnp.where(a == 0, jnp.ones_like(a), a))
        min_exp = -(2 ** (exp_bits - 1)) + 2
        private_exp = jnp.maximum(private_exp, min_exp)
        # Scale mantissa into the integer range (exact power-of-two ops).
        pow2_exp = _pow2(private_exp, a.dtype)
        out = out / pow2_exp * (2.0 ** (bits - 2))
    else:
        pow2_exp = None
        out = out * (2.0 ** (bits - 2))

    out = _round_mantissa(out, round_mode, key=key)

    if pow2_exp is None:
        out = out / (2.0 ** (bits - 2))
    else:
        out = out / (2.0 ** (bits - 2)) * pow2_exp

    if saturate_normals or exp_bits == 0:
        out = clamp_keep_zero_sign(out, -max_norm, max_norm)
    else:
        out = jnp.where(
            jnp.abs(out) > max_norm, jnp.sign(out) * jnp.inf, out
        )

    # torch.sign(±0) == 0, so exact-zero inputs always produce +0 in the
    # reference; bit-pattern test avoids catching FTZ-flushed subnormals.
    out = jnp.where(is_true_zero(a), jnp.zeros_like(out), out)

    out = jnp.where(jnp.isposinf(a), jnp.inf, out)
    out = jnp.where(jnp.isneginf(a), -jnp.inf, out)
    out = jnp.where(jnp.isnan(a), jnp.nan, out)
    return out.astype(a.dtype)


_FP_RE = re.compile(r"fp(\d+)_e(\d+)m(\d+)")


def parse_fp_dtype(dtype: str) -> Tuple[int, int, int]:
    """Parse ``fpN_eXmY`` into (nbits, ebits, mbits).

    ``nbits == ebits + mbits`` denotes an unsigned format (used for scale
    codebooks); ``nbits == ebits + mbits + 1`` is the usual signed format.
    """
    match = _FP_RE.fullmatch(dtype)
    if match is None:
        raise ValueError(f"String {dtype!r} does not match fpN_eXmY")
    nbits, ebits, mbits = map(int, match.groups())
    if nbits not in (ebits + mbits, ebits + mbits + 1):
        raise ValueError(f"Inconsistent fp dtype spec: {dtype}")
    return nbits, ebits, mbits


def fp_max_norm(dtype: str) -> float:
    """Largest representable magnitude of an fpN_eXmY format.

    Matches the reference's convention (reference: fp8.py:206-225): formats
    with fewer than 5 exponent bits reclaim the special-value encodings,
    doubling emax; fp8_e4m3 uses the NVIDIA max-norm 448.
    """
    _, ebits, mbits = parse_fp_dtype(dtype)
    mbits = mbits + 2
    emax = 2 ** (ebits - 1) - 1 if ebits > 4 else 2 ** (ebits - 1)
    if dtype == "fp8_e4m3":
        return 2.0 ** emax * 1.75
    return 2.0 ** emax * float(2 ** (mbits - 1) - 1) / 2 ** (mbits - 2)


def quantize_to_fp(x: jax.Array, dtype: str) -> jax.Array:
    """Round to an arbitrary ``fpN_eXmY`` format with round-to-even saturation."""
    nbits, ebits, mbits = parse_fp_dtype(dtype)
    if nbits == ebits + mbits:  # unsigned scale format
        x = jnp.abs(x)
    return quantize_elemwise(
        x, mbits + 2, ebits, fp_max_norm(dtype), round_mode="even",
        saturate_normals=True,
    )
