"""Bit-level helpers shared by the numerics kernels.

All low-precision formats in this framework (posit, FP8, fpN_eXmY) are defined
by exact bit manipulation of the IEEE-754 float32 representation.  These
helpers keep that manipulation jit-friendly and well-defined: XLA leaves
shifts with counts >= bit-width implementation-defined, so every data-dependent
shift count is clamped into range.  Lanes whose "true" shift count exceeds the
clamp are always masked out downstream (saturated / flushed / regime-dominated),
so clamping never changes results.
"""

import jax
import jax.numpy as jnp

F32_EXP_MASK = 0x7F800000
F32_FRAC_MASK = 0x007FFFFF
F32_EXP_BIAS = 127


@jax.custom_vjp
def materialize_rounding(x: jax.Array) -> jax.Array:
    """Force the array's nominal-dtype rounding to actually happen.

    XLA compiles with ``--xla_allow_excess_precision`` on by default: inside
    a fused region, an f32→bf16→f32 convert chain may be elided so a chain of
    "bf16" elementwise ops silently runs in full f32.  That is harmless for
    ordinary math but wrong at a quantizer boundary — the bit-exact kernels
    (and the reference they are pinned to) quantize the genuinely *rounded*
    model-dtype value, and eager vs jit vs sharded execution must agree.

    A bitcast round-trip pins the representation: a convert whose result
    feeds a bitcast cannot be elided.  No-op for f32 inputs.  Identity
    gradient (bitcast has no VJP of its own, and the op *is* the identity on
    values already in their nominal dtype).
    """
    return _materialize_value(x)


def _materialize_value(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.bfloat16:
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint16), jnp.bfloat16)
    if x.dtype == jnp.float16:
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint16), jnp.float16)
    return x


materialize_rounding.defvjp(
    lambda x: (_materialize_value(x), None),
    lambda _, g: (g,),
)


def f32_bits(x: jax.Array) -> jax.Array:
    """View a float array's float32 representation as int32 bits."""
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def bits_f32(bits: jax.Array) -> jax.Array:
    """View int32 bits as float32."""
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)


def shl(x, count, max_count=31):
    """Left shift with the count clamped to a defined range."""
    count = jnp.clip(count, 0, max_count)
    return jnp.left_shift(x, count)


def shr(x, count, max_count=31):
    """Arithmetic right shift with the count clamped to a defined range."""
    count = jnp.clip(count, 0, max_count)
    return jnp.right_shift(x, count)


def mask_from_shift(count, max_count=31):
    """``1 << count`` with a clamped, well-defined shift count."""
    return shl(jnp.ones_like(count), count, max_count)


def low_bits_mask(count, max_count=31):
    """``(1 << count) - 1`` with a clamped shift count."""
    return mask_from_shift(count, max_count) - 1


def keep_high_bits_mask(count, max_count=31):
    """``-1 << count``: mask clearing the low ``count`` bits."""
    return shl(jnp.full_like(count, -1), count, max_count)


def signum_nonzero(x):
    """±1 by sign bit (never 0) — torch.sign semantics for nonzero lanes and
    -0-preserving multiplication for rounded-to-zero lanes, immune to
    subnormal flush-to-zero."""
    return jnp.where(jnp.signbit(x), -1.0, 1.0).astype(x.dtype)


def is_true_zero(x):
    """Exact-zero test by bit pattern (±0 only) — immune to XLA's
    flush-to-zero comparisons on subnormal inputs."""
    if x.dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(x, jnp.int16)
        return (bits & jnp.int16(0x7FFF)) == 0
    if x.dtype == jnp.float16:
        bits = jax.lax.bitcast_convert_type(x, jnp.int16)
        return (bits & jnp.int16(0x7FFF)) == 0
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return (bits & 0x7FFFFFFF) == 0


def clamp_keep_zero_sign(x, lo, hi):
    """torch.clamp semantics: lanes already inside [lo, hi] are untouched, so
    a -0 with lo <= 0 keeps its sign bit (XLA max(-0, 0) would return +0)."""
    return jnp.where(x < lo, lo, jnp.where(x > hi, hi, x))
