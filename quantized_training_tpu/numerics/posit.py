"""Bit-exact posit(nbits, es) rounding of float tensors.

Implements the same numerics as the reference framework's posit quantizer
(reference: src/quantized_training/posit.py:6-67): the input's float32 bit
pattern is decomposed into regime / exponent / fraction fields, truncated to
the posit precision available at that regime, and rounded with guard/sticky
round-to-nearest-even.  The result is returned in the input dtype ("fake
quantization": a float tensor whose values are exactly representable posits).

Everything is pure jnp bit arithmetic: jit-able, vectorizable on the TPU VPU,
and usable inside Pallas kernels.
"""

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp

from .bitutils import (
    F32_EXP_MASK,
    F32_FRAC_MASK,
    bits_f32,
    f32_bits,
    keep_high_bits_mask,
    low_bits_mask,
    mask_from_shift,
    shl,
)

__all__ = ["quantize_to_posit", "quantize_to_posit_positive",
           "quantize_to_posit_unit", "quantize_to_posit_unit_mul",
           "quantize_to_posit_fast",
           "decode_posit", "encode_posit", "posit_max_value"]


def posit_max_value(nbits: int, es: int) -> float:
    """Largest representable posit magnitude: useed**(nbits-2)."""
    return float((2 ** (2 ** es)) ** (nbits - 2))


def quantize_to_posit(
    x: jax.Array,
    nbits: int = 8,
    es: int = 1,
    round_to_even: bool = True,
    return_pbits: bool = False,
):
    """Round ``x`` to the nearest posit(nbits, es) value.

    Args:
        x: float input (any float dtype; math runs on the float32 image).
        nbits: total posit width including sign.
        es: number of exponent bits.
        round_to_even: flush |x| below the even-rounding threshold of minpos
            to zero (matches hardware round-to-nearest-even at the bottom of
            the range).
        return_pbits: additionally return the signed raw posit bit patterns.

    Returns:
        The rounded tensor in ``x.dtype`` (and int32 posit bits if requested).
    """
    xf = x.astype(jnp.float32)
    raw_bits = f32_bits(xf)
    scale = ((raw_bits & F32_EXP_MASK) >> 23) - 127
    fraction = raw_bits & F32_FRAC_MASK
    positive_scale = scale >= 0

    max_scale = (nbits - 2) * (1 << es)
    # Lanes where the regime alone exceeds the posit range: saturate, no
    # rounding.  Written with logical ops, not a bool-valued where — Mosaic
    # cannot lower i8->i1 truncation inside Pallas kernels.
    regime_dominated = jnp.logical_or(
        jnp.logical_and(positive_scale, scale > max_scale),
        jnp.logical_and(jnp.logical_not(positive_scale), scale < -max_scale),
    )

    # Regime run length.  Arithmetic >> implements floor division for negative
    # scales, exactly as the reference does with int32 tensors.
    run = jnp.where(positive_scale, 1 + (scale >> es), -(scale >> es))
    # Clamped copy used only as a shift count; out-of-range lanes are
    # regime_dominated and their bit patterns are never consumed.
    regime = jnp.where(
        positive_scale, mask_from_shift(run + 1, 30) - 1, jnp.zeros_like(run)
    ) ^ 1
    exponent = jnp.mod(scale, 1 << es)
    pt_bits = shl(regime, 23 + es, 31) | shl(exponent, 23, 31) | fraction

    # Guard / sticky round-to-nearest-even on the truncated posit encoding.
    total_len = 2 + run + es + 23
    lb_mask = mask_from_shift(total_len - nbits)
    gb_mask = jnp.right_shift(lb_mask, 1)
    sb_mask = gb_mask - 1

    lb = (pt_bits & lb_mask) != 0
    gb = (pt_bits & gb_mask) != 0
    sb = (pt_bits & sb_mask) != 0
    rb = ((lb & gb) | (gb & sb)) & jnp.logical_not(regime_dominated)

    # Truncate exponent bits lost to the regime.
    ne_mask = jnp.clip(2 + run + es - nbits, 0, es)
    scale_t = scale & keep_high_bits_mask(ne_mask, es if es > 0 else 31)
    scale_t = jnp.clip(scale_t, -max_scale, max_scale)

    # Truncate fraction bits.
    nf_mask = jnp.clip(total_len - nbits, 0, 23)
    fraction_t = fraction & keep_high_bits_mask(nf_mask, 23)

    out_bits = ((scale_t + 127) << 23) | fraction_t
    out_bits = jnp.where(rb, out_bits + mask_from_shift(nf_mask + ne_mask), out_bits)
    out = bits_f32(out_bits) * jnp.sign(xf)

    if round_to_even:
        # Below this magnitude the nearest-even neighbour is exactly zero.
        threshold = math.pow(
            2.0, math.floor(-(nbits - 1) * (1 << es) + 2 ** (es - 1))
        )
        out = jnp.where(jnp.abs(xf) < threshold, 0.0, out)

    out = jnp.where(xf == 0.0, 0.0, out)
    out = jnp.where(jnp.isfinite(xf), out, jnp.nan)
    out = out.astype(x.dtype)

    if return_pbits:
        pbits = jnp.right_shift(pt_bits, jnp.clip(total_len - nbits, 0, 31))
        pbits = pbits & ((1 << (nbits - 1)) - 1)
        pbits = jnp.where(rb, pbits + 1, pbits)
        pbits = pbits * jnp.sign(xf).astype(jnp.int32)
        return out, pbits

    return out


def quantize_to_posit_positive(
    x: jax.Array, nbits: int = 8, es: int = 1
) -> jax.Array:
    """Lean posit rounding for known-non-negative finite inputs (e.g. softmax
    probabilities inside attention kernels).

    Exploits that posit round-to-nearest-even on the encoding equals integer
    RNE on the float32 bit pattern at the posit truncation position: the
    regime/exponent/fraction fields are contiguous in both encodings, and a
    round-up carry propagates into the exponent identically.  ~3x fewer VPU
    ops than the general kernel — this is the hot quantizer in the flash
    attention epilogue.  Verified bit-identical to :func:`quantize_to_posit`
    on every non-negative bf16 input by the exhaustive tests.
    """
    max_scale = (nbits - 2) * (1 << es)
    maxpos = jnp.float32(2.0 ** max_scale)
    minpos = jnp.float32(2.0 ** -max_scale)

    xf0 = x.astype(jnp.float32)
    # Saturate into the posit range first: keeps the truncation shift small
    # and makes out-of-range lanes round trivially to minpos/maxpos.
    xf = jnp.clip(xf0, minpos, maxpos)
    bits = f32_bits(xf)
    e = ((bits >> 23) & 0xFF) - 127

    # Regime run length and posit truncation position within the f32 bits:
    # up to 23 fraction bits plus at most es exponent bits (deeper truncation
    # is regime territory — handled by the input saturation above).
    run = jnp.where(e >= 0, 1 + (e >> es), -(e >> es))
    raw = run + es + 25 - nbits
    s2 = jnp.clip(raw, 0, 23 + es)  # == clip(raw,0,23)+clip(raw-23,0,es)

    # A single variable-amount shift builds the rounding quantum; every other
    # quantity derives arithmetically (variable-shift ops are the expensive
    # lowering case for the Mosaic vector unit).
    q = jnp.left_shift(jnp.ones_like(bits), s2)   # 2^s2
    q_mask = q - 1

    # Posit truncation anchors the exponent grid at scale 0; the f32 field is
    # biased by 127.  Work modulo 2^s2: subtract the bias's low bits (zero in
    # the common fraction-rounding case s2 <= 23), round, re-add.
    r = (127 << 23) & q_mask
    m = bits - r

    # Round-to-nearest-even at position s2.  The tie ("even") bit is the
    # posit encoding's kept-lsb: a fraction/exponent bit of the *unbiased*
    # pattern for s2 < 23 + es (the 127 bias flips exponent-bit parity, so
    # use bits - bias), and the regime bit for s2 >= 23 + es — always 0 for
    # positive scales, always 1 for negative.
    lsb = jnp.where(
        s2 >= 23 + es,
        (e < 0).astype(bits.dtype),
        (((bits - (127 << 23)) & q) != 0).astype(bits.dtype),
    )
    half_minus_1 = (q >> 1) - 1  # constant-amount shift
    rounded = (m + half_minus_1 + lsb) & jnp.bitwise_not(q_mask)
    out = jnp.minimum(bits_f32(rounded + r), maxpos)

    # Below this magnitude the nearest posit is zero (includes x == 0).
    threshold = math.pow(2.0, math.floor(-(nbits - 1) * (1 << es) + 2 ** (es - 1)))
    out = jnp.where(xf0 < threshold, 0.0, out)
    return out.astype(x.dtype)


def quantize_to_posit_unit(
    x: jax.Array, nbits: int = 8, es: int = 1
) -> jax.Array:
    """Posit rounding specialized to inputs in [0, 1] — softmax probabilities
    inside the flash kernel, the hottest quantizer in the framework (O(S^2)
    elements per layer).

    Drops ops the unit interval makes dead: the exponent is always <= 0 (so
    ``run = -(e >> es)`` needs no sign select; e == 0 can only be x == 1.0
    exactly, whose zero mantissa rounds to itself at any position), and no
    maxpos clamp is needed (values <= 1 round to <= 1).  Verified
    bit-identical to :func:`quantize_to_posit_positive` over every bf16 in
    [0, 1] by the exhaustive tests.
    """
    max_scale = (nbits - 2) * (1 << es)
    minpos = jnp.float32(2.0 ** -max_scale)

    xf0 = x.astype(jnp.float32)
    bits = f32_bits(jnp.maximum(xf0, minpos))
    e = ((bits >> 23) & 0xFF) - 127      # <= 0 on the unit interval

    raw = -(e >> es) + es + 25 - nbits
    s2 = jnp.clip(raw, 0, 23 + es)

    q = jnp.left_shift(jnp.ones_like(bits), s2)
    q_mask = q - 1
    r = (127 << 23) & q_mask
    lsb = jnp.where(
        raw >= 23 + es,
        jnp.ones_like(bits),             # regime tie-bit: always 1 for e < 0
        (((bits - (127 << 23)) & q) != 0).astype(bits.dtype),
    )
    rounded = ((bits - r) + (q >> 1) - 1 + lsb) & jnp.bitwise_not(q_mask)
    out = bits_f32(rounded + r)

    threshold = math.pow(
        2.0, math.floor(-(nbits - 1) * (1 << es) + 2 ** (es - 1)))
    out = jnp.where(xf0 < threshold, 0.0, out)
    return out.astype(x.dtype)


def _unit_probe(x, nbits, es):
    """Pure-numpy port of :func:`quantize_to_posit_unit` (host-side oracle
    for the chain builder — must not touch jax: the builder runs lazily,
    possibly inside an outer jit trace)."""
    import numpy as np

    max_scale = (nbits - 2) * (1 << es)
    minpos = np.float32(2.0 ** -max_scale)
    xf0 = np.asarray(x, np.float32).ravel()
    bits = np.maximum(xf0, minpos).view(np.int32)
    e = ((bits >> 23) & 0xFF) - 127
    raw = -(e >> es) + es + 25 - nbits
    s2 = np.clip(raw, 0, 23 + es)
    q = np.int32(1) << s2
    q_mask = q - 1
    r = np.int32(127 << 23) & q_mask
    lsb = np.where(raw >= 23 + es, np.int32(1),
                   (((bits - (127 << 23)) & q) != 0).astype(np.int32))
    rounded = ((bits - r) + (q >> 1) - 1 + lsb) & ~q_mask
    out = (rounded + r).view(np.float32)
    threshold = math.pow(
        2.0, math.floor(-(nbits - 1) * (1 << es) + 2 ** (es - 1)))
    return np.where(xf0 < np.float32(threshold), np.float32(0.0), out)


@functools.lru_cache(maxsize=None)
def _unit_mul_chain(nbits: int, es: int):
    """(e_start, [(cut, value), ...]) for :func:`quantize_to_posit_unit_mul`.

    The mul identity (posit RNE == integer RNE of t = x * 2^(f-e)) holds for
    every binade keeping f >= 1 fraction bits: the kept-lsb is a fraction bit,
    whose parity equals t's.  Below 2^e_start (f <= 0: partial/absent
    exponent fields, pure regime) the posits are a handful of exact powers of
    two; this builder probes the bit-exact kernel to enumerate them and
    bisects each pair's rounding boundary on the f32 grid, so the select
    chain replicates the exact kernel's boundary AND tie semantics without
    re-deriving them.  Host-side, cached once per (nbits, es).
    """
    import numpy as np

    f0 = nbits - 2 - es
    e_start = (1 - f0) * (1 << es)        # smallest e with f(e) >= 1
    hi = math.ldexp(1.0, e_start)

    # distinct kernel outputs below hi (probe 64 points per binade)
    probes = []
    e = e_start
    while math.ldexp(1.0, e) > 1e-45 and e > -130:
        for i in range(64):
            probes.append(math.ldexp(1.0 + i / 64.0, e - 1))
        e -= 1
    out = _unit_probe(np.float32(probes), nbits, es)
    vals = sorted({float(v) for v in out if v < hi})
    if not vals or vals[0] != 0.0:
        vals = [0.0] + vals

    # bisect each (v1, v2) boundary on the f32 bit grid
    def bits(v):
        return int(np.float32(v).view(np.uint32))

    def val(b):
        return float(np.uint32(b).view(np.float32))

    chain = []
    uppers = vals[1:] + [hi]
    for v1, v2 in zip(vals, uppers):
        lo_b, hi_b = bits(v1), bits(v2)
        while hi_b - lo_b > 1:
            mid = (lo_b + hi_b) // 2
            r = float(_unit_probe(np.float32(val(mid)), nbits, es)[0])
            if r <= v1:
                lo_b = mid
            else:
                hi_b = mid
        # x < val(hi_b)  =>  rounds to v1
        chain.append((val(hi_b), v1))
    return e_start, tuple(chain)


def quantize_to_posit_unit_mul(
    x: jax.Array, nbits: int = 8, es: int = 1
) -> jax.Array:
    """Multiplication-form posit rounding for inputs in [0, 1] — the fastest
    unit-interval kernel (~20 VPU op-equivalents vs ~38 for the bit-integer
    form; no variable-amount shifts).

    Key identity: in every binade keeping f >= 1 fraction bits
    (f(e) = (nbits-2-es) + (e >> es)), posit(nbits, es) values are exactly
    the integer multiples of 2^(e-f), and posit round-to-nearest-even equals
    float RNE of t = x * 2^(f-e) to an integer (the kept-lsb is a fraction
    bit, so the tie parities coincide).  2^(f-e) and 2^(e-f) are assembled by
    constant shifts into the exponent field; the integer RNE is one f32 add
    with the 1.5 * 2^23 magic constant (hardware rounding).  The few exact
    power-of-two posits below 2^e_start are an unrolled select chain with
    boundaries bisected from the bit-exact kernel (see _unit_mul_chain).

    Bit-identical to :func:`quantize_to_posit` on every bf16 in [0, 1] and to
    :func:`quantize_to_posit_unit` on f32 probes (tested).  Contract: finite
    inputs in [0, 1] only.
    """
    e_start, chain = _unit_mul_chain(nbits, es)
    f0 = nbits - 2 - es

    xf0 = x.astype(jnp.float32)
    # No input clamp: lanes below 2^e_start produce harmless finite garbage
    # in the mul path (x == 0 exactly gives 0) and are overridden by the
    # select chain, which owns everything below 2^e_start.
    b = f32_bits(xf0)
    e = (b >> 23) - 127                   # field extract; x in [0, 1]
    d127 = (f0 + 127) + (e >> es) - e     # (f - e) + 127
    b1 = d127 << 23                       # bits of 2^(f-e)
    t = xf0 * bits_f32(b1)                # x * 2^(f-e), exact
    magic = jnp.float32(1.5 * 2.0 ** 23)
    u = (t + magic) - magic               # hardware RNE to integer
    y = u * bits_f32((254 << 23) - b1)    # * 2^(e-f), exact (mirror exponent)

    for cut, v in reversed(chain):
        y = jnp.where(xf0 < jnp.float32(cut), jnp.float32(v), y)
    return y.astype(x.dtype)


def quantize_to_posit_fast(
    x: jax.Array, nbits: int = 8, es: int = 1
) -> jax.Array:
    """Production posit rounding: the single-variable-shift integer-RNE
    pipeline of :func:`quantize_to_posit_positive` extended to signed and
    non-finite inputs (sign bit rides outside the magnitude rounding;
    non-finite lanes map to NaN like the reference).  ~20 VPU ops vs ~50 for
    the reference-shaped kernel; bit-identical on every bf16 input
    (exhaustive tests).
    """
    max_scale = (nbits - 2) * (1 << es)
    maxpos = jnp.float32(2.0 ** max_scale)
    minpos = jnp.float32(2.0 ** -max_scale)

    xf0 = x.astype(jnp.float32)
    sign_bit = f32_bits(xf0) & jnp.int32(-2147483648)

    xa = jnp.clip(jnp.abs(xf0), minpos, maxpos)
    bits = f32_bits(xa)
    e = (bits >> 23) - 127  # magnitude only: no sign/exp masking needed

    run = jnp.where(e >= 0, 1 + (e >> es), -(e >> es))
    raw = run + es + 25 - nbits
    s2 = jnp.clip(raw, 0, 23 + es)  # == clip(raw,0,23)+clip(raw-23,0,es)

    q = jnp.left_shift(jnp.ones_like(bits), s2)
    q_mask = q - 1
    r = (127 << 23) & q_mask
    m = bits - r
    lsb = jnp.where(
        s2 >= 23 + es,
        (e < 0).astype(bits.dtype),
        (((bits - (127 << 23)) & q) != 0).astype(bits.dtype),
    )
    rounded = (m + (q >> 1) - 1 + lsb) & jnp.bitwise_not(q_mask)
    out = jnp.minimum(bits_f32(rounded + r), maxpos)

    threshold = math.pow(2.0, math.floor(-(nbits - 1) * (1 << es) + 2 ** (es - 1)))
    out = bits_f32(f32_bits(out) | sign_bit)
    out = jnp.where(jnp.abs(xf0) < threshold, 0.0, out)
    out = jnp.where(jnp.isfinite(xf0), out, jnp.nan)
    return out.astype(x.dtype)


def decode_posit(codes: jax.Array, nbits: int = 8, es: int = 1) -> jax.Array:
    """Decode packed posit codes (two's-complement, as produced by
    ``quantize_to_posit(..., return_pbits=True)``) back to float values.

    Pure bit arithmetic with two variable-amount shifts per element —
    Pallas-safe, used by the posit-storage matmul kernels to decode weight
    tiles in VMEM (weights live in HBM at 1 byte/element instead of bf16's
    two).  code 0 -> 0; the NaR pattern (-2^(nbits-1)) -> NaN.
    """
    c = codes.astype(jnp.int32)
    width_mask = (1 << nbits) - 1
    c = c & width_mask
    nar = 1 << (nbits - 1)

    sign = c >= nar                      # top bit set => negative
    mag = jnp.where(sign, (nar * 2 - c) & width_mask, c)  # two's complement

    # Left-align the magnitude's regime+exp+frac (nbits-1 payload bits) at
    # bit 30 so clz counts the regime run directly.
    u = jnp.left_shift(mag, 32 - nbits) & 0x7FFFFFFF

    top_one = (u & 0x40000000) != 0
    ones_run = jax.lax.clz((~u) & 0x7FFFFFFF) - 1   # leading 1s below bit 31
    zeros_run = jax.lax.clz(u | 1) - 1              # leading 0s below bit 31
    run = jnp.where(top_one, ones_run, zeros_run)

    scale_regime = jnp.where(top_one, (run - 1) << es, -(run) << es)

    # Bits after the regime terminator, left-aligned at bit 31.
    tail = jnp.left_shift(u, run + 2)
    if es > 0:
        exp = jnp.right_shift(tail, 32 - es) & ((1 << es) - 1)
    else:
        exp = 0
    scale = scale_regime + exp
    # Fraction: the remaining tail bits aligned into the f32 23-bit field.
    frac23 = jnp.right_shift(jnp.left_shift(tail, es), 9) & 0x7FFFFF

    bits = ((scale + 127) << 23) | frac23
    out = bits_f32(bits)
    out = jnp.where(sign, -out, out)
    out = jnp.where(mag == 0, 0.0, out)
    out = jnp.where(c == nar, jnp.nan, out)
    return out


def encode_posit(x: jax.Array, nbits: int = 8, es: int = 1) -> jax.Array:
    """Quantize and return the packed posit codes (int32, two's complement).

    The reference's ``return_pbits`` path emits garbage codes for
    regime-saturated lanes (its shift counts overflow there — the reference
    has the same defect); this encoder avoids that by re-running the bit
    extraction on the already-rounded values, which are exactly on the posit
    grid and therefore never regime-dominated.  NaN maps to NaR.
    """
    vals = quantize_to_posit(x, nbits, es, round_to_even=True)
    _, pbits = quantize_to_posit(vals, nbits, es, round_to_even=False,
                                 return_pbits=True)
    nar = -(1 << (nbits - 1))
    pbits = jnp.where(jnp.isnan(vals.astype(jnp.float32)), nar, pbits)
    return pbits
