"""Quantized KV cache with a full-precision residual cache (KIVI-style).

Functional equivalent of the reference's two-tier static cache (reference:
llm_utils.py:295-499 ``TorchExportableModuleWithStaticCache`` and the KIVI
attention at llm_utils.py:115-243): the prefill KV is quantized group-wise
into a static main cache — K along the token axis (ax=-2), V along the
feature axis (ax=-1) — while newly generated tokens go to a small
full-precision residual cache; attention runs over the concatenation.

TPU-native design: the cache is an explicit pytree of static-shape arrays
(codes + per-group scale/zero-point in bf16), so the decode step jits once
and the whole pytree shards over the mesh (heads on the model axis — see
parallel/sharding.py).  With ``KVCacheConfig(pack=True)`` sub-byte codes are
stored bit-packed in the token-planar layout (``pack_tokens_planar``) — 4x
fewer HBM bytes for uint2 — and the fused decode kernel
(ops/pallas/kivi_attention.py) unpacks planes in VMEM.  The generic
``pack_codes``/``unpack_codes`` remain as the export-format packing.

Storage layout is head-major, (B, KV, T, D) — the reference's own
(batch, heads, tokens, dim) order.  Per (batch, kv-head) the cache is a
contiguous (T, D) tile: exactly what the fused decode kernel DMAs per grid
step (Mosaic requires block slices to be full in the trailing two dims),
with D on lanes and tokens on sublanes.  Model code still speaks
(B, S, KV, D); the prefill/append/cache_kv wrappers transpose at the
boundary (linear-size tensors, fused by XLA into adjacent reshapes).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..qspec import QScheme, QuantizationSpec
from ..quantize.fake_quant import _group_affine_qparams
from ..quantize.ops import expand_scale
from ..numerics.bitutils import clamp_keep_zero_sign

__all__ = ["KVCacheConfig", "QuantizedKVCache", "init_cache", "prefill_cache",
           "append_to_cache", "cache_kv", "pack_codes", "unpack_codes",
           "pack_tokens_planar", "unpack_tokens_planar"]


class KVCacheConfig(NamedTuple):
    """Static cache geometry + quantization specs.

    k_spec / v_spec default to the KIVI setting used by the reference tests
    (test_codegen.py:536-586): uint2 group_wise_affine, K grouped along
    tokens (ax=-2), V along features (ax=-1), block 32.

    ``pack=True`` stores sub-byte codes bit-packed (32//bits codes per int32
    word) in the token-planar layout (see :func:`pack_tokens_planar`),
    realizing the 2-4x HBM capacity/bandwidth saving that is the point of a
    uint2/4 cache; the fused decode-attention kernel unpacks planes in VMEM
    with shift pairs on native 32-bit lanes.

    ``sym_bits`` (8 or 4) selects the **per-token symmetric** main-tier
    format instead (k_spec/v_spec must be None): codes int8 (or int4,
    token-planar packed) with one f32 scale per (batch, kv-head, token) for
    both K and V.  Structurally this is the fast format on TPU — the scale
    folds out of the (P, D) element path entirely, so the fused decode
    kernel (ops/pallas/int_kv_attention.py) has no zero-point correction
    dots and no scale lane-expansions: the r05 on-chip race measured it at
    2.1x the uint2 KIVI kernel (204.6 vs 435.1 us/layer at 7B geometry)
    with ~50x tighter per-element quantization error.  The two-tier
    semantics (quantized main + bf16 residual ring, reference
    llm_utils.py:295-499) are unchanged.
    """

    max_prefill: int
    max_decode: int
    k_spec: Optional[QuantizationSpec] = None
    v_spec: Optional[QuantizationSpec] = None
    pack: bool = False
    sym_bits: Optional[int] = None

    @staticmethod
    def kivi(max_prefill: int, max_decode: int,
             k_spec: str = "uint2,qs=group_wise_affine,bs=32,ax=-2",
             v_spec: str = "uint2,qs=group_wise_affine,bs=32,ax=-1",
             pack: bool = False):
        return KVCacheConfig(
            max_prefill, max_decode,
            _translate_spec_axes(QuantizationSpec.from_str(k_spec)),
            _translate_spec_axes(QuantizationSpec.from_str(v_spec)),
            pack=pack,
        )

    @staticmethod
    def int_sym(max_prefill: int, max_decode: int, bits: int = 4):
        """Per-token symmetric int8/int4 two-tier cache (see class doc)."""
        assert bits in (4, 8), bits
        return KVCacheConfig(max_prefill, max_decode, None, None,
                             pack=(bits == 4), sym_bits=bits)

    def _pack_bits(self, spec: Optional[QuantizationSpec]) -> Optional[int]:
        """Bits per code when this spec's codes are stored packed, else None.

        Packing applies to unsigned 1/2/4-bit codes only (uint2 KIVI being
        the headline case); signed or wider codes stay one byte per code.
        """
        if not self.pack or spec is None or spec.quant_min < 0:
            return None
        b = int(spec.quant_max).bit_length()  # uint2: quant_max 3 -> 2 bits
        return b if b in (1, 2, 4) else None


class QuantizedKVCache(NamedTuple):
    """Per-layer cache state (a pytree; stack layers with jax.tree_map)."""

    k_codes: jax.Array       # (B, KV, P, D) int8 (or bf16 when unquantized)
    k_scale: jax.Array
    k_zp: jax.Array
    v_codes: jax.Array
    v_scale: jax.Array
    v_zp: jax.Array
    k_res: jax.Array         # (B, KV, R, D) residual, full precision
    v_res: jax.Array
    main_len: jax.Array      # int32: valid tokens in the quantized cache
    res_len: jax.Array       # int32: valid tokens in the residual cache


# Cache storage follows the reference's (batch, heads, tokens, dim) layout
# (llm_utils.py KIVI: K ax=-2 groups along tokens, V ax=-1 along features),
# so spec axes carry over directly — just normalized to positive indices.
def _translate_spec_axes(spec: QuantizationSpec) -> QuantizationSpec:
    axes = spec.ch_axis if isinstance(spec.ch_axis, tuple) else (spec.ch_axis,)
    ours = tuple(a + 4 if a < 0 else a for a in axes)
    return spec.replace(ch_axis=ours if len(ours) > 1 else ours[0])


def _to_cache_layout(x: jax.Array) -> jax.Array:
    """(B, S, KV, D) model layout -> (B, KV, S, D) cache layout."""
    return jnp.swapaxes(x, 1, 2)


def _to_model_layout(x: jax.Array) -> jax.Array:
    """(B, KV, S, D) cache layout -> (B, S, KV, D) model layout."""
    return jnp.swapaxes(x, 1, 2)


def _qparam_shape(shape, spec: QuantizationSpec):
    """Shape of group-affine scale/zp for a (B, KV, T, D) tensor (spec axes
    already translated to our layout)."""
    axes = spec.ch_axis if isinstance(spec.ch_axis, tuple) else (spec.ch_axis,)
    out = list(shape)
    for ax in axes:
        ax = ax + len(shape) if ax < 0 else ax
        out[ax] = -(-shape[ax] // spec.block_size)
    return tuple(out)


def _code_dtype(spec: QuantizationSpec):
    return jnp.int8 if spec.quant_min < 0 else jnp.uint8


def _quantize_groupwise(x, spec: QuantizationSpec):
    """Group-affine encode: returns (codes u/int8, scale, zp) in x's layout."""
    sf, zp = _group_affine_qparams(x, spec)
    sfe = expand_scale(sf, x.shape, spec.block_size)
    zpe = expand_scale(zp, x.shape, spec.block_size)
    codes = clamp_keep_zero_sign(
        jnp.round(x.astype(jnp.float32) / sfe.astype(jnp.float32)
                  + zpe.astype(jnp.float32)),
        spec.quant_min, spec.quant_max,
    ).astype(_code_dtype(spec))
    return codes, sf.astype(jnp.bfloat16), zp.astype(jnp.bfloat16)


def _dequantize_groupwise(codes, scale, zp, spec: QuantizationSpec, dtype):
    sfe = expand_scale(scale.astype(jnp.float32), codes.shape, spec.block_size)
    zpe = expand_scale(zp.astype(jnp.float32), codes.shape, spec.block_size)
    return ((codes.astype(jnp.float32) - zpe) * sfe).astype(dtype)


# -- per-token symmetric format (sym_bits) ----------------------------------

_SYM_QMAX = {8: 127, 4: 7}


def _quantize_sym_per_token(x, bits: int):
    """(B, KV, T, D) -> (codes, scale).  Scale is (B, KV, 1, T) f32 — one
    scalar per token, laid out token-on-lanes as the fused decode kernel
    reads it.  bits=8: int8 codes (B, KV, T, D); bits=4: token-planar
    packed int32 words (B, KV, T//8, D) holding 4-bit two's-complement
    signed codes (pack_tokens_planar with a +mid pre-offset stores the
    signed code's raw field, so the kernel's shl/asr unpack sign-extends
    straight to the code)."""
    qmax = _SYM_QMAX[bits]
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-30)   # (B, KV, T)
    sf = amax / qmax
    codes = jnp.clip(jnp.round(xf / sf[..., None]), -qmax, qmax)
    if bits == 4:
        codes = pack_tokens_planar(codes.astype(jnp.int32) + 8, 4)
    else:
        codes = codes.astype(jnp.int8)
    return codes, sf[:, :, None, :].astype(jnp.float32)


def _dequantize_sym_per_token(codes, scale, bits: int, dtype):
    if bits == 4:
        c = unpack_tokens_planar(codes, 4).astype(jnp.int32) - 8
    else:
        c = codes.astype(jnp.int32)
    sf_t = scale.astype(jnp.float32)[:, :, 0, :, None]          # (B,KV,T,1)
    return (c.astype(jnp.float32) * sf_t).astype(dtype)


def init_cache(
    cfg: KVCacheConfig, batch: int, kv_heads: int, head_dim: int,
    dtype=jnp.bfloat16,
) -> QuantizedKVCache:
    P, R = cfg.max_prefill, cfg.max_decode
    shape = (batch, kv_heads, P, head_dim)

    if cfg.sym_bits is not None:
        bits = cfg.sym_bits
        assert cfg.k_spec is None and cfg.v_spec is None, (
            "sym_bits replaces k_spec/v_spec")
        if bits == 4:
            assert P % 8 == 0, P
            cshape, cdt = (batch, kv_heads, P // 8, head_dim), jnp.int32
        else:
            cshape, cdt = shape, jnp.int8
        sshape = (batch, kv_heads, 1, P)
        return QuantizedKVCache(
            jnp.zeros(cshape, cdt), jnp.ones(sshape, jnp.float32),
            jnp.zeros((1,), jnp.bfloat16),
            jnp.zeros(cshape, cdt), jnp.ones(sshape, jnp.float32),
            jnp.zeros((1,), jnp.bfloat16),
            k_res=jnp.zeros((batch, kv_heads, R, head_dim), dtype),
            v_res=jnp.zeros((batch, kv_heads, R, head_dim), dtype),
            main_len=jnp.zeros((), jnp.int32),
            res_len=jnp.zeros((), jnp.int32),
        )

    def _codes_shape(spec):
        bits = cfg._pack_bits(spec)
        if bits is None:
            return shape, _code_dtype(spec)
        return (batch, kv_heads, P * bits // 32, head_dim), jnp.int32

    if cfg.k_spec is not None:
        k_shape, k_dt = _codes_shape(cfg.k_spec)
        k_codes = jnp.zeros(k_shape, k_dt)
        k_scale = jnp.ones(_qparam_shape(shape, cfg.k_spec), jnp.bfloat16)
        k_zp = jnp.zeros_like(k_scale)
    else:
        k_codes = jnp.zeros(shape, dtype)
        k_scale = jnp.ones((1,), jnp.bfloat16)
        k_zp = jnp.zeros((1,), jnp.bfloat16)
    if cfg.v_spec is not None:
        v_shape, v_dt = _codes_shape(cfg.v_spec)
        v_codes = jnp.zeros(v_shape, v_dt)
        v_scale = jnp.ones(_qparam_shape(shape, cfg.v_spec), jnp.bfloat16)
        v_zp = jnp.zeros_like(v_scale)
    else:
        v_codes = jnp.zeros(shape, dtype)
        v_scale = jnp.ones((1,), jnp.bfloat16)
        v_zp = jnp.zeros((1,), jnp.bfloat16)
    return QuantizedKVCache(
        k_codes, k_scale, k_zp, v_codes, v_scale, v_zp,
        k_res=jnp.zeros((batch, kv_heads, R, head_dim), dtype),
        v_res=jnp.zeros((batch, kv_heads, R, head_dim), dtype),
        main_len=jnp.zeros((), jnp.int32),
        res_len=jnp.zeros((), jnp.int32),
    )


def prefill_cache(
    cache: QuantizedKVCache, cfg: KVCacheConfig,
    k: jax.Array, v: jax.Array,
    length=None,
) -> QuantizedKVCache:
    """Quantize the prefill K/V (B, S, KV, D) into the main cache.

    S == cfg.max_prefill gives exact reference parity of the group boundaries
    (the reference exports the graph at a fixed prefill length).  Shorter
    prefills pad with zeros; ``length`` (int or traced scalar, defaults to S)
    additionally zeroes K/V at positions >= length — so a fixed-shape padded
    prefill (serving engine) stores bit-identical cache content to a
    true-length prefill.  Decoders must still mask slots >= main_len
    (residual_causal_mask / per_slot_mask do).
    """
    B, S, KV, D = k.shape
    P = cfg.max_prefill
    assert S <= P, (S, P)
    k = _to_cache_layout(k)                      # (B, KV, S, D)
    v = _to_cache_layout(v)
    if S < P:
        pad = [(0, 0), (0, 0), (0, P - S), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    if length is None:
        main_len = jnp.asarray(S, jnp.int32)
    else:
        main_len = jnp.asarray(length, jnp.int32)
        pos = jnp.arange(P)[None, None, :, None]
        keep = pos < main_len
        k = jnp.where(keep, k, jnp.zeros((), k.dtype))
        v = jnp.where(keep, v, jnp.zeros((), v.dtype))

    if cfg.sym_bits is not None:
        k_codes, k_scale = _quantize_sym_per_token(k, cfg.sym_bits)
        v_codes, v_scale = _quantize_sym_per_token(v, cfg.sym_bits)
        return cache._replace(
            k_codes=k_codes, k_scale=k_scale,
            v_codes=v_codes, v_scale=v_scale,
            main_len=main_len,
            res_len=jnp.zeros((), jnp.int32),
        )

    if cfg.k_spec is not None:
        k_codes, k_scale, k_zp = _quantize_groupwise(k, cfg.k_spec)
        bits = cfg._pack_bits(cfg.k_spec)
        if bits is not None:
            k_codes = pack_tokens_planar(k_codes, bits)
    else:
        k_codes, k_scale, k_zp = k, cache.k_scale, cache.k_zp
    if cfg.v_spec is not None:
        v_codes, v_scale, v_zp = _quantize_groupwise(v, cfg.v_spec)
        bits = cfg._pack_bits(cfg.v_spec)
        if bits is not None:
            v_codes = pack_tokens_planar(v_codes, bits)
    else:
        v_codes, v_scale, v_zp = v, cache.v_scale, cache.v_zp

    return cache._replace(
        k_codes=k_codes, k_scale=k_scale, k_zp=k_zp,
        v_codes=v_codes, v_scale=v_scale, v_zp=v_zp,
        main_len=main_len,
        res_len=jnp.zeros((), jnp.int32),
    )


def append_to_cache(
    cache: QuantizedKVCache, k_new: jax.Array, v_new: jax.Array
) -> QuantizedKVCache:
    """Append decode-step K/V (B, 1, KV, D) to the full-precision residual."""
    idx = cache.res_len
    n = k_new.shape[1]
    k_res = jax.lax.dynamic_update_slice(
        cache.k_res, _to_cache_layout(k_new), (0, 0, idx, 0))
    v_res = jax.lax.dynamic_update_slice(
        cache.v_res, _to_cache_layout(v_new), (0, 0, idx, 0))
    return cache._replace(
        k_res=k_res, v_res=v_res, res_len=cache.res_len + n
    )


def cache_kv(
    cache: QuantizedKVCache, cfg: KVCacheConfig, dtype=jnp.bfloat16
) -> Tuple[jax.Array, jax.Array]:
    """Materialized (K, V) = [dequant(main); residual] for attention.

    Shapes are static: (B, max_prefill + max_decode, KV, D); invalid slots
    must be masked by the caller (see residual_causal_mask).
    """
    if cfg.sym_bits is not None:
        k_main = _dequantize_sym_per_token(
            cache.k_codes, cache.k_scale, cfg.sym_bits, dtype)
        v_main = _dequantize_sym_per_token(
            cache.v_codes, cache.v_scale, cfg.sym_bits, dtype)
        k = jnp.concatenate([k_main, cache.k_res.astype(dtype)], axis=2)
        v = jnp.concatenate([v_main, cache.v_res.astype(dtype)], axis=2)
        return _to_model_layout(k), _to_model_layout(v)

    if cfg.k_spec is not None:
        k_codes = cache.k_codes
        bits = cfg._pack_bits(cfg.k_spec)
        if bits is not None:
            k_codes = unpack_tokens_planar(k_codes, bits)
        k_main = _dequantize_groupwise(
            k_codes, cache.k_scale, cache.k_zp, cfg.k_spec, dtype)
    else:
        k_main = cache.k_codes.astype(dtype)
    if cfg.v_spec is not None:
        v_codes = cache.v_codes
        bits = cfg._pack_bits(cfg.v_spec)
        if bits is not None:
            v_codes = unpack_tokens_planar(v_codes, bits)
        v_main = _dequantize_groupwise(
            v_codes, cache.v_scale, cache.v_zp, cfg.v_spec, dtype)
    else:
        v_main = cache.v_codes.astype(dtype)
    k = jnp.concatenate([k_main, cache.k_res.astype(dtype)], axis=2)
    v = jnp.concatenate([v_main, cache.v_res.astype(dtype)], axis=2)
    return _to_model_layout(k), _to_model_layout(v)


def residual_causal_mask(
    cfg: KVCacheConfig, batch: int, q_len: int,
    main_len: jax.Array, res_len: jax.Array, dtype=jnp.float32,
) -> jax.Array:
    """Additive mask over [main; residual] slots for a decode query block
    (reference: llm_utils.py:278-292): main slots < main_len visible,
    residual slots < res_len + q_len visible causally."""
    P, R = cfg.max_prefill, cfg.max_decode
    kv_pos = jnp.arange(P + R)[None, :]
    q_pos = jnp.arange(q_len)[:, None]
    in_main = kv_pos < main_len
    res_idx = kv_pos - P
    in_res = jnp.logical_and(
        kv_pos >= P, res_idx <= res_len + q_pos
    )
    allowed = jnp.logical_or(in_main, in_res)
    mask_value = float(jnp.finfo(jnp.bfloat16).min)
    mask = jnp.where(allowed, 0.0, mask_value).astype(dtype)
    return jnp.broadcast_to(mask[None, None], (batch, 1, q_len, P + R))


# ---------------------------------------------------------------------------
# Token-planar packing: the serving cache layout
# ---------------------------------------------------------------------------
#
# Codes (…, P, D) pack along the *token* axis into (…, P//per, D) **int32**
# words with per = 32//bits: word[…, t', d] holds the codes of tokens
# t = s * (P//per) + t' in bit-field s (s = 0..per-1), each stored *centered*
# (c - 2^(bits-1)) as an nbits-wide two's-complement field.  This keeps the
# last (lane) dimension at D=128 — full-width DMAs — and unpacking plane s is
# a shift-left / arithmetic-shift-right pair on natively-32-bit VPU lanes
# yielding the contiguous token block [s*P//per, (s+1)*P//per).
#
# int32 words rather than uint8 bytes for the same reason the affine weight
# storage uses them (ops/pallas/affine_storage.py, commit 8684218): Mosaic
# lowers int8->int32 conversions as sublane-shuffle relayouts that measured
# ~5x over the byte bound, while int32 loads need no relayout at all.
# Centered storage makes the unpack sign-extending (shl/asr, no mask) and the
# decode kernel folds the +2^(bits-1) back into its per-group zero-point
# constant (ops/pallas/kivi_attention.py).


def pack_tokens_planar(codes: jax.Array, bits: int) -> jax.Array:
    """(…, P, D) int codes in [0, 2^bits) -> (…, P//per, D) int32 words,
    token-planar, fields centered two's-complement.

    Accumulated plane-by-plane with slices + ors rather than a reshape /
    broadcast-shift / reduce: the reduce form materialized two full
    (…, per, P//per, D) int32 temps — 2.7 GB each at the 7B batch-8 cache
    shape, which OOM'd the serving decode graph — while the slice chain
    fuses into a single output-sized loop.
    """
    assert bits in (1, 2, 4)
    per = 32 // bits
    *lead, P, D = codes.shape
    assert P % per == 0, (P, per)
    mid = 1 << (bits - 1)
    mask = (1 << bits) - 1
    pp = P // per
    fields = (codes.astype(jnp.int32) - mid) & mask
    out = jnp.zeros((*lead, pp, D), jnp.int32)
    for s in range(per):
        out = out | (fields[..., s * pp:(s + 1) * pp, :] << (bits * s))
    return out


def unpack_tokens_planar(packed: jax.Array, bits: int) -> jax.Array:
    """Inverse of pack_tokens_planar; returns uint8 codes (…, P, D)."""
    per = 32 // bits
    *lead, Pp, D = packed.shape
    mid = 1 << (bits - 1)
    sh_l = ((32 - bits) - jnp.arange(per, dtype=jnp.int32) * bits).reshape(
        (1,) * len(lead) + (per, 1, 1))
    planes = ((packed[..., None, :, :] << sh_l) >> (32 - bits)) + mid
    return planes.reshape(*lead, per * Pp, D).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Sub-byte storage packing (uint2/uint4 codes -> bytes) for HBM footprint
# ---------------------------------------------------------------------------

def pack_codes(codes: jax.Array, bits: int) -> jax.Array:
    """Pack intN codes (stored int8, last axis) into bytes: 8//bits per byte."""
    assert bits in (1, 2, 4)
    per = 8 // bits
    *lead, last = codes.shape
    assert last % per == 0
    u = codes.astype(jnp.uint8).reshape(*lead, last // per, per)
    shifts = (jnp.arange(per, dtype=jnp.uint8) * bits)
    return jnp.sum(
        (u & ((1 << bits) - 1)).astype(jnp.uint8) << shifts, axis=-1
    ).astype(jnp.uint8)


def unpack_codes(packed: jax.Array, bits: int, signed: bool = False) -> jax.Array:
    """Inverse of pack_codes; returns int8 codes.

    ``signed=True`` sign-extends the low ``bits`` bits (two's complement), so
    intN codes round-trip: int4 -1 packs as 0b1111 and unpacks back to -1.
    Without it only unsigned codes survive the round trip.
    """
    per = 8 // bits
    shifts = jnp.arange(per, dtype=jnp.uint8) * bits
    u = (packed[..., None] >> shifts) & ((1 << bits) - 1)
    *lead, last, _ = u.shape
    u = u.reshape(*lead, last * per).astype(jnp.int32)
    if signed:
        sign_bit = 1 << (bits - 1)
        u = (u ^ sign_bit) - sign_bit
    return u.astype(jnp.int8)


# ---------------------------------------------------------------------------
# Per-slot operations for continuous batching (lengths as (B,) arrays)
# ---------------------------------------------------------------------------

def prefill_slot(
    cache: QuantizedKVCache, cfg: KVCacheConfig,
    k: jax.Array, v: jax.Array, slot: jax.Array,
) -> QuantizedKVCache:
    """Quantize one request's prefill K/V (1, P, KV, D) into batch slot
    ``slot`` and reset that slot's residual.  Lengths must be (B,) arrays
    (continuous-batching mode)."""
    if cfg.pack:
        # token-planar packing spans the full prefill extent; a partial
        # prefill would interleave planes wrongly.
        assert k.shape[1] == cfg.max_prefill, (k.shape, cfg.max_prefill)
    k = _to_cache_layout(k)                      # (1, KV, P, D)
    v = _to_cache_layout(v)
    k_zp = v_zp = None
    if cfg.sym_bits is not None:
        k_codes, k_scale = _quantize_sym_per_token(k, cfg.sym_bits)
        v_codes, v_scale = _quantize_sym_per_token(v, cfg.sym_bits)
    else:
        if cfg.k_spec is not None:
            k_codes, k_scale, k_zp = _quantize_groupwise(k, cfg.k_spec)
            bits = cfg._pack_bits(cfg.k_spec)
            if bits is not None:
                k_codes = pack_tokens_planar(k_codes, bits)
        else:
            k_codes, k_scale = k, None
        if cfg.v_spec is not None:
            v_codes, v_scale, v_zp = _quantize_groupwise(v, cfg.v_spec)
            bits = cfg._pack_bits(cfg.v_spec)
            if bits is not None:
                v_codes = pack_tokens_planar(v_codes, bits)
        else:
            v_codes, v_scale = v, None

    def put(buf, val):
        if val is None:
            return buf
        start = (slot,) + (0,) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), start)

    S = k.shape[2]
    return cache._replace(
        k_codes=put(cache.k_codes, k_codes),
        k_scale=put(cache.k_scale, k_scale),
        k_zp=put(cache.k_zp, k_zp),
        v_codes=put(cache.v_codes, v_codes),
        v_scale=put(cache.v_scale, v_scale),
        v_zp=put(cache.v_zp, v_zp),
        k_res=put(cache.k_res, jnp.zeros_like(cache.k_res[:1])),
        v_res=put(cache.v_res, jnp.zeros_like(cache.v_res[:1])),
        main_len=cache.main_len.at[slot].set(S),
        res_len=cache.res_len.at[slot].set(0),
    )


def append_per_slot(
    cache: QuantizedKVCache, k_new: jax.Array, v_new: jax.Array
) -> QuantizedKVCache:
    """Append one decode token per slot at each slot's own residual index.

    k_new/v_new: (B, 1, KV, D); res_len: (B,).

    Implemented as a one-hot masked write over the (small) residual extent
    rather than a vmapped dynamic_update_slice: per-batch dynamic indices
    lower to a serial while-loop whose body forces batch all-gathers under
    GSPMD — the masked write is elementwise, so it stays batch-parallel and
    batch-sharded (the distributed engine's zero-collective decode step
    depends on this).
    """
    R = cache.k_res.shape[2]
    # (B, 1, R, 1): slot r == res_len[b]
    hit = (jnp.arange(R)[None, None, :, None]
           == cache.res_len[:, None, None, None])

    def put(buf, new):
        new = _to_cache_layout(new).astype(buf.dtype)   # (B, KV, 1, D)
        return jnp.where(hit, new, buf)

    return cache._replace(
        k_res=put(cache.k_res, k_new), v_res=put(cache.v_res, v_new),
        res_len=cache.res_len + 1)


def per_slot_mask(
    cfg: KVCacheConfig, main_len: jax.Array, res_len: jax.Array,
    dtype=jnp.float32,
) -> jax.Array:
    """Additive decode mask (B, 1, 1, P+R) from per-slot lengths: main slots
    < main_len[b] visible; residual slots <= res_len[b] visible (the current
    token was just appended at index res_len[b])."""
    P, R = cfg.max_prefill, cfg.max_decode
    kv_pos = jnp.arange(P + R)[None, :]
    in_main = kv_pos < main_len[:, None]
    in_res = jnp.logical_and(kv_pos >= P,
                             (kv_pos - P) <= res_len[:, None])
    allowed = jnp.logical_or(in_main, in_res)
    mask_value = float(jnp.finfo(jnp.bfloat16).min)
    mask = jnp.where(allowed, 0.0, mask_value).astype(dtype)
    return mask[:, None, None, :]
