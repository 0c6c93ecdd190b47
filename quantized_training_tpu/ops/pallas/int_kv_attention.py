"""Integer-KV decode attention: per-token symmetric int8/int4 cache whose
codes feed the MXU directly (Pallas/Mosaic TPU kernel).

Why this exists next to the uint2 KIVI kernel (kivi_attention.py): the r04
on-chip ablation proved that kernel *critical-path-bound* at ~430 us/layer
(20% of its byte bound) — per (batch, kv-head) grid step the M=1 attention
chain runs ~9 serial MXU/VPU stages (unpack, dequant-mul, zero-point
correction dots, scale lane-expansions) whose instruction latency, not
bytes, sets the time.  The VERDICT r04 structural candidate (a) is this
kernel: store the main cache as **per-token symmetric** integer codes so

  * the zero-point terms vanish (symmetric: zp == 0 by construction),
  * the scale factors out of the (P, D) element path entirely —
      k[t, :] = ks[t] * ck[t, :]  =>  scores  s[h, t] = (q_h . ck[t]) * ks[t]
      v[t, :] = vs[t] * cv[t, :]  =>  output  o = (p ⊙ vs) @ cv
    i.e. scale application is a (group, P) vector multiply, never a (P, D)
    dequant or a lane-expansion dot,
  * with ``int_dots=True`` the dots themselves run s8 x s8 -> s32 on the
    MXU (2x the bf16 rate on v5e): q is quantized per-head to int8 in-kernel
    and p ⊙ vs per-row after the softmax, so the cache codes are consumed
    *as stored* — no unpack, no convert, no dequantized (P, D) tile at all.

Accuracy: int8 per-token symmetric is far tighter than uint2 group-affine
(rel err ~4e-3 vs ~2e-1 per element); the extra in-kernel roundings
(q -> s8, p⊙vs -> s8) add ~1/127-of-max relative noise, well under the
cache's own quantization error.  The two-tier semantics of the reference
cache are preserved exactly: main tier quantized, decode tokens in a bf16
residual ring, attention over the concatenation with post-append
visibility (main t < main_len, residual r < res_len) — reference:
llm_utils.py:115-243 (KIVI attention), llm_utils.py:295-499 (two-tier
static cache); this kernel changes the main-tier *format*, not the tiering.

Layouts (head-major cache, see serving/kv_cache.py):
  q               (B, H, D)
  k_codes         (B, KV, D, P) int8  — K stored TRANSPOSED ("K^T cache"):
                  the score dot is then a standard (group, D) @ (D, P)
                  contraction; Mosaic consumes the s8 tile directly.
                  (``k_transposed=False`` accepts (B, KV, P, D) and
                  contracts on the trailing dim instead — raced on chip.)
  v_codes         (B, KV, P, D) int8
  k_scale/v_scale (B, KV, 1, P) f32 — per-token scalar scales
  k_res/v_res     (B, KV, R, D) bf16 residual ring
  main_len/res_len (B,) int32

int4 (``bits=4``) stores codes as token-planar packed int32 words
((B, KV, P//8, D), see kv_cache.pack_tokens_planar) and runs the bf16
path (no s4 MXU on v5e); it exists for the capacity point (2x fewer cache
bytes than int8).
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import mesh_axis_size as _axis_size, resolve_interpret

__all__ = ["int_kv_decode_attention"]

NEG_INF = -2.0 ** 30


def _unpack_planar(codes, bits: int):
    """(Pw, D) packed int32 words -> (P, D) int32 signed codes (token order
    preserved: plane s of word t' is token s * (P // per) + t', and planes
    concatenate in order — see kv_cache.pack_tokens_planar)."""
    per = 32 // bits
    planes = [(codes << (32 - bits * (s + 1))) >> (32 - bits)
              for s in range(per)]
    return jnp.concatenate(planes, axis=0)


def _kernel(
    main_ref, res_ref,                    # SMEM (B, 1) lengths
    q_ref, kc_ref, ks_ref, vc_ref, vs_ref, kr_ref, vr_ref,
    o_ref,
    *,
    scale: float, P: int, bits: int, int_dots: bool, k_transposed: bool,
):
    b = pl.program_id(0)
    ml = main_ref[b, 0]
    rl = res_ref[b, 0]

    qf = q_ref[0, 0].astype(jnp.float32) * scale          # (group, D)
    group, D = qf.shape
    ks = ks_ref[0, 0].astype(jnp.float32)                 # (1, P)
    vs = vs_ref[0, 0].astype(jnp.float32)                 # (1, P)

    # ---- main scores --------------------------------------------------------
    if int_dots:
        # q -> s8 per tile (one shared scale across the group rows: exact
        # enough — |q| is homogeneous within a head group, and group is 1
        # for MHA).  127.5-free rounding: round(q / qs) with qs = amax/127
        # never exceeds ±127.
        qa = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-30)
        qs = qa / 127.0
        q8 = jnp.round(qf / qs).astype(jnp.int8)
        if k_transposed:
            sdot = jax.lax.dot_general(                   # (group, P)
                q8, kc_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            sdot = jax.lax.dot_general(
                q8, kc_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        s_main = sdot.astype(jnp.float32) * (ks * qs)
    else:
        qb = qf.astype(jnp.bfloat16)
        if bits in (4,):
            kcb = _unpack_planar(kc_ref[0, 0], bits).astype(jnp.bfloat16)
            s_main = jax.lax.dot_general(
                qb, kcb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * ks
        elif k_transposed:
            kcb = kc_ref[0, 0].astype(jnp.bfloat16)       # (D, P)
            s_main = jax.lax.dot_general(
                qb, kcb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * ks
        else:
            kcb = kc_ref[0, 0].astype(jnp.bfloat16)       # (P, D)
            s_main = jax.lax.dot_general(
                qb, kcb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * ks
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (group, P), 1)
    s_main = jnp.where(t_idx < ml, s_main, NEG_INF)

    # ---- residual scores (bf16 tier) ----------------------------------------
    qb = qf.astype(jnp.bfloat16)
    kr = kr_ref[0, 0]                                     # (R, D) bf16
    R = kr.shape[0]
    s_res = jax.lax.dot_general(
        qb, kr.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (group, R), 1)
    s_res = jnp.where(r_idx < rl, s_res, NEG_INF)

    # ---- softmax over [main; residual] --------------------------------------
    m = jnp.maximum(jnp.max(s_main, axis=1, keepdims=True),
                    jnp.max(s_res, axis=1, keepdims=True))
    p_main = jnp.exp(s_main - m)
    p_res = jnp.exp(s_res - m)
    l = (jnp.sum(p_main, axis=1, keepdims=True)
         + jnp.sum(p_res, axis=1, keepdims=True))

    # ---- weighted V ---------------------------------------------------------
    pv = p_main * vs                                      # (group, P) f32
    if int_dots:
        pa = jnp.maximum(jnp.max(jnp.abs(pv)), 1e-30)
        ps = pa / 127.0
        p8 = jnp.round(pv / ps).astype(jnp.int8)
        acc = jax.lax.dot_general(                        # (group, D)
            p8, vc_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * ps
    else:
        if bits in (4,):
            vcb = _unpack_planar(vc_ref[0, 0], bits).astype(jnp.bfloat16)
        else:
            vcb = vc_ref[0, 0].astype(jnp.bfloat16)       # (P, D)
        acc = jax.lax.dot_general(
            pv.astype(jnp.bfloat16), vcb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        p_res.astype(jnp.bfloat16), vr_ref[0, 0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _decode_attention_local(
    q: jax.Array,
    k_codes: jax.Array, k_scale: jax.Array,
    v_codes: jax.Array, v_scale: jax.Array,
    k_res: jax.Array, v_res: jax.Array,
    main_len: jax.Array, res_len: jax.Array,
    *,
    bits: int = 8,
    int_dots: bool = True,
    k_transposed: bool = True,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    B, H, D = q.shape
    KV = k_codes.shape[1]
    group = H // KV
    assert H % KV == 0, (H, KV)
    P = v_scale.shape[-1]
    R = k_res.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    interpret = resolve_interpret(interpret)
    if bits == 4:
        assert not int_dots, "int4 runs the bf16 path (no s4 MXU)"
        assert not k_transposed
        Pk = Pv = P * 4 // 32
    else:
        assert bits == 8, bits
        Pk, Pv = (D if k_transposed else P), P

    kernel = functools.partial(
        _kernel, scale=scale, P=P, bits=bits, int_dots=int_dots,
        k_transposed=k_transposed,
    )
    grid = (B, KV)

    def _bh(b, kv):
        return (b, kv, 0, 0)

    def _full(b, kv):
        return (0, 0)

    def _block4(n3, n4):
        return pl.BlockSpec((1, 1, n3, n4), _bh)

    kc_block = (_block4(D, P) if (bits == 8 and k_transposed)
                else _block4(Pk, D))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), _full, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), _full, memory_space=pltpu.SMEM),
            _block4(group, D),
            kc_block,
            _block4(1, P),
            _block4(Pv, D),
            _block4(1, P),
            _block4(R, D),
            _block4(R, D),
        ],
        out_specs=_block4(group, D),
        out_shape=jax.ShapeDtypeStruct((B, KV, group, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        main_len.astype(jnp.int32).reshape(B, 1),
        res_len.astype(jnp.int32).reshape(B, 1),
        q.reshape(B, KV, group, D),
        k_codes, k_scale, v_codes, v_scale, k_res, v_res,
    )
    return out.reshape(B, H, D)


# ---------------------------------------------------------------------------
# SPMD partitioning: identical story to kivi_attention.py — the grid is
# (B, KV) with fully independent steps, so batch shards over the data axis
# and kv-heads over the model axis with zero collectives.
# ---------------------------------------------------------------------------

# every non-(batch, kv-head) factor is private to its operand (kc's dims
# depend on the layout variant, and vc's token extent differs from vs's
# when codes are bit-packed — unifying them would be wrong for bits=4)
_SDY_RULE = (
    "b h d, b k x y, b k o tk, b k z w, b k o2 tv, "
    "b k r d, b k r d, b, b -> b h d"
)


@functools.lru_cache(maxsize=None)
def _partitioned_decode(bits, int_dots, k_transposed, scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    kwargs = dict(bits=bits, int_dots=int_dots, k_transposed=k_transposed,
                  scale=scale, interpret=interpret)

    def fn(q, kc, ks, vc, vs, kr, vr, ml, rl):
        return _decode_attention_local(q, kc, ks, vc, vs, kr, vr, ml, rl,
                                       **kwargs)

    def _canonical_specs(mesh, q_shape):
        spec = getattr(q_shape.sharding, "spec", P())
        B = q_shape.shape[0]
        b_ax = spec[0] if len(spec) > 0 else None
        m_ax = spec[1] if len(spec) > 1 else None
        if b_ax is not None and B % _axis_size(mesh, b_ax):
            b_ax = None
        return b_ax, m_ax

    def partition(mesh, arg_shapes, result_shape):
        b_ax, m_ax = _canonical_specs(mesh, arg_shapes[0])
        KV = arg_shapes[1].shape[1]
        if m_ax is not None and KV % _axis_size(mesh, m_ax):
            m_ax = None
        qspec = NamedSharding(mesh, P(b_ax, m_ax, None))
        cspec = NamedSharding(mesh, P(b_ax, m_ax, None, None))
        lspec = NamedSharding(mesh, P(b_ax))
        arg_shardings = (qspec,) + (cspec,) * 6 + (lspec, lspec)
        return mesh, fn, qspec, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        b_ax, m_ax = _canonical_specs(mesh, arg_shapes[0])
        return NamedSharding(mesh, P(b_ax, m_ax, None))

    wrapped = custom_partitioning(fn)
    wrapped.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=_SDY_RULE,
        need_replication_factors=(
            "d", "x", "y", "o", "tk", "z", "w", "o2", "tv", "r"),
    )
    return wrapped


def int_kv_decode_attention(
    q: jax.Array,
    k_codes: jax.Array, k_scale: jax.Array,
    v_codes: jax.Array, v_scale: jax.Array,
    k_res: jax.Array, v_res: jax.Array,
    main_len: jax.Array, res_len: jax.Array,
    *,
    bits: int = 8,
    int_dots: bool = True,
    k_transposed: bool = True,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One decode step of attention over the two-tier int-sym cache.

    See module docstring for layouts.  Returns (B, H, D) in q.dtype.
    SPMD-partitionable over batch (data axis) and kv-heads (model axis)
    with zero collectives.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    interpret = resolve_interpret(interpret)
    return _partitioned_decode(
        int(bits), bool(int_dots), bool(k_transposed), float(scale),
        bool(interpret))(
        q, k_codes, k_scale, v_codes, v_scale, k_res, v_res,
        main_len, res_len)
