"""Fused dequantize-attention for KIVI decode (Pallas/Mosaic TPU kernel).

The point of a quantized KV cache is that it pays for itself at decode: the
reference fuses the cache dequantize into the attention consumers
(reference: llm_utils.py:115-243 KIVI attention; llm_utils.py:829-997
fuse_dequantize_quantize collapses dq->q chains over cache slices).  The
round-1 TPU path instead materialized the full dequantized K/V in HBM every
step (serving/kv_cache.py cache_kv) — paying the bf16 write + read on top of
the code read, which made the uint2 cache *slower* than the fp cache.

This kernel reads the cache codes (optionally bit-packed token-planar
uint2/4), per-group scales/zero-points, and the fp residual directly from
HBM and dequantizes tiles in VMEM; the dequantized K/V never touch HBM.

Per-(batch, kv-head) grid step, entirely in VMEM:
  * unpack planes (constant shifts, sublane concat) if packed
  * dequantize K/V: scale/zp group expansion is done with a 0/1 expansion
    matmul on the MXU (E_P @ scale) — robust on Mosaic, free next to the
    memory time (decode attention is HBM-bandwidth-bound)
  * masked scores over [main; residual], f32 softmax, weighted sum

Visibility convention (post-append): main slot t visible iff t < main_len,
residual slot r visible iff r < res_len — equivalent to the model's
residual_causal_mask / per_slot_mask applied after the current token's K/V
was appended at index res_len-1.

Shapes (head-major cache layout, see serving/kv_cache.py): q (B, H, D);
codes (B, KV, P[*bits/8], D); k scales (B, KV, P/bsK, D); v scales
(B, KV, P, D/bsV); residual (B, KV, R, D); lengths (B,) int32.  Per grid
step every operand block is a full trailing-2D tile — the layout Mosaic's
block rules require and the DMA engine likes.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import mesh_axis_size as _axis_size, resolve_interpret

__all__ = ["kivi_decode_attention"]

NEG_INF = -2.0 ** 30


def _unpack_planar(codes, bits: int):
    """(Pw, D) packed int32 words -> (P, D) int32 *centered* codes,
    token-planar order (see kv_cache.pack_tokens_planar).  A shift-left /
    arithmetic-shift-right pair per plane on natively-32-bit lanes — no int8
    loads and no int8->int32 relayouts (Mosaic lowers those as sublane
    shuffles that measured ~5x over the byte bound in the old uint8 layout).

    ``bits is None`` means unpacked u/int8 codes: returned as int32 raw
    (uncentered); the caller's mid constant is 0 there.
    """
    if bits is None:
        return codes.astype(jnp.int32)
    per = 32 // bits
    planes = [(codes << (32 - bits * (s + 1))) >> (32 - bits)
              for s in range(per)]
    return jnp.concatenate(planes, axis=0)


def _expansion_matrix(n: int, groups: int):
    """(n, groups) 0/1 f32 matrix E with E[i, g] = 1 iff i // bs == g."""
    bs = n // groups
    i = jax.lax.broadcasted_iota(jnp.int32, (n, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (n, groups), 1)
    return jnp.where(i // bs == g, 1.0, 0.0).astype(jnp.float32)


def _kernel(
    main_ref, res_ref,            # SMEM (B, 1) lengths, indexed by batch row
    q_ref, kc_ref, ks_ref, kz_ref, vc_ref, vs_ref, vz_ref, kr_ref, vr_ref,
    o_ref,
    *,
    scale: float, P: int, bits_k: Optional[int], bits_v: Optional[int],
    gP: int, gD: int,
):
    # Compute budget: decode attention is HBM-bound, so per grid step the
    # whole body must stay under the ~0.3 us byte time of its operands.  The
    # zero-points therefore NEVER expand to (P, D): with centered codes c'
    #   k[t] = (c'[t] + mid - kz[g]) * ks[g]
    #   q.k[t] = q.(c'[t] * ks_exp[t]) + [q.((mid - kz[g]) * ks[g])]_(g(t))
    # — a scale-only elementwise dequant plus a per-GROUP constant, computed
    # with (group, gP)-sized matmuls (the old kernel's (P, gP) @ (gP, D) f32
    # scale/zp expansion matmuls were ~30 MFLOP per grid step, 10-30x the
    # byte time).  Same factoring on the V side with vz.
    b = pl.program_id(0)
    ml = main_ref[b, 0]
    rl = res_ref[b, 0]

    qf = q_ref[0, 0].astype(jnp.float32) * scale        # (group, D) f32
    qb = qf.astype(jnp.bfloat16)
    group, D = qf.shape
    bsP = P // gP                                       # tokens per K group
    mid_k = (1 << (bits_k - 1)) if bits_k else 0
    mid_v = (1 << (bits_v - 1)) if bits_v else 0

    # ---- K main: unpack + scale-only dequant in VMEM ------------------------
    # bf16 end-to-end: centered codes are small ints (exact in bf16) and the
    # scales are stored bf16, so convert+mul in bf16 rounds the exact product
    # once — bit-identical to f32-multiply-then-round, one VPU op cheaper.
    kcb = _unpack_planar(kc_ref[0, 0], bits_k).astype(jnp.bfloat16)
    ks = ks_ref[0, 0].astype(jnp.float32)               # (gP, D)
    kz = kz_ref[0, 0].astype(jnp.float32)
    # sublane broadcast (free relayout: merging leading dims), not a matmul
    ksb_exp = jnp.broadcast_to(
        ks_ref[0, 0].astype(jnp.bfloat16)[:, None, :],
        (gP, bsP, D)).reshape(P, D)
    khat = kcb * ksb_exp                                # (P, D) bf16

    s_main = jax.lax.dot_general(                       # (group, P)
        qb, khat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # All correction/expansion dots run with bf16 operands (f32 accumulate):
    # Mosaic lowers an f32 x f32 MXU dot as multiple bf16 passes.  On-chip
    # ablation (r4) measured the kernel critical-path-bound at ~1.7 us per
    # grid step (bytes: 0.34 us): dropping the correction dot groups saved
    # 32-57 us/layer each, but neither bf16-ifying them nor hoisting,
    # merging, or pairing grid steps recovered that serial-chain time —
    # the bf16 forms are kept as the cheaper encoding (fewer MXU passes),
    # measured time-neutral at 7B geometry (~430 us/layer).  The constants
    # being rounded to bf16 perturbs scores ~1e-3 relative — well inside
    # the cache quantization error itself.
    kconst = jax.lax.dot_general(                       # (group, gP)
        qb, ((mid_k - kz) * ks).astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ep = _expansion_matrix(P, gP).astype(jnp.bfloat16)  # (P, gP) 0/1
    s_main = s_main + jax.lax.dot_general(              # lane-expand consts
        kconst.astype(jnp.bfloat16), ep, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (group, P), 1)
    s_main = jnp.where(t_idx < ml, s_main, NEG_INF)

    # ---- residual scores ----------------------------------------------------
    kr = kr_ref[0, 0]                                   # (R, D) bf16
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

    # ---- V main: unpack + scale-only dequant --------------------------------
    vcb = _unpack_planar(vc_ref[0, 0], bits_v).astype(jnp.bfloat16)
    vs = vs_ref[0, 0].astype(jnp.float32)               # (P, gD)
    vz = vz_ref[0, 0].astype(jnp.float32)
    edb = _expansion_matrix(D, gD).astype(jnp.bfloat16)  # (D, gD) 0/1
    # lane expansion must cross lanes -> tiny matmul ((P,gD)@(gD,D), ~2 MFLOP);
    # bf16 operands (expansion merely selects, so bf16 scales pass through
    # unrounded beyond their stored bf16 value)
    vs_exp = jax.lax.dot_general(
        vs_ref[0, 0].astype(jnp.bfloat16), edb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    vhat = vcb * vs_exp                                 # (P, D) bf16

    pb = p_main.astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        pb, vhat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # vz term: o2[d] = sum_t p[t] ((mid - vz[t,g]) vs[t,g]),  g = g(d)
    w2 = ((mid_v - vz) * vs).astype(jnp.bfloat16)       # (P, gD)
    o2 = jax.lax.dot_general(                           # (group, gD)
        pb, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(                    # lane-expand
        o2.astype(jnp.bfloat16), edb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        p_res.astype(jnp.bfloat16), vr_ref[0, 0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _decode_attention_local(
    q: jax.Array,
    k_codes: jax.Array, k_scale: jax.Array, k_zp: jax.Array,
    v_codes: jax.Array, v_scale: jax.Array, v_zp: jax.Array,
    k_res: jax.Array, v_res: jax.Array,
    main_len: jax.Array, res_len: jax.Array,
    *,
    bits_k: Optional[int] = None,
    bits_v: Optional[int] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-device kernel body of :func:`kivi_decode_attention` (the public
    entry adds the SPMD partitioning rule; shard_map callers use this
    directly)."""
    B, H, D = q.shape
    _, KV, Pc, _ = k_codes.shape
    P = Pc * (32 // bits_k) if bits_k else Pc
    R = k_res.shape[2]
    gP = k_scale.shape[2]
    gD = v_scale.shape[3]
    group = H // KV
    assert H % KV == 0, (H, KV)

    if scale is None:
        scale = 1.0 / math.sqrt(D)
    interpret = resolve_interpret(interpret)

    kernel = functools.partial(
        _kernel, scale=scale, P=P, bits_k=bits_k, bits_v=bits_v,
        gP=gP, gD=gD,
    )
    grid = (B, KV)

    def _bh(b, kv):
        return (b, kv, 0, 0)

    def _full(b, kv):
        return (0, 0)

    def _block4(n3, n4):
        return pl.BlockSpec((1, 1, n3, n4), _bh)

    Pv = v_codes.shape[2]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # lengths ride whole in SMEM (full-array block; Mosaic requires
            # trailing block dims be full or (8, 128)-aligned)
            pl.BlockSpec((B, 1), _full, memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), _full, memory_space=pltpu.SMEM),
            _block4(group, D),
            _block4(Pc, D),
            _block4(gP, D),
            _block4(gP, D),
            _block4(Pv, D),
            _block4(P, gD),
            _block4(P, gD),
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
        k_codes, k_scale, k_zp, v_codes, v_scale, v_zp, k_res, v_res,
    )
    return out.reshape(B, H, D)


# ---------------------------------------------------------------------------
# SPMD partitioning: the pallas_call is an opaque custom-call to GSPMD, so
# without a rule the partitioner all-gathers the (batch-sharded) cache onto
# every device before each decode step.  The grid is (B, KV) with fully
# independent steps, so the op partitions perfectly: batch over the data
# axis, kv-heads (and q heads with them) over the model axis, each shard
# running the unmodified kernel on its local block.  custom_partitioning
# teaches the partitioner exactly that — the distributed engine's
# zero-collective decode step depends on it.
# ---------------------------------------------------------------------------

# einsum-like shardy rule: shared factors b (batch), k (kv-heads), d (head
# features); every other dim is private.  q's head dim h is constrained to
# k's sharding in the partition callback (heads must split with their kv
# group), not by the rule.
_SDY_RULE = (
    "b h d, b k tk d, b k gk d, b k gk d, b k tv d, b k tf gv, b k tf gv, "
    "b k r d, b k r d, b, b -> b h d"
)


@functools.lru_cache(maxsize=None)
def _partitioned_decode(bits_k, bits_v, scale, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    kwargs = dict(bits_k=bits_k, bits_v=bits_v, scale=scale,
                  interpret=interpret)

    def fn(q, kc, ks, kz, vc, vs, vz, kr, vr, ml, rl):
        return _decode_attention_local(q, kc, ks, kz, vc, vs, vz, kr, vr,
                                       ml, rl, **kwargs)

    def _canonical_specs(mesh, q_shape):
        """(q, cache, lengths, out) specs from q's suggested sharding: batch
        axis kept if it divides B, head axis kept if it divides KV (heads
        must split along whole kv groups; otherwise replicate heads)."""
        spec = getattr(q_shape.sharding, "spec", P())
        B, H, _ = q_shape.shape
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
        arg_shardings = (qspec,) + (cspec,) * 8 + (lspec, lspec)
        return mesh, fn, qspec, arg_shardings

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        b_ax, m_ax = _canonical_specs(mesh, arg_shapes[0])
        return NamedSharding(mesh, P(b_ax, m_ax, None))

    wrapped = custom_partitioning(fn)
    wrapped.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=_SDY_RULE,
        # only batch / kv-heads / q-heads may shard; everything else (tokens,
        # scale groups, head features) must stay whole per device — without
        # this shardy can propose splitting one mesh axis across several
        # cache dims, which has no NamedSharding form
        need_replication_factors=("d", "tk", "gk", "tv", "tf", "gv", "r"),
    )
    return wrapped


def kivi_decode_attention(
    q: jax.Array,
    k_codes: jax.Array, k_scale: jax.Array, k_zp: jax.Array,
    v_codes: jax.Array, v_scale: jax.Array, v_zp: jax.Array,
    k_res: jax.Array, v_res: jax.Array,
    main_len: jax.Array, res_len: jax.Array,
    *,
    bits_k: Optional[int] = None,
    bits_v: Optional[int] = None,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One decode step of attention over the two-tier quantized cache.

    q: (B, H, D).  k/v_codes: (B, KV, P*, D) with P* = P (unpacked int8) or
    P*bits/32 (token-planar packed int32 words, centered codes).
    k_scale/k_zp: (B, KV, P/bsK, D);
    v_scale/v_zp: (B, KV, P, D/bsV).  k_res/v_res: (B, KV, R, D) bf16.
    main_len/res_len: (B,) int32 — post-append visibility counts.
    Returns (B, H, D) in q.dtype.

    SPMD-partitionable: under pjit on a mesh the op splits over batch and
    kv-heads with zero collectives (see ``_partitioned_decode``).
    """
    B, H, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    interpret = resolve_interpret(interpret)
    return _partitioned_decode(bits_k, bits_v, float(scale), bool(interpret))(
        q, k_codes, k_scale, k_zp, v_codes, v_scale, v_zp,
        k_res, v_res, main_len, res_len)


def kivi_decode_attention_sharded(
    mesh, q, k_codes, k_scale, k_zp, v_codes, v_scale, v_zp,
    k_res, v_res, main_len, res_len, *,
    data_axis: str = "data", model_axis: str = "model", **kwargs,
) -> jax.Array:
    """Multi-chip fused decode: batch sharded over ``data_axis``, kv heads
    over ``model_axis``; each chip runs the kernel on its local shard — the
    grid is (B, KV) so both axes partition with zero collectives (the o_proj
    that follows is row-parallel and carries the layer's single psum).

    Requires B % data and KV % model == 0 (and H % KV == 0 locally).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    q_spec = P(d, m, None)
    cache_spec = P(d, m, None, None)
    len_spec = P(d)
    fn = functools.partial(_decode_attention_local, **kwargs)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(q_spec,) + (cache_spec,) * 8 + (len_spec, len_spec),
        out_specs=q_spec,
        check_vma=False,
    )(q, k_codes, k_scale, k_zp, v_codes, v_scale, v_zp,
      k_res, v_res, main_len, res_len)
