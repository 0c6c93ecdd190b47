"""Quantization-aware flash attention (Pallas/Mosaic TPU kernel).

The reference framework makes attention quantizable by splitting it per head
and inserting fake-quant nodes around the qk / av matmuls, softmax and the
scaling mul (reference: mapping.py:285-383, modules/quantizable/*).  On TPU
the (B, H, S, S) score tensor never exists in HBM at all.  Quantizer
placement (deliberate, measured):
  * q/k/v quantizers are elementwise and hoisted to XLA — one fused pass
    per tensor instead of one per grid step (k/v would re-round once per
    q-block in-kernel); the kernel consumes pre-rounded operands.
  * p_qfn (probability rounding) runs in-kernel — p never exists outside.
  * out_qfn (the o_proj GEMM-input rounding) runs in the kernel epilogue,
    riding the output write instead of a separate HBM pass.
Block sizes come from the VMEM-budget model in autotune.py unless pinned.

Probability quantization is EXACT (two-pass online softmax):
  * With ``p_qfn`` set, the kernel walks the k blocks twice per q block.
    Pass 1 accumulates the standard running max ``m`` and denominator ``l``
    (no pv matmul), then converts them to the row logsumexp.  Pass 2
    recomputes each score tile and quantizes the TRUE normalized
    probability ``p = exp(s - logsumexp)`` — exactly the reference's
    quantize-after-softmax semantics (quantize_pt2e.py:323-446 dq
    placement) — and accumulates ``quant(p) @ v`` with no rescaling.
    The perf path and the accuracy path are therefore the same program
    (up to f32 summation association in ``l``, which any two softmax
    implementations differ by); the earlier running-normalized
    approximation is gone.  Cost: one extra qk matmul pass per tile when
    (and only when) probabilities are quantized.
  * Without ``p_qfn`` the kernel is the standard single-pass flash forward.
  * GQA is handled by the k/v BlockSpec index maps (head h reads kv head
    h // group) — repeated heads are never materialized.

Backward passes (both tile-recomputing, nothing quadratic in HBM):
  * p_qfn=None: standard flash backward, di = rowsum(dO * O).
  * p_qfn set: straight-through-exact backward.  With o = STE(quant(p)) @ v,
      dv = quant(p)^T dO          (the quantized p is what multiplied v)
      dp = dO V^T;  ds = p (dp - di);  di = rowsum(dO * o_unq), o_unq = p V
    so the forward-for-backward variant additionally accumulates the
    UNQUANTIZED ``p @ v`` (one extra MXU matmul, training only) and the
    dk/dv kernel re-applies ``p_qfn`` for the dv term.

Interface shapes: q (B, H, S, D); k, v (B, KV, T, D); output (B, H, S, D).
S, T must be multiples of the block sizes; D must be a multiple of 128
(use 128 for head_dim 64 by padding at the caller — standard for TPU).
"""

import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_interpret

__all__ = ["flash_attention"]

NEG_INF = -2.0 ** 30  # large-but-safe additive mask (bf16/posit friendly)


LANES = 128  # row-stat minor dim (lse/di stored replicated across lanes)


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest,
    scale: float,
    causal: bool,
    q_offset: int,
    block_q: int,
    block_k: int,
    nk_real: int,
    q_qfn, k_qfn, p_qfn, v_qfn, out_qfn,
    save_lse: bool,
):
    two_pass = p_qfn is not None
    lse_ref = o_raw_ref = o_unq_ref = acc2_ref = None
    idx = 0
    if save_lse:
        lse_ref = rest[idx]; idx += 1
        if two_pass:
            o_unq_ref = rest[idx]; idx += 1
        elif out_qfn is not None:
            o_raw_ref = rest[idx]; idx += 1
    acc_ref, m_ref, l_ref = rest[idx:idx + 3]
    idx += 3
    if two_pass and save_lse:
        acc2_ref = rest[idx]

    i = pl.program_id(2)  # q block
    j = pl.program_id(3)  # k sweep step (0..2*nk_real-1 when two_pass)
    if two_pass:
        nk = nk_real
        jr = jax.lax.rem(j, nk)
        phase2 = j >= nk
        last = 2 * nk - 1
    else:
        nk = pl.num_programs(3)
        jr = j
        phase2 = None
        last = nk - 1

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        if acc2_ref is not None:
            acc2_ref[:] = jnp.zeros_like(acc2_ref)

    # Causal: skip blocks strictly above the diagonal.
    q_start = i * block_q + q_offset
    k_start = jr * block_k
    needed = jnp.logical_or(
        jnp.logical_not(causal), k_start <= q_start + block_q - 1
    )

    @pl.when(needed)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        if q_qfn is not None:
            q = q_qfn(q)
        if k_qfn is not None:
            k = k_qfn(k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale

        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        if not two_pass:
            m_prev = m_ref[:]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)

            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:] = m_new

            v = v_ref[0, 0]
            if v_qfn is not None:
                v = v_qfn(v)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] * alpha + pv
        else:
            @pl.when(jnp.logical_not(phase2))
            def _stats():
                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                l_ref[:] = (l_ref[:] * jnp.exp(m_prev - m_new)
                            + jnp.sum(jnp.exp(s - m_new), axis=1,
                                      keepdims=True))
                m_ref[:] = m_new

            @pl.when(phase2)
            def _accum():
                # m_ref holds the row logsumexp after the phase transition;
                # p is the TRUE normalized probability of this tile.
                p = jnp.exp(s - m_ref[:])
                pq = p_qfn(p.astype(jnp.bfloat16)).astype(jnp.float32)
                v = v_ref[0, 0]
                if v_qfn is not None:
                    v = v_qfn(v)
                acc_ref[:] += jax.lax.dot_general(
                    pq.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if acc2_ref is not None:
                    acc2_ref[:] += jax.lax.dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

    if two_pass:
        @pl.when(j == nk - 1)
        def _to_lse():
            l = l_ref[:]
            l = jnp.where(l == 0.0, 1.0, l)
            m_ref[:] = m_ref[:] + jnp.log(l)

    @pl.when(j == last)
    def _finalize():
        if two_pass:
            # quantized probabilities were already normalized; no division
            o_val = acc_ref[:].astype(o_ref.dtype)
        else:
            l = l_ref[:]
            l = jnp.where(l == 0.0, 1.0, l)
            o_val = (acc_ref[:] / l).astype(o_ref.dtype)
        if out_qfn is None:
            o_ref[0, 0] = o_val
        else:
            # epilogue quantization: the o_proj GEMM-input rounding rides the
            # kernel's own output write (round the bf16 value, like the XLA
            # site would).
            o_ref[0, 0] = out_qfn(o_val).astype(o_ref.dtype)
            if o_raw_ref is not None:
                o_raw_ref[0, 0] = o_val
        if o_unq_ref is not None:
            # unquantized p @ v for the STE backward's di term
            o_unq_ref[0, 0] = acc2_ref[:].astype(o_unq_ref.dtype)
        if save_lse:
            # logsumexp per row, replicated over the lane dim for the
            # backward kernels (in-VMEM row-stat layout: (block_q, LANES))
            if two_pass:
                lse = m_ref[:]
            else:
                l = l_ref[:]
                l = jnp.where(l == 0.0, 1.0, l)
                lse = m_ref[:] + jnp.log(l)
            lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, LANES))


def _bwd_di_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    di_acc,
    *,
    scale: float, causal: bool, q_offset: int,
    block_q: int, block_k: int, err_qfn,
):
    """di = sum_j rowsum(p * err_qfn(dp)) — the softmax-backward inner
    product when the error (gradient) quantizer taps dp BEFORE the softmax
    jacobian (reference backward-pre hook on the av matmul's p input,
    quantize.py:142-150).  The o-based shortcut di = rowsum(dO * o) equals
    rowsum(p * dp) only for unquantized dp, so the error-quantized backward
    pays one extra recompute pass for exact tap placement."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        di_acc[:] = jnp.zeros_like(di_acc)

    q_start = i * block_q + q_offset
    k_start = j * block_k
    needed = jnp.logical_or(
        jnp.logical_not(causal), k_start <= q_start + block_q - 1
    )

    @pl.when(needed)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpq = err_qfn(dp.astype(jnp.bfloat16)).astype(jnp.float32)
        di_acc[:] += jnp.sum(p * dpq, axis=1, keepdims=True)

    @pl.when(j == nk - 1)
    def _finalize():
        di_ref[0, 0] = jnp.broadcast_to(di_acc[:], di_ref.shape[2:])


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
    dq_acc,
    *,
    scale: float, causal: bool, q_offset: int,
    block_q: int, block_k: int, err_qfn=None,
):
    """dq = sum_j [p * (dO V^T - di)] * scale @ K — one (b, h, i) row of q
    blocks, sequential over j, score tiles recomputed in VMEM.  With
    probability quantization the same formula holds under the straight-
    through estimator (p here is the UNQUANTIZED softmax; di is computed
    from the unquantized o by the caller)."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_start = i * block_q + q_offset
    k_start = j * block_k
    needed = jnp.logical_or(
        jnp.logical_not(causal), k_start <= q_start + block_q - 1
    )

    @pl.when(needed)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]                      # (block_q, 1)
        di = di_ref[0, 0][:, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)

        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        if err_qfn is not None:
            # error tap on the av matmul's p-input cotangent (reference
            # backward-pre hook): dp quantized BEFORE the softmax jacobian;
            # di was accumulated from the quantized dp by _bwd_di_kernel
            dp = err_qfn(dp.astype(jnp.bfloat16)).astype(jnp.float32)
        ds = p * (dp - di) * scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    scale: float, causal: bool, q_offset: int,
    block_q: int, block_k: int,
    p_qfn=None, err_qfn=None,
):
    """dk/dv for one (b, h, j) k block, sequential over q blocks i.
    dv = p^T dO;  dk = [p * (dO V^T - di) * scale]^T Q.  With probability
    quantization, dv uses the QUANTIZED p (that is the operand that
    multiplied v in the forward) while dk keeps the unquantized p (the
    softmax jacobian under the straight-through estimator)."""
    j = pl.program_id(2)
    i = pl.program_id(3)
    ni = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = i * block_q + q_offset
    k_start = j * block_k
    needed = jnp.logical_or(
        jnp.logical_not(causal), k_start <= q_start + block_q - 1
    )

    @pl.when(needed)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)                             # (bq, bk)

        if p_qfn is not None:
            pv_op = p_qfn(p.astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            pv_op = p
        dv_acc[:] += jax.lax.dot_general(
            pv_op.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, D)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if err_qfn is not None:
            dp = err_qfn(dp.astype(jnp.bfloat16)).astype(jnp.float32)
        ds = p * (dp - di) * scale                       # (bq, bk)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, D)

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _naive_attention(q, k, v, scale, causal, q_offset, q_qfn, k_qfn,
                     p_qfn, v_qfn):
    """jnp reference of the kernel semantics — the interpret-free
    correctness oracle.  Quantizers are straight-through (stop_gradient
    residual trick).  p is quantized AFTER full normalization, identical
    placement to the two-pass kernel."""

    def ste(fn, x):
        if fn is None:
            return x
        return x + jax.lax.stop_gradient(fn(x) - x)

    B, H, S, D = q.shape
    _, KV, T, _ = k.shape
    if KV != H:
        k = jnp.repeat(k, H // KV, axis=1)
        v = jnp.repeat(v, H // KV, axis=1)
    q = ste(q_qfn, q)
    k = ste(k_qfn, k)
    s = jnp.einsum("bhsd,bhtd->bhst", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        q_pos = jnp.arange(S)[:, None] + q_offset
        k_pos = jnp.arange(T)[None, :]
        s = jnp.where((k_pos <= q_pos)[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if p_qfn is not None:
        # STE across the whole bf16-cast + quantize chain: the cotangent
        # stays f32 (wrapping only the inner call would round the incoming
        # gradient to bf16 — an artifact, not STE semantics).
        pq = p_qfn(p.astype(jnp.bfloat16)).astype(jnp.float32)
        p = p + jax.lax.stop_gradient(pq - p)
    v = ste(v_qfn, v)
    return jnp.einsum("bhst,bhtd->bhsd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    q_offset: int = 0,
    q_qfn: Optional[Callable] = None,
    k_qfn: Optional[Callable] = None,
    p_qfn: Optional[Callable] = None,
    v_qfn: Optional[Callable] = None,
    out_qfn: Optional[Callable] = None,
    err_qfn: Optional[Callable] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Causal flash attention with optional in-kernel quantization.

    q: (B, H, S, D); k, v: (B, KV, T, D) with H % KV == 0.
    ``q_offset`` is the absolute position of q[0] (decode with a prefix
    cache).  On non-TPU backends the kernel runs in interpreter mode
    automatically, keeping the CPU path alive.

    Differentiable: the backward pass recomputes attention from q/k/v
    (standard flash rematerialization); probability quantization uses the
    straight-through-exact backward (see module docstring).

    ``err_qfn`` hosts the reference's backward error quantization
    (quantize.py:142-150 error_pre_process hooks on the attention matmul
    inputs) inside the flash backward: dp is quantized before the softmax
    jacobian (with di recomputed from the quantized dp — one extra
    recompute pass), and dq/dk/dv are quantized as they exit.  Without
    this the model must fall back to naive attention whenever the
    backward=gemm ladder rung is active — the r04 train bench's fwderr
    arm silently paid exactly that.
    """
    B, H, S, D = q.shape
    _, KV, T, _ = k.shape
    assert H % KV == 0, (H, KV)
    group = H // KV

    # q/k/v quantization is elementwise, so hoist it out of the kernel: XLA
    # fuses a single pass per tensor, while in-kernel it would re-quantize
    # each tile once per grid step (k/v: x num-q-blocks).  Only the
    # probability quantizer must run inside (p never exists outside).
    # Straight-through so gradients pass the (non-differentiable) rounding.
    def _ste(fn, x):
        # materialize: the hoisted quantize runs in the XLA graph, where
        # excess-precision fusion could feed it an unrounded f32 value.
        from ...numerics.bitutils import materialize_rounding
        x = materialize_rounding(x)
        return x + jax.lax.stop_gradient(fn(x) - x)

    if q_qfn is not None:
        q = _ste(q_qfn, q)
        q_qfn = None
    if k_qfn is not None:
        k = _ste(k_qfn, k)
        k_qfn = None
    if v_qfn is not None:
        v = _ste(v_qfn, v)
        v_qfn = None

    if scale is None:
        scale = 1.0 / math.sqrt(D)
    interpret = resolve_interpret(interpret)
    two_pass = p_qfn is not None

    # VMEM-budget block selection (autotune.py; measured sweet spot is
    # (1024, 1024) on v5e — 1.8x over the old fixed (256, 512)).
    from .autotune import attention_blocks, attention_bwd_blocks

    auto_bq, auto_bk = attention_blocks(S, T, D, quantized=two_pass)
    block_q = auto_bq if block_q is None else min(block_q, S)
    block_k = auto_bk if block_k is None else min(block_k, T)
    assert S % block_q == 0, (S, block_q)
    assert T % block_k == 0, (T, block_k)

    nk_real = T // block_k
    grid = (B, H, S // block_q, nk_real * (2 if two_pass else 1))

    q_map = lambda b, h, i, j: (b, h, i, 0)
    if two_pass:
        kv_map = lambda b, h, i, j, group=group, nk=nk_real: (
            b, h // group, j % nk, 0)
    else:
        kv_map = lambda b, h, i, j, group=group: (b, h // group, j, 0)

    def _make_call(save_lse: bool):
        kernel = functools.partial(
            _attn_kernel,
            scale=scale, causal=causal, q_offset=q_offset,
            block_q=block_q, block_k=block_k, nk_real=nk_real,
            q_qfn=q_qfn, k_qfn=k_qfn, p_qfn=p_qfn, v_qfn=v_qfn,
            out_qfn=out_qfn,
            save_lse=save_lse,
        )
        out_specs = [pl.BlockSpec((1, 1, block_q, D), q_map)]
        out_shape = [jax.ShapeDtypeStruct((B, H, S, D), q.dtype)]
        if save_lse:
            out_specs.append(pl.BlockSpec((1, 1, block_q, LANES), q_map))
            out_shape.append(
                jax.ShapeDtypeStruct((B, H, S, LANES), jnp.float32))
            if two_pass:
                # unquantized p @ v for the backward's di = rowsum(dO*o_unq)
                out_specs.append(pl.BlockSpec((1, 1, block_q, D), q_map))
                out_shape.append(jax.ShapeDtypeStruct((B, H, S, D), q.dtype))
            elif out_qfn is not None:
                # raw (pre-quant) o for the backward's di = rowsum(dO*O)
                out_specs.append(pl.BlockSpec((1, 1, block_q, D), q_map))
                out_shape.append(jax.ShapeDtypeStruct((B, H, S, D), q.dtype))
        scratch = [
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ]
        if two_pass and save_lse:
            scratch.append(pltpu.VMEM((block_q, D), jnp.float32))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), q_map),
                pl.BlockSpec((1, 1, block_k, D), kv_map),
                pl.BlockSpec((1, 1, block_k, D), kv_map),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )

    # Inference never pays for the logsumexp output; the fwd-for-backward
    # variant saves it for the tile-recomputing backward kernels.
    call = _make_call(save_lse=False)
    call_lse = _make_call(save_lse=True)

    def _flash_bwd(qr, kr, vr, lse, o_unq, g):
        """Tile-recomputed flash backward: dq then dk/dv, no (S, T) tensor
        in HBM.  di = rowsum(dO * o_unq) — the softmax-backward inner
        product; o_unq is p @ v with p UNQUANTIZED (equals the forward
        output except under out_qfn / p_qfn, where the forward saves it).
        With ``err_qfn`` (backward error quantization), dp is tapped before
        the softmax jacobian, so di must be rowsum(p * quant(dp)) — the
        o-based shortcut no longer holds and a dedicated recompute pass
        (_bwd_di_kernel) produces it."""
        do = g.astype(jnp.float32)

        # backward tiles hold ~1.5x the forward footprint — own block sizes
        bq2, bk2 = attention_bwd_blocks(S, T, D)
        bq_map = lambda b, h, i, j: (b, h, i, 0)
        bkv_map = lambda b, h, i, j, group=group: (b, h // group, j, 0)
        common = dict(
            scale=scale, causal=causal, q_offset=q_offset,
            block_q=bq2, block_k=bk2,
        )
        if err_qfn is None:
            di = jnp.sum(do * o_unq.astype(jnp.float32), axis=-1)
            di = jnp.broadcast_to(di[..., None], (B, H, S, LANES))
        else:
            di = pl.pallas_call(
                functools.partial(_bwd_di_kernel, err_qfn=err_qfn, **common),
                grid=(B, H, S // bq2, T // bk2),
                in_specs=[
                    pl.BlockSpec((1, 1, bq2, D), bq_map),
                    pl.BlockSpec((1, 1, bk2, D), bkv_map),
                    pl.BlockSpec((1, 1, bk2, D), bkv_map),
                    pl.BlockSpec((1, 1, bq2, D), bq_map),
                    pl.BlockSpec((1, 1, bq2, LANES), bq_map),
                ],
                out_specs=pl.BlockSpec((1, 1, bq2, LANES), bq_map),
                out_shape=jax.ShapeDtypeStruct((B, H, S, LANES),
                                               jnp.float32),
                scratch_shapes=[pltpu.VMEM((bq2, 1), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "parallel",
                                         "arbitrary"),
                ),
                interpret=interpret,
            )(qr, kr, vr, g, lse)
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, err_qfn=err_qfn, **common),
            grid=(B, H, S // bq2, T // bk2),
            in_specs=[
                pl.BlockSpec((1, 1, bq2, D), bq_map),
                pl.BlockSpec((1, 1, bk2, D), bkv_map),
                pl.BlockSpec((1, 1, bk2, D), bkv_map),
                pl.BlockSpec((1, 1, bq2, D), bq_map),
                pl.BlockSpec((1, 1, bq2, LANES), bq_map),
                pl.BlockSpec((1, 1, bq2, LANES), bq_map),
            ],
            out_specs=pl.BlockSpec((1, 1, bq2, D), bq_map),
            out_shape=jax.ShapeDtypeStruct((B, H, S, D), qr.dtype),
            scratch_shapes=[pltpu.VMEM((bq2, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )(qr, kr, vr, g, lse, di)

        # dk/dv: grid walks (b, h, k-block) with q blocks innermost; per-head
        # results are summed over the GQA group outside (linear-size tensors).
        kv_j_map = lambda b, h, j, i, group=group: (b, h // group, j, 0)
        q_i_map = lambda b, h, j, i: (b, h, i, 0)
        dk_h, dv_h = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel, p_qfn=p_qfn, err_qfn=err_qfn,
                              **common),
            grid=(B, H, T // bk2, S // bq2),
            in_specs=[
                pl.BlockSpec((1, 1, bq2, D), q_i_map),
                pl.BlockSpec((1, 1, bk2, D), kv_j_map),
                pl.BlockSpec((1, 1, bk2, D), kv_j_map),
                pl.BlockSpec((1, 1, bq2, D), q_i_map),
                pl.BlockSpec((1, 1, bq2, LANES), q_i_map),
                pl.BlockSpec((1, 1, bq2, LANES), q_i_map),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bk2, D),
                             lambda b, h, j, i: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bk2, D),
                             lambda b, h, j, i: (b, h, j, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, T, D), kr.dtype),
                jax.ShapeDtypeStruct((B, H, T, D), vr.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk2, D), jnp.float32),
                pltpu.VMEM((bk2, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )(qr, kr, vr, g, lse, di)
        if group > 1:
            dk = dk_h.reshape(B, KV, group, T, D).sum(axis=2).astype(kr.dtype)
            dv = dv_h.reshape(B, KV, group, T, D).sum(axis=2).astype(vr.dtype)
        else:
            dk, dv = dk_h, dv_h
        if err_qfn is not None:
            # error taps on the matmul input cotangents as they exit —
            # identical placement to the naive path's bwd_quantize sites on
            # q / k (qk matmul inputs) and v (av matmul input), which tap
            # dq / dk / dv pre-GQA-expansion (dk/dv summed over the group
            # first, matching quantize-after-sum there)
            dq = err_qfn(dq)
            dk = err_qfn(dk)
            dv = err_qfn(dv)
        return dq, dk, dv

    @jax.custom_vjp
    def _fa(q, k, v):
        return call(q, k, v)[0]

    def _fa_fwd(q, k, v):
        outs = call_lse(q, k, v)
        o, lse = outs[0], outs[1]
        if two_pass:
            o_unq = outs[2]        # unquantized p @ v (di term)
        elif out_qfn is not None:
            o_unq = outs[2]        # raw (pre-out-quant) o == p @ v
        else:
            o_unq = o              # o itself is p @ v
        return o, (q, k, v, lse, o_unq)

    def _fa_bwd(res, g):
        qr, kr, vr, lse, o_unq = res
        return _flash_bwd(qr, kr, vr, lse, o_unq, g)

    _fa.defvjp(_fa_fwd, _fa_bwd)
    return _fa(q, k, v)
