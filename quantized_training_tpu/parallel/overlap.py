"""Collective-overlapped (decomposed) matmuls for sequence-parallel TP.

SURVEY §7.8 names "collective-overlapped quantized matmuls (shard_map +
async collectives)" as a TPU-native design goal with no reference
counterpart (the reference is single-accelerator; its only placement is
sequential offload, pt2e_utils.py:62-327).

A sequence-parallel Megatron block needs an all-gather of the activations
before the column-parallel GEMM and a reduce-scatter after the row-parallel
GEMM.  Issued as monolithic collectives, the ICI transfer serializes with
the MXU work.  Here both are decomposed into ``n_shards`` ring steps —
one neighbor ``lax.ppermute`` hop plus one partial matmul per step — so
XLA's async collective-permute (start/done pairs) overlaps each hop with
the previous step's matmul.  The loop is a static Python unroll (mesh size
is static), which keeps the schedule visible to XLA and the whole thing
differentiable.  Differentiability caveat: that statement applies to the
*unquantized* wire (``payload_spec=None``, grad-tested).  With a quantized
payload the round/clip in ``group_quantize_payload`` zeroes the code path's
gradient (only the scale/zero-point min/max statistics carry grad); there
is no straight-through estimator on the wire.  Use the unquantized wire in
training graphs, or treat the quantized wire as inference-only.

Quantized wire: with ``payload_spec`` the all-gather ring rotates
group-affine codes (+ scales/zero-points) instead of bf16 activations —
int8 one-byte codes, plane-packed sub-byte for uint4/uint2 — using the same
payload helpers as ring attention, so the ICI bytes drop 2-8x.  Semantics
are exact w.r.t. the quantized activations: the result equals
``dequantize(quantize(x)) @ w`` (the own-shard contribution is quantized
too, so every device computes from identical values).  The reduce-scatter
ring rotates *partial sums* and stays full-precision — lossy accumulation
belongs to the gradient path, where ``parallel/grad_compress.py`` provides
it with error feedback.
"""

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..qspec import QuantizationSpec
from .ring_attention import dequantize_payload, group_quantize_payload

__all__ = ["allgather_matmul", "matmul_reducescatter"]


def allgather_matmul(
    x: jax.Array,
    w: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    payload_spec=None,
) -> jax.Array:
    """``all_gather(x, rows) @ w`` as an overlapped ring.

    x: (M, K) sharded along rows (sequence-parallel activations);
    w: (K, N) sharded along columns (Megatron column-parallel weight).
    Returns y = (M, N) sharded along columns: every device computes the full
    sequence against its weight shard, receiving one x block per ring hop.

    ``payload_spec`` (e.g. ``"int8,qs=group_wise_affine,bs=64,ax=-1"``)
    quantizes the rotating activation blocks; groups lie along K so the
    dequant is a rank-expanded scale multiply on arrival.
    """
    n = mesh.shape[axis]
    spec = (QuantizationSpec.from_str(payload_spec)
            if isinstance(payload_spec, str) else payload_spec)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local(x_loc, w_loc):
        m = x_loc.shape[0]
        idx = jax.lax.axis_index(axis)
        if spec is not None:
            payload = group_quantize_payload(x_loc, spec)
        else:
            payload = (x_loc,)

        y = jnp.zeros((m * n, w_loc.shape[1]), jnp.float32)
        for t in range(n):
            if t > 0:  # n-1 hops; each overlaps the previous partial matmul
                payload = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, axis, perm), payload)
            if spec is not None:
                blk = dequantize_payload(*payload, spec).astype(x_loc.dtype)
            else:
                blk = payload[0]
            part = jnp.dot(blk, w_loc, preferred_element_type=jnp.float32)
            src = (idx - t) % n  # origin of the block we hold after t hops
            y = jax.lax.dynamic_update_slice(y, part, (src * m, 0))
        return y.astype(x.dtype)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(x, w)


def matmul_reducescatter(
    y: jax.Array,
    w: jax.Array,
    mesh: Mesh,
    axis: str = "model",
) -> jax.Array:
    """``reduce_scatter(y @ w, rows)`` as an overlapped ring.

    y: (M, N) sharded along columns (a column-parallel GEMM's output);
    w: (N, K) sharded along rows (Megatron row-parallel weight).
    Returns z = (M, K) sharded along rows: z_rows(i) = Σ_j (y_j @ w_j)[i].

    Each device computes its full partial product once, then the ring
    accumulates row blocks: block b starts at device (b+1) mod n and lands
    on device b after n-1 hops, gathering every device's contribution on
    the way; each hop overlaps the next block's accumulation add.
    """
    n = mesh.shape[axis]
    perm = [(i, (i + 1) % n) for i in range(n)]

    assert y.shape[0] % n == 0, (
        f"matmul_reducescatter: M={y.shape[0]} must be divisible by the "
        f"'{axis}' mesh axis size {n} (rows are scattered in M/{n} blocks)"
    )

    def local(y_loc, w_loc):
        part = jnp.dot(y_loc, w_loc, preferred_element_type=jnp.float32)
        m = part.shape[0] // n
        idx = jax.lax.axis_index(axis)

        def block(b):
            return jax.lax.dynamic_slice(
                part, (b * m, jnp.zeros((), b.dtype)), (m, part.shape[1]))

        acc = block((idx - 1) % n)
        for t in range(1, n):
            acc = jax.lax.ppermute(acc, axis, perm)
            acc = acc + block((idx - 1 - t) % n)
        return acc.astype(y.dtype)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )(y, w)
