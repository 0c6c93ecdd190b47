"""Quantized gradient synchronization for data-parallel training.

Gradient all-reduce is the DP-scaling bottleneck once models shard cleanly;
this module replaces the f32/bf16 ``psum`` with a two-phase exchange whose
wire payload is int8 (or packed int4) codes — 4x/8x fewer bytes over
ICI/DCN than f32 — plus one f32 scale per ``block`` codes (<1% overhead at
the default 512), with error feedback so compression noise does not
accumulate (it is re-injected and corrected on the next step, the standard
EF-SGD construction).

Block-local scales matter for *bucket fusion*: the fused buffer concatenates
every gradient leaf, so a single per-chunk amax would be set by the largest
leaf and round small-magnitude leaves (norm scales next to embeddings) to
all-zero codes each step.  With fixed 512-element blocks the damage is
bounded by the block-local amax regardless of what shares the bucket.

This extends the framework's theme (the reference quantizes *compute*:
weights/activations/errors, reference quantize.py:36-43) to *communication*,
which only exists in the multi-chip design.

Two-phase schedule (the quantized analogue of reduce-scatter + all-gather,
inside ``shard_map`` over the data axis; N = axis size):

1. each device adds its carried error, splits the flat gradient into N
   chunks, quantizes each chunk (per-block amax scales), and ``all_to_all``s
   the codes — device d receives everyone's chunk d;
2. device d dequantizes and sums its chunk (exact f32 accumulation),
   re-quantizes the reduced chunk, and ``all_gather``s the codes back.

Error feedback covers both quantizations: phase 1's error stays local per
device; phase 2's error is known only to the chunk owner, which folds it
into its own carried error (compensated exactly once on the next step).

Both collectives carry int8 — asserted in the tests on the compiled HLO.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["compressed_allreduce_mean", "compressed_grad_sync",
           "init_error_state"]


def _quantize_blocks(x: jax.Array, qmax: int,
                     block: int) -> Tuple[jax.Array, jax.Array]:
    """Symmetric blockwise int quantization: x (R, L) with L % block == 0 ->
    codes (R, L) f32 integer values in [-qmax, qmax], scales (R, L/block)."""
    R, L = x.shape
    xb = x.reshape(R, L // block, block)
    amax = jnp.max(jnp.abs(xb), axis=2)
    scale = jnp.where(amax > 0, amax / qmax, jnp.ones_like(amax))
    codes = jnp.round(xb / scale[..., None]).reshape(R, L)
    return codes, scale


def _deq_blocks(codes: jax.Array, scale: jax.Array) -> jax.Array:
    """(R, L) codes x (R, L/block) scales -> (R, L) f32 values."""
    R, L = codes.shape
    nb = scale.shape[-1]
    return (codes.reshape(R, nb, L // nb)
            * scale[..., None]).reshape(R, L)


def _pack4(codes: jax.Array) -> jax.Array:
    """int4 codes (R, L) -> int8 (R, L/2): lo nibble = first half of the
    row, hi nibble = second half (plane packing: constant-shift unpack)."""
    R, L = codes.shape
    c = codes.astype(jnp.int32) & 0xF
    lo, hi = c[:, : L // 2], c[:, L // 2:]
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack4(packed: jax.Array) -> jax.Array:
    u = packed.astype(jnp.int32) & 0xFF
    lo, hi = u & 0xF, u >> 4
    # sign-extend the 4-bit two's-complement nibbles
    sext = lambda v: (v ^ 0x8) - 0x8
    return jnp.concatenate([sext(lo), sext(hi)], axis=1).astype(jnp.float32)


def compressed_allreduce_mean(
    x: jax.Array,
    axis_name: str,
    *,
    nbits: int = 8,
    block: int = 512,
    error: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Quantized mean-all-reduce of ``x`` over ``axis_name`` (shard_map
    context).  Returns ``(mean, new_error)``; ``new_error`` has x's shape
    and must be passed back on the next call (error feedback).

    ``nbits``: 8 (int8 wire) or 4 (two codes per int8 byte).
    ``block``: elements per f32 scale (must be even); smaller blocks bound
    the quantization step by a more local amax at proportionally more scale
    bytes on the wire.
    """
    assert nbits in (4, 8), nbits
    assert block % 2 == 0, block
    qmax = 2 ** (nbits - 1) - 1
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    shape = x.shape
    g = x.astype(jnp.float32)
    if error is not None:
        g = g + error.astype(jnp.float32)

    flat = g.reshape(-1)
    # pad so chunks split evenly into whole blocks (block even also keeps
    # the int4 half-row packing aligned)
    mult = n * block
    L = -(-flat.size // mult) * mult
    flat = jnp.pad(flat, (0, L - flat.size))
    chunks = flat.reshape(n, L // n)

    # ---- phase 1: quantize my chunks, all_to_all ------------------------
    codes, scale = _quantize_blocks(chunks, qmax, block)
    my_deq = _deq_blocks(codes, scale)           # what the wire conveys
    wire = _pack4(codes) if nbits == 4 else codes.astype(jnp.int8)
    recv = jax.lax.all_to_all(wire, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    recv_scale = jax.lax.all_to_all(scale, axis_name, split_axis=0,
                                    concat_axis=0, tiled=False)
    recv_deq = _deq_blocks(
        _unpack4(recv) if nbits == 4 else recv.astype(jnp.float32),
        recv_scale)
    summed = jnp.sum(recv_deq, axis=0)           # exact f32 accumulation

    # ---- phase 2: re-quantize the reduced chunk, all_gather -------------
    codes2, scale2 = _quantize_blocks(summed[None, :], qmax, block)
    deq2 = _deq_blocks(codes2, scale2)[0]
    wire2 = _pack4(codes2) if nbits == 4 else codes2.astype(jnp.int8)
    gathered = jax.lax.all_gather(wire2[0], axis_name, tiled=False)
    gscale = jax.lax.all_gather(scale2[0], axis_name, tiled=False)
    full = _deq_blocks(
        _unpack4(gathered) if nbits == 4 else gathered.astype(jnp.float32),
        gscale).reshape(-1)

    out = (full[: g.size] / n).reshape(shape)

    # ---- error feedback --------------------------------------------------
    # phase 1: my own quantization error, local to this device
    e = (chunks - my_deq).reshape(-1)
    # phase 2: the reduced-chunk error is known only to the chunk owner;
    # fold (summed - deq2) into its slice — compensated exactly once next
    # step after the all_to_all sum.  Divide by nothing: the wire carries
    # sums, the /n happens only on the output.
    e = e.reshape(n, L // n)
    e = e.at[idx].add(summed - deq2)
    e = e.reshape(-1)[: g.size].reshape(shape)
    return out.astype(x.dtype), e


def init_error_state(grads):
    """Zero error-feedback pytree matching ``grads``."""
    return jax.tree_util.tree_map(
        lambda g: jnp.zeros(g.shape, jnp.float32), grads)


def compressed_grad_sync(grads, axis_name: str, *, nbits: int = 8,
                         block: int = 512, errors=None):
    """:func:`compressed_allreduce_mean` over a gradient pytree, with
    *bucket fusion*: every leaf is raveled into ONE flat f32 buffer and
    synced in a single call — 4 collectives total per step, however many
    leaves the tree has (per-leaf calls would be latency-bound on the tiny
    scale arrays).  Returns ``(mean_grads, new_errors)``; seed ``errors``
    with :func:`init_error_state` (or None for zeros)."""
    if errors is None:
        errors = init_error_state(grads)
    flat_g, treedef = jax.tree_util.tree_flatten(grads)
    flat_e = treedef.flatten_up_to(errors)
    buf = jnp.concatenate(
        [g.astype(jnp.float32).reshape(-1) for g in flat_g])
    ebuf = jnp.concatenate(
        [e.astype(jnp.float32).reshape(-1) for e in flat_e])
    y, ne = compressed_allreduce_mean(buf, axis_name, nbits=nbits,
                                      block=block, error=ebuf)
    out, errs, off = [], [], 0
    for g in flat_g:
        sl = slice(off, off + g.size)
        out.append(y[sl].reshape(g.shape).astype(g.dtype))
        errs.append(ne[sl].reshape(g.shape))
        off += g.size
    return (jax.tree_util.tree_unflatten(treedef, out),
            jax.tree_util.tree_unflatten(treedef, errs))
