"""SPMD pipeline parallelism (GPipe-style) over a mesh axis.

Scale-out north star (SURVEY §2.5; no reference counterpart — the
reference's only model placement is sequential layer offload,
pt2e_utils.py:62-156, which runs ONE device at a time).  Here the layer
stack is split into P stages sharded over the ``pipe`` mesh axis and
microbatches stream through: at tick t device p processes microbatch
t - p and hands its activation to device p+1 via ``lax.ppermute`` (one ICI
neighbor hop).  All P devices compute concurrently once the pipeline fills;
the bubble is the standard (P-1)/(M+P-1) fraction.

Everything is a single SPMD program (shard_map + static tick loop): no
host-side scheduling, no per-stage dispatch, and the whole thing is
differentiable — ``jax.grad`` through ``pipeline_apply`` yields exactly the
sequential model's gradients (tested), so pipeline-parallel *training*
composes with the quantized layer stack for free.

Layout contract: ``stage_params`` is a pytree whose leaves have a leading
``n_stages`` dimension (stack per-layer params with ``tree_map(stack)``),
sharded over ``pipe``; inputs/outputs are replicated (batch stays whole —
compose with the data axis for batch sharding).
"""

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..qspec import QuantizationSpec
from .ring_attention import dequantize_payload, group_quantize_payload

__all__ = ["pipeline_apply", "stack_stage_params"]


def stack_stage_params(per_stage_params):
    """[stage0_tree, stage1_tree, ...] -> one tree with leading stage dim."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_stage_params)


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int,
    payload_spec: Optional[str] = None,
) -> jax.Array:
    """Run ``x`` through all stages of a pipeline-parallel layer stack.

    stage_fn(params_one_stage, h) -> h' applies ONE stage (one or more
    layers).  ``stage_params`` leaves have leading dim n_stages, which must
    be divisible by the ``axis`` size (each device runs a lax.scan over its
    local stages every tick).  ``x``: (B, ...) with B % n_microbatches == 0.

    Returns stage_fn applied ``n_stages`` times in sequence — bit-equal to
    the sequential loop up to usual reduction-order effects (tested exact on
    the virtual mesh).

    ``payload_spec`` (e.g. ``"int8,qs=group_wise_affine,bs=64,ax=-1"``)
    quantizes the inter-stage activation hops: codes + group qparams ride
    ICI instead of the full-precision tensor (2-8x fewer bytes, like the
    ring-attention payload).  This is LOSSY — each device boundary rounds
    the activation once, exactly equivalent to inserting
    ``dequantize(quantize(h))`` between stage groups in the sequential
    model (the fidelity/traffic trade is the caller's; tested against that
    oracle).  The collected outputs themselves are never quantized.
    """
    n_stages = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    n_pipe = mesh.shape[axis]
    assert n_stages % n_pipe == 0, (n_stages, n_pipe)
    B = x.shape[0]
    M = n_microbatches
    assert B % M == 0, (B, M)
    mb = B // M
    xs = x.reshape(M, mb, *x.shape[1:])
    spec = QuantizationSpec.from_str(payload_spec) if payload_spec else None

    def local(params_local, xs):
        # params_local: leaves (n_stages/n_pipe, ...); xs: (M, mb, ...)
        p = jax.lax.axis_index(axis)

        def apply_local_stages(h):
            def body(h, one_stage):
                return stage_fn(one_stage, h), None
            h, _ = jax.lax.scan(body, h, params_local)
            return h

        state = jnp.zeros_like(xs[0])          # inflight activation
        out = jnp.zeros_like(xs)               # collected on the last device
        T = M + n_pipe - 1

        def tick(t, carry, do_permute=True):
            state, out = carry
            # device 0 ingests microbatch t (garbage after M ticks — the
            # results of those ticks are never collected)
            inp = jnp.where(
                p == 0,
                jax.lax.dynamic_index_in_dim(
                    xs, jnp.minimum(t, M - 1), keepdims=False),
                state,
            )
            h = apply_local_stages(inp)
            # last device finished microbatch t - (n_pipe - 1) at tick t
            done_idx = t - (n_pipe - 1)
            collect = jnp.logical_and(p == n_pipe - 1, done_idx >= 0)
            out = jax.lax.cond(
                collect,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, h.astype(o.dtype), jnp.maximum(done_idx, 0), 0),
                lambda o: o,
                out,
            )
            # hand activations to the next stage (ring: last -> 0 carries
            # garbage that device 0 ignores); the final tick skips the hop —
            # its rotated state is never read
            if do_permute:
                perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
                if spec is not None:
                    payload = group_quantize_payload(h, spec)
                    payload = jax.tree_util.tree_map(
                        lambda a: jax.lax.ppermute(a, axis, perm), payload)
                    state = dequantize_payload(*payload, spec).astype(h.dtype)
                else:
                    state = jax.lax.ppermute(h, axis, perm)
            else:
                state = h
            return state, out

        carry = jax.lax.fori_loop(0, T - 1, tick, (state, out))
        _, out = tick(T - 1, carry, do_permute=False)
        # only the last device holds real outputs: broadcast them
        out = jax.lax.psum(
            jnp.where(p == n_pipe - 1, out, jnp.zeros_like(out)), axis)
        return out

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, xs)
    return out.reshape(B, *x.shape[1:])
