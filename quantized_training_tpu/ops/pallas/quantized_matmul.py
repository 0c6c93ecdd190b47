"""Fused quantize-matmul (Pallas/Mosaic TPU kernel).

The framework's hot GEMM path: activations are fake-quantized *inside* the
matmul kernel — each x tile is rounded once on its first use (cached in VMEM
scratch across the N-block sweep) and the VPU rounding overlaps the MXU
tiles, so quantization adds no serialized elementwise pass over HBM.  This
is the TPU realization of the reference's dequant+GEMM fusion goal
(reference: codegen fused subgraphs, mapping.py:1017-1100; BASELINE
"fused dequant-matmul Pallas kernels at speed-of-light").

Weights arrive pre-quantized (serving folds weight rounding offline);
``w_qfn`` exists for QAT parity runs.

Differentiable with straight-through semantics: backward uses XLA matmuls on
the recomputed rounded operands.
"""

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_interpret

__all__ = ["quantized_matmul"]


def _mm_kernel(x_ref, x_next_ref, w_ref, o_ref, acc_ref, xq_ref, *,
               x_qfn, nk: int, block_k: int):
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Software-pipelined quantization: on the first n-block sweep, round the
    # k=0 tile immediately and then always round tile k+1 — the VPU work on
    # the *next* tile has no dependency on this step's MXU dot, letting
    # Mosaic overlap them.  Later n-blocks reuse the VMEM cache.
    if x_qfn is not None:
        @pl.when(jnp.logical_and(j == 0, k == 0))
        def _quantize_first():
            xq_ref[:, pl.ds(0, block_k)] = x_qfn(x_ref[:])

        @pl.when(jnp.logical_and(j == 0, k < nk - 1))
        def _quantize_next():
            xq_ref[:, pl.ds((k + 1) * block_k, block_k)] = x_qfn(
                x_next_ref[:])

        x_tile = xq_ref[:, pl.ds(k * block_k, block_k)]
    else:
        x_tile = x_ref[:]

    acc_ref[:] += jax.lax.dot_general(
        x_tile, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def quantized_matmul(
    x: jax.Array,
    w: jax.Array,
    *,
    x_qfn: Optional[Callable] = None,
    w_qfn: Optional[Callable] = None,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x_qfn(x) @ w_qfn(w) with the x rounding fused into the kernel.

    x: (M, K); w: (K, N).  M/K/N should be multiples of the block sizes
    (the wrapper shrinks blocks to fit and falls back to XLA when shapes
    don't tile).  Straight-through gradient.
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    out_dtype = out_dtype or x.dtype

    if w_qfn is not None:
        w = w + jax.lax.stop_gradient(w_qfn(w) - w)

    interpret = resolve_interpret(interpret)

    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    if M % block_m or N % block_n or K % block_k or (interpret and x_qfn):
        # Non-tiling shapes (or interpret debugging): XLA fallback with the
        # same semantics.
        xq = x if x_qfn is None else x + jax.lax.stop_gradient(x_qfn(x) - x)
        return jnp.dot(xq, w, preferred_element_type=jnp.float32).astype(
            out_dtype)

    nk = K // block_k
    grid = (M // block_m, N // block_n, nk)

    kernel = functools.partial(
        _mm_kernel, x_qfn=x_qfn, nk=nk, block_k=block_k)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            # lookahead tile for the pipelined quantize (clamped at the edge)
            pl.BlockSpec((block_m, block_k),
                         lambda i, j, k, nk=nk: (i, jnp.minimum(k + 1, nk - 1))),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, block_n), jnp.float32),
            pltpu.VMEM((block_m, K), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )

    @jax.custom_vjp
    def _mm(x, w):
        return call(x, x, w)

    def _fwd(x, w):
        return call(x, x, w), (x, w)

    def _bwd(res, g):
        xr, wr = res
        xq = xr if x_qfn is None else xr + jax.lax.stop_gradient(
            x_qfn(xr) - xr)
        _, vjp = jax.vjp(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
            .astype(out_dtype),
            xq, wr,
        )
        return vjp(g)

    _mm.defvjp(_fwd, _bwd)
    return _mm(x, w)
