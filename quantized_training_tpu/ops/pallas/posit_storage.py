"""Posit-storage matmul: weights live in HBM as packed posit codes (1 byte
per element) and are decoded to bf16 in VMEM inside the matmul kernel.

This is the serving memory-*footprint* capability of the framework: posit8
codes halve weight HBM residency (a 13B model fits where a 7B-bf16 did).
Measured on v5e, the clz-based in-register decode (~25 VPU ops/element) is
VPU-bound below the bf16 streaming rate, so this kernel trades throughput
for capacity at decode shapes; the throughput-oriented 8-bit storage path is
the int8-MXU matmul with per-block scale epilogue for MX/affine formats
(planned: the MXU consumes int8 codes directly, scales fold into the
epilogue — no per-element decode at all).

``pack_posit_weights`` is the offline deployment step (exact: encode/decode
round-trips bit-perfectly per the exhaustive tests); ``posit_matmul``
computes x @ decode(W).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_interpret

from ...numerics.posit import decode_posit, encode_posit

__all__ = ["pack_posit_weights", "posit_matmul"]


def pack_posit_weights(w: jax.Array, nbits: int = 8, es: int = 1) -> jax.Array:
    """Offline: quantize + pack weights to int8 posit codes."""
    assert nbits <= 8, "packed storage supports nbits <= 8"
    return encode_posit(w, nbits, es).astype(jnp.int8)


def _kernel(x_ref, w_ref, o_ref, acc_ref, *, nk: int, es: int, nbits: int,
            out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = decode_posit(w_ref[:], nbits, es).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def posit_matmul(
    x: jax.Array,
    w_codes: jax.Array,
    *,
    nbits: int = 8,
    es: int = 1,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x @ decode_posit(w_codes); w_codes: (K, N) int8.

    Blocks default to the VMEM-budget picker (autotune.py), which keeps
    divisor-poor weight dims (e.g. 5504 = 128 * 43) on the kernel instead of
    the XLA fallback."""
    M, K = x.shape
    K2, N = w_codes.shape
    assert K == K2
    out_dtype = out_dtype or x.dtype

    interpret = resolve_interpret(interpret)

    if block_m is None or block_n is None or block_k is None:
        from .autotune import storage_matmul_blocks
        picked = storage_matmul_blocks(M, K, N, code_bytes=1)
        if picked is not None:
            bm, bk, bn = picked
            block_m = block_m or bm
            block_k = block_k or bk
            block_n = block_n or bn
        else:
            block_m = block_n = block_k = 1  # force fallback below

    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    if M % block_m or N % block_n or K % block_k or interpret:
        w = decode_posit(w_codes, nbits, es).astype(x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            out_dtype)

    nk = K // block_k
    grid = (M // block_m, N // block_n, nk)
    kernel = functools.partial(
        _kernel, nk=nk, es=es, nbits=nbits, out_dtype=out_dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(x, w_codes)
