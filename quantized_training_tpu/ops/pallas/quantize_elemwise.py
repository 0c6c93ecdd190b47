"""Elementwise fake-quantize as a Pallas kernel (HBM-bandwidth bound).

The direct-rounding fake quant (the paper's forward posit8/E4M3 mode) is a
pure elementwise map, so its speed-of-light is one HBM read + one write at
full bandwidth.  Round-1 profiling showed the XLA-fused rounding chains run
far below that on the projection inputs (~23 ms/forward on the bench model —
the whole quantized-vs-bf16 gap).  This kernel runs the identical bit-exact
numerics (numerics/posit.py, numerics/fp8.py — pinned to the reference over
all 2^16 bf16 values) over large VMEM tiles with f32 compute (Mosaic on v5e
has no bf16 elementwise math).

Used by quantize.fake_quant for direct-rounding specs on TPU when the tensor
tiles cleanly; everything else falls back to the XLA path with the same
semantics.
"""

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_interpret

__all__ = ["pallas_quantize", "pallas_quantize_eligible"]


def _kernel(x_ref, o_ref, *, qfn):
    o_ref[:] = qfn(x_ref[:]).astype(o_ref.dtype)


def _flat_view(size: int):
    """Pick a (rows, cols) factorization of ``size`` for an elementwise map.

    Elementwise kernels are layout-free, so the logical shape is irrelevant —
    what matters is a lane-aligned 2D view with wide blocks.  Prefer 1024
    lanes (one VREG row of f32 is 8x128; 1024 keeps DMA transfers long)."""
    for cols in (1024, 512, 256, 128):
        if size % cols == 0:
            return size // cols, cols
    return None


def pallas_quantize_eligible(x: jax.Array) -> bool:
    """Cheap static check: flattenable to a TPU-friendly 2D tiling."""
    if x.ndim == 0 or x.size == 0:
        return False
    v = _flat_view(x.size)
    return v is not None and v[0] >= 8


def pallas_quantize(
    x: jax.Array,
    qfn: Callable[[jax.Array], jax.Array],
    *,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Apply the elementwise quantizer ``qfn`` via a tiled Pallas kernel.

    ``qfn`` must be a pure elementwise map (quantize_fn(...) result).  The
    input is viewed as (lead, last); blocks are shrunk to fit and the kernel
    falls back to plain ``qfn(x)`` when the view doesn't tile.
    """
    interpret = resolve_interpret(interpret)

    if not pallas_quantize_eligible(x):
        return qfn(x)

    lead, last = _flat_view(x.size)
    x2 = x.reshape(lead, last)

    bn = last  # full lane width (1024 when size allows)
    bm = min(block_rows, lead)
    if lead % bm:
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if lead % cand == 0:
                bm = cand
                break
        else:
            return qfn(x)

    out = pl.pallas_call(
        functools.partial(_kernel, qfn=qfn),
        grid=(lead // bm, last // bn),
        in_specs=[pl.BlockSpec((bm, bn), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((lead, last), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x2)
    return out.reshape(x.shape)
