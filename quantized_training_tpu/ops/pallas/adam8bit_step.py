"""Fused 8-bit-Adam moment update (Pallas/Mosaic TPU kernel).

The r4 train-step decomposition (BENCH_TRAIN_r04.json) measured adam8bit
at **+23.3 ms/step** over f32 adamw at the bench geometry — the single
largest quantized-training cost, bigger than forward fake-quant (+7.5) and
backward error-quant (+12.8) combined.  The profiled cause is NOT the int8
codes: an XLA blockwise quantize round-trip runs at ~122 GB/s whether the
codes are int8 or kept f32 (the per-256-block reduce+broadcast defeats
XLA's elementwise fusion and it re-materializes the blocked view), while a
trivial map hits ~638 GB/s on the same array.

This kernel performs the ENTIRE 8-bit Adam moment update in one VMEM pass
per tile: dequantize m (signed int8 * block scale) and v (uint8 sqrt-code,
squared), apply the bias-corrected Adam update, requantize both moments.
Byte traffic per element: read g(4) + mc(1) + vc(1), write upd(4) + mc(1)
+ vc(1) + scales ~= 12.1 B — *less* than f32 Adam's 24 B of moment
traffic, so the 8-bit optimizer becomes a bandwidth win instead of a
3.4x-over-bound VPU stall.

Numerics match the XLA path in ``training/optim8bit.py`` up to compiler
fma-contraction ulps (same f32 formulas and rounding points; XLA and
Mosaic may contract a*b+c differently, wobbling a block scale by 1 ulp
and a code by at most 1 step — asserted by the interpret-mode test).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_interpret

__all__ = ["fused_adam8bit_update", "adam8bit_block_rows"]

BLOCK = 256  # quantization block size this kernel is specialized for


def adam8bit_block_rows(nb: int):
    """Largest grid row-block dividing ``nb`` (None if nothing fits)."""
    for bm in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if nb % bm == 0:
            return bm
    return None


def _kernel(bc_ref, g_ref, mc_ref, ms_ref, vc_ref, vs_ref,
            u_ref, mco_ref, mso_ref, vco_ref, vso_ref,
            *, b1: float, b2: float, eps: float):
    bc1 = bc_ref[0, 0]
    bc2 = bc_ref[0, 1]
    g = g_ref[:]

    m = b1 * (mc_ref[:].astype(jnp.float32) * ms_ref[:]) + (1.0 - b1) * g
    # Mosaic has no direct uint8<->f32 casts: hop through int32 (zero-
    # extend on read, wrap on write — values are in [0, 255] so exact)
    root = vc_ref[:].astype(jnp.int32).astype(jnp.float32) * vs_ref[:]
    v = b2 * (root * root) + (1.0 - b2) * (g * g)

    u_ref[:] = (m / bc1) / (jnp.sqrt(v / bc2) + eps)

    absmax = jnp.max(jnp.abs(m), axis=1, keepdims=True)
    ms = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    mco_ref[:] = jnp.clip(jnp.round(m / ms), -127, 127).astype(jnp.int8)
    mso_ref[:] = ms

    vroot = jnp.sqrt(v)
    vmax = jnp.max(vroot, axis=1, keepdims=True)
    vs = jnp.where(vmax > 0, vmax / 255.0, 1.0)
    vco_ref[:] = jnp.clip(jnp.round(vroot / vs), 0, 255).astype(
        jnp.int32).astype(jnp.uint8)
    vso_ref[:] = vs


def fused_adam8bit_update(
    g2d: jax.Array,          # (nb, 256) f32 padded flat gradient
    m_codes: jax.Array,      # (nb, 256) int8
    m_scale: jax.Array,      # (nb,) or (nb, 1) f32
    v_codes: jax.Array,      # (nb, 256) uint8
    v_scale: jax.Array,      # (nb,) or (nb, 1) f32
    bc1: jax.Array,          # scalar f32 bias correction 1 - b1^t
    bc2: jax.Array,
    *,
    b1: float,
    b2: float,
    eps: float,
    interpret=None,
):
    """One fused Adam step on 8-bit blockwise moments.

    Returns ``(update, new_m_codes, new_m_scale, new_v_codes,
    new_v_scale)`` with scales shaped (nb,).  Caller handles leaf
    flattening/padding (see training/optim8bit.py).
    """
    nb, blk = g2d.shape
    assert blk == BLOCK, (g2d.shape,)
    bm = adam8bit_block_rows(nb)
    interpret = resolve_interpret(interpret)
    assert bm is not None  # any nb >= 1 matches bm=1

    kernel = functools.partial(_kernel, b1=b1, b2=b2, eps=eps)
    bc = jnp.stack([bc1.astype(jnp.float32),
                    bc2.astype(jnp.float32)]).reshape(1, 2)

    u, mc, ms, vc, vs = pl.pallas_call(
        kernel,
        grid=(nb // bm,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((bm, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((bm, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        ],
        interpret=bool(interpret),
    )(bc, g2d, m_codes, m_scale.reshape(nb, 1), v_codes,
      v_scale.reshape(nb, 1))
    return u, mc, ms[:, 0], vc, vs[:, 0]
