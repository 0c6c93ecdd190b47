"""W8A8 integer GEMM: int8 weights x dynamically-int8-quantized activations
on the MXU's native s8 x s8 -> s32 path.

The fake-quant training paths keep GEMMs in bf16 by design (values are
rounded, storage is not).  This is the *serving* counterpart for integer
specs: weights are stored as int8 codes + per-output-channel scales
(``pack_int8_weights``), activations are quantized per row (per token) on
the fly, the dot runs in int8 (half the operand bytes of bf16 AND double
MXU throughput on v5e-class chips: 394 TOPS int8 vs 197 TFLOP/s bf16), and
the result is rescaled by the rank-1 outer product of the two scale vectors.

Numerics contract: ``w8a8_matmul(x, *pack_int8_weights(w))`` equals
``dequant(quant(x)) @ dequant(quant(w))`` computed in f32 — i.e. the exact
integer-arithmetic evaluation of the framework's
``int8,qs=per_channel_symmetric`` (weights, ax=1 of (K, N)) x
``int8,qs=per_tensor_…``-style dynamic per-token activation quantization.
The s32 accumulator is exact (no rounding inside the dot), so this path is
*more* faithful than a bf16 dequant GEMM.

Reference counterpart: the reference's integer quantization mode
(quantizer.py qmax=127 int specs) always evaluates through fp fake-quant;
native integer evaluation is the TPU-side extension of its codegen
operand-size goals (SURVEY §2 #25/#27).
"""

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["pack_int8_weights", "quantize_int8_rowwise", "w8a8_matmul"]


def pack_int8_weights(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float weights -> (int8 codes (K, N), f32 scales (N,)).

    Per-output-channel symmetric: scale = amax(|w[:, n]|) / 127.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127)
    return codes.astype(jnp.int8), scale


def quantize_int8_rowwise(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(M, K) float activations -> (int8 codes, f32 scales (M,)).

    Per-row (per-token) symmetric dynamic quantization — the standard W8A8
    serving recipe (row scales absorb token-level outliers without a
    calibration pass)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=1) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(jnp.round(xf / scale[:, None]), -127, 127)
    return codes.astype(jnp.int8), scale


def w8a8_matmul(
    x: jax.Array,
    w_codes: jax.Array,
    w_scale: jax.Array,
    out_dtype=None,
) -> jax.Array:
    """y = dequant(quant_rowwise(x)) @ dequant(w_codes): int8 MXU dot +
    rank-1 rescale.  x (M, K) float; w_codes (K, N) int8; w_scale (N,)."""
    out_dtype = out_dtype or x.dtype
    x_codes, x_scale = quantize_int8_rowwise(x)
    # s8 x s8 -> s32: exact integer accumulation on the MXU
    acc = jax.lax.dot_general(
        x_codes, w_codes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale[:, None] * w_scale[None, :]
    return y.astype(out_dtype)
