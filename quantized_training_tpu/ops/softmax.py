"""Posit-approximated softmax with the reference's custom backward.

The reference approximates softmax on the accelerator with posit16_1 lookup
tables for exp and reciprocal, and a custom gradient whose reciprocal term
uses the hardware's approximate derivative 2^(-2*floor(log2 sum) - 1)
(reference: modules/softmax.py:19-51).  The gold LUT files encode
posit16_1-rounded exp / reciprocal; here the same values are produced
in-register by the posit rounding kernels — no tables.

``posit_softmax`` is the functional core; models use it through
models.layers.QSoftmax.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..numerics import quantize_fn, quantize_fn_positive
from ..numerics.bitutils import bits_f32, f32_bits

__all__ = ["posit_softmax"]


def _posit16_exp(x):
    """posit16_1-rounded exp (the posit16_1_exp gold table's function)."""
    p16 = quantize_fn_positive("posit16_1")
    return p16(jnp.exp(x.astype(jnp.float32)))


def _posit16_reciprocal(x):
    """posit16_1-rounded reciprocal (posit16_1_reciprocal gold table)."""
    p16 = quantize_fn_positive("posit16_1")
    return p16(1.0 / x.astype(jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def posit_softmax(x: jax.Array, use_posit_exp: bool = True,
                  use_posit_reciprocal: bool = False) -> jax.Array:
    """Softmax along the last axis with posit16-approximated exp/reciprocal.

    The max-subtraction happens outside the approximation (reference
    Softmax.forward subtracts amax first).
    """
    out, _ = _posit_softmax_fwd(x, use_posit_exp, use_posit_reciprocal)
    return out


def _posit_softmax_fwd(x, use_posit_exp, use_posit_reciprocal):
    xf = x.astype(jnp.float32)
    shifted = xf - jax.lax.stop_gradient(
        jnp.max(xf, axis=-1, keepdims=True))
    exp_x = _posit16_exp(shifted) if use_posit_exp else jnp.exp(shifted)
    exp_sum = jnp.sum(exp_x, axis=-1, keepdims=True)
    if use_posit_reciprocal:
        out = exp_x * _posit16_reciprocal(exp_sum)
        res = (out, exp_x, exp_sum)
    else:
        out = exp_x / exp_sum
        res = (out, None, None)
    return out.astype(x.dtype), res


def _posit_softmax_bwd(use_posit_exp, use_posit_reciprocal, res, g):
    out, exp_x, exp_sum = res
    gf = g.astype(jnp.float32)
    if exp_x is None:
        # Exact softmax Jacobian (reference: softmax.py:41-44).
        grad = out * gf
        grad = grad - out * jnp.sum(grad, axis=-1, keepdims=True)
    else:
        # Approximate-reciprocal derivative: d(1/s)/ds ~ -2^(-2*floor(log2 s)-1)
        # (reference: softmax.py:46-49).
        grad = out * gf
        sum_grad = jnp.sum(exp_x * gf, axis=-1, keepdims=True)
        deriv = jnp.exp2(jnp.floor(jnp.log2(exp_sum)) * -2.0 - 1.0)
        grad = grad - deriv * exp_x * sum_grad
    return (grad.astype(g.dtype),)


posit_softmax.defvjp(_posit_softmax_fwd, _posit_softmax_bwd)
