"""Functional fake quantization with explicit state pytrees.

The reference implements fake quantization as stateful nn.Module buffers
mutated inside autograd Functions (reference:
src/quantized_training/fake_quantize.py:98-435).  The TPU-native design makes
every piece explicit and jit-stable:

  * :class:`FakeQuantState` — a fixed-shape pytree carrying the amax history
    ring buffer, derived scale, zero point, and optional exponent histogram.
    No resize-on-first-use: shapes are determined up front from the input
    shape + spec, so the state threads through jit/pjit/scan without
    retracing and shards like any other pytree leaf.
  * :func:`fake_quantize` — pure function ``(x, spec, state) -> (y, state')``
    covering all four schemes (per-tensor / per-channel delayed scaling,
    microscaling, group-wise affine) plus outlier masking.
  * Straight-through gradients via ``custom_vjp`` — matching the reference's
    backward (identity on the input gradient, no clipping).

Gradient ("error") quantization composes the same function inside a
``custom_vjp`` applied to the *backward* stream (training/qat.py).
"""

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..numerics import quantize_fn, normalize_axes, reshape_to_blocks
from ..numerics.bitutils import clamp_keep_zero_sign, materialize_rounding
from ..qspec import QScheme, QuantizationSpec
from .ops import calculate_mx_qparam, expand_scale

__all__ = [
    "FakeQuantState",
    "init_state",
    "fake_quantize",
    "straight_through",
    "scale_shape_for",
]


class FakeQuantState(NamedTuple):
    """Observer state for delayed-scaling schemes (a jit-friendly pytree).

    amax_history: (amax_history_len, *scale_shape) float32 ring buffer.
    scale:        (*scale_shape,) float32, always valid (init 1.0).
    step:         int32 scalar, number of observer updates so far.
    """

    amax_history: jax.Array
    scale: jax.Array
    step: jax.Array


def scale_shape_for(spec: QuantizationSpec, x_shape: Tuple[int, ...]):
    """Shape of the scale tensor for a spec applied to an input shape."""
    if spec.qscheme == QScheme.PER_CHANNEL_SYMMETRIC:
        ch_axis = spec.ch_axis if isinstance(spec.ch_axis, int) else -1
        ch_axis = ch_axis + len(x_shape) if ch_axis < 0 else ch_axis
        return tuple(
            x_shape[i] if i == ch_axis else 1 for i in range(len(x_shape))
        )
    return ()


def init_state(
    spec: QuantizationSpec, x_shape: Tuple[int, ...] = ()
) -> Optional[FakeQuantState]:
    """Fresh observer state; None for stateless schemes (MX, group affine)."""
    if spec.qscheme in (QScheme.MICROSCALING, QScheme.GROUP_WISE_AFFINE):
        return None
    ahl = spec.amax_history_len or 16
    sshape = scale_shape_for(spec, x_shape)
    return FakeQuantState(
        amax_history=jnp.zeros((ahl,) + sshape, jnp.float32),
        scale=jnp.ones(sshape, jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def straight_through(fn):
    """Wrap a value transform with an identity (straight-through) gradient.

    The reference's fake-quant autograd Functions return grad_output
    unchanged for the input and None for every parameter
    (fake_quantize.py:131-133, 192-194, 250-252).
    """

    @jax.custom_vjp
    def wrapped(x, *args):
        return fn(x, *args)

    def fwd(x, *args):
        return fn(x, *args), tuple(
            jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
                args,
            )
        )

    def bwd(res, g):
        zeros = tuple(
            jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), r)
            for r in res
        )
        return (g,) + zeros

    wrapped.defvjp(fwd, bwd)
    return wrapped


# --------------------------------------------------------------------------
# Scheme implementations (value paths; straight-through applied at the end)
# --------------------------------------------------------------------------

def _pallas_elemwise_enabled() -> bool:
    """Route direct-rounding quantizers through the tiled Pallas kernel on
    TPU (ops/pallas/quantize_elemwise.py).  Identical bit-exact numerics;
    the kernel exists to run the rounding chain at HBM bandwidth.  Disable
    with QT_PALLAS_ELEMWISE=0 (A/B benching)."""
    import os

    if os.environ.get("QT_PALLAS_ELEMWISE", "1") == "0":
        return False
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform == "tpu"


def _direct_round_fn(spec: QuantizationSpec):
    qfn = quantize_fn(spec.dtype)

    def value(t):
        if _pallas_elemwise_enabled():
            # XLA runs the rounding chain ~3x faster than Mosaic (better VPU
            # ILP), but left alone it fuses the chain into the consumer
            # matmul, making the GEMM VPU-bound.  The barrier pins the chain
            # as its own (or the producer's) fusion while keeping the matmul
            # clean; measured best of the three routings (see ROUND2_NOTES).
            return jax.lax.optimization_barrier(
                qfn(materialize_rounding(t)))
        return qfn(materialize_rounding(t))

    return value

def _observe_amax(
    x: jax.Array, state: FakeQuantState, spec: QuantizationSpec
) -> FakeQuantState:
    """Delayed-scaling observer: scale from the amax *history*, then push the
    current amax (reference: fake_quantize.py:217-242)."""
    if spec.qscheme == QScheme.PER_CHANNEL_SYMMETRIC:
        ch_axis = spec.ch_axis if isinstance(spec.ch_axis, int) else -1
        ch_axis = ch_axis + x.ndim if ch_axis < 0 else ch_axis
        dims = tuple(i for i in range(x.ndim) if i != ch_axis)
        amax_cur = jnp.max(jnp.abs(x), axis=dims, keepdims=True)
    else:
        amax_cur = jnp.max(jnp.abs(x))
    amax_cur = amax_cur.astype(jnp.float32)

    amax = jnp.max(state.amax_history, axis=0)

    history = state.amax_history
    if history.shape[0] > 1:
        history = jnp.roll(history, -1, axis=0)
    history = history.at[0].set(amax_cur)

    sf = amax / spec.quant_max
    sf = jnp.where(amax > 0.0, sf, state.scale)
    sf = jnp.where(jnp.isfinite(amax), sf, state.scale)
    if spec.force_scale_power_of_two:
        sf = jnp.exp2(jnp.ceil(jnp.log2(sf)))

    return FakeQuantState(
        amax_history=history, scale=sf, step=state.step + 1
    )


def _apply_scale_quant(x, scale, spec: QuantizationSpec):
    """vmap(input / scale, qmap) * scale, in the input dtype.

    The quotient is pinned to the input dtype before the quantizer: XLA's
    excess-precision fusion would otherwise feed the bit-exact kernel an
    unrounded f32 value, making jit results diverge from eager/reference
    (see numerics.bitutils.materialize_rounding)."""
    qfn = quantize_fn(spec.dtype)
    scale = scale.astype(x.dtype)
    return qfn(materialize_rounding(x / scale)) * scale


def _mx_value(x, spec: QuantizationSpec):
    qfn = quantize_fn(spec.dtype)
    scale_qfn = quantize_fn(spec.scale_dtype) if spec.scale_dtype else None
    axes = tuple(normalize_axes(spec.ch_axis, x.ndim))
    block_size = spec.block_size
    scale = calculate_mx_qparam(
        x, axes, block_size, spec.quant_max,
        spec.force_scale_power_of_two, scale_qfn,
    )
    q = qfn(materialize_rounding(
        x / expand_scale(scale, x.shape, block_size)))
    return q * expand_scale(scale, x.shape, block_size), scale


def _group_affine_qparams(x, spec: QuantizationSpec):
    """Blockwise affine qparams (reference: fake_quantize.py:150-180)."""
    axes = normalize_axes(spec.ch_axis, x.ndim)
    blocked, baxes, _, _ = reshape_to_blocks(x, axes, spec.block_size)
    shared_axes = tuple(a + 1 for a in baxes)
    mn = jnp.min(blocked, axis=shared_axes)
    mx = jnp.max(blocked, axis=shared_axes)
    sf = (mx - mn) / (spec.quant_max - spec.quant_min)
    sf = jnp.where(sf > 0.0, sf, jnp.ones_like(sf))
    zp = -mn / sf + spec.quant_min
    if spec.scale_dtype:
        scale_qfn = quantize_fn(spec.scale_dtype)
        sf = scale_qfn(sf)
        zp = scale_qfn(zp)
    return sf, zp


def _group_affine_value(x, spec: QuantizationSpec):
    sf, zp = _group_affine_qparams(x, spec)
    sfe = expand_scale(sf, x.shape, spec.block_size)
    zpe = expand_scale(zp, x.shape, spec.block_size)
    q = clamp_keep_zero_sign(
        jnp.round(materialize_rounding(x / sfe + zpe)),
        spec.quant_min, spec.quant_max
    )
    return (q - zpe) * sfe, (sf, zp)


# --------------------------------------------------------------------------
# Public entry point
# --------------------------------------------------------------------------

def fake_quantize(
    x: jax.Array,
    spec: Optional[QuantizationSpec],
    state: Optional[FakeQuantState] = None,
    *,
    observe: bool = True,
    quantize: bool = True,
) -> Tuple[jax.Array, Optional[FakeQuantState]]:
    """Fake-quantize ``x`` per ``spec``; returns ``(y, new_state)``.

    ``spec`` must be static under jit (QuantizationSpec is hashable).
    ``observe``/``quantize`` mirror the reference's observer_enabled /
    fake_quant_enabled switches and are also static.
    Straight-through gradient on the value path.
    """
    if spec is None:
        return x, state

    if spec.qscheme is None:
        # Direct rounding, no observer/scale — the paper's forward posit8 /
        # E4M3 mode (reference: FusedAmaxObsFakeQuantFunction with
        # observer_enabled=0, scale=1; run_quantized_training.py passes bare
        # "--activation posit8_1" with no qscheme).
        if not quantize:
            return x, state
        y = straight_through(_direct_round_fn(spec))(x)
        return y, state

    # Outlier masking: quantize only |x| < threshold, restore outliers after
    # (reference: fake_quantize.py:352-359, 400-402).
    if spec.outlier_threshold is not None:
        mask = jnp.abs(x) < spec.outlier_threshold
        x_in = jnp.where(mask, x, jnp.zeros_like(x))
    else:
        mask = None
        x_in = x

    if spec.qscheme == QScheme.MICROSCALING:
        value = straight_through(lambda t: _mx_value(t, spec)[0])
        y = value(x_in) if quantize else x_in
        new_state = state
    elif spec.qscheme == QScheme.GROUP_WISE_AFFINE:
        value = straight_through(lambda t: _group_affine_value(t, spec)[0])
        y = value(x_in) if quantize else x_in
        new_state = state
    else:
        if state is None:
            state = init_state(spec, x_in.shape)
        new_state = (
            _observe_amax(jax.lax.stop_gradient(x_in), state, spec)
            if observe
            else state
        )
        if quantize:
            value = straight_through(
                lambda t, s: _apply_scale_quant(t, s, spec)
            )
            y = value(x_in, new_state.scale)
        else:
            y = x_in

    if mask is not None:
        y = jnp.where(mask, y, x)
    return y, new_state
