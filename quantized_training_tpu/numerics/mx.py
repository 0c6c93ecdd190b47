"""Microscaling (MX) block utilities: shared exponents and block reshaping.

Functional equivalents of the reference's MX helpers (reference:
src/quantized_training/mx_utils.py:16-134).  ``reshape_to_blocks`` pads each
block axis to a multiple of ``block_size`` and splits it into
(num_blocks, block_size) — all shapes static, so the transform jits cleanly
and maps onto TPU tile layouts (block_size is typically 32/64, aligned with
the 128-lane registers when the block axis is minor).
"""

import math
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .bitutils import F32_EXP_MASK, f32_bits

__all__ = [
    "shared_exponents",
    "reshape_to_blocks",
    "undo_reshape_to_blocks",
    "normalize_axes",
]

FP32_MIN_NORMAL = 2.0 ** -126


def normalize_axes(axes: Union[int, Sequence[int]], ndim: int) -> List[int]:
    """Axes as a sorted list of non-negative ints."""
    if isinstance(axes, int):
        axes = [axes]
    return sorted(a + ndim if a < 0 else a for a in axes)


def floor_log2_f32(a: jax.Array) -> jax.Array:
    """floor(log2(|a|)) computed exactly from the float32 exponent field.

    For subnormal f32 inputs the value is normalized first (exact 2**64
    scaling).  Zero inputs must be masked by the caller.
    """
    af = jnp.abs(a).astype(jnp.float32)
    bits = f32_bits(af)
    exp = ((bits & F32_EXP_MASK) >> 23) - 127
    sub = exp == -127
    bits_up = f32_bits(af * jnp.float32(2.0 ** 64))
    exp_up = ((bits_up & F32_EXP_MASK) >> 23) - 127 - 64
    return jnp.where(sub, exp_up, exp)


def shared_exponents(
    a: jax.Array,
    method: str = "max",
    axes: Sequence[int] = None,
    ebits: int = 0,
) -> jax.Array:
    """Shared exponent per block: floor(log2(max |a|)) over ``axes``.

    Matches reference mx_utils.py:16-59, including the overflow-to-NaN /
    underflow-to--emax behaviour when ``ebits`` bounds the exponent format.
    """
    if method == "max":
        if axes is None:
            shared = jnp.max(jnp.abs(a))
        else:
            shared = jnp.abs(a)
            for axis in axes:
                shared = jnp.max(shared, axis=axis, keepdims=True)
    elif method == "none":
        shared = jnp.abs(a)
    else:
        raise ValueError(f"Unrecognized shared exponent method {method}")

    shared = jnp.where(shared == 0, FP32_MIN_NORMAL, shared)
    shared_exp = floor_log2_f32(shared).astype(a.dtype)

    if ebits > 0:
        emax = 2 ** (ebits - 1) - 1
        shared_exp = jnp.where(shared_exp > emax, jnp.nan, shared_exp)
        shared_exp = jnp.where(shared_exp < -emax, -emax, shared_exp)

    return shared_exp


def reshape_to_blocks(
    a: jax.Array, axes: Sequence[int], block_size: int
) -> Tuple[jax.Array, List[int], Tuple[int, ...], Tuple[int, ...]]:
    """Split each axis in ``axes`` into (ceil(n/block), block) tiles.

    Returns ``(blocked, shifted_axes, orig_shape, padded_shape)`` where
    ``orig_shape``/``padded_shape`` describe the intermediate array with the
    singleton tile dims inserted (the contract needed by
    ``undo_reshape_to_blocks``), matching reference mx_utils.py:62-121.
    """
    if axes is None:
        raise ValueError("axes required to determine block dimensions")
    if block_size == 0:
        raise ValueError("block_size == 0 in reshape_to_blocks")

    axes = normalize_axes(axes, a.ndim)

    # Insert a tile dimension after each block axis.
    shifted = []
    for i, axis in enumerate(axes):
        axis += i
        shifted.append(axis)
        a = jnp.expand_dims(a, axis=axis + 1)
    axes = shifted

    orig_shape = a.shape
    pad_width = [(0, 0)] * a.ndim
    needs_pad = False
    for axis in axes:
        size = orig_shape[axis]
        if size % block_size != 0:
            pad_width[axis] = (0, block_size - size % block_size)
            needs_pad = True
    if needs_pad:
        a = jnp.pad(a, pad_width)

    padded_shape = a.shape
    new_shape = list(padded_shape)
    for axis in axes:
        if new_shape[axis] >= block_size:
            assert new_shape[axis] % block_size == 0
            new_shape[axis + 1] = block_size
            new_shape[axis] = new_shape[axis] // block_size
        else:
            new_shape[axis + 1] = new_shape[axis]
            new_shape[axis] = 1

    return a.reshape(new_shape), axes, orig_shape, padded_shape


def undo_reshape_to_blocks(
    a: jax.Array,
    padded_shape: Sequence[int],
    orig_shape: Sequence[int],
    axes: Sequence[int],
) -> jax.Array:
    """Inverse of :func:`reshape_to_blocks`."""
    a = a.reshape(padded_shape)
    if list(padded_shape) != list(orig_shape):
        a = a[tuple(slice(0, s) for s in orig_shape)]
    for axis in reversed(list(axes)):
        a = jnp.squeeze(a, axis=axis + 1)
    return a
