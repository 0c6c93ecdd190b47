"""Functional quantized-tensor ops: the framework's L1 op library.

JAX equivalents of the reference's ``torch.ops.quantized_ops`` custom op
library (reference: src/quantized_training/decomposed.py:166-561):
quantize / dequantize with block-expanded scales and codebooks, microscaling
qparam calculation, MX GEMM wrappers, and outlier split + residual matmul.

Everything is a pure function of arrays + a static :class:`QuantizationSpec`
(or explicit static ints), so the whole op library traces into one XLA
program.  On TPU the dequantize→matmul pairs are replaced by fused Pallas
kernels (ops/pallas/) — these jnp versions are the reference semantics and
the interpret-mode fallback.
"""

import math
from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..numerics import (
    apply_lut,
    normalize_axes,
    reshape_to_blocks,
    shared_exponents,
)
from ..numerics.bitutils import bits_f32

__all__ = [
    "expand_scale",
    "quantize",
    "dequantize",
    "calculate_mx_qparam",
    "quantize_mx",
    "linear_mx",
    "matmul_mx",
    "conv2d_mx",
    "filter_outlier",
    "outlier_matmul",
    "to_csr",
]


def expand_scale(
    scale: jax.Array, shape: Sequence[int], block_size: int
) -> jax.Array:
    """Broadcast per-block scales back to the full tensor shape.

    Matches the reference ``expand`` (decomposed.py:127-140): unsqueeze
    leading dims, repeat each mismatching dim by ``block_size``, then crop
    any padding overhang.
    """
    shape = tuple(shape)
    while scale.ndim < len(shape):
        scale = scale[None]
    for dim in range(len(shape)):
        if scale.shape[dim] != shape[dim]:
            scale = jnp.repeat(scale, block_size, axis=dim)
    if scale.shape != shape:
        scale = scale[tuple(slice(0, s) for s in shape)]
    return scale


def quantize(
    x: jax.Array,
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    axes: Optional[Sequence[int]] = None,
    block_size: Optional[int] = None,
    qfn=None,
) -> jax.Array:
    """Map float values to (fake-)quantized values: ``qfn(x/scale + zp)``.

    ``qfn`` is a direct elementwise quantizer from
    :func:`quantized_training_tpu.numerics.quantize_fn` (the reference passes
    a LUT here; the direct form is bit-identical and TPU-friendly).
    """
    assert qfn is not None, "qfn must be provided for quantization"
    if block_size is not None:
        scale = expand_scale(scale, x.shape, block_size)
        if zero_point is not None:
            zero_point = expand_scale(zero_point, x.shape, block_size)
    x = x / scale if zero_point is None else x / scale + zero_point
    return qfn(x)


def dequantize(
    x: jax.Array,
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    axes: Optional[Sequence[int]] = None,
    block_size: Optional[int] = None,
    input_codebook: Optional[jax.Array] = None,
    output_qfn=None,
) -> jax.Array:
    """Map quantized values back to float: ``(decode(x) - zp) * scale``."""
    if input_codebook is not None:
        x = jnp.take(input_codebook, x.astype(jnp.int32), axis=0).astype(x.dtype)
    if block_size is not None:
        scale = expand_scale(scale, x.shape, block_size)
        if zero_point is not None:
            zero_point = expand_scale(zero_point, x.shape, block_size)
    out = x * scale if zero_point is None else (x - zero_point) * scale
    if output_qfn is not None:
        out = output_qfn(out)
    return out


def _exact_pow2(e: jax.Array, dtype) -> jax.Array:
    bits = jnp.clip(e.astype(jnp.int32) + 127, 0, 255) << 23
    return bits_f32(bits).astype(dtype)


def calculate_mx_qparam(
    x: jax.Array,
    axes: Union[int, Tuple[int, ...]],
    block_size: int,
    quant_max: float,
    force_scale_power_of_two: bool = False,
    scale_qfn=None,
) -> jax.Array:
    """Per-block scale factors for microscaling quantization.

    amax-based by default (scale = blockwise amax / quant_max, optionally
    quantized through a scale codebook), or power-of-two shared exponents
    offset by floor(log2(quant_max)) (reference: decomposed.py:366-419).
    """
    assert block_size > 0
    axes = normalize_axes(axes, x.ndim)
    blocked, baxes, _, _ = reshape_to_blocks(x, axes, block_size)
    shared_axes = tuple(a + 1 for a in baxes)

    if force_scale_power_of_two:
        shared_exp = shared_exponents(
            blocked, method="max", axes=shared_axes, ebits=0
        )
        shared_exp = shared_exp - math.floor(math.log2(quant_max))
        for axis in reversed(baxes):
            shared_exp = jnp.squeeze(shared_exp, axis=axis + 1)
        scale = _exact_pow2(shared_exp, x.dtype)
    else:
        amax = jnp.max(jnp.abs(blocked), axis=shared_axes)
        scale = amax / quant_max
        if scale_qfn is not None:
            scale = scale_qfn(scale)

    return jnp.where(scale > 0.0, scale, jnp.ones_like(scale))


def quantize_mx(
    x: jax.Array,
    qfn,
    axes: Union[int, Tuple[int, ...]],
    block_size: int,
    quant_max: float,
    force_scale_power_of_two: bool = False,
    scale_qfn=None,
) -> Tuple[jax.Array, jax.Array]:
    """Blockwise-scale quantization: returns ``(scale, quantized)``."""
    scale = calculate_mx_qparam(
        x, tuple(normalize_axes(axes, x.ndim)), block_size, quant_max,
        force_scale_power_of_two, scale_qfn,
    )
    q = quantize(x, scale, None, axes, block_size, qfn)
    return scale, q


def _decode_and_rescale(
    x: jax.Array,
    scale: Optional[jax.Array],
    codebook: Optional[jax.Array],
    block_size: Optional[int],
) -> jax.Array:
    if codebook is not None:
        x = jnp.take(codebook, x.astype(jnp.int32), axis=0).astype(x.dtype)
    if scale is not None:
        x = x * expand_scale(scale, x.shape, block_size)
    return x


def linear_mx(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    input_scale: Optional[jax.Array] = None,
    weight_scale: Optional[jax.Array] = None,
    block_size: Optional[int] = None,
    input_codebook: Optional[jax.Array] = None,
    weight_codebook: Optional[jax.Array] = None,
) -> jax.Array:
    """Dequantize-then-linear (reference: decomposed.py:304-333).

    ``weight`` follows torch's (out, in) layout.  On TPU this decomposed form
    exists for correctness checks; the production path fuses the decode into
    the matmul (ops/pallas/dequant_matmul.py).
    """
    x = _decode_and_rescale(x, input_scale, input_codebook, block_size)
    w = _decode_and_rescale(weight, weight_scale, weight_codebook, block_size)
    out = jnp.matmul(x, w.T)
    if bias is not None:
        out = out + bias
    return out


def matmul_mx(
    a: jax.Array,
    b: jax.Array,
    *,
    input_scale: Optional[jax.Array] = None,
    weight_scale: Optional[jax.Array] = None,
    block_size: Optional[int] = None,
    input_codebook: Optional[jax.Array] = None,
    weight_codebook: Optional[jax.Array] = None,
) -> jax.Array:
    """Dequantize-then-matmul (reference: decomposed.py:336-363)."""
    a = _decode_and_rescale(a, input_scale, input_codebook, block_size)
    b = _decode_and_rescale(b, weight_scale, weight_codebook, block_size)
    return jnp.matmul(a, b)


def conv2d_mx(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
    *,
    input_scale: Optional[jax.Array] = None,
    weight_scale: Optional[jax.Array] = None,
    block_size: Optional[int] = None,
    input_codebook: Optional[jax.Array] = None,
    weight_codebook: Optional[jax.Array] = None,
) -> jax.Array:
    """Dequantize-then-conv2d, NCHW/OIHW layouts like the reference
    (decomposed.py:265-301)."""
    x = _decode_and_rescale(x, input_scale, input_codebook, block_size)
    w = _decode_and_rescale(weight, weight_scale, weight_codebook, block_size)

    def _pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    stride, padding, dilation = _pair(stride), _pair(padding), _pair(dilation)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def filter_outlier(
    x: jax.Array, threshold: float
) -> Tuple[jax.Array, jax.Array]:
    """Split a tensor into (inlier, outlier) parts at |x| > threshold.

    The reference converts outliers to CSR on the host and multiplies with a
    scalar loop (decomposed.py:451-561).  On TPU the outlier tensor stays
    dense — at the <=5% densities this feature targets, a dense MXU matmul
    beats any gather-based sparse form, and XLA fuses the masking for free.
    ``to_csr`` below provides the storage/export format.
    """
    is_outlier = jnp.abs(x) > threshold
    inlier = jnp.where(is_outlier, jnp.zeros_like(x), x)
    outlier = jnp.where(is_outlier, x, jnp.zeros_like(x))
    return inlier, outlier


def outlier_matmul(
    outlier: jax.Array,
    b: jax.Array,
    b_scale: Optional[jax.Array] = None,
    b_codebook: Optional[jax.Array] = None,
    block_size: Optional[int] = None,
    weight_transposed: bool = False,
) -> jax.Array:
    """Residual matmul for the outlier part (reference spmm_csr semantics,
    decomposed.py:513-561, computed dense)."""
    b = _decode_and_rescale(b, b_scale, b_codebook, block_size)
    if weight_transposed:
        b = b.T
    out2d = jnp.matmul(outlier.reshape(-1, outlier.shape[-1]), b)
    return out2d.reshape(outlier.shape[:-1] + (b.shape[-1],))


def to_csr(dense, max_nnz: int):
    """Host-side CSR packing of an outlier tensor (export format parity with
    reference decomposed.py:451-487).  Returns (data, indices, indptr) padded
    to ``max_nnz``; numpy in, numpy out."""
    import numpy as np

    arr = np.asarray(dense, dtype=np.float32).reshape(-1, dense.shape[-1])
    rows, _ = arr.shape
    r, c = np.nonzero(arr)
    data = arr[r, c]
    nnz = data.size
    indptr = np.zeros(rows + 1, dtype=np.int32)
    np.add.at(indptr, r + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)

    actual = min(nnz, max_nnz)
    data_p = np.zeros(max_nnz, dtype=arr.dtype)
    idx_p = np.zeros(max_nnz, dtype=np.int32)
    data_p[:actual] = data[:actual]
    idx_p[:actual] = c[:actual]
    # When nnz > max_nnz the tail is truncated; clamp indptr so row pointers
    # never index past the padded data/indices arrays.
    indptr = np.minimum(indptr, actual).astype(np.int32)
    return data_p, idx_p, indptr
