"""Group-affine quantized weight storage (W4A16 / W2A16): weights live in
HBM as bit-packed uintN codes + per-group scale/zero-point, dequantized to
bf16 tiles in VMEM inside the matmul kernel.

This extends the weight-storage family (mx_storage.py: int8 symmetric
microscaling, 2x byte win; posit_storage.py: exact posit8, capacity) to the
asymmetric sub-byte formats the serving world standardized on (AWQ/GPTQ-class
W4 layouts; the reference expresses the same numerics as
``uint4,qs=group_wise_affine`` — reference fake_quantize.py:150-180 via
quantizer.py group_wise_affine specs, test_codegen.py llm_kivi uses the uint2
variant for the KV cache).  uint4 streams 4x fewer weight bytes than bf16,
uint2 8x fewer, so weight-bandwidth-bound GEMMs (decode, small batch) gain up
to the byte ratio while the dequantized values match the framework's
``uint{n},qs=group_wise_affine,bs=G,ax=0`` fake-quant bit-for-bit.

Layout: *plane-packed along K*.  One packed byte at row ``r`` holds the codes
for original rows ``r + p*(K/per)`` (p = 0..per-1, per = 8/nbits) in bit
field p.  Unpacking is therefore constant shifts + masks (no sublane
interleave, which Mosaic handles poorly), and each plane is a contiguous
K-range whose matching activation columns are passed as a pre-split
``(per, M, K/per)`` operand — the kernel issues one MXU dot per plane and
accumulates.  Groups never straddle planes (``group_size * per`` must divide
K).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import resolve_interpret

from ...numerics.bitutils import clamp_keep_zero_sign, materialize_rounding
from ...qspec import QuantizationSpec
from ...quantize.fake_quant import _group_affine_qparams
from ...quantize.ops import expand_scale

__all__ = ["pack_affine_weights", "plane_pack", "affine_matmul",
           "affine_spec"]


def affine_spec(nbits: int, group_size: int) -> QuantizationSpec:
    """The fake-quant spec this storage format realizes exactly."""
    return QuantizationSpec.from_str(
        f"uint{nbits},qs=group_wise_affine,bs={group_size},ax=0"
    )


def pack_affine_weights(
    w: jax.Array, nbits: int = 4, group_size: int = 128
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Offline: (K, N) weights -> plane-packed codes + per-group qparams.

    Returns ``(packed, sf_planes, zp_planes)``:

    - ``packed``: int8, shape (K/per, N), per = 8 // nbits; bit field p of
      byte (r, n) is the uintN code of ``w[r + p*K/per, n]``.
    - ``sf_planes`` / ``zp_planes``: float32, shape (per, K/(per*G), N) —
      the group scale / zero point, split per plane so kernel tiles index
      them with the same K-grid coordinate as the codes.

    Quantization runs in float32 (like ``pack_mx_weights``): dequantized
    codes reproduce ``fake_quantize(w.astype(float32), affine_spec(...))``
    bit-for-bit (qparams come from the same ``_group_affine_qparams``; a
    bf16 *input* spec path would instead round qparams per-op in bf16 and
    wobble by 1 ulp).
    """
    w = w.astype(jnp.float32)
    K, N = w.shape
    per = 8 // nbits
    if K % (per * group_size):
        raise ValueError(
            f"K={K} must be a multiple of per*group_size="
            f"{per * group_size} (groups must not straddle planes)"
        )
    spec = affine_spec(nbits, group_size)
    sf, zp = _group_affine_qparams(w, spec)          # (K/G, N)
    sfe = expand_scale(sf, w.shape, group_size)
    zpe = expand_scale(zp, w.shape, group_size)
    codes = clamp_keep_zero_sign(
        jnp.round(materialize_rounding(w / sfe + zpe)),
        spec.quant_min, spec.quant_max,
    ).astype(jnp.int32)                               # (K, N), 0..2^nbits-1

    return plane_pack(codes, sf, zp, nbits, group_size)


def plane_pack(
    codes: jax.Array, sf: jax.Array, zp: jax.Array,
    nbits: int, group_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pack pre-computed uintN codes + group qparams into the kernel layout.

    ``codes``: (K, N) integer codes in [0, 2^nbits); ``sf``/``zp``:
    (K/group_size, N) group qparams.  Shared by :func:`pack_affine_weights`
    (RTN) and the GPTQ path (quantize/gptq.py), whose codes come from
    error-compensated rounding rather than round-to-nearest of the raw
    weight, but land in the identical storage layout.
    """
    K, N = codes.shape
    per = 8 // nbits
    kp = K // per
    planes = jnp.asarray(codes, jnp.int32).reshape(per, kp, N)
    packed = jnp.zeros((kp, N), jnp.int32)
    for p in range(per):
        packed = packed | (planes[p] << (nbits * p))
    packed = packed.astype(jnp.int8)                  # bit pattern mod 256

    gp = kp // group_size
    sf_planes = jnp.asarray(sf, jnp.float32).reshape(per, gp, N)
    zp_planes = jnp.asarray(zp, jnp.float32).reshape(per, gp, N)
    return packed, sf_planes, zp_planes


def _dequant_planes(packed, sf_planes, zp_planes, nbits, group_size, per):
    """Full dequant (fallback path): (K/per, N) packed -> (K, N) f32."""
    u = packed.astype(jnp.int32) & 0xFF
    mask = (1 << nbits) - 1
    ws = []
    for p in range(per):
        c = ((u >> (nbits * p)) & mask).astype(jnp.float32)
        sfe = jnp.repeat(sf_planes[p], group_size, axis=0)
        zpe = jnp.repeat(zp_planes[p], group_size, axis=0)
        ws.append((c - zpe) * sfe)
    return jnp.concatenate(ws, axis=0)


def _kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, nk: int,
            nbits: int, group_size: int, per: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = w_ref[:].astype(jnp.int32) & 0xFF
    mask = (1 << nbits) - 1
    for p in range(per):
        c = ((u >> (nbits * p)) & mask).astype(jnp.float32)
        sfe = jnp.repeat(s_ref[p], group_size, axis=0)
        zpe = jnp.repeat(z_ref[p], group_size, axis=0)
        w = ((c - zpe) * sfe).astype(jnp.bfloat16)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[p], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def affine_matmul(
    x: jax.Array,
    packed: jax.Array,
    sf_planes: jax.Array,
    zp_planes: jax.Array,
    *,
    nbits: int = 4,
    group_size: int = 128,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
    force_kernel: bool = False,
) -> jax.Array:
    """y = x @ dequant(packed); packed (K/per, N), qparams (per, K/(per*G), N).

    ``block_k`` counts *packed* rows (original-K rows / per).  Blocks default
    to the VMEM-budget picker; indivisible shapes fall back to an XLA
    dequant + dot with identical numerics.  Off-TPU the fallback is also the
    default (the Pallas interpreter is test-only) — ``force_kernel=True``
    runs the kernel body under the interpreter anyway, which is how the
    plane-unpack/rescale math is covered by the CPU test suite.
    """
    M, K = x.shape
    per = 8 // nbits
    kp, N = packed.shape
    assert kp * per == K, (packed.shape, x.shape, nbits)
    out_dtype = out_dtype or x.dtype

    interpret = resolve_interpret(interpret)

    if block_m is None or block_n is None or block_k is None:
        from .autotune import storage_matmul_blocks
        # x operand is (per, M, kp): per activation planes per K step; the
        # two f32 qparam tiles add 8*per/G bytes per packed-code byte
        picked = storage_matmul_blocks(
            M, kp, N, code_bytes=1, scale_block=group_size, x_factor=per,
            scale_bytes_per_code=8.0 * per / group_size)
        if picked is not None:
            bm, bk, bn = picked
            block_m = block_m or bm
            block_k = block_k or bk
            block_n = block_n or bn
        else:
            block_m = block_n = block_k = 1  # force fallback below

    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, kp)
    if (M % block_m or N % block_n or kp % block_k
            or block_k % group_size or (interpret and not force_kernel)):
        w = _dequant_planes(packed, sf_planes, zp_planes, nbits, group_size,
                            per).astype(x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            out_dtype)

    x_planes = jnp.stack(jnp.split(x, per, axis=1))   # (per, M, K/per)

    nk = kp // block_k
    grid = (M // block_m, N // block_n, nk)
    kernel = functools.partial(_kernel, nk=nk, nbits=nbits,
                               group_size=group_size, per=per)

    sb = block_k // group_size
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((per, block_m, block_k), lambda i, j, k: (0, i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((per, sb, block_n), lambda i, j, k: (0, k, j)),
            pl.BlockSpec((per, sb, block_n), lambda i, j, k: (0, k, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(x_planes, packed, sf_planes, zp_planes)
