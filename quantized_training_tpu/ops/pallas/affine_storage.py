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
``uint{n},qs=group_wise_affine,bs=G,ax=0`` fake-quant bit-for-bit (the packed
codes + qparams reproduce it exactly; the kernel's in-VMEM rescale is within
1-2 bf16 ulp of the dequantized dense matmul).

Layout: *int32 words, consecutive along K*.  Word ``r`` of column ``n`` holds
the uintN codes of original rows ``r*per + p`` (p = 0..per-1, per =
32/nbits) in bit field p.  The VPU unpack is therefore constant int32
shifts + masks on natively-32-bit lanes — no int8 loads and no
int8->int32 relayouts, which Mosaic lowers as expensive sublane shuffles
(the previous int8 plane-packed layout measured ~5x slower than its own
byte bound on chip because of exactly that).  Each bit-field p is a strided
K-slice whose matching activation columns are pre-split outside the kernel
into a contiguous ``(per, M, K/per)`` operand; the kernel issues one MXU dot
per field and accumulates.

The zero-point never touches the per-element path: codes are stored
*centered* (c' = c - 2^{nbits-1}, sign-extended on unpack by a shift-left /
arithmetic-shift-right pair), and since

    y = x @ ((c - zp) * sf)  =  x @ (c' * sf)  -  xsum_g @ ((zp - mid) sf)_g

with ``xsum_g[m] = sum_{k in group g} x[m, k]``, the kernel multiplies
sign-extended codes by the (repeated) scale only — two shifts, convert, mul,
one bf16 cast per code — and subtracts the per-group correction with one
extra tiny MXU dot per K step.  Centering keeps ``|c' * sf|`` at the true
weight magnitude, so the in-kernel bf16 rounding matches the dequantized
dense matmul's.  Words never straddle groups (``group_size`` must be a
multiple of ``32/nbits``).
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
           "affine_spec", "expand_w2_words_to_w4"]


def expand_w2_words_to_w4(packed2: jax.Array) -> jax.Array:
    """(K/16, N) int32 w2 words -> (K/8, N) int32 w4 words holding the SAME
    centered w2 code values in 4-bit two's-complement fields.

    w2 word r covers original rows r*16 + p; rows p < 8 land in w4 word 2r
    field p, rows p >= 8 in word 2r+1 field p-8 — a pure per-word bit op.
    The r05 on-chip race (BENCH_W2X_r05) measured the w4-layout form
    1.7-2.1x faster than the direct w2 kernel at identical numerics (w2 is
    VPU-issue-bound: per-code instruction work is constant while bytes
    halve), so when the 2x storage fits, w2-valued models should ship in
    this layout (storage format "w2x4").  The consumer is the ordinary
    nbits=4 ``affine_matmul`` with zero-points pre-shifted by +6 so its
    mid-16 correction equals the original mid-2 one:
    (zp + 6 - 8) * sf == (zp - 2) * sf.
    """
    kp2, N = packed2.shape
    even = jnp.zeros((kp2, N), jnp.int32)
    odd = jnp.zeros((kp2, N), jnp.int32)
    for p in range(8):
        c_lo = (packed2 << (32 - 2 * (p + 1))) >> 30       # rows p
        c_hi = (packed2 << (32 - 2 * (p + 9))) >> 30       # rows p + 8
        even = even | ((c_lo & 0xF) << (4 * p))
        odd = odd | ((c_hi & 0xF) << (4 * p))
    return jnp.stack([even, odd], axis=1).reshape(kp2 * 2, N)


def affine_spec(nbits: int, group_size: int) -> QuantizationSpec:
    """The fake-quant spec this storage format realizes exactly."""
    return QuantizationSpec.from_str(
        f"uint{nbits},qs=group_wise_affine,bs={group_size},ax=0"
    )


def pack_affine_weights(
    w: jax.Array, nbits: int = 4, group_size: int = 128
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Offline: (K, N) weights -> packed int32 words + per-group qparams.

    Returns ``(packed, sf, zp)``:

    - ``packed``: int32, shape (K/per, N), per = 32 // nbits; bit field p of
      word (r, n) is the *centered* code ``c - 2^(nbits-1)`` of
      ``w[r*per + p, n]``, stored as an nbits-wide two's-complement field.
    - ``sf`` / ``zp``: float32, shape (K/group_size, N) — the group scale /
      zero point (group g = original rows [g*G, (g+1)*G), all of which live
      in whole words because per divides G).

    Quantization runs in float32 (like ``pack_mx_weights``): dequantized
    codes reproduce ``fake_quantize(w.astype(float32), affine_spec(...))``
    bit-for-bit (qparams come from the same ``_group_affine_qparams``; a
    bf16 *input* spec path would instead round qparams per-op in bf16 and
    wobble by 1 ulp).
    """
    w = w.astype(jnp.float32)
    K, N = w.shape
    per = 32 // nbits
    if group_size % per or K % group_size:
        raise ValueError(
            f"need group_size % (32/nbits)=={per} == 0 and K % group_size "
            f"== 0 (words must not straddle groups); got K={K}, "
            f"group_size={group_size}, nbits={nbits}"
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
    per = 32 // nbits
    if group_size % per or K % group_size:
        raise ValueError(
            f"need group_size % {per} == 0 and K % group_size == 0; got "
            f"K={K}, group_size={group_size}, nbits={nbits}"
        )
    kp = K // per
    mask = (1 << nbits) - 1
    mid = 1 << (nbits - 1)
    fields = (jnp.asarray(codes, jnp.int32) - mid) & mask  # centered, 2's-c
    fields = fields.reshape(kp, per, N)
    packed = jnp.zeros((kp, N), jnp.int32)
    for p in range(per):
        packed = packed | (fields[:, p] << (nbits * p))
    return packed, jnp.asarray(sf, jnp.float32), jnp.asarray(zp, jnp.float32)


def _dequant_planes(packed, sf, zp, nbits, group_size):
    """Full dequant (fallback path): (K/per, N) int32 words -> (K, N) f32.

    Bit-for-bit the ``affine_spec`` fake-quant of the packed weights
    ((c - zp) * sf per element, f32 qparams).
    """
    per = 32 // nbits
    kp, N = packed.shape
    mid = 1 << (nbits - 1)
    cs = [(packed << (32 - nbits * (p + 1))) >> (32 - nbits)
          for p in range(per)]                       # sign-extended centered
    c = (jnp.stack(cs, axis=1).reshape(kp * per, N).astype(jnp.float32)
         + mid)
    sfe = expand_scale(sf, c.shape, group_size)
    zpe = expand_scale(zp, c.shape, group_size)
    return (c - zpe) * sfe


def _dequant_kernel(w_ref, s_ref, z_ref, o_ref, *, nbits: int, gwords: int,
                    per: int, bk: int):
    """Streaming dequant: (bk, bn) int32 words -> (per*bk, bn) bf16,
    PLANE-MAJOR row order (plane p occupies sublanes [p*bk, (p+1)*bk)) —
    each plane lands as one contiguous sublane range, so the kernel is pure
    stream: unpack-shift pair, add (mid - zp), scale, one contiguous store.
    Values are bit-identical to :func:`_dequant_planes` (same f32 math,
    same single bf16 rounding)."""
    u = w_ref[:]
    sfe = jnp.repeat(s_ref[:], gwords, axis=0).astype(jnp.float32)
    zpe = jnp.repeat(z_ref[:], gwords, axis=0).astype(jnp.float32)
    mid = 1 << (nbits - 1)
    for p in range(per):
        c = ((u << (32 - nbits * (p + 1)))
             >> (32 - nbits)).astype(jnp.float32) + mid
        o_ref[p * bk:(p + 1) * bk, :] = ((c - zpe) * sfe).astype(o_ref.dtype)


def dequant_planes_tpu(packed, sf, zp, nbits, group_size, *,
                       out_dtype=jnp.bfloat16, interpret=False):
    """Pallas dequant of the packed layout -> (K, N) bf16 in PLANE-MAJOR row
    order: output row ``p * (K/per) + r`` is original row ``r * per + p``.
    A matching activation permutation (``x.reshape(M, kp, per)``
    ``.transpose(0, 2, 1).reshape(M, K)``) makes ``x_pm @ w_pm`` equal the
    original product up to f32 summation order.

    Exists for the fallback shapes the block picker rejects (e.g. LLaMA's
    down-projection K=11008 = 2^8 * 43: no block_k is both a multiple of
    8*gwords and a proper divisor of K/per, so the in-kernel-dequant matmul
    cannot tile it): the XLA unpack in ``_dequant_planes`` measured 2.9x
    slower than this stream at (2048, 11008, 4096) on chip (0.32 vs ~0.85
    MFU end-to-end)."""
    kp, N = packed.shape
    per = 32 // nbits
    gwords = group_size // per
    sg = kp // gwords
    # N blocks only (full-K stripes): output stripe is (K, bn).  Mosaic
    # requires the lane (last) block dim be a multiple of 128 or the full
    # array dim, so pick the largest such divisor of N within the VMEM
    # budget (halving alone can land on e.g. 5120 -> 320 -> 160, which is
    # neither — the 13B w2a16 down-projection shape).
    budget = 12 * 1024 * 1024
    cands = [N] + [b for b in range(128, N, 128) if N % b == 0]
    fit = [b for b in cands
           if (kp * b * 4 + per * kp * b * 2) * 2 <= budget]
    bn = max(fit) if fit else min(cands)
    grid = (N // bn,)
    kernel = functools.partial(_dequant_kernel, nbits=nbits, gwords=gwords,
                               per=per, bk=kp)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp, bn), lambda j: (0, j)),
            pl.BlockSpec((sg, bn), lambda j: (0, j)),
            pl.BlockSpec((sg, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((per * kp, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((per * kp, N), out_dtype),
        interpret=bool(interpret),
    )(packed, sf, zp)


def _plane_major_x(x, kp, per):
    """Permute activation columns to match ``dequant_planes_tpu``'s row
    order (column p*kp + r multiplies original row r*per + p)."""
    M = x.shape[0]
    return x.reshape(M, kp, per).transpose(0, 2, 1).reshape(M, kp * per)


def _kernel(x_ref, w_ref, s_ref, zs_ref, xs_ref, o_ref, acc_ref, *, nk: int,
            nbits: int, gwords: int, per: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = w_ref[:]                                     # (bk, bn) int32 words
    sfe = jnp.repeat(s_ref[:], gwords, axis=0)       # (bk, bn) f32
    acc = acc_ref[:]
    for p in range(per):
        c = ((u << (32 - nbits * (p + 1)))
             >> (32 - nbits)).astype(jnp.float32)    # sign-extended centered
        w = (c * sfe).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(
            x_ref[p], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # zero-point correction: xsum_g @ (zp*sf)_g for this K step's groups
    acc -= jax.lax.dot_general(
        xs_ref[:], zs_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def affine_matmul(
    x: jax.Array,
    packed: jax.Array,
    sf: jax.Array,
    zp: jax.Array,
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
    """y = x @ dequant(packed); packed (K/per, N) int32, qparams (K/G, N).

    ``block_k`` counts *packed* words (original-K rows / per).  Blocks
    default to the VMEM-budget picker; indivisible shapes fall back to an
    XLA dequant + dot with identical numerics.  Off-TPU the fallback is also
    the default (the Pallas interpreter is test-only) — ``force_kernel=True``
    runs the kernel body under the interpreter anyway, which is how the
    word-unpack/rescale/zp-correction math is covered by the CPU test suite.
    """
    M, K = x.shape
    per = 32 // nbits
    kp, N = packed.shape
    assert kp * per == K, (packed.shape, x.shape, nbits)
    gwords = group_size // per            # words per qparam group
    out_dtype = out_dtype or x.dtype

    interpret = resolve_interpret(interpret)

    if block_m is None or block_n is None or block_k is None:
        from .autotune import storage_matmul_blocks
        # x operand is (per, M, kp): per activation planes per K step; the
        # f32 scale+zp·sf tiles add 8/(4*gwords) bytes per packed-code byte
        picked = storage_matmul_blocks(
            M, kp, N, code_bytes=4, scale_block=gwords, x_factor=per,
            scale_bytes_per_code=2.0 / gwords)
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
            or block_k % gwords or (interpret and not force_kernel)):
        if not interpret:
            # On TPU, the fallback's dequant runs as a Pallas stream into a
            # plane-major bf16 weight + a dense MXU dot on plane-major-
            # permuted activations (same products, permuted f32 summation
            # order).  The pure-XLA unpack below measured 2.9x slower on
            # chip at the shapes that land here (see dequant_planes_tpu).
            w_pm = dequant_planes_tpu(packed, sf, zp, nbits, group_size,
                                      out_dtype=x.dtype)
            x_pm = _plane_major_x(x, kp, per)
            return jnp.dot(x_pm, w_pm,
                           preferred_element_type=jnp.float32).astype(
                out_dtype)
        w = _dequant_planes(packed, sf, zp, nbits, group_size).astype(x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            out_dtype)

    # bit field p of word r is original row r*per + p
    x_planes = x.reshape(M, kp, per).transpose(2, 0, 1)   # (per, M, kp)
    # per-group activation row-sums for the zero-point correction, stored
    # transposed so the (sb, bm) tile is Mosaic-legal (sb on sublanes)
    xsum_t = (x.astype(jnp.float32)
               .reshape(M, K // group_size, group_size).sum(-1).T)
    zs = (zp - (1 << (nbits - 1))) * sf                   # (K/G, N) f32

    nk = kp // block_k
    grid = (M // block_m, N // block_n, nk)
    kernel = functools.partial(_kernel, nk=nk, nbits=nbits,
                               gwords=gwords, per=per)

    sb = block_k // gwords
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((per, block_m, block_k), lambda i, j, k: (0, i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, block_m), lambda i, j, k: (k, i)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(x_planes, packed, sf, zs, xsum_t)
