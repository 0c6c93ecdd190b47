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

    # f32 vector divides run at a fraction of VPU mul rate: divide by the
    # per-block scale via reciprocal multiply (1 scalar-column divide per
    # block row instead of a per-element divide; quantize codes can differ
    # by 1 step from the XLA path, inside the test's existing tolerance),
    # and hoist the scalar bias corrections into multipliers.
    u_ref[:] = (m * (1.0 / bc1)) / (jnp.sqrt(v * (1.0 / bc2)) + eps)

    absmax = jnp.max(jnp.abs(m), axis=1, keepdims=True)
    ms = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    mco_ref[:] = jnp.clip(jnp.round(m * (1.0 / ms)), -127, 127).astype(
        jnp.int8)
    mso_ref[:] = ms

    vroot = jnp.sqrt(v)
    vmax = jnp.max(vroot, axis=1, keepdims=True)
    vs = jnp.where(vmax > 0, vmax / 255.0, 1.0)
    vco_ref[:] = jnp.clip(jnp.round(vroot * (1.0 / vs)), 0, 255).astype(
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


# ---------------------------------------------------------------------------
# int32-word-packed variant: the kernel above still ran at only ~200 GB/s
# (12 B/element) — Mosaic lowers 8-bit lane converts as sublane shuffles,
# the same pathology the affine weight storage and the KIVI cache hit.  The
# fix is the same: pack 4 codes per int32 word so pack/unpack are
# shift-left / (arithmetic-)shift-right pairs on natively-32-bit lanes.
#
# Packed layout (TILE_ROWS = 512 block rows per grid tile): within a tile of
# 512 (rows) x 256 (lanes) moment elements, the int32 word at (r, l) of the
# tile's (128, 256) word block holds the codes of tile rows p*128 + r
# (p = 0..3) in byte field p.  Rows never mix across tiles, so a grid
# step's word block maps to exactly one (512, 256) slab of gradient rows
# and the per-row block scales stay aligned.  m codes are signed int8
# fields (sign-extending unpack); v codes are uint8 fields of sqrt(v)
# (masked unpack).  Total state bytes are unchanged (4 codes/word); leaves
# whose row count is not a multiple of 512 keep the unpacked state and the
# kernel above (training/optim8bit.py discriminates by code dtype).
# ---------------------------------------------------------------------------

TILE_ROWS = 512
_PLANES = 4
_PR = TILE_ROWS // _PLANES   # word rows per tile
_SR = 8                      # scale rows per tile (2 used, 6 pad: Mosaic
                             # blocks need sublane counts divisible by 8)


def packable_rows(nb: int) -> bool:
    return nb % TILE_ROWS == 0


def pack_scale_rows(scale: jax.Array) -> jax.Array:
    """(nb,) per-block-row f32 scales -> (nb/64, 256) tiled lane-wide
    layout: tile t's 512 scales occupy rows [t*8, t*8+2) flattened
    row-major; rows t*8+2..t*8+8 are zero pad.  The fused kernel's scale
    DMAs were the dominant cost in its narrow (rows, 1) form: a pure-copy
    kernel ran 8.11 ms with them vs 4.92 ms without (the platform's
    pallas read+write copy ceiling measures ~324 GB/s), because 1-lane
    blocks issue strided 4-byte transfers."""
    nb = scale.shape[0]
    assert packable_rows(nb), scale.shape
    nt = nb // TILE_ROWS
    s = scale.reshape(nt, 2, BLOCK)
    return jnp.pad(s, ((0, 0), (0, _SR - 2), (0, 0))).reshape(
        nt * _SR, BLOCK)


def unpack_scale_rows(tiled: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_scale_rows` -> (nb,) f32."""
    nt = tiled.shape[0] // _SR
    return tiled.reshape(nt, _SR, BLOCK)[:, :2].reshape(-1)


def pack_moment_rows(codes: jax.Array) -> jax.Array:
    """(nb, 256) int codes (int8 range or uint8 range) -> (nb/4, 256) int32
    words, tile-local planes.  XLA-side reference pack (state init / CPU
    path / tests): field p of word (t*128 + r, l) is code
    (t*512 + p*128 + r, l) & 0xFF."""
    nb, blk = codes.shape
    assert blk == BLOCK and packable_rows(nb), codes.shape
    c = jnp.asarray(codes, jnp.int32) & 0xFF
    tiles = c.reshape(nb // TILE_ROWS, _PLANES, _PR, BLOCK)
    shifts = (jnp.arange(_PLANES, dtype=jnp.int32) * 8).reshape(1, 4, 1, 1)
    return jnp.sum(tiles << shifts, axis=1).reshape(nb // _PLANES, BLOCK)


def unpack_moment_rows(words: jax.Array, signed: bool) -> jax.Array:
    """Inverse of :func:`pack_moment_rows`; int32 codes (sign- or
    zero-extended per ``signed``)."""
    nw, blk = words.shape
    nb = nw * _PLANES
    w = words.reshape(nw // _PR, 1, _PR, BLOCK)
    sh = (jnp.arange(_PLANES, dtype=jnp.int32) * 8).reshape(1, 4, 1, 1)
    if signed:
        planes = (w << (24 - sh)) >> 24
    else:
        planes = (w >> sh) & 0xFF
    return planes.reshape(nb, BLOCK)


def _packed_kernel(bc_ref, g_ref, mw_ref, ms_ref, vw_ref, vs_ref,
                   u_ref, mwo_ref, mso_ref, vwo_ref, vso_ref,
                   *, b1: float, b2: float, eps: float):
    inv_bc1 = 1.0 / bc_ref[0, 0]
    inv_bc2 = 1.0 / bc_ref[0, 1]
    mw = mw_ref[:]                                  # (128, 256) int32
    vw = vw_ref[:]
    # scales arrive lane-wide ((8, 256) block, 2 rows used) and relayout
    # in-register to one scale per moment row.  Mosaic supports the
    # (1, N) -> (N, 1) shape cast but not (2, 256) -> (512, 1) directly
    # (verified on chip), so each row casts separately and the columns
    # concatenate on sublanes.
    def _col(ref):
        return jnp.concatenate(
            [ref[r:r + 1, :].reshape(BLOCK, 1) for r in range(2)], axis=0)
    ms_all = _col(ms_ref)
    vs_all = _col(vs_ref)
    mso_rows = []
    vso_rows = []

    mwo = jnp.zeros_like(mw)
    vwo = jnp.zeros_like(vw)
    for p in range(_PLANES):
        sl = slice(p * _PR, (p + 1) * _PR)
        g = g_ref[sl, :]
        # unpack: shl/asr (sign-extend, m) / shr+mask (zero-extend, v) on
        # 32-bit lanes — no 8-bit converts, no sublane shuffles
        mc = ((mw << (24 - 8 * p)) >> 24).astype(jnp.float32)
        vc = ((vw >> (8 * p)) & 0xFF).astype(jnp.float32)
        m = b1 * (mc * ms_all[sl, :]) + (1.0 - b1) * g
        root = vc * vs_all[sl, :]
        v = b2 * (root * root) + (1.0 - b2) * (g * g)

        u_ref[sl, :] = (m * inv_bc1) / (jnp.sqrt(v * inv_bc2) + eps)

        absmax = jnp.max(jnp.abs(m), axis=1, keepdims=True)
        ms = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        mso_rows.append(ms)
        mcq = jnp.clip(jnp.round(m * (1.0 / ms)), -127, 127).astype(
            jnp.int32)
        mwo = mwo | ((mcq & 0xFF) << (8 * p))

        vroot = jnp.sqrt(v)
        vmax = jnp.max(vroot, axis=1, keepdims=True)
        vs = jnp.where(vmax > 0, vmax / 255.0, 1.0)
        vso_rows.append(vs)
        vcq = jnp.clip(jnp.round(vroot * (1.0 / vs)), 0, 255).astype(
            jnp.int32)
        vwo = vwo | (vcq << (8 * p))
    mwo_ref[:] = mwo
    vwo_ref[:] = vwo
    # write scales back in the tiled lane-wide layout: per 256-row chunk,
    # the (256, 1) column casts to one (1, 256) lane row (the inverse of
    # the read-side pattern)
    def _rows(cols):
        col = jnp.concatenate(cols, axis=0)          # (512, 1)
        return jnp.concatenate(
            [col[r * BLOCK:(r + 1) * BLOCK, :].reshape(1, BLOCK)
             for r in range(2)], axis=0)             # (2, 256)
    mso_ref[0:2, :] = _rows(mso_rows)
    mso_ref[2:_SR, :] = jnp.zeros((_SR - 2, BLOCK), jnp.float32)
    vso_ref[0:2, :] = _rows(vso_rows)
    vso_ref[2:_SR, :] = jnp.zeros((_SR - 2, BLOCK), jnp.float32)


def fused_adam8bit_update_packed(
    g2d: jax.Array,          # (nb, 256) f32 flat gradient, nb % 512 == 0
    m_words: jax.Array,      # (nb/4, 256) int32
    m_scale: jax.Array,      # (nb/64, 256) f32, pack_scale_rows layout
    v_words: jax.Array,      # (nb/4, 256) int32
    v_scale: jax.Array,      # (nb/64, 256) f32, pack_scale_rows layout
    bc1: jax.Array,          # scalar f32 bias correction 1 - b1^t
    bc2: jax.Array,
    *,
    b1: float,
    b2: float,
    eps: float,
    interpret=None,
):
    """One fused Adam step on int32-word-packed 8-bit moments with
    lane-wide tiled scales.

    Returns ``(update, new_m_words, new_m_scale, new_v_words,
    new_v_scale)``; scales stay in the :func:`pack_scale_rows` layout."""
    nb, blk = g2d.shape
    assert blk == BLOCK and packable_rows(nb), (g2d.shape,)
    nw = nb // _PLANES
    ns = (nb // TILE_ROWS) * _SR
    assert m_scale.shape == (ns, BLOCK), (m_scale.shape, ns)
    interpret = resolve_interpret(interpret)

    kernel = functools.partial(_packed_kernel, b1=b1, b2=b2, eps=eps)
    bc = jnp.stack([bc1.astype(jnp.float32),
                    bc2.astype(jnp.float32)]).reshape(1, 2)

    u, mw, ms, vw, vs = pl.pallas_call(
        kernel,
        grid=(nb // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_ROWS, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_PR, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_SR, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_PR, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_SR, BLOCK), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_ROWS, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_PR, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_SR, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_PR, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((_SR, BLOCK), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nw, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((ns, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((nw, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((ns, BLOCK), jnp.float32),
        ],
        interpret=bool(interpret),
    )(bc, g2d, m_words, m_scale, v_words, v_scale)
    return u, mw, ms, vw, vs
