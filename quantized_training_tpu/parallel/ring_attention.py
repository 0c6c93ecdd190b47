"""Ring (sequence-parallel) attention over the device mesh.

Long-context north star (SURVEY §2.5/§7.8; no reference counterpart — the
reference is single-host eager).  Q/K/V are sharded along the sequence axis;
each device keeps its Q shard resident and the K/V shards rotate around the
ring via ``lax.ppermute`` (ICI neighbor exchange), one hop per step, while a
flash-style online softmax accumulates partial results — the full attention
matrix never exists anywhere.

Composition with the quantized cache: with ``kv_spec`` set, each device
group-quantizes its K/V shard once (KIVI layout: K along tokens, V along
features) and the ring rotates the *codes + scales* instead of bf16 tensors
— int8 codes, plane-packed sub-byte for uint4/uint2, so the payload is
4-8x fewer bytes than bf16 — with unpack + dequantize-on-arrival in
VMEM-resident compute.  Scores are exact w.r.t. the dequantized values (the
same values a KIVI cache would serve).

All devices execute the same ``n_shards`` steps (static loop) so the program
is identical across the mesh; causal masking is positional, derived from
``axis_index``.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..qspec import QuantizationSpec
from ..quantize.ops import expand_scale

__all__ = ["ring_attention", "ring_attention_reference",
           "group_quantize_payload", "dequantize_payload"]

NEG_INF = -1e30


def _payload_nbits(spec: QuantizationSpec) -> int:
    """Code width for the rotating payload; sub-byte packing needs unsigned
    2/4-bit codes, everything else ships one int8 byte per code."""
    if spec.quant_min == 0 and spec.quant_max in (3.0, 15.0):
        return 2 if spec.quant_max == 3.0 else 4
    return 8


def group_quantize_payload(x, spec: QuantizationSpec):
    """Group-affine quantize along spec.ch_axis (KIVI layout); returns
    (codes int8 — plane-packed sub-byte for uint2/uint4 so the ring moves
    2-8x fewer bytes than bf16 — scale f32, zp f32) with group-expanded
    dequant = (codes - zp) * scale."""
    ax = spec.ch_axis if spec.ch_axis >= 0 else x.ndim + spec.ch_axis
    bs = spec.block_size
    n = x.shape[ax]
    assert n % bs == 0, (n, bs)
    shape = list(x.shape)
    shape[ax] = n // bs
    shape.insert(ax + 1, bs)
    xg = x.astype(jnp.float32).reshape(shape)
    mn = jnp.min(xg, axis=ax + 1, keepdims=True)
    mx = jnp.max(xg, axis=ax + 1, keepdims=True)
    qrange = spec.quant_max - spec.quant_min
    scale = jnp.maximum((mx - mn) / qrange, 1e-8)
    zp = -mn / scale + spec.quant_min
    codes = jnp.clip(jnp.round(xg / scale + zp),
                     spec.quant_min, spec.quant_max)
    codes = codes.reshape(x.shape).astype(jnp.int32)
    nbits = _payload_nbits(spec)
    per = 8 // nbits
    if per > 1 and x.shape[ax] % (per * bs) == 0:
        # plane-pack along the group axis: byte r holds the codes of planes
        # r + p*(n/per) in bit field p (groups never straddle planes)
        planes = jnp.split(codes, per, axis=ax)
        packed = planes[0]
        for p in range(1, per):
            packed = packed | (planes[p] << (nbits * p))
        codes = packed
    codes = codes.astype(jnp.int8)   # integer codes: lossless round trip
    return (codes, jnp.squeeze(scale, ax + 1), jnp.squeeze(zp, ax + 1))


def dequantize_payload(codes, scale, zp, spec: QuantizationSpec):
    ax = spec.ch_axis if spec.ch_axis >= 0 else codes.ndim + spec.ch_axis
    c = codes.astype(jnp.int32)
    # the packing factor is self-describing: scale carries one entry per
    # group of the *unpacked* dim
    per = (scale.shape[ax] * spec.block_size) // codes.shape[ax]
    if per > 1:
        nbits = 8 // per
        mask = (1 << nbits) - 1
        u = c & 0xFF
        c = jnp.concatenate([(u >> (nbits * p)) & mask for p in range(per)],
                            axis=ax)
    elif spec.quant_min == 0:
        c = c & 0xFF                # undo int8 wrap of unsigned codes > 127
    c = c.astype(jnp.float32)
    s = expand_scale(scale, c.shape, spec.block_size)
    z = expand_scale(zp, c.shape, spec.block_size)
    return (c - z) * s


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mesh: Mesh,
    seq_axis: str = "data",
    causal: bool = True,
    scale: Optional[float] = None,
    kv_spec: Optional[str] = None,
) -> jax.Array:
    """Sequence-parallel attention: (B, S, H, D) -> (B, S, H, D).

    S must divide evenly over ``mesh.shape[seq_axis]``.  With ``kv_spec``
    (e.g. ``"uint4,qs=group_wise_affine,bs=32,ax=1"`` — ``ax`` indexes the
    (B, S, H, D) layout, so ``ax=1`` groups along tokens like KIVI-K and
    ``ax=-1`` along features like KIVI-V) the rotating K/V payloads are
    group-quantized codes+scales.  Per-device shard quantization equals
    whole-sequence quantization whenever S_loc is a multiple of the group
    size (groups never straddle shards).
    """
    B, S, H, D = q.shape
    n_shards = mesh.shape[seq_axis]
    assert S % n_shards == 0, (S, n_shards)
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    spec = QuantizationSpec.from_str(kv_spec) if kv_spec else None

    def local(q, k, v):
        # shapes here are the per-device shards: (B, S_loc, H, D)
        idx = jax.lax.axis_index(seq_axis)
        S_loc = q.shape[1]
        qf = q.astype(jnp.float32) * scale
        q_pos = idx * S_loc + jnp.arange(S_loc)

        if spec is not None:
            payload = group_quantize_payload(k, spec) + group_quantize_payload(v, spec)
        else:
            payload = (k.astype(jnp.float32), v.astype(jnp.float32))

        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        m0 = jnp.full((B, H, S_loc, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, H, S_loc, 1), jnp.float32)
        acc0 = jnp.zeros((B, H, S_loc, D), jnp.float32)

        def compute(t, payload, m, l, acc):
            if spec is not None:
                kc, ks, kz, vc, vs, vz = payload
                k_t = dequantize_payload(kc, ks, kz, spec)
                v_t = dequantize_payload(vc, vs, vz, spec)
            else:
                k_t, v_t = payload
            # the shard we hold after t hops originated at (idx - t) mod n
            src = (idx - t) % n_shards
            k_pos = src * S_loc + jnp.arange(S_loc)

            s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_t)
            if causal:
                vis = k_pos[None, :] <= q_pos[:, None]       # (S_loc, S_loc)
                s = jnp.where(vis[None, None], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
            p = jnp.exp(jnp.where(m_new <= NEG_INF / 2, NEG_INF, s - m_new))
            corr = jnp.exp(
                jnp.where(m <= NEG_INF / 2, NEG_INF, m - m_new))
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.einsum("bhqk,bkhd->bhqd", p, v_t)
            return m_new, l, acc

        def step(t, carry):
            # permute-then-compute: the ring pays n_shards - 1 hops, not n
            payload, m, l, acc = carry
            payload = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, seq_axis, perm), payload)
            m, l, acc = compute(t, payload, m, l, acc)
            return payload, m, l, acc

        m, l, acc = compute(0, payload, m0, l0, acc0)
        _, m, l, acc = jax.lax.fori_loop(
            1, n_shards, step, (payload, m, l, acc))
        out = acc / jnp.maximum(l, 1e-30)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)

    spec_q = P(None, seq_axis, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q),
        out_specs=spec_q,
        check_vma=False,
    )(q, k, v)


def ring_attention_reference(q, k, v, causal=True, scale=None,
                             kv_spec: Optional[str] = None):
    """Single-device oracle with identical numerics (for tests): plain
    softmax attention over (optionally per-shard-quantized) K/V."""
    B, S, H, D = q.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    if kv_spec:
        spec = QuantizationSpec.from_str(kv_spec)
        k = dequantize_payload(*group_quantize_payload(k, spec), spec).astype(k.dtype)
        v = dequantize_payload(*group_quantize_payload(v, spec), spec).astype(v.dtype)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if causal:
        vis = jnp.arange(S)[None, :] <= jnp.arange(S)[:, None]
        s = jnp.where(vis[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)
