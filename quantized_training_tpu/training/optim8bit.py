"""8-bit block-quantized Adam: optimizer-state memory at 1/4 of f32.

Fine-tuning memory is dominated by Adam's two f32 moments (8 bytes/param —
2x the bf16 weights).  This optimizer stores both moments as int8 codes with
per-block absmax scales (block_size consecutive elements share one f32
scale), cutting state memory ~4x, in the spirit of 8-bit Adam
(Dettmers et al., 2022) re-expressed as an optax ``GradientTransformation``:

  * ``m`` (signed, roughly symmetric): blockwise-linear signed int8
    (code = round(m / absmax * 127)).
  * ``v`` (non-negative, huge dynamic range): blockwise-linear uint8 of
    ``sqrt(v)`` — the sqrt halves the dynamic range in the log domain, so a
    linear code keeps ~0.4% relative resolution at block scale; decode
    squares.

States are quantized after every update and dequantized before the next —
the exact-f32 moment never persists (that is the memory point), and the
requantization error behaves as zero-mean noise on the moment estimate
(same argument as the reference's error quantization for gradients,
`bwd_quantize`).  No error feedback: feedback buffers would cost the very
memory the optimizer saves.

This extends the framework's quantized-training theme (reference scope:
forward/backward compute quantization, reference fake_quantize.py;
gradient *communication* quantization lives in parallel/grad_compress.py)
to the third pillar, optimizer state.

Sharding: moment leaves are *flattened* — codes are (nblocks, block_size)
and scales (nblocks,), NOT param-shaped — so dimension-based f32-Adam
PartitionSpecs do not transfer.  Under pjit either replicate the optimizer
state (it is 4x smaller than f32 state, which is often exactly the point),
or shard codes and scales together on their leading block axis
(``P("data")`` rows), which never splits a quantization block across
devices.  Everything is jit/pjit-traceable (static shapes, no host
callbacks).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["adam8bit", "scale_by_adam8bit", "state_nbytes"]


def _pad_len(n: int, block: int) -> int:
    return (block - n % block) % block


def _use_fused(block_size: int) -> bool:
    """Route large-leaf updates through the fused Pallas kernel on a real
    TPU (the kernel is specialized for block 256; CPU keeps the XLA path —
    the interpret-mode test asserts the two are bit-identical)."""
    if block_size != 256:
        return False
    from ..ops.pallas.common import resolve_interpret
    return not resolve_interpret(None)


def _quantize_signed(x: jax.Array, block: int):
    """Flattened blockwise-linear signed int8: (codes, scales, orig_shape)."""
    flat = x.reshape(-1)
    pad = _pad_len(flat.size, block)
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    codes = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return codes, scale[:, 0]


def _dequantize_signed(codes, scale, shape):
    n = 1
    for d in shape:
        n *= d
    flat = (codes.astype(jnp.float32) * scale[:, None]).reshape(-1)
    return flat[:n].reshape(shape)


def _quantize_sqrt(x: jax.Array, block: int):
    """uint8 of sqrt(x) with per-block absmax (x >= 0)."""
    flat = jnp.sqrt(x.reshape(-1))
    pad = _pad_len(flat.size, block)
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    mx = jnp.max(blocks, axis=1, keepdims=True)
    scale = jnp.where(mx > 0, mx / 255.0, 1.0).astype(jnp.float32)
    codes = jnp.clip(jnp.round(blocks / scale), 0, 255).astype(jnp.uint8)
    return codes, scale[:, 0]


def _dequantize_sqrt(codes, scale, shape):
    n = 1
    for d in shape:
        n *= d
    root = (codes.astype(jnp.float32) * scale[:, None]).reshape(-1)[:n]
    return (root * root).reshape(shape)


class _Moment8(NamedTuple):
    codes: jax.Array
    scale: jax.Array


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array           # int32 step counter
    mu: optax.Params           # tree of _Moment8 (signed int8)
    nu: optax.Params           # tree of _Moment8 (uint8 sqrt-code)


def scale_by_adam8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 256,
    min_8bit_size: int = 4096,
) -> optax.GradientTransformation:
    """The Adam moment/scaling core with int8 blockwise state.

    Leaves smaller than ``min_8bit_size`` keep exact f32 moments (biases,
    norms — the 8-bit payoff is nil and small tensors are where blockwise
    noise hurts most); large leaves (the matmul weights that dominate
    memory) get 8-bit state.  Matches ``optax.scale_by_adam`` semantics
    (bias-corrected moments) up to the state rounding.
    """

    def small(p) -> bool:
        return p.size < min_8bit_size

    def packed(p) -> bool:
        """int32-word-packed state (TPU fused kernel layout): block 256 and
        a row count divisible by the kernel's 512-row tile — true for every
        matmul kernel; odd-sized large leaves keep unpacked int8 state."""
        if block_size != 256:
            return False
        from ..ops.pallas.adam8bit_step import packable_rows
        nb = (p.size + _pad_len(p.size, block_size)) // block_size
        return packable_rows(nb)

    def init(params):
        # small leaves keep exact f32 moments in the ``codes`` slot; the
        # scale is a (1,) placeholder (checkpointers reject 0-size arrays)
        # and the code dtype is the discriminator (f32 exact / int32
        # packed words / int8 unpacked).
        def init_mu(p):
            if small(p):
                return _Moment8(jnp.zeros_like(p, jnp.float32),
                                jnp.zeros((1,), jnp.float32))
            codes, scale = _quantize_signed(jnp.zeros_like(p, jnp.float32),
                                            block_size)
            if packed(p):
                from ..ops.pallas.adam8bit_step import (
                    pack_moment_rows, pack_scale_rows)
                return _Moment8(pack_moment_rows(codes),
                                pack_scale_rows(scale))
            return _Moment8(codes, scale)

        def init_nu(p):
            if small(p):
                return _Moment8(jnp.zeros_like(p, jnp.float32),
                                jnp.zeros((1,), jnp.float32))
            codes, scale = _quantize_sqrt(jnp.zeros_like(p, jnp.float32),
                                          block_size)
            if packed(p):
                from ..ops.pallas.adam8bit_step import (
                    pack_moment_rows, pack_scale_rows)
                return _Moment8(pack_moment_rows(codes),
                                pack_scale_rows(scale))
            return _Moment8(codes, scale)

        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(init_mu, params),
            nu=jax.tree_util.tree_map(init_nu, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def _one_packed(g, mu8, nu8):
            """int32-word-packed leaf (see ops/pallas/adam8bit_step.py):
            fused single-pass kernel on TPU; XLA unpack -> update -> repack
            (same formulas) on every other backend."""
            from ..ops.pallas.adam8bit_step import (
                fused_adam8bit_update_packed, pack_moment_rows,
                pack_scale_rows, unpack_moment_rows, unpack_scale_rows)
            from ..ops.pallas.common import resolve_interpret
            flat = g.reshape(-1)
            pad = _pad_len(flat.size, block_size)
            if pad:
                g2d = jnp.pad(flat, (0, pad)).reshape(-1, block_size)
            else:
                g2d = flat.reshape(-1, block_size)
            if not resolve_interpret(None):       # real TPU
                upd2d, mw, ms, vw, vs = fused_adam8bit_update_packed(
                    g2d, mu8.codes, mu8.scale, nu8.codes, nu8.scale,
                    bc1, bc2, b1=b1, b2=b2, eps=eps)
            else:
                mc = unpack_moment_rows(mu8.codes, signed=True)
                vc = unpack_moment_rows(nu8.codes, signed=False)
                msf = unpack_scale_rows(mu8.scale)
                vsf = unpack_scale_rows(nu8.scale)
                m = (b1 * (mc.astype(jnp.float32)
                           * msf[:, None]) + (1.0 - b1) * g2d)
                root = vc.astype(jnp.float32) * vsf[:, None]
                v = b2 * (root * root) + (1.0 - b2) * (g2d * g2d)
                upd2d = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                mcq, ms = _quantize_signed(m, block_size)
                vcq, vs = _quantize_sqrt(v, block_size)
                mw = pack_moment_rows(mcq)
                vw = pack_moment_rows(vcq)
                ms = pack_scale_rows(ms)
                vs = pack_scale_rows(vs)
            if pad:
                upd = upd2d.reshape(-1)[:flat.size].reshape(g.shape)
            else:
                upd = upd2d.reshape(g.shape)
            return upd, _Moment8(mw, ms), _Moment8(vw, vs)

        def one(g, mu8, nu8):
            g = g.astype(jnp.float32)
            if mu8.codes.dtype == jnp.float32:    # exact small-leaf path
                m = b1 * mu8.codes + (1.0 - b1) * g
                v = b2 * nu8.codes + (1.0 - b2) * g * g
                upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                return upd, _Moment8(m, mu8.scale), _Moment8(v, nu8.scale)
            if mu8.codes.dtype == jnp.int32:      # int32-word-packed leaf
                return _one_packed(g, mu8, nu8)
            if _use_fused(block_size):
                # Fused Pallas moment update (ops/pallas/adam8bit_step.py):
                # one VMEM pass instead of XLA's re-materialized blocked
                # views (which measured ~122 GB/s vs a ~638 GB/s stream and
                # made adam8bit the largest quantized-training cost,
                # +23.3 ms/step — BENCH_TRAIN_r04.json).  Same f32 math,
                # same rounding points as the path below.
                from ..ops.pallas.adam8bit_step import fused_adam8bit_update
                flat = g.reshape(-1)
                pad = _pad_len(flat.size, block_size)
                if pad:
                    # pad + slice-back each copy the full gradient (~5 ms
                    # at 536M params); leaves that divide the block — all
                    # matmul kernels — take the free-reshape path
                    g2d = jnp.pad(flat, (0, pad)).reshape(-1, block_size)
                else:
                    g2d = flat.reshape(-1, block_size)
                upd2d, mc, ms, vc, vs = fused_adam8bit_update(
                    g2d, mu8.codes, mu8.scale, nu8.codes, nu8.scale,
                    bc1, bc2, b1=b1, b2=b2, eps=eps)
                if pad:
                    upd = upd2d.reshape(-1)[:flat.size].reshape(g.shape)
                else:
                    upd = upd2d.reshape(g.shape)
                return upd, _Moment8(mc, ms), _Moment8(vc, vs)
            m = b1 * _dequantize_signed(mu8.codes, mu8.scale, g.shape) \
                + (1.0 - b1) * g
            v = b2 * _dequantize_sqrt(nu8.codes, nu8.scale, g.shape) \
                + (1.0 - b2) * g * g
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            mc, ms = _quantize_signed(m, block_size)
            vc, vs = _quantize_sqrt(v, block_size)
            return upd, _Moment8(mc, ms), _Moment8(vc, vs)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [one(g, mu8, nu8)
               for g, mu8, nu8 in zip(flat_u, flat_mu, flat_nu)]
        new_updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return new_updates, ScaleByAdam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)


def adam8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 256,
    min_8bit_size: int = 4096,
    weight_decay: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(W) with 8-bit blockwise moment state — drop-in for
    ``optax.adam(w)`` in `training/trainer.py`."""
    parts = [scale_by_adam8bit(b1, b2, eps, block_size, min_8bit_size)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def state_nbytes(opt_state) -> int:
    """Total bytes of an optimizer state tree (for the memory assertions)."""
    return sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(opt_state)
               if hasattr(l, "dtype"))
