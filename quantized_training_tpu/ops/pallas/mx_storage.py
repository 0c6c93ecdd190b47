"""MX-int8 weight-storage matmul: weights live in HBM as int8 microscaling
codes + per-block scales; the kernel converts and rescales tiles in VMEM
(2-3 VPU ops per element) before the MXU dot.

This is the throughput-oriented 8-bit weight storage path (cf. the posit
storage kernel, which is exact-posit but VPU-decode-bound): int8 halves the
weight bytes streamed from HBM and the cheap convert keeps the VPU ahead of
the stream, so weight-bandwidth-bound GEMMs (decode / small batch) run up to
~2x faster while fake-quantization semantics match the framework's
``int8,qs=microscaling`` spec exactly.

``pack_mx_weights`` is the offline step: blockwise amax scales along the
contraction dim (the reference's weight ax=-1 in (out,in) layout == axis 0
of our (in, out) kernels), codes = round(w / scale).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import mesh_axis_size as _axis_size, resolve_interpret

from ...quantize.ops import calculate_mx_qparam, expand_scale
from ...numerics import quantize_fn

__all__ = ["pack_mx_weights", "mx_matmul", "mx_matmul_sharded"]


def pack_mx_weights(
    w: jax.Array, nbits: int = 8, block_size: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """Offline: (K, N) weights -> int8 codes + bf16 scales (K/bs, N).

    Scales are blockwise amax / quant_max along K (the contraction dim).
    Dequantized codes reproduce the ``int{nbits},qs=microscaling,bs=...``
    fake-quant of ``w`` exactly.
    """
    quant_max = float(2 ** (nbits - 1) - 1)
    scale = calculate_mx_qparam(w, (0,), block_size, quant_max)
    qfn = quantize_fn(f"int{nbits}")
    codes = qfn(w.astype(jnp.float32)
                / expand_scale(scale, w.shape, block_size).astype(jnp.float32))
    return codes.astype(jnp.int8), scale.astype(jnp.bfloat16)


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int, block_size: int,
            block_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 codes -> bf16, rescaled per (K-block, N) group: one convert and
    # one multiply per element.
    codes = w_ref[:].astype(jnp.bfloat16)
    scales = s_ref[:]                      # (block_k // bs, block_n)
    w = codes * jnp.repeat(scales, block_size, axis=0)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def mx_matmul(
    x: jax.Array,
    w_codes: jax.Array,
    w_scales: jax.Array,
    *,
    block_size: int = 64,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x @ (codes * expand(scales)); codes (K, N) int8, scales (K/bs, N).

    Block sizes default to the VMEM-budget picker (autotune.py), which
    prefers divisor-exact tiles — weight dims like 5504 = 128 * 43 have no
    mid-size power-of-two divisors and would otherwise fall back to XLA."""
    M, K = x.shape
    K2, N = w_codes.shape
    assert K == K2
    out_dtype = out_dtype or x.dtype

    interpret = resolve_interpret(interpret)

    if block_m is None or block_n is None or block_k is None:
        from .autotune import storage_matmul_blocks
        picked = storage_matmul_blocks(M, K, N, code_bytes=1)
        if picked is not None:
            bm, bk, bn = picked
            block_m = block_m or bm
            block_k = block_k or bk
            block_n = block_n or bn
        else:
            block_m = block_n = block_k = 1  # force fallback below

    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    if (M % block_m or N % block_n or K % block_k
            or block_k % block_size or interpret):
        w = (w_codes.astype(jnp.float32)
             * expand_scale(w_scales.astype(jnp.float32), w_codes.shape,
                            block_size)).astype(x.dtype)
        return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            out_dtype)

    nk = K // block_k
    grid = (M // block_m, N // block_n, nk)
    kernel = functools.partial(_kernel, nk=nk, block_size=block_size,
                               block_k=block_k)

    sb = block_k // block_size
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, block_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(x, w_codes, w_scales)


# ---------------------------------------------------------------------------
# SPMD partitioning: under pjit the pallas_call is an opaque custom call, so
# without a rule GSPMD all-gathers the Megatron-sharded codes onto every
# device before each GEMM — exactly the weight movement the storage format
# exists to avoid.  The matmul partitions canonically: column-parallel
# (codes (K, N) sharded on N) splits the kernel per shard with x replicated;
# row-parallel (sharded on K, aligned to whole scale groups) computes
# partial products and one psum.  Same construction as the fused KIVI decode
# kernel's rule (kivi_attention.py).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _partitioned_mx_matmul(block_size, out_dtype_name, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    out_dtype = jnp.dtype(out_dtype_name)

    def local(x, codes, scales):
        return mx_matmul(x, codes, scales, block_size=block_size,
                         out_dtype=out_dtype, interpret=interpret)

    def _spec_of(shape_struct):
        return getattr(shape_struct.sharding, "spec", P())

    def _classify(mesh, arg_shapes):
        """-> (m_ax, mode, w_ax): batch sharding of x rows, and whether the
        codes shard column- (N) or row-parallel (K, whole scale groups)."""
        xs, cs = _spec_of(arg_shapes[0]), _spec_of(arg_shapes[1])
        M, K = arg_shapes[0].shape
        N = arg_shapes[1].shape[1]
        m_ax = xs[0] if len(xs) > 0 else None
        if m_ax is not None and M % _axis_size(mesh, m_ax):
            m_ax = None
        c_k = cs[0] if len(cs) > 0 else None
        c_n = cs[1] if len(cs) > 1 else None
        if c_n is not None and N % _axis_size(mesh, c_n) == 0:
            return m_ax, "col", c_n
        if c_k is not None:
            n_sh = _axis_size(mesh, c_k)
            # shard boundaries must align with whole scale groups
            if K % n_sh == 0 and (K // n_sh) % block_size == 0:
                return m_ax, "row", c_k
        return m_ax, "rep", None

    def partition(mesh, arg_shapes, result_shape):
        m_ax, mode, w_ax = _classify(mesh, arg_shapes)
        if mode == "col":
            args = (NamedSharding(mesh, P(m_ax, None)),
                    NamedSharding(mesh, P(None, w_ax)),
                    NamedSharding(mesh, P(None, w_ax)))
            out = NamedSharding(mesh, P(m_ax, w_ax))
            return mesh, local, out, args
        if mode == "row":
            args = (NamedSharding(mesh, P(m_ax, w_ax)),
                    NamedSharding(mesh, P(w_ax, None)),
                    NamedSharding(mesh, P(w_ax, None)))
            out = NamedSharding(mesh, P(m_ax, None))

            def local_psum(x, codes, scales):
                part = mx_matmul(x, codes, scales, block_size=block_size,
                                 out_dtype=jnp.float32, interpret=interpret)
                return jax.lax.psum(part, w_ax).astype(out_dtype)

            return mesh, local_psum, out, args
        args = (NamedSharding(mesh, P(m_ax, None)),
                NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))
        return mesh, local, NamedSharding(mesh, P(m_ax, None)), args

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        m_ax, mode, w_ax = _classify(mesh, arg_shapes)
        return NamedSharding(
            mesh, P(m_ax, w_ax if mode == "col" else None))

    wrapped = custom_partitioning(local)
    wrapped.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        # einsum rule: contraction k shared by x and codes; the scale-group
        # dim g tracks k/bs and is pinned in the partition callback
        sharding_rule="m k, k n, g n -> m n",
        need_replication_factors=("g",),
    )
    return wrapped


def mx_matmul_sharded(
    x: jax.Array, w_codes: jax.Array, w_scales: jax.Array, *,
    block_size: int = 64, out_dtype=None, interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`mx_matmul` with an SPMD partitioning rule: under pjit,
    Megatron-sharded codes stay sharded (column: per-shard GEMM; row:
    partial GEMM + one psum) instead of being all-gathered."""
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    interpret = resolve_interpret(interpret)
    return _partitioned_mx_matmul(block_size, out_dtype.name,
                                  bool(interpret))(x, w_codes, w_scales)
