"""Deployed weight storage: convert trained/loaded params into packed code
collections the QDense storage kernels consume at serving time.

This is the deployment step that makes the weight-storage kernels
(ops/pallas/{posit,mx,affine}_storage.py) a model-level feature rather than
standalone ops — the TPU realization of the reference compiler's 8-bit
operand-storage goal (reference codegen: weights leave the host already in
accelerator number formats).  Flow:

    variables = model_or_loader(...)                     # bf16/f32 kernels
    storage, slim = build_storage(variables["params"], "w4a16", group=64)
    qc = quant_config.with_storage("w4a16", 64)
    model = LlamaForCausalLM(cfg, qc)
    model.apply({"params": slim, "storage": storage, ...}, ...)

``build_storage`` packs every 2-D ``kernel`` leaf (the QDense weights;
QConv 4-D kernels and embeddings are left alone) and *removes it from the
params tree* — the dense bf16 weights never reach the device, which is the
capacity/bandwidth point.

Tensor parallelism: ``parallel.shard_rules_llama_storage(fmt)`` gives the
packed codes/qparams the Megatron shardings of the kernels they replaced
(TP storage forward ≡ single-device, tested on the virtual mesh).  The
mx format's matmul additionally carries a ``custom_partitioning`` rule
(``mx_matmul_sharded``) so under pjit the sharded codes are never
all-gathered: column-parallel shards run the kernel on their N slice,
row-parallel shards compute partials and one psum (asserted on HLO).

The packed dequant matches the corresponding weight fake-quant exactly:

    posit8  ≡ weight spec ``posit8_1``        (exact codes, 1 B/weight)
    mx8     ≡ ``int8,qs=microscaling,bs=G``   (1 B + shared scales)
    w4a16   ≡ ``uint4,qs=group_wise_affine``  (0.5 B + scale/zp)
    w2a16   ≡ ``uint2,qs=group_wise_affine``  (0.25 B + scale/zp)
    w8a8    ≡ ``int8,qs=per_channel_symmetric`` weights x dynamic per-token
              int8 activations, evaluated NATIVELY on the s8 x s8 -> s32 MXU
              path (ops/int8_matmul.py) — the only format whose GEMM runs
              *faster* than bf16 (2x MXU throughput), not just smaller;
              activation rounding happens inside the op, so configure no
              separate activation spec at gemm sites
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["build_storage", "STORAGE_FORMATS"]

STORAGE_FORMATS = ("posit8", "mx8", "w4a16", "w2a16", "w2x4", "w8a8")


def _pack_kernel(w: jax.Array, fmt: str, group: int) -> Dict[str, jax.Array]:
    if fmt == "posit8":
        from ..ops.pallas.posit_storage import pack_posit_weights
        # encode from bf16 — the dense path fake-quants the bf16-cast
        # kernel, and posit8(bf16(w)) can differ from posit8(f32 w) at
        # double-rounding boundaries; this keeps the paths bit-equal
        return {"codes": pack_posit_weights(w.astype(jnp.bfloat16))}
    if fmt == "mx8":
        from ..ops.pallas.mx_storage import pack_mx_weights
        codes, scales = pack_mx_weights(w, block_size=group)
        return {"codes": codes, "scales": scales}
    if fmt in ("w4a16", "w2a16"):
        from ..ops.pallas.affine_storage import pack_affine_weights
        nbits = 4 if fmt == "w4a16" else 2
        codes, sf, zp = pack_affine_weights(w, nbits, group)
        return {"codes": codes, "scales": sf, "zero_points": zp}
    if fmt == "w2x4":
        # w2 NUMERICS (uint2 group-affine values — same codes as w2a16) in
        # the w4 word layout: the direct w2 kernel is VPU-issue-bound at
        # 0.14-0.16 of HBM and absolutely slower than w4, so when the 2x
        # bytes fit, ship the same values expanded (1.7-2.1x faster on
        # chip, BENCH_W2X_r05).  zp += 6 folds the mid-2 -> mid-16 shift
        # so the plain nbits=4 consumer computes identical products.
        from ..ops.pallas.affine_storage import (
            expand_w2_words_to_w4, pack_affine_weights,
        )
        codes2, sf, zp = pack_affine_weights(w, 2, group)
        return {"codes": expand_w2_words_to_w4(codes2), "scales": sf,
                "zero_points": zp + 6.0}
    if fmt == "w8a8":
        from ..ops.int8_matmul import pack_int8_weights
        codes, scale = pack_int8_weights(w)
        return {"codes": codes, "scales": scale}
    raise ValueError(f"unknown storage format {fmt!r}; "
                     f"expected one of {STORAGE_FORMATS}")


def _eligible(path: Tuple[str, ...], leaf: jax.Array, fmt: str,
              group: int) -> bool:
    if path[-1] != "kernel" or leaf.ndim != 2:
        return False
    if fmt in ("w4a16", "w2a16", "w2x4"):
        # int32 words must not straddle qparam groups (w2x4 packs at 2
        # bits first, so it carries the w2 constraint)
        per = 32 // (4 if fmt == "w4a16" else 2)
        return group % per == 0 and leaf.shape[0] % group == 0
    if fmt == "mx8":
        return leaf.shape[0] % group == 0
    return True


def build_storage(params, fmt: str, group: int = 64):
    """(params) -> (storage_tree, slim_params).

    ``storage_tree`` mirrors the module hierarchy with a dict of packed
    arrays where each eligible ``kernel`` lived; ``slim_params`` is params
    with those kernels REMOVED (biases, norms, embeddings stay).  Kernels
    whose contraction dim does not satisfy the format's grouping stay as
    ordinary params (QDense falls back to the dense path for them).
    """
    assert fmt in STORAGE_FORMATS, fmt

    def walk(node, path):
        if not isinstance(node, dict):
            return None, node
        storage, slim = {}, {}
        for k, v in node.items():
            if isinstance(v, dict):
                st, sl = walk(v, path + (k,))
                if st:
                    storage[k] = st
                slim[k] = sl
            elif _eligible(path + (k,), v, fmt, group):
                # the packed arrays live under the layer's own scope so
                # QDense can self.variable("storage", ...) them
                for name, arr in _pack_kernel(
                        v.astype(jnp.float32), fmt, group).items():
                    storage[name] = arr
            else:
                slim[k] = v
        return storage, slim

    storage, slim = walk(params, ())
    return storage or {}, slim
