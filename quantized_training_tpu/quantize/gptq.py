"""GPTQ: error-compensated weight rounding for the affine storage formats.

Round-to-nearest (``pack_affine_weights``) quantizes each weight in
isolation; GPTQ (Frantar et al., 2023) instead minimizes the *layer output*
error ``||X W - X W_q||_F`` by quantizing the contraction dimension
sequentially and folding each row's rounding error into the not-yet-
quantized rows through the inverse Hessian ``(X^T X)^{-1}``.  At 4 bits it
typically recovers most of the RTN accuracy loss, and at 2 bits it is the
difference between a usable and an unusable model — which is exactly the
regime the ``w2a16`` storage kernel serves.

This is framework-added value beyond the reference (which stops at RTN
group-affine fake-quant, reference fake_quantize.py:150-180); it exists here
because the storage deployment path (quantize/storage.py →
ops/pallas/affine_storage.py) made sub-byte weights a first-class serving
feature, and sub-byte RTN leaves accuracy on the table.

Pipeline::

    # 1. calibrate: accumulate per-layer input Hessians (QDense sows X^T X
    #    of its post-input-quant matmul operand into the "gptq" collection)
    _, col = model.apply(variables, batch, mutable=["gptq"])
    hessians = accumulate_gptq(hessians, col["gptq"])   # over batches

    # 2. quantize + pack into the affine storage layout
    storage, slim = build_storage_gptq(
        variables["params"], hessians, "w4a16", group=64)

    # 3. serve exactly like RTN-packed storage
    model = LlamaForCausalLM(cfg, qc.with_storage("w4a16", 64))
    model.apply({"params": slim, "storage": storage, ...}, ...)

The quantization mechanics (group min/max scale, float zero-point, RNE
codes, ``(c - zp) * sf`` dequant) are byte-identical to
``affine_spec(nbits, G)`` fake-quant — only *which* code each weight gets
differs — so the packed result runs on the unmodified ``affine_matmul``
kernel and the sharding rules for RTN storage apply as-is.

Design notes:

* Offline, host-side numpy — this runs once at deployment, not under jit;
  K x K Hessian solves (Cholesky) are a few seconds for 4k-dim layers.
* No ``act_order``: reordering rows by diag(H) requires a per-row group
  index at inference; ``affine_matmul``'s plane layout indexes group
  qparams by position, and the accuracy gap vs act_order is small at
  group_size <= 128.
* Groups never straddle update blocks (``block_size`` is rounded to a
  multiple of ``group_size``), so group qparams always come from rows that
  already carry every earlier row's error feedback.
"""

from typing import Dict, Optional, Tuple

import numpy as np
import jax

__all__ = [
    "gptq_quantize", "hessian_from_inputs", "accumulate_gptq",
    "build_storage_gptq",
]


def hessian_from_inputs(x) -> np.ndarray:
    """``X^T X`` of a batch of layer inputs (leading dims flattened).

    The GPTQ update only ever uses *ratios* of inverse-Hessian entries, so
    the conventional factor 2 and any sample-count normalization cancel;
    accumulating raw ``X^T X`` over calibration batches is exact.
    """
    x2 = np.asarray(x, np.float32).reshape(-1, np.shape(x)[-1])
    return x2.T @ x2


def accumulate_gptq(total: Optional[Dict], col: Dict) -> Dict:
    """Sum a model's sown ``"gptq"`` collection into a running total."""
    col = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), col)
    if total is None:
        return col
    return jax.tree_util.tree_map(lambda a, b: a + b, total, col)


def _affine_qparams_np(w: np.ndarray, qmin: int, qmax: int):
    """float32 group qparams over axis 0 — the numpy mirror of
    ``_group_affine_qparams`` (quantize/fake_quant.py:205-219) so GPTQ's
    qparams are bit-compatible with the RTN storage format."""
    mn = w.min(axis=0)
    mx = w.max(axis=0)
    sf = ((mx - mn) / np.float32(qmax - qmin)).astype(np.float32)
    sf = np.where(sf > 0.0, sf, np.float32(1.0))
    zp = (-mn / sf + np.float32(qmin)).astype(np.float32)
    return sf, zp


def gptq_quantize(
    w,
    hessian,
    nbits: int = 4,
    group_size: int = 128,
    percdamp: float = 0.01,
    block_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Quantize ``w`` (K, N) to uintN group-affine codes, GPTQ-style.

    ``hessian`` is the (K, K) accumulated ``X^T X`` of this layer's inputs.
    Returns ``(wq, codes, sf, zp)``: the dequantized weights (float32,
    bit-equal to what ``affine_matmul`` reconstructs), the integer codes
    (K, N), and per-group qparams (K/group_size, N) ready for
    :func:`~quantized_training_tpu.ops.pallas.affine_storage.plane_pack`.

    With a diagonal Hessian the error-feedback terms vanish and the result
    is exactly the RTN packing (tested); correlated inputs are where the
    Frobenius win appears.
    """
    W = np.asarray(w, np.float32).copy()
    K, N = W.shape
    if K % group_size:
        raise ValueError(f"K={K} not a multiple of group_size={group_size}")
    qmin, qmax = 0, (1 << nbits) - 1
    block_size = max(block_size - block_size % group_size, group_size)

    H = np.asarray(hessian, np.float64).copy()
    if H.shape != (K, K):
        raise ValueError(f"hessian shape {H.shape} != ({K}, {K})")
    # Dead inputs (all-zero activation column): their weights never touch
    # the output; zero them so they quantize for free.
    diag = np.arange(K)
    dead = H[diag, diag] == 0
    H[diag[dead], diag[dead]] = 1.0
    W[dead, :] = 0.0
    H[diag, diag] += percdamp * np.mean(H[diag, diag])

    # Upper-Cholesky factor U of H^{-1} (H^{-1} = U^T U).  Row k of U holds
    # exactly the propagation weights from row k onto rows > k.
    L = np.linalg.cholesky(np.linalg.inv(H))
    Hinv = np.ascontiguousarray(L.T)

    Q = np.zeros_like(W)
    codes = np.zeros((K, N), np.int32)
    n_groups = K // group_size
    sf = np.zeros((n_groups, N), np.float32)
    zp = np.zeros((n_groups, N), np.float32)

    for i1 in range(0, K, block_size):
        i2 = min(i1 + block_size, K)
        cnt = i2 - i1
        Wb = W[i1:i2]                       # view: updates land in W
        Hb = Hinv[i1:i2, i1:i2]
        Eb = np.zeros((cnt, N), np.float32)
        for k in range(cnt):
            g = (i1 + k) // group_size
            if (i1 + k) % group_size == 0:
                # group qparams from *current* rows — they already include
                # error feedback from every earlier quantized row
                sf[g], zp[g] = _affine_qparams_np(
                    Wb[k:k + group_size], qmin, qmax)
            row = Wb[k]
            c = np.clip(np.round(row / sf[g] + zp[g]), qmin, qmax)
            q = ((c.astype(np.float32) - zp[g]) * sf[g]).astype(np.float32)
            codes[i1 + k] = c.astype(np.int32)
            Q[i1 + k] = q
            err = ((row - q) / np.float32(Hb[k, k])).astype(np.float32)
            if k + 1 < cnt:
                Wb[k + 1:] -= np.outer(
                    Hb[k, k + 1:].astype(np.float32), err)
            Eb[k] = err
        if i2 < K:
            # lazy batch update of everything past the block
            W[i2:] -= Hinv[i1:i2, i2:].astype(np.float32).T @ Eb

    return Q, codes, sf, zp


def build_storage_gptq(params, hessians, fmt: str, group: int = 64,
                       percdamp: float = 0.01, block_size: int = 128):
    """GPTQ variant of :func:`~quantized_training_tpu.quantize.storage.build_storage`.

    ``hessians`` is the accumulated ``"gptq"`` collection (same module tree
    as ``params``, leaf name ``hessian``).  Eligible kernels with a Hessian
    get GPTQ codes; eligible kernels *without* one fall back to RTN packing;
    ineligible kernels stay dense.  Returns ``(storage_tree, slim_params)``
    exactly like ``build_storage`` — the serving side cannot tell the
    difference (same layout, same kernels, same sharding rules).
    """
    if fmt not in ("w4a16", "w2a16"):
        raise ValueError(
            f"GPTQ targets the group-affine formats, got {fmt!r} "
            "(posit8 storage is exact; mx8 has no zero-point to absorb "
            "error feedback into)")
    nbits = 4 if fmt == "w4a16" else 2

    from ..ops.pallas.affine_storage import plane_pack
    from .storage import _eligible, _pack_kernel

    def walk(node, hnode, path):
        if not isinstance(node, dict):
            return None, node
        storage, slim = {}, {}
        for key, v in node.items():
            sub_h = hnode.get(key, {}) if isinstance(hnode, dict) else {}
            if isinstance(v, dict):
                st, sl = walk(v, sub_h, path + (key,))
                if st:
                    storage[key] = st
                slim[key] = sl
            elif _eligible(path + (key,), v, fmt, group):
                H = None
                if isinstance(hnode, dict):
                    H = hnode.get("hessian")
                if H is not None:
                    _, c, s, z = gptq_quantize(
                        np.asarray(v, np.float32), H, nbits, group,
                        percdamp=percdamp, block_size=block_size)
                    packed, sfp, zpp = plane_pack(c, s, z, nbits, group)
                    storage.update(codes=packed, scales=sfp,
                                   zero_points=zpp)
                else:
                    storage.update(_pack_kernel(
                        v.astype(np.float32) if hasattr(v, "astype") else v,
                        fmt, group))
            else:
                slim[key] = v
        return storage, slim

    storage, slim = walk(params, hessians or {}, ())
    return storage or {}, slim
