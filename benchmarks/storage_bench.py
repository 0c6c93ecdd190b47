"""Weight-storage decode benchmark: MX-int8 codes vs bf16 weights.

The honest protocol for 8-bit weight storage: an 8-layer MLP stack whose
weights (360 MB bf16 / 180 MB int8) far exceed VMEM, so every step truly
streams weights from HBM — single-GEMM loops over fixed weights let the
codes go VMEM-resident between iterations and overstate the win.

Measured r2 (v5e, M=16 decode batch): bf16 796 GB/s (its bandwidth bound),
mx-int8 1.34x faster end-to-end (67% of the 2x byte-ratio bound; the
residual is the in-kernel convert+rescale VPU pass serializing with the
stream).  Per-op at (16, 2048, 5504): mx 12.3us vs bf16 25.9us = 2.1x.

Prints one JSON line per config.
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    from quantized_training_tpu.ops.pallas.mx_storage import (
        mx_matmul, pack_mx_weights,
    )

    L, K, N, M = 8, 2048, 5504, 16
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
          for _ in range(L)]
    ws2 = [jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.bfloat16)
           for _ in range(L)]
    packed = [pack_mx_weights(w) for w in ws]
    packed2 = [pack_mx_weights(w) for w in ws2]

    def mlp_bf16(x, ws, ws2):
        for w, w2 in zip(ws, ws2):
            h = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = jnp.dot(jax.nn.silu(h).astype(jnp.bfloat16), w2,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return x

    def mlp_mx(x, packed, packed2):
        for (c, s), (c2, s2) in zip(packed, packed2):
            h = mx_matmul(x, c, s, out_dtype=jnp.float32)
            x = mx_matmul(jax.nn.silu(h).astype(jnp.bfloat16), c2, s2)
        return x

    def timed(fn, *args):
        @partial(jax.jit, static_argnames="n")
        def run(n, x, *rest):
            def body(i, carry):
                x, acc = carry
                out = jax.lax.optimization_barrier(fn(x, *rest))
                return (x + jnp.bfloat16(1e-3),
                        acc + out.ravel()[:1].astype(jnp.float32).sum())
            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))[1]

        float(run(1, *args))
        float(run(65, *args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter(); float(run(65, *args))
            t1 = time.perf_counter(); float(run(1, *args))
            t2 = time.perf_counter()
            best = min(best, ((t1 - t0) - (t2 - t1)) / 64)
        return best

    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    t_bf = timed(mlp_bf16, x, ws, ws2)
    t_mx = timed(mlp_mx, x, packed, packed2)
    bytes_bf = L * 2 * K * N * 2
    print(json.dumps({
        "metric": "mlp8L_decode_bf16_ms", "value": round(t_bf * 1e3, 3),
        "unit": "ms", "gbps": round(bytes_bf / t_bf / 1e9, 0)}))
    print(json.dumps({
        "metric": "mlp8L_decode_mxint8_ms", "value": round(t_mx * 1e3, 3),
        "unit": "ms", "gbps": round(bytes_bf / 2 / t_mx / 1e9, 0)}))
    print(json.dumps({
        "metric": "mx_storage_vs_bf16_decode_speedup",
        "value": round(t_bf / t_mx, 2), "unit": "x"}))

    # W8A8 native-integer path (ops/int8_matmul.py): int8 x int8 -> s32 on
    # the MXU + rank-1 rescale.  Halves operand bytes AND doubles MXU
    # throughput where XLA lowers the s8 dot natively.
    from quantized_training_tpu.ops.int8_matmul import (
        pack_int8_weights, w8a8_matmul,
    )
    packed_i8 = [pack_int8_weights(w) for w in ws]
    packed2_i8 = [pack_int8_weights(w) for w in ws2]

    def mlp_w8a8(x, packed, packed2):
        for (c, s), (c2, s2) in zip(packed, packed2):
            h = w8a8_matmul(x, c, s, out_dtype=jnp.float32)
            x = w8a8_matmul(jax.nn.silu(h).astype(jnp.bfloat16), c2, s2)
        return x

    t_i8 = timed(mlp_w8a8, x, packed_i8, packed2_i8)
    print(json.dumps({
        "metric": "mlp8L_decode_w8a8_ms", "value": round(t_i8 * 1e3, 3),
        "unit": "ms", "gbps": round(bytes_bf / 2 / t_i8 / 1e9, 0)}))
    print(json.dumps({
        "metric": "w8a8_vs_bf16_decode_speedup",
        "value": round(t_bf / t_i8, 2), "unit": "x"}))

    # W4A16 group-affine storage (ops/pallas/affine_storage.py): plane-packed
    # uint4 codes stream 4x fewer weight bytes than bf16.  group_size=64 so
    # per*G=128 divides both 2048 and 5504.
    from quantized_training_tpu.ops.pallas.affine_storage import (
        affine_matmul, pack_affine_weights,
    )
    packed_w4 = [pack_affine_weights(w, 4, 64) for w in ws]
    packed2_w4 = [pack_affine_weights(w, 4, 64) for w in ws2]

    def mlp_w4(x, packed, packed2):
        for (c, s, z), (c2, s2, z2) in zip(packed, packed2):
            h = affine_matmul(x, c, s, z, nbits=4, group_size=64,
                              out_dtype=jnp.float32)
            x = affine_matmul(jax.nn.silu(h).astype(jnp.bfloat16), c2, s2,
                              z2, nbits=4, group_size=64)
        return x

    t_w4 = timed(mlp_w4, x, packed_w4, packed2_w4)
    print(json.dumps({
        "metric": "mlp8L_decode_w4a16_ms", "value": round(t_w4 * 1e3, 3),
        "unit": "ms", "gbps": round(bytes_bf / 4 / t_w4 / 1e9, 0)}))
    print(json.dumps({
        "metric": "w4a16_vs_bf16_decode_speedup",
        "value": round(t_bf / t_w4, 2), "unit": "x"}))

    # Compute-bound shape (prefill: M=4096): here the win is MXU throughput,
    # not bytes — v5e peaks ~394 TOPS int8 vs ~197 TFLOP/s bf16, so w8a8
    # can exceed 1x even with the activations quantized on the fly.
    xl = jnp.asarray(rng.normal(size=(4096, K)), jnp.bfloat16)
    t_bf_l = timed(mlp_bf16, xl, ws, ws2)
    t_i8_l = timed(mlp_w8a8, xl, packed_i8, packed2_i8)
    flops = 2 * L * 2 * 4096 * K * N
    print(json.dumps({
        "metric": "mlp8L_prefill_bf16_ms", "value": round(t_bf_l * 1e3, 3),
        "unit": "ms", "tflops": round(flops / t_bf_l / 1e12, 1)}))
    print(json.dumps({
        "metric": "mlp8L_prefill_w8a8_ms", "value": round(t_i8_l * 1e3, 3),
        "unit": "ms", "tflops": round(flops / t_i8_l / 1e12, 1)}))
    print(json.dumps({
        "metric": "w8a8_vs_bf16_prefill_speedup",
        "value": round(t_bf_l / t_i8_l, 2), "unit": "x"}))


if __name__ == "__main__":
    main()
