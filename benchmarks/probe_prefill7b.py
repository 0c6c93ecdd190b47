"""Component decomposition of the 7B w4a16 prefill step (VERDICT r05 #4).

r04 measured 7B w4 prefill at 0.603 MFU end-to-end while the per-GEMM w4
kernels probe at 0.80-0.88 — and bf16 prefill loses only ~20% end-to-end
vs 28% for w4.  This probe gives prefill the same treatment the decode
step got: time every component at its exact prefill shape (B=1, S=2048),
build the predicted step time from components, and report the residual
against the measured end-to-end number so the gap is accounted, not
guessed.

Components per layer: 4 w4 GEMMs at M=2048 (qkvo x4 counted by shape),
flash attention (1, 32, 2048, 128) causal, KIVI prefill-quantize of K/V
into the cache (both uint2-affine and int4-sym variants), RMSNorm + rotary
+ residual glue.  Plus once per step: lm_head GEMM, embedding gather.

Prints one JSON line per measurement (-> BENCH_PREFILL_r05.json).
"""

import json
import os
import sys
import threading
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

PEAK_HBM_GBS = 819.0
PEAK_BF16_TFLOPS = 197.0

S = 2048
HID, INTER, VOCAB = 4096, 11008, 32000
H = KV = 32
D = 128
L = 32
GROUP = 64

SHAPES = [
    ("qkvo", HID, HID, 4),
    ("gate_up", HID, INTER, 2),
    ("down", INTER, HID, 1),
]

SANITY = os.environ.get("QT_PROBE_SANITY") == "1"


def emit(rec):
    if SANITY:
        rec["sanity"] = True
    print(json.dumps(rec), flush=True)


def start_watchdog(deadline_s):
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print("probe_prefill7b watchdog fired", file=sys.stderr,
                  flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done


def timed_chain(step, operands, state0, n1=4, n2=40, repeats=4):
    @partial(jax.jit, static_argnames="n")
    def run(operands, state, n):
        def body(i, c):
            return step(operands, c)
        out = jax.lax.fori_loop(0, n, body, state)
        return sum(l.ravel()[0].astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(out))

    float(run(operands, state0, n1))
    float(run(operands, state0, n2))

    def t(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(operands, state0, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n2, repeats) - t(n1, repeats)) / (n2 - n1)


def probe_gemms(nbits):
    """w4 (and bf16 anchor) GEMMs at M=2048, rotating weights."""
    from quantized_training_tpu.ops.pallas.affine_storage import (
        affine_matmul, pack_affine_weights,
    )
    rng = np.random.default_rng(0)
    Lrot = 4
    out = {}
    for name, K, N, cnt in SHAPES + [("lm_head", HID, VOCAB, 1)]:
        packs, dense = [], []
        for i in range(Lrot):
            w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
            packs.append(jax.jit(
                lambda w: pack_affine_weights(w, nbits, GROUP))(w))
            dense.append(w.astype(jnp.bfloat16))
        jax.block_until_ready((packs, dense))
        x0 = jnp.asarray(rng.normal(size=(S, K)), jnp.bfloat16)
        flops = 2 * S * K * N

        def step_q(packs, c):
            x, acc = c
            for p, s, z in packs:
                y = affine_matmul(x, p, s, z, nbits=nbits, group_size=GROUP,
                                  out_dtype=jnp.bfloat16)
                y = jax.lax.optimization_barrier(y)
                acc = acc + y[0, 0].astype(jnp.float32)
            return x + 1, acc

        dtq = timed_chain(step_q, packs,
                          (x0, jnp.zeros((1,), jnp.float32))) / Lrot

        def step_d(ws, c):
            x, acc = c
            for w in ws:
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                # barrier, then a scalar probe: a sliced reduction without
                # the barrier lets XLA fold the slice into the GEMM and
                # compute ONE column (measured "mfu 27" on a 0.97-peak
                # part); a full abs-sum would bill ~0.5 ms of reduction to
                # the GEMM instead
                y = jax.lax.optimization_barrier(y)
                acc = acc + y[0, 0]
            return x + 1, acc

        dtd = timed_chain(step_d, dense,
                          (x0, jnp.zeros((1,), jnp.float32))) / Lrot
        out[name] = (dtq, dtd, cnt)
        emit({
            "metric": f"prefill_w{nbits}_{name}_us",
            "value": round(dtq * 1e6, 1), "unit": "us",
            "mfu": round(flops / dtq / 1e12 / PEAK_BF16_TFLOPS, 3),
            "bf16_us": round(dtd * 1e6, 1),
            "bf16_mfu": round(flops / dtd / 1e12 / PEAK_BF16_TFLOPS, 3),
        })
    return out


def probe_flash():
    from quantized_training_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, KV, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, KV, S, D)), jnp.bfloat16)

    def step(ops, c):
        k, v = ops
        q, acc = c
        o = flash_attention(q, k, v, causal=True)
        return q + (0.001 * o).astype(q.dtype), acc + jnp.sum(
            jnp.abs(o[..., 0]).astype(jnp.float32))

    dt = timed_chain(step, (k, v), (q, jnp.zeros((1,), jnp.float32)))
    flops = 4 * H * D * S * (S + 1) / 2  # causal qk + av
    emit({
        "metric": "prefill_flash_layer_us",
        "value": round(dt * 1e6, 1), "unit": "us",
        "mfu_vs_causal_flops": round(
            flops / dt / 1e12 / PEAK_BF16_TFLOPS, 3),
    })
    return dt


def probe_cache_quant():
    from quantized_training_tpu.serving.kv_cache import (
        KVCacheConfig, init_cache, prefill_cache,
    )
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.normal(size=(1, S, KV, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, S, KV, D)), jnp.bfloat16)
    out = {}
    for name, cfg in [
        ("u2", KVCacheConfig.kivi(max_prefill=S, max_decode=160, pack=True)),
        ("i4", KVCacheConfig.int_sym(max_prefill=S, max_decode=160, bits=4)),
    ]:
        cache0 = init_cache(cfg, 1, KV, D)

        def step(ops, c):
            k, v = ops
            x, acc = c
            nc = prefill_cache(cache0, cfg, k + x, v)
            probe = sum(l.ravel()[0].astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(nc))
            return x + 1e-6, acc + probe

        dt = timed_chain(step, (k, v),
                         (jnp.zeros((), jnp.bfloat16),
                          jnp.zeros((1,), jnp.float32)))
        out[name] = dt
        emit({
            "metric": f"prefill_cache_quant_{name}_layer_us",
            "value": round(dt * 1e6, 1), "unit": "us",
        })
    return out


def probe_glue():
    """RMSNorm x2 + rotary + residual adds at layer shape."""
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(1, S, HID)), jnp.bfloat16)
    w = jnp.ones((HID,), jnp.bfloat16)
    cos = jnp.asarray(rng.normal(size=(S, D // 2)), jnp.float32)
    sin = jnp.asarray(rng.normal(size=(S, D // 2)), jnp.float32)

    def rms(x, w):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * w

    def rope(x):
        xr = x.reshape(1, S, H, D)
        x1, x2 = jnp.split(xr, 2, axis=-1)
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        return jnp.concatenate(
            [x1 * c - x2 * s, x1 * s + x2 * c], axis=-1).reshape(1, S, H * D)

    def step(ops, c):
        w, = ops
        x, acc = c
        h = rms(x, w)
        h = rope(h).astype(x.dtype)     # rope's f32 cos/sin upcasts
        h = x + h
        h2 = rms(h, w)
        h = h + h2
        return ((h * 0.5).astype(x.dtype),
                acc + jnp.sum(jnp.abs(h[..., 0]).astype(jnp.float32)))

    dt = timed_chain(step, (w,), (x0, jnp.zeros((1,), jnp.float32)))
    emit({
        "metric": "prefill_glue_layer_us",
        "value": round(dt * 1e6, 1), "unit": "us",
        "note": "2x rmsnorm + rotary + 2x residual add at (1, 2048, 4096)",
    })
    return dt


def main():
    if not SANITY:
        assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S",
                                               "2400")))
    gemms = probe_gemms(4)
    t_flash = probe_flash()
    t_cache = probe_cache_quant()
    t_glue = probe_glue()

    # ---- predicted step from components ----------------------------------
    per_layer_gemm = sum(dtq * cnt for n, (dtq, dtd, cnt) in gemms.items()
                         if n != "lm_head")
    per_layer_gemm_bf16 = sum(
        dtd * cnt for n, (dtq, dtd, cnt) in gemms.items() if n != "lm_head")
    lm = gemms["lm_head"][0]
    lm_bf16 = gemms["lm_head"][1]
    for cache_name, t_cq in t_cache.items():
        pred = (L * (per_layer_gemm + t_flash + t_cq + t_glue) + lm)
        gemm_flops = 2 * S * (
            sum(K * N * c for _, K, N, c in SHAPES) * L + HID * VOCAB)
        attn_flops = L * 4 * H * D * S * (S + 1) / 2
        mfu = (gemm_flops + attn_flops) / pred / 1e12 / PEAK_BF16_TFLOPS
        emit({
            "metric": f"prefill_predicted_step_ms_{cache_name}",
            "value": round(pred * 1e3, 2), "unit": "ms",
            "predicted_mfu": round(mfu, 3),
            "components_ms": {
                "gemms": round(L * per_layer_gemm * 1e3, 2),
                "flash": round(L * t_flash * 1e3, 2),
                "cache_quant": round(L * t_cq * 1e3, 2),
                "glue": round(L * t_glue * 1e3, 2),
                "lm_head": round(lm * 1e3, 2),
            },
            "note": "compare against llama7b serving prefill tokens/s; the "
                    "difference is the unaccounted residual",
        })
    pred_bf16 = (L * (per_layer_gemm_bf16 + t_flash + t_glue) + lm_bf16)
    gemm_flops = 2 * S * (
        sum(K * N * c for _, K, N, c in SHAPES) * L + HID * VOCAB)
    attn_flops = L * 4 * H * D * S * (S + 1) / 2
    emit({
        "metric": "prefill_predicted_step_ms_bf16",
        "value": round(pred_bf16 * 1e3, 2), "unit": "ms",
        "predicted_mfu": round(
            (gemm_flops + attn_flops) / pred_bf16 / 1e12 / PEAK_BF16_TFLOPS,
            3),
    })
    done.set()


if __name__ == "__main__":
    main()
