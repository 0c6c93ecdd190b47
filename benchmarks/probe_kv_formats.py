"""Race of KV-cache decode-attention structures at the exact 7B geometry.

VERDICT r04 #1: the uint2 KIVI kernel is 53% of the w4a16 decode step at 20%
of its byte bound, critical-path-bound at ~430 us/layer, and the round-4
ablation says the *structure* (M=1 serial chain per (batch, kv-head) with
VPU unpack + zero-point correction dots on the path) is the problem.  This
probe races the structural alternatives — per-token symmetric int8/int4
caches whose scales fold out of the (P, D) element path, including the
fully-integer variant whose s8 codes feed the MXU directly — against the
incumbent, all at (B=8, KV=32, P=2048, R=160, D=128), with an on-chip
correctness check against the XLA dequant-then-attend reference first.

Timing protocol: probe_decode7b's timed_chain (operands as jit args, every
carry leaf feeds the fetched scalar, two-point subtraction).  Prints one
JSON line per measurement (collected into BENCH_KVRACE_r05.json).
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

B, KV, P, R, D = 8, 32, 2048, 160, 128
H = KV                                   # 7B is MHA: group = 1
SCALE = 1.0 / np.sqrt(D)

SANITY = os.environ.get("QT_PROBE_SANITY") == "1"
if SANITY:
    B, KV, P, R, D = 2, 2, 256, 32, 128
    H = KV


def emit(rec):
    if SANITY:
        rec["sanity"] = True
    print(json.dumps(rec), flush=True)


def start_watchdog(deadline_s):
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print("probe_kv_formats watchdog fired", file=sys.stderr,
                  flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done


def timed_chain(step, operands, state0, n1=8, n2=200, repeats=5):
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


# ----------------------------------------------------------------- data
def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, KV, P, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, KV, P, D)), jnp.float32)
    kr = jnp.asarray(rng.normal(size=(B, KV, R, D)), jnp.bfloat16)
    vr = jnp.asarray(rng.normal(size=(B, KV, R, D)), jnp.bfloat16)
    ml = jnp.full((B,), P, jnp.int32)
    rl = jnp.full((B,), R // 2, jnp.int32)
    return q, k, v, kr, vr, ml, rl


def quant_per_token(x, qmax):
    """(B, KV, T, D) -> (codes int32, scale (B, KV, T)) symmetric."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-30)
    sf = amax / qmax
    codes = jnp.clip(jnp.round(x / sf[..., None]), -qmax, qmax)
    return codes.astype(jnp.int32), sf.astype(jnp.float32)


def pack_planar_signed(codes, bits):
    """(…, P, D) signed codes -> (…, P*bits//32, D) int32 token-planar."""
    from quantized_training_tpu.serving.kv_cache import pack_tokens_planar
    mid = 1 << (bits - 1)
    return pack_tokens_planar((codes + mid).astype(jnp.int32), bits)


def reference_attention(q, k_main, v_main, kr, vr, ml, rl):
    """XLA dequant-then-attend reference (f32)."""
    qf = q.astype(jnp.float32) * SCALE
    ka = jnp.concatenate([k_main, kr.astype(jnp.float32)], axis=2)
    va = jnp.concatenate([v_main, vr.astype(jnp.float32)], axis=2)
    s = jnp.einsum("bhd,bhtd->bht", qf, ka)
    t_idx = jnp.arange(P + R)[None, None, :]
    ok_main = (t_idx < ml[:, None, None]) & (t_idx < P)
    ok_res = (t_idx >= P) & ((t_idx - P) < rl[:, None, None])
    s = jnp.where(ok_main | ok_res, s, -2.0 ** 30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p, va)


# ----------------------------------------------------------------- arms
def build_arms():
    """Returns {name: (fn(ops, q), ops, bytes_moved, ref_out)}."""
    from quantized_training_tpu.ops.pallas.int_kv_attention import (
        int_kv_decode_attention,
    )

    q, k, v, kr, vr, ml, rl = make_inputs()
    arms = {}

    kc, ks = quant_per_token(k, 127)
    vc, vs = quant_per_token(v, 127)
    kd = kc.astype(jnp.float32) * ks[..., None]
    vd = vc.astype(jnp.float32) * vs[..., None]
    ref8 = reference_attention(q, kd, vd, kr, vr, ml, rl)

    kc8 = kc.astype(jnp.int8)
    vc8 = vc.astype(jnp.int8)
    kc8_t = jnp.swapaxes(kc8, 2, 3)                # (B, KV, D, P)
    ks4 = ks[:, :, None, :]                        # (B, KV, 1, P)
    vs4 = vs[:, :, None, :]
    s8_bytes = (kc8.size + vc8.size) + (ks4.size + vs4.size) * 4 \
        + (kr.size + vr.size) * 2

    def mk8(int_dots, k_transposed):
        kcx = kc8_t if k_transposed else kc8

        def fn(ops, qq):
            kcx, ks4, vc8, vs4, kr, vr, ml, rl = ops
            return int_kv_decode_attention(
                qq, kcx, ks4, vc8, vs4, kr, vr, ml, rl,
                bits=8, int_dots=int_dots, k_transposed=k_transposed)
        return fn, (kcx, ks4, vc8, vs4, kr, vr, ml, rl)

    for name, args in [
        ("s8_int_kt", (True, True)),
        ("s8_int", (True, False)),
        ("s8_bf16_kt", (False, True)),
        ("s8_bf16", (False, False)),
    ]:
        fn, ops = mk8(*args)
        arms[name] = (fn, ops, s8_bytes, ref8)

    # int4 per-token symmetric, planar-packed, bf16 path
    kc4, ks_4 = quant_per_token(k, 7)
    vc4, vs_4 = quant_per_token(v, 7)
    kd4 = kc4.astype(jnp.float32) * ks_4[..., None]
    vd4 = vc4.astype(jnp.float32) * vs_4[..., None]
    ref4 = reference_attention(q, kd4, vd4, kr, vr, ml, rl)
    kc4p = pack_planar_signed(kc4, 4)
    vc4p = pack_planar_signed(vc4, 4)
    ks44 = ks_4[:, :, None, :]
    vs44 = vs_4[:, :, None, :]
    s4_bytes = (kc4p.size + vc4p.size) * 4 + (ks44.size + vs44.size) * 4 \
        + (kr.size + vr.size) * 2

    def fn4(ops, qq):
        kc4p, ks44, vc4p, vs44, kr, vr, ml, rl = ops
        return int_kv_decode_attention(
            qq, kc4p, ks44, vc4p, vs44, kr, vr, ml, rl,
            bits=4, int_dots=False, k_transposed=False)
    arms["s4_bf16"] = (fn4, (kc4p, ks44, vc4p, vs44, kr, vr, ml, rl),
                       s4_bytes, ref4)

    return q, arms


def build_kivi_baseline():
    """The incumbent uint2 kernel at the same geometry (synthetic qparams,
    timing-only — its accuracy is covered by the packed≡unpacked tests)."""
    from quantized_training_tpu.ops.pallas.kivi_attention import (
        kivi_decode_attention,
    )
    bits = 2
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    kc = jnp.asarray(
        rng.integers(-2**31, 2**31, (B, KV, P * bits // 32, D)), jnp.int32)
    ks = jnp.asarray(rng.random((B, KV, P // 32, D)) * 0.1 + 0.01,
                     jnp.bfloat16)
    kz = jnp.asarray(rng.random((B, KV, P // 32, D)), jnp.bfloat16)
    vc = jnp.asarray(
        rng.integers(-2**31, 2**31, (B, KV, P * bits // 32, D)), jnp.int32)
    vs = jnp.asarray(rng.random((B, KV, P, D // 32)) * 0.1 + 0.01,
                     jnp.bfloat16)
    vz = jnp.asarray(rng.random((B, KV, P, D // 32)), jnp.bfloat16)
    kr = jnp.asarray(rng.normal(size=(B, KV, R, D)), jnp.bfloat16)
    vr = jnp.asarray(rng.normal(size=(B, KV, R, D)), jnp.bfloat16)
    ml = jnp.full((B,), P, jnp.int32)
    rl = jnp.full((B,), R // 2, jnp.int32)

    def fn(ops, qq):
        kc, ks, kz, vc, vs, vz, kr, vr, ml, rl = ops
        return kivi_decode_attention(qq, kc, ks, kz, vc, vs, vz, kr, vr,
                                     ml, rl, bits_k=bits, bits_v=bits)
    code_b = 2 * B * KV * (P * bits // 32) * D * 4
    qp_b = (ks.size + kz.size + vs.size + vz.size) * 2
    res_b = (kr.size + vr.size) * 2
    return q, fn, (kc, ks, kz, vc, vs, vz, kr, vr, ml, rl), \
        code_b + qp_b + res_b


def main():
    if not SANITY:
        assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S",
                                               "2400")))
    only = os.environ.get("QT_KV_ARMS")
    only = set(only.split(",")) if only else None

    q, arms = build_arms()
    for name, (fn, ops, nbytes, ref) in arms.items():
        if only and name not in only:
            continue
        # correctness first: one call vs the XLA dequant reference
        try:
            out = np.asarray(jax.jit(fn)(ops, q), np.float32)
        except Exception as e:  # noqa: BLE001 — Mosaic lowering may reject
            emit({"metric": f"kv_{name}_layer_us", "value": None,
                  "error": str(e).splitlines()[0][:200]})
            continue
        refn = np.asarray(ref, np.float32)
        # scale-normalized error: the output is bf16 and attention outputs
        # cross zero, so pointwise relative error only measures the 1e-3
        # epsilon at near-zero elements
        rel = float(np.max(np.abs(out - refn)) / np.max(np.abs(refn)))

        def step(ops, c, fn=fn):
            qq, acc = c
            o = fn(ops, qq)
            return (qq + (0.001 * o).astype(qq.dtype),
                    acc + jnp.sum(o[..., 0].astype(jnp.float32)))

        dt = timed_chain(step, ops, (q, jnp.zeros((1,), jnp.float32)))
        gbs = nbytes / dt / 1e9
        emit({
            "metric": f"kv_{name}_layer_us",
            "value": round(dt * 1e6, 1), "unit": "us",
            "shape": f"B{B} KV{KV} P{P} R{R} D{D}",
            "bytes_per_call": int(nbytes),
            "stream_gb_per_s": round(gbs, 1),
            "fraction_of_hbm": round(gbs / PEAK_HBM_GBS, 3),
            "per_step_ms_contribution": round(dt * 32 * 1e3, 2),
            "scaled_max_err_vs_dequant_ref": round(rel, 5),
        })

    if not SANITY and (only is None or "u2_kivi" in only):
        q, fn, ops, nbytes = build_kivi_baseline()

        def step(ops, c):
            qq, acc = c
            o = fn(ops, qq)
            return (qq + (0.001 * o).astype(qq.dtype),
                    acc + jnp.sum(o[..., 0].astype(jnp.float32)))

        dt = timed_chain(step, ops, (q, jnp.zeros((1,), jnp.float32)))
        gbs = nbytes / dt / 1e9
        emit({
            "metric": "kv_u2_kivi_layer_us",
            "value": round(dt * 1e6, 1), "unit": "us",
            "bytes_per_call": int(nbytes),
            "stream_gb_per_s": round(gbs, 1),
            "fraction_of_hbm": round(gbs / PEAK_HBM_GBS, 3),
            "per_step_ms_contribution": round(dt * 32 * 1e3, 2),
        })

    done.set()


if __name__ == "__main__":
    main()
