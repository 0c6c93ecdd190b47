"""Component-level probe of the 7B decode step (why 22% of roofline?).

BENCH_SERVING7B_r03: the composed w4a16 + KIVI decode step runs 34.6 ms vs a
7.7 ms HBM bound.  This times each component at its exact 7B shape so the
gap decomposes into (a) the affine storage matmuls, (b) the fused KIVI
attention, (c) everything else, each against its own byte bound.

Per-op streaming protocol (ROUND2_NOTES): L distinct weight instances per
shape chained in one on-device fori so codes can't go VMEM-resident; scalar
fetch; two-point subtraction.  Prints one JSON line per measurement.
"""

import json
import math
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

B = 8                 # decode slots (matches llama7b_serving)
GROUP = 64
SHAPES = [            # (K, N, count per layer) LLaMA-2 7B decode GEMMs
    ("qkvo", 4096, 4096, 4),
    ("gate_up", 4096, 11008, 2),
    ("down", 11008, 4096, 1),
    ("lm_head", 4096, 32000, 1),
]

# QT_PROBE_SANITY=1: run the whole probe off-TPU on toy shapes — validates
# the plumbing (pack, kernels, timing protocol) where no chip is attached;
# the printed rates are meaningless there and are tagged "sanity": true.
SANITY = os.environ.get("QT_PROBE_SANITY") == "1"
if SANITY:
    SHAPES = [("qkvo", 256, 256, 4), ("down", 512, 256, 1)]


def emit(rec):
    if SANITY:
        rec["sanity"] = True
    print(json.dumps(rec), flush=True)


def start_watchdog(deadline_s):
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print("probe_decode7b watchdog fired", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done


def timed_chain(step, operands, state0, n1=8, n2=200, repeats=5):
    """step: (operands, carry) -> carry with data dependence; returns s/iter.

    Two measurement hazards on this tunneled TPU platform, both hit by the
    original probe (it printed negative times and >4x-of-peak rates):

    * ``operands`` (the weights) MUST be jit *arguments*, never closed-over —
      closure arrays become executable-embedded constants, which here made
      compiles hang for minutes and timing garbage; passed as args the same
      loop measures a clean 82%-of-roofline bf16 stream.
    * Dispatch overhead is ~25 ms with ~1-2 ms jitter, so the two-point
      spread (n2 - n1) must put the per-iteration signal well above that.
    """
    @partial(jax.jit, static_argnames="n")
    def run(operands, state, n):
        def body(i, c):
            return step(operands, c)
        out = jax.lax.fori_loop(0, n, body, state)
        # EVERY carry leaf must feed the fetched scalar: returning only
        # leaf[0] (the x counter, which doesn't depend on the matmuls) let
        # XLA dead-code-eliminate the whole compute chain — the probe then
        # measured pure dispatch (">200x of HBM peak").
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


def probe_affine(nbits):
    from quantized_training_tpu.ops.pallas.affine_storage import (
        affine_matmul, pack_affine_weights,
    )
    rng = np.random.default_rng(0)
    L = 4
    for name, K, N, cnt in SHAPES:
        packs = []
        for i in range(L):
            w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
            packs.append(jax.jit(
                lambda w: pack_affine_weights(w, nbits, GROUP))(w))
        jax.block_until_ready(packs)
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)

        def step(packs, c):
            x, acc = c
            for p, s, z in packs:
                y = affine_matmul(x, p, s, z, nbits=nbits, group_size=GROUP,
                                  out_dtype=jnp.bfloat16)
                acc = acc + jnp.sum(y[..., :1].astype(jnp.float32))
            return x + 1, acc

        dt = timed_chain(step, packs,
                         (x0, jnp.zeros((1,), jnp.float32))) / L
        code_bytes = K * N * nbits // 8
        qparam_bytes = 2 * 4 * (K // GROUP) * N
        gbs = (code_bytes + qparam_bytes) / dt / 1e9
        emit({
            "metric": f"affine_w{nbits}_{name}_us",
            "value": round(dt * 1e6, 1), "unit": "us",
            "shape": f"({B},{K})x({K},{N})",
            "stream_gb_per_s": round(gbs, 1),
            "fraction_of_hbm": round(gbs / PEAK_HBM_GBS, 3),
            "per_step_ms_contribution": round(dt * cnt * 32 * 1e3, 2)
            if name != "lm_head" else round(dt * 1e3, 2),
        })


def probe_bf16_dense():
    rng = np.random.default_rng(1)
    L = 4
    for name, K, N, cnt in SHAPES:
        ws = [jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
              for _ in range(L)]
        jax.block_until_ready(ws)
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)

        def step(ws, c):
            x, acc = c
            for w in ws:
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                # abs before the reduce: a *linear* functional of y (slice
                # or plain sum) lets XLA fold the reduction into w and DCE
                # the matmul (observed: "3544 GB/s" on an 819 GB/s part)
                acc = acc + jnp.sum(jnp.abs(y))
            return x + 1, acc

        dt = timed_chain(step, ws, (x0, jnp.zeros((1,), jnp.float32))) / L
        gbs = (K * N * 2) / dt / 1e9
        emit({
            "metric": f"bf16_dense_{name}_us",
            "value": round(dt * 1e6, 1), "unit": "us",
            "stream_gb_per_s": round(gbs, 1),
            "fraction_of_hbm": round(gbs / PEAK_HBM_GBS, 3),
        })


def probe_kivi_decode():
    """Fused KIVI decode attention at the exact 7B shape (one layer)."""
    from quantized_training_tpu.ops.pallas.kivi_attention import (
        kivi_decode_attention,
    )
    H = KV = 32
    D = 128
    P = 2048            # main-tier tokens
    R = 160             # residual tier
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

    def step(ops, c):
        kc, ks, kz, vc, vs, vz, kr, vr, ml, rl = ops
        q, acc = c
        o = kivi_decode_attention(q, kc, ks, kz, vc, vs, vz, kr, vr, ml, rl,
                                  bits_k=bits, bits_v=bits)
        return q + 0.001 * o, acc + jnp.sum(o[..., 0].astype(jnp.float32))

    dt = timed_chain(step, (kc, ks, kz, vc, vs, vz, kr, vr, ml, rl),
                     (q, jnp.zeros((1,), jnp.float32)))
    code_b = 2 * B * KV * (P * bits // 32) * D * 4  # int32 words
    qp_b = (ks.size + kz.size + vs.size + vz.size) * 2  # bf16, as kv_cache stores them
    res_b = (kr.size + vr.size) * 2
    total = code_b + qp_b + res_b
    gbs = total / dt / 1e9
    emit({
        "metric": "kivi_decode_layer_us",
        "value": round(dt * 1e6, 1), "unit": "us",
        "shape": f"B{B} KV{KV} P{P} R{R} D{D} uint{bits}",
        "bytes": {"codes": code_b, "qparams": qp_b, "residual": res_b},
        "stream_gb_per_s": round(gbs, 1),
        "fraction_of_hbm": round(gbs / PEAK_HBM_GBS, 3),
        "per_step_ms_contribution": round(dt * 32 * 1e3, 2),
    })


def main():
    if not SANITY:
        assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S", "2000")))
    probe_bf16_dense()
    probe_affine(4)
    probe_affine(2)
    if not SANITY:
        probe_kivi_decode()
    done.set()


if __name__ == "__main__":
    main()
