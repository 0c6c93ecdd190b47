"""w2a16 structural experiments (VERDICT r05 #2): can w2 earn its bytes?

The r04 probe measured the w2 GEMM kernel at 166-187 GB/s (0.20-0.23 of
HBM) and *absolutely slower* than w4 at identical logical shapes: the
per-code VPU/MXU instruction work is constant while the bytes halve, so the
kernel is issue-bound, not byte-bound.  This probe runs the two structural
moves the verdict names, plus a block-shape retune, and measures honestly:

  1. int4-dot feasibility: does an s4 x s4 MXU dot lower on this toolchain
     at all (XLA level)?  If yes, a w2->s4 path could halve MXU passes.
  2. stream-expand: a per-word bit-op pass converts w2 words (16 x 2-bit
     fields) into two w4 words (8 x 4-bit fields, w2-centered values), then
     the *proven* w4 kernel consumes them.  Total traffic 1.25 B/code vs
     0.25 direct — wins only if the w2 kernel's issue-bound rate is worse
     than the extra bytes cost.  Raced both as an XLA pre-pass (elementwise
     streams at 535-573 GB/s here) and fused per-step.
  3. block-shape retune for the direct w2 kernel at decode shapes (forced
     block_k = kp, widened block_n).

Prints one JSON line per measurement (-> BENCH_W2X_r05.json).
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
B = 8
GROUP = 64
SHAPES = [
    ("qkvo", 4096, 4096),
    ("gate_up", 4096, 11008),
    ("down13b", 13824, 5120),
]

SANITY = os.environ.get("QT_PROBE_SANITY") == "1"
if SANITY:
    SHAPES = [("qkvo", 256, 256)]


def emit(rec):
    if SANITY:
        rec["sanity"] = True
    print(json.dumps(rec), flush=True)


def start_watchdog(deadline_s):
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print("probe_w2_expand watchdog fired", file=sys.stderr,
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


# ---------------------------------------------------------------- 1. s4 dot
def probe_int4_dot():
    """Does XLA lower an int4 x int4 -> int32 dot on this TPU?"""
    try:
        # int8 host arrays; the s4 cast happens inside the jitted fn
        # (device-side jnp.asarray(..., int4) tripped a recursive-jit error
        # on this platform)
        a8 = jnp.asarray(np.random.default_rng(0).integers(-7, 8, (128, 256)),
                         jnp.int8)
        b8 = jnp.asarray(np.random.default_rng(1).integers(-7, 8, (256, 128)),
                         jnp.int8)
        fn = jax.jit(lambda a, b: jax.lax.dot_general(
            a.astype(jnp.int4), b.astype(jnp.int4), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        txt = fn.lower(a8, b8).compile().as_text()
        out = np.asarray(fn(a8, b8))
        ref = (np.asarray(a8, np.int32) @ np.asarray(b8, np.int32))
        ok = bool((out == ref).all())
        emit({"metric": "w2x_int4_dot_lowers", "value": int(ok),
              "unit": "bool", "s4_in_hlo": int("s4[" in txt),
              "note": "correct result; s4_in_hlo says whether s4 survives "
                      "into the compiled device HLO or is widened away"})
    except Exception as e:  # noqa: BLE001
        emit({"metric": "w2x_int4_dot_lowers", "value": 0, "unit": "bool",
              "error": str(e).splitlines()[0][:200]})


# ------------------------------------------------------- 2. stream-expand
def expand_w2_words_to_w4(packed2):
    """(K/16, N) int32 w2 words -> (K/8, N) int32 w4 words holding the same
    centered code values in 4-bit two's-complement fields.

    w2 word r covers original rows r*16+p; rows p<8 land in w4 word 2r
    field p, rows p>=8 in word 2r+1 field p-8 — so the expansion is a pure
    per-word bit op, interleaved back as (K/16, 2, N) -> (K/8, N)."""
    kp2, N = packed2.shape
    even = jnp.zeros((kp2, N), jnp.int32)
    odd = jnp.zeros((kp2, N), jnp.int32)
    for p in range(8):
        c_lo = (packed2 << (32 - 2 * (p + 1))) >> 30       # rows p
        c_hi = (packed2 << (32 - 2 * (p + 9))) >> 30       # rows p+8
        even = even | ((c_lo & 0xF) << (4 * p))
        odd = odd | ((c_hi & 0xF) << (4 * p))
    return jnp.stack([even, odd], axis=1).reshape(kp2 * 2, N)


def probe_expand(name, K, N):
    from quantized_training_tpu.ops.pallas.affine_storage import (
        affine_matmul, pack_affine_weights,
    )
    rng = np.random.default_rng(0)
    L = 4
    packs2 = []
    for i in range(L):
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
        packs2.append(jax.jit(
            lambda w: pack_affine_weights(w, 2, GROUP))(w))
    jax.block_until_ready(packs2)
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)

    # correctness: expanded codes through the w4 kernel == direct w2 kernel
    p2, sf, zp = packs2[0]
    p4 = expand_w2_words_to_w4(p2)
    y2 = affine_matmul(x0, p2, sf, zp, nbits=2, group_size=GROUP,
                       out_dtype=jnp.float32)
    # zp adjustment: the w4 kernel subtracts mid=8 where these codes were
    # centered at mid2=2 -> shift zp by (8 - 2) so (zp' - 8) == (zp - 2)
    y4 = affine_matmul(x0, p4, sf, zp + 6.0, nbits=4, group_size=GROUP,
                       out_dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(y2 - y4)) / (jnp.max(jnp.abs(y2)) + 1e-9))
    emit({"metric": f"w2x_expand_correct_{name}", "value": round(err, 6),
          "unit": "scaled_max_err", "pass": int(err < 2e-2)})

    # direct w2 (baseline at this shape)
    def step2(packs, c):
        x, acc = c
        for p, s, z in packs:
            y = affine_matmul(x, p, s, z, nbits=2, group_size=GROUP,
                              out_dtype=jnp.bfloat16)
            acc = acc + jnp.sum(y[..., :1].astype(jnp.float32))
        return x + 1, acc

    dt2 = timed_chain(step2, packs2, (x0, jnp.zeros((1,), jnp.float32))) / L

    # per-step fused expand + w4 kernel
    def step_x(packs, c):
        x, acc = c
        for p, s, z in packs:
            p4 = expand_w2_words_to_w4(p)
            y = affine_matmul(x, p4, s, z + 6.0, nbits=4, group_size=GROUP,
                              out_dtype=jnp.bfloat16)
            acc = acc + jnp.sum(y[..., :1].astype(jnp.float32))
        return x + 1, acc

    dtx = timed_chain(step_x, packs2, (x0, jnp.zeros((1,), jnp.float32))) / L

    # pre-expanded w4 kernel (the floor the expansion chases: w2 codes
    # kept in HBM as w4 words, i.e. pay 2x bytes once at load time)
    packs4 = [(expand_w2_words_to_w4(p), s, z + 6.0) for p, s, z in packs2]
    jax.block_until_ready(packs4)

    def step4(packs, c):
        x, acc = c
        for p, s, z in packs:
            y = affine_matmul(x, p, s, z, nbits=4, group_size=GROUP,
                              out_dtype=jnp.bfloat16)
            acc = acc + jnp.sum(y[..., :1].astype(jnp.float32))
        return x + 1, acc

    dt4 = timed_chain(step4, packs4, (x0, jnp.zeros((1,), jnp.float32))) / L

    code_b2 = K * N * 2 // 8
    gbs2 = code_b2 / dt2 / 1e9
    emit({
        "metric": f"w2x_{name}_us", "unit": "us",
        "direct_w2_us": round(dt2 * 1e6, 1),
        "fused_expand_w4_us": round(dtx * 1e6, 1),
        "preexpanded_w4_us": round(dt4 * 1e6, 1),
        "value": round(min(dt2, dtx, dt4) * 1e6, 1),
        "direct_w2_gbs": round(gbs2, 1),
        "direct_w2_fraction_of_hbm": round(gbs2 / PEAK_HBM_GBS, 3),
        "winner": ["direct_w2", "fused_expand", "preexpanded_w4"][
            int(np.argmin([dt2, dtx, dt4]))],
    })


# ------------------------------------------------- 3. block-shape retune
def probe_retune(name, K, N):
    from quantized_training_tpu.ops.pallas.affine_storage import (
        affine_matmul, pack_affine_weights,
    )
    rng = np.random.default_rng(0)
    L = 4
    packs = []
    for i in range(L):
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32)
        packs.append(jax.jit(lambda w: pack_affine_weights(w, 2, GROUP))(w))
    jax.block_until_ready(packs)
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    kp = K // 16
    rows = []
    for bk, bn in [(None, None), (kp, 512), (kp, 1024), (kp, 2048),
                   (kp // 2, 2048), (kp // 4, 4096)]:
        if bk is not None and (kp % bk or N % bn or bk % (GROUP // 16)):
            continue

        def step(packs, c, bk=bk, bn=bn):
            x, acc = c
            for p, s, z in packs:
                y = affine_matmul(x, p, s, z, nbits=2, group_size=GROUP,
                                  block_m=B if bk else None, block_k=bk,
                                  block_n=bn, out_dtype=jnp.bfloat16)
                acc = acc + jnp.sum(y[..., :1].astype(jnp.float32))
            return x + 1, acc

        try:
            dt = timed_chain(step, packs,
                             (x0, jnp.zeros((1,), jnp.float32)), repeats=3) / L
            rows.append({"block_k": bk, "block_n": bn,
                         "us": round(dt * 1e6, 1)})
        except Exception as e:  # noqa: BLE001
            rows.append({"block_k": bk, "block_n": bn,
                         "error": str(e).splitlines()[0][:120]})
    best = min((r for r in rows if "us" in r), key=lambda r: r["us"],
               default=None)
    emit({"metric": f"w2x_retune_{name}", "unit": "us",
          "value": best["us"] if best else None, "grid": rows})


def main():
    if not SANITY:
        assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S",
                                               "2400")))
    probe_int4_dot()
    for name, K, N in SHAPES:
        probe_expand(name, K, N)
    for name, K, N in SHAPES:
        probe_retune(name, K, N)
    done.set()


if __name__ == "__main__":
    main()
