"""Flash-attention block sweep at the 7B prefill shape (VERDICT r05 #4).

probe_prefill7b measured the flash forward at 0.403 MFU-of-causal-flops at
(1, 32, 2048, 128) — the single biggest non-GEMM share of the prefill gap.
This sweeps (block_q, block_k) against the autotuned default and reports
the best; if a clearly better point exists the autotuner's table gets it.

Prints one JSON line per measurement (-> BENCH_FLASHTUNE_r05.json).
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

PEAK_BF16_TFLOPS = 197.0

B, H, S, D = 1, 32, 2048, 128

SANITY = os.environ.get("QT_PROBE_SANITY") == "1"


def start_watchdog(deadline_s):
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print("probe_flash_blocks watchdog fired", file=sys.stderr,
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


def main():
    if not SANITY:
        assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S",
                                               "2400")))
    from quantized_training_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    flops = 4 * H * D * S * (S + 1) / 2

    rows = []
    grid = [(None, None), (256, 256), (256, 512), (512, 512), (512, 1024),
            (1024, 512), (1024, 1024), (256, 2048), (512, 2048),
            (2048, 256), (1024, 2048), (2048, 512)]
    for bq, bk in grid:
        def step(ops, c, bq=bq, bk=bk):
            k, v = ops
            q, acc = c
            o = flash_attention(q, k, v, causal=True, block_q=bq,
                                block_k=bk)
            return (q + (0.001 * o).astype(q.dtype),
                    acc + jnp.sum(jnp.abs(o[..., 0]).astype(jnp.float32)))

        try:
            dt = timed_chain(step, (k, v),
                             (q, jnp.zeros((1,), jnp.float32)), repeats=3)
            rows.append({"bq": bq, "bk": bk, "us": round(dt * 1e6, 1),
                         "mfu": round(flops / dt / 1e12
                                      / PEAK_BF16_TFLOPS, 3)})
        except Exception as e:  # noqa: BLE001
            rows.append({"bq": bq, "bk": bk,
                         "error": str(e).splitlines()[0][:120]})
        print(json.dumps({"metric": "flashtune_point", **rows[-1]}),
              flush=True)
    best = min((r for r in rows if "us" in r), key=lambda r: r["us"])
    print(json.dumps({
        "metric": "flashtune_best", "value": best["us"], "unit": "us",
        "config": best, "shape": f"B{B} H{H} S{S} D{D} causal",
    }), flush=True)
    done.set()


if __name__ == "__main__":
    main()
