"""Optimizer-step probe: where does the adam8bit_delta (+12.85 ms,
BENCH_TRAIN_r04.json) actually sit?

Times, at the train-bench state size (536M f32 params as one packable
leaf), each candidate on its own:

  1. f32 adamw   — ``optax.adamw`` update + apply (the bf16 arm's cost)
  2. adam8bit    — ``training.adam8bit`` update + apply (packed fused path)
  3. kernel only — ``fused_adam8bit_update_packed`` standalone
  4. stream bound — an XLA f32 triad a*x+y at the same logical element
     count, as the platform's fused-elementwise ceiling reference

Each row reports GB/s against its *minimum* byte traffic, so "fraction"
compares implementations against their own speed-of-light (the exact
per-element byte accounting lives next to each measurement below):
  f32 adam   32 B/elem (m/v read+write 16, g read 4, p read+write 8,
             upd write 4)
  adam8bit   20.1 B/elem for the full update+apply path (g4 + codes 2r/2w
             + upd4 + p read+write 8 + scales); the standalone kernel row
             uses its kernel-only traffic of ~12.1 B/elem (no p apply)

Protocol: on-device fori loop carrying (params, opt_state) — the state
evolving through iterations defeats hoisting/CSE; the returned carry is
barriered and probed leaf-wise so nothing is DCE'd (PERF_ANALYSIS §6).
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

N_PARAMS = 131072 * 4096          # 536.9M, rows divisible by 512*256
SHAPE = (131072, 4096)


def time_opt(opt, params, repeats=4, iters=24):
    state = jax.jit(opt.init)(params)

    @partial(jax.jit, static_argnames="n")
    def run(params, state, g0, n):
        def body(i, carry):
            p, s = carry
            g = jax.tree_util.tree_map(
                lambda x: x * (1.0 + 1e-6 * i), g0)
            upd, s = opt.update(g, s, p)
            p = optax.apply_updates(p, upd)
            return p, s
        p, s = jax.lax.optimization_barrier(
            jax.lax.fori_loop(0, n, body, (params, state)))
        return sum(l.ravel()[0].astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves((p, s)))

    g0 = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, 1e-4, jnp.float32), params)
    float(run(params, state, g0, 1))
    float(run(params, state, g0, iters + 1))

    def timed(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, state, g0, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters + 1, repeats) - timed(1, 2 * repeats)) / iters


def main():
    # the axon TPU plugin registers itself regardless of the JAX_PLATFORMS
    # env var; only the jax_platforms *config* overrides it (same dance as
    # tests/conftest.py) — honor the env var here for CPU sanity runs
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    sanity = backend != "tpu"
    global SHAPE, N_PARAMS
    if sanity:  # plumbing check on CPU: tiny shapes
        SHAPE = (1024, 256)
        N_PARAMS = SHAPE[0] * SHAPE[1]

    from quantized_training_tpu.training import adam8bit

    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, SHAPE, jnp.float32) * 0.02}

    skip_opt = os.environ.get("QT_PROBE_SKIP_OPT") == "1"

    # 1. f32 adamw --------------------------------------------------------
    t = 1.0 if skip_opt else time_opt(optax.adamw(1e-4), params)
    # moments r+w (16) + g read (4) + upd materialize ~ (4) + p r+w (8)
    byte_bound = N_PARAMS * 32
    skip_opt or print(json.dumps({
        "metric": "opt_f32_adamw_ms", "value": round(t * 1e3, 2),
        "unit": "ms", "n_params": N_PARAMS,
        "gb_per_s_vs_min_traffic": round(byte_bound / t / 1e9, 1),
    }), flush=True)

    # 2. adam8bit (packed fused path on TPU) ------------------------------
    t8 = 1.0 if skip_opt else time_opt(adam8bit(1e-4), params)
    byte_bound8 = int(N_PARAMS * 20.1)  # codes 2r+2w, scales, g4, upd4, p8
    skip_opt or print(json.dumps({
        "metric": "opt_adam8bit_ms", "value": round(t8 * 1e3, 2),
        "unit": "ms", "n_params": N_PARAMS,
        "gb_per_s_vs_min_traffic": round(byte_bound8 / t8 / 1e9, 1),
        "delta_vs_f32_ms": round((t8 - t) * 1e3, 2),
    }), flush=True)

    # 3. the packed kernel standalone -------------------------------------
    from quantized_training_tpu.ops.pallas.adam8bit_step import (
        fused_adam8bit_update_packed, pack_moment_rows, pack_scale_rows,
        packable_rows)
    sys.path.insert(0, os.path.dirname(__file__))
    from timing import time_fn

    del params  # free 2.1 GB before the standalone-kernel stage
    # quarter size: time_fn stacks perturbed copies of g2d, and full size
    # OOMs next to the kernel outputs; GB/s is size-independent here
    nb = N_PARAMS // 256 // 4
    n_kernel = nb * 256
    if packable_rows(nb) and not sanity:
        g2d = jnp.full((nb, 256), 1e-4, jnp.float32)
        mw = pack_moment_rows(jnp.zeros((nb, 256), jnp.int8))
        ms = pack_scale_rows(jnp.ones((nb,), jnp.float32))
        vw = pack_moment_rows(jnp.zeros((nb, 256), jnp.int8))
        vs = pack_scale_rows(jnp.ones((nb,), jnp.float32))
        bc = jnp.float32(0.1)

        def call(g2d, mw, ms, vw, vs):
            u, mo, mso, vo, vso = fused_adam8bit_update_packed(
                g2d, mw, ms, vw, vs, bc, bc, b1=0.9, b2=0.999, eps=1e-8)
            # one pallas_call produces all five outputs — using any one of
            # them keeps the whole kernel live; touch the others' first
            # element so XLA cannot drop the result buffers either
            return u + (mo[0, 0] + vo[0, 0]).astype(jnp.float32) \
                + mso[0, 0] + vso[0, 0]

        tk = time_fn(call, g2d, mw, ms, vw, vs, iters=32)
        kbytes = n_kernel * 12.1
        print(json.dumps({
            "metric": "opt_adam8bit_kernel_only_ms",
            "value": round(tk * 1e3, 2), "unit": "ms",
            "gb_per_s_vs_min_traffic": round(kbytes / tk / 1e9, 1),
        }), flush=True)

    # 4. XLA f32 triad stream reference (quarter size: full-size operand
    # stacks OOM after stage 3's buffers) ---------------------------------
    n_triad = N_PARAMS // 4 if not sanity else N_PARAMS
    x = jnp.ones((n_triad // 1024, 1024), jnp.float32)
    y = jnp.ones((n_triad // 1024, 1024), jnp.float32)
    tt = time_fn(lambda a, b: a * 0.9 + b * 0.1, x, y, iters=64)
    print(json.dumps({
        "metric": "opt_xla_f32_triad_ms", "value": round(tt * 1e3, 3),
        "unit": "ms",
        "gb_per_s": round(n_triad * 12 / tt / 1e9, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
