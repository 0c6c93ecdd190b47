"""On-device timing helper for the tunneled-TPU environment.

This backend has ~30 ms dispatch latency and a lazy block_until_ready, so
host-side loops measure RPC, not compute.  Protocol (see ROUND1_NOTES.md):
run the iteration loop on-device inside one jit, fetch a scalar to force
completion, and subtract the n=1 run to remove dispatch+fetch overhead.

Three traps this version fixes (observed: "0 us" / >1 TB/s readings):
  * a loop body that reads the SAME input every iteration is loop-invariant
    up to the accumulator — XLA hoists the computation out of the fori loop.
    The body must index a different input copy per step (i % copies).
  * reducing only out[:1] lets XLA slice-propagate through ELEMENTWISE
    bodies and compute one element per iteration (a bf16 "copy" measured
    1324 GB/s).  An optimization_barrier on the output forces full
    materialization before the scalar accumulate.
  * the n=1 dispatch baseline is noisy on the tunnel (±2 ms); use many
    iters so the division amortizes it, and extra baseline repeats.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["time_fn"]


def time_fn(fn, *args, iters: int = 128, copies: int = 2,
            repeats: int = 5) -> float:
    """Seconds per call of ``fn(*args)`` (on-device loop protocol).

    ``fn`` must return an array.  Its first argument is replicated into
    ``copies`` slightly perturbed versions; iteration i runs on copy
    i % copies, which defeats loop hoisting/CSE while keeping the working
    set small.
    """
    x0 = args[0]
    rest = args[1:]
    xs = jnp.stack([x0 + jnp.asarray(c * 1e-3, x0.dtype)
                    for c in range(copies)])

    @partial(jax.jit, static_argnames="n")
    def run(n, xs, *rest):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xs, i % copies, keepdims=False)
            out = jax.lax.optimization_barrier(fn(x, *rest))
            return acc + out.ravel()[:1].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(1, xs, *rest))          # compile n=1
    float(run(iters + 1, xs, *rest))  # compile n=iters+1

    def timed(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(n, xs, *rest))
            best = min(best, time.perf_counter() - t0)
        return best

    base = timed(1, 2 * repeats)
    return max((timed(iters + 1, repeats) - base) / iters, 1e-9)
