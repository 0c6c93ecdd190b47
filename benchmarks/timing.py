"""On-device timing helper for the tunneled-TPU environment.

This backend has ~30 ms dispatch latency and a lazy block_until_ready, so
host-side loops measure RPC, not compute.  Protocol (see ROUND1_NOTES.md):
run the iteration loop on-device inside one jit (data dependence between
iterations so XLA can't hoist the body), fetch a scalar to force completion,
and subtract the n=1 run to remove dispatch+fetch overhead.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["time_fn"]


def time_fn(fn, *args, iters: int = 8, repeats: int = 3) -> float:
    """Seconds per call of ``fn(*args)`` (on-device loop protocol).

    ``fn`` must return an array; its first argument is threaded through
    iterations with a small perturbation to create a data dependence.
    """

    @partial(jax.jit, static_argnames="n")
    def run(n, x0, *rest):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *rest)
            acc = acc + jnp.sum(out.ravel()[:1].astype(jnp.float32))
            # data dependence without changing magnitude
            x = x + jnp.zeros((), x.dtype) * acc.astype(x.dtype)
            return x, acc

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))
        return acc

    float(run(1, *args))          # compile n=1
    float(run(iters + 1, *args))  # compile n=iters+1

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters + 1) - timed(1)) / iters
