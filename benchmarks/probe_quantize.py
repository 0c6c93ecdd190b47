"""TPU probes: where does the quantized-forward gap actually go?

Measures, at the bench shapes (LLaMA-stack 2048x8L, B4 S1024 => M=4096):
  1. bf16 matmul TFLOP/s (XLA)
  2. standalone activation-quantize pass (XLA chain vs Pallas kernel), GB/s
  3. quantize+matmul composed (XLA) vs Pallas fused quantized_matmul

Run alone on the chip (exclusive use).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

from timing import time_fn  # noqa: E402
from quantized_training_tpu.numerics import quantize_fn  # noqa: E402
from quantized_training_tpu.numerics.bitutils import (  # noqa: E402
    materialize_rounding,
)
from quantized_training_tpu.ops.pallas.quantize_elemwise import (  # noqa: E402
    pallas_quantize,
)
from quantized_training_tpu.ops.pallas.quantized_matmul import (  # noqa: E402
    quantized_matmul,
)


def main():
    assert jax.default_backend() == "tpu", (
        f"TPU init failed (backend={jax.default_backend()}); "
        "is another process holding the chip?")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    M = 4096
    shapes = [(M, 2048, 2048), (M, 2048, 5504), (M, 5504, 2048)]

    print("== bf16 matmul (XLA) ==", flush=True)
    for (m, k, n) in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        t = time_fn(lambda a, b: jnp.dot(
            a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            x, w)
        print(f"  {m}x{k}x{n}: {t*1e6:.0f} us  {2*m*k*n/t/1e12:.1f} TF/s",
              flush=True)

    print("== activation quantize pass ==", flush=True)
    for dtype in ("posit8_1", "e4m3"):
        qfn = quantize_fn(dtype)
        for k in (2048, 5504):
            x = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)
            gb = 2 * x.size * 2 / 1e9  # read + write bf16
            t_x = time_fn(lambda a: qfn(materialize_rounding(a)), x)
            t_p = time_fn(lambda a: pallas_quantize(a, qfn, interpret=False), x)
            print(f"  {dtype} {M}x{k}: XLA {t_x*1e6:.0f} us ({gb/t_x:.0f} GB/s)"
                  f"  Pallas {t_p*1e6:.0f} us ({gb/t_p:.0f} GB/s)", flush=True)

    print("== quantize+matmul composed ==", flush=True)
    qfn = quantize_fn("posit8_1")
    for (m, k, n) in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        tf = 2 * m * k * n / 1e12

        t_xla = time_fn(lambda a, b: jnp.dot(
            qfn(materialize_rounding(a)), b,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), x, w)
        t_pq = time_fn(lambda a, b: jnp.dot(
            pallas_quantize(a, qfn, interpret=False), b,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16), x, w)
        t_fused = time_fn(lambda a, b: quantized_matmul(
            a, b, x_qfn=qfn, interpret=False), x, w)
        print(f"  {m}x{k}x{n}: XLA q+mm {t_xla*1e6:.0f} us ({tf/t_xla:.0f} TF/s)"
              f"  pallasQ+mm {t_pq*1e6:.0f} us ({tf/t_pq:.0f} TF/s)"
              f"  fused {t_fused*1e6:.0f} us ({tf/t_fused:.0f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
