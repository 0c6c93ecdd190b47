"""GPTQ-vs-RTN at 7B layer shapes, evaluated on chip.

VERDICT r3 item #4: on-chip evidence for GPTQ — the claim to verify is that
error-compensated rounding (quantize/gptq.py, the reference-adjacent
AWQ/GPTQ deployment family) beats round-to-nearest where inputs are
*correlated*, measured as the relative layer-output error
||X W - X dequant(codes)||_F / ||X W||_F with both packings evaluated by the
same on-chip ``affine_matmul`` kernel the serving path uses.

Protocol: correlated calibration inputs X = Z C with C a random mixing
matrix raised to a power (condition-heavy, like real activations); Hessian
X^T X accumulated in f64 on host; GPTQ solve on host (it is an offline
deployment step — reference PTQ is offline too); error evaluation on chip
at 7B shapes (4096x4096 qkvo, 4096x11008 gate/up).

Prints one JSON line per (shape, nbits).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    from quantized_training_tpu.ops.pallas.affine_storage import (
        affine_matmul, pack_affine_weights, plane_pack)
    from quantized_training_tpu.quantize.gptq import (
        gptq_quantize, hessian_from_inputs)

    on_tpu = jax.default_backend() == "tpu"
    group = 64
    n_calib = 512
    rng = np.random.default_rng(0)

    for (K, N), shape_name in (((4096, 4096), "qkvo"),
                               ((4096, 11008), "gate_up")):
        W = rng.normal(size=(K, N)).astype(np.float32) / np.sqrt(K)
        # correlated inputs: mix iid gaussians through a squared random
        # matrix -> heavy-tailed spectrum, like post-LN activations
        C = rng.normal(size=(K, K)).astype(np.float32) / np.sqrt(K)
        C = C @ C
        X = (rng.normal(size=(n_calib, K)).astype(np.float32) @ C)
        H = hessian_from_inputs(X)

        Xj = jnp.asarray(X, jnp.bfloat16)
        ref = jnp.dot(Xj.astype(jnp.float32), jnp.asarray(W),
                      preferred_element_type=jnp.float32)
        ref_norm = float(jnp.linalg.norm(ref))

        for nbits in (4, 2):
            # RTN packing (the serving default)
            rtn = pack_affine_weights(jnp.asarray(W), nbits, group)

            t0 = time.perf_counter()
            _, codes, sf, zp = gptq_quantize(
                W, H, nbits=nbits, group_size=group)
            t_solve = time.perf_counter() - t0
            gpt = plane_pack(jnp.asarray(codes), jnp.asarray(sf),
                             jnp.asarray(zp), nbits, group)

            errs = {}
            for name, (p, s, z) in (("rtn", rtn), ("gptq", gpt)):
                y = affine_matmul(
                    Xj, p, s, z, nbits=nbits, group_size=group,
                    out_dtype=jnp.float32)
                errs[name] = float(jnp.linalg.norm(y - ref)) / ref_norm

            print(json.dumps({
                "metric": f"gptq_vs_rtn_{shape_name}_w{nbits}",
                "value": round(errs["rtn"] / max(errs["gptq"], 1e-12), 3),
                "unit": "x (rtn_err / gptq_err, >1 means GPTQ wins)",
                "shape": f"({K},{N})", "group": group,
                "rel_err_rtn": round(errs["rtn"], 5),
                "rel_err_gptq": round(errs["gptq"], 5),
                "gptq_solve_s": round(t_solve, 1),
                "eval_backend": "tpu" if on_tpu else jax.default_backend(),
            }), flush=True)


if __name__ == "__main__":
    main()
