"""Benchmark: quantized-LLaMA forward throughput vs bf16 baseline.

Measures tokens/s of a posit8-quantized LLaMA block stack (activation fake
quant at every GEMM input, weights pre-quantized offline as in serving)
against the same model in pure bf16 on the same chip.  ``vs_baseline`` is
the throughput ratio quantized/bf16 — the cost of quantization; 1.0 means
quantization is free, >1.0 means the quantized path wins.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def build(quantized: bool, rung: str = "residual_fusion"):
    from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
    from quantized_training_tpu.quantize import FUSION_LADDER, QConfig, QuantConfig

    cfg = LlamaConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5504,
        num_hidden_layers=8,
        num_attention_heads=16,
        num_key_value_heads=16,
        max_position_embeddings=1024,
        use_flash_attention=True,
    )
    qc = None
    if quantized:
        cats = dict(FUSION_LADDER)[rung]
        qc = QuantConfig(
            global_qconfig=QConfig.from_strs(
                activation="posit8_1", weight="posit8_1"
            )
        ).with_fusion(forward=cats)
    return LlamaForCausalLM(cfg, qc), cfg


def model_flops_per_token(cfg):
    """Causal-accounting model FLOPs per token (standard MFU convention)."""
    h, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    gemm = L * (4 * h * h + 3 * h * inter) + h * cfg.vocab_size
    S = 1024  # bench sequence length
    attn = L * 4 * cfg.num_attention_heads * cfg.head_dim * (S + 1) / 2
    return 2 * gemm + attn


def prequantize_weights(variables, qconfig):
    """Offline weight quantization (serving deployment step)."""
    from quantized_training_tpu.quantize import fold_quantized_weights

    return {**variables,
            "params": fold_quantized_weights(variables["params"], qconfig)}


def measure(model, variables, ids, iters=8, repeats=5):
    """Tokens/s with the iteration loop *on device* (lax.fori_loop inside one
    jit) and a scalar fetch: remote backends have large per-dispatch latency
    and lazy block_until_ready, so host-side loops measure RPC, not compute.
    The n=1 run is subtracted to remove dispatch+fetch overhead."""
    from functools import partial

    vocab = 32000

    @partial(jax.jit, static_argnames="n")
    def run(v, ids0, n):
        def body(i, carry):
            ids_i, acc = carry
            # the barrier stops XLA from folding the reduction's vocab slice
            # into the lm_head matmul (without it, sum(out[..., 0]) lets XLA
            # compute ONE lm_head column — ~23% of model FLOPs DCE'd)
            out = jax.lax.optimization_barrier(model.apply(v, ids_i))
            # data dependence between iterations so XLA can't hoist the body
            acc = acc + jnp.sum(out[..., 0])
            ids_i = (ids_i + 1) % vocab
            return ids_i, acc
        _, acc = jax.lax.fori_loop(0, n, body, (ids0, jnp.float32(0.0)))
        return acc

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(variables, ids, n))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    float(run(variables, ids, 1))          # compile
    float(run(variables, ids, iters + 1))  # compile
    t_base = timed(1)
    t_full = timed(iters + 1)
    dt = (t_full - t_base) / iters
    tokens = ids.shape[0] * ids.shape[1]
    return tokens / dt


def main():
    # Watchdog: a dead TPU tunnel makes the first device call hang forever
    # (observed in-round: even jax.devices() blocks, inside a C call — so a
    # SIGALRM Python handler would never run; a daemon thread still does,
    # because the RPC wait releases the GIL).  Die loudly with a diagnostic
    # on stderr instead of hanging the driver; stdout stays clean so no
    # bogus result line is recorded.
    import os
    import threading

    deadline = float(os.environ.get("QT_BENCH_WATCHDOG_S", "1500"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(deadline):
            print(f"bench.py watchdog: no completion after {deadline:.0f}s "
                  "— TPU tunnel likely down (jax device calls hang)",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    # NOTE: timings require exclusive use of the chip - run nothing else.
    batch, seq = 4, 1024
    rng = np.random.default_rng(0)

    qmodel, cfg = build(quantized=True)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)))
    # jit the init: remote backends pay ~30ms dispatch per op otherwise
    qvars = jax.jit(qmodel.init)(jax.random.PRNGKey(0), ids)
    qvars = prequantize_weights(qvars, qmodel.qconfig)
    # weight rounding is folded offline; runtime quantizes activations only
    from quantized_training_tpu.quantize import strip_weight_specs
    from quantized_training_tpu.models import LlamaForCausalLM
    qmodel = LlamaForCausalLM(cfg, strip_weight_specs(qmodel.qconfig))
    print("measuring quantized...", file=sys.stderr, flush=True)
    q_tps = measure(qmodel, {"params": qvars["params"]}, ids)

    fmodel, _ = build(quantized=False)
    print("measuring bf16 baseline...", file=sys.stderr, flush=True)
    f_tps = measure(fmodel, {"params": qvars["params"]}, ids)

    # achieved TFLOP/s + fraction-of-peak (MFU) for both arms; v5e bf16
    # peak = 197 TFLOP/s
    flops_tok = model_flops_per_token(cfg)
    extra = {
        "quantized_tflops": round(q_tps * flops_tok / 1e12, 1),
        "quantized_mfu": round(q_tps * flops_tok / 1e12 / 197.0, 3),
        "bf16_tflops": round(f_tps * flops_tok / 1e12, 1),
        "bf16_mfu": round(f_tps * flops_tok / 1e12 / 197.0, 3),
    }

    # Optional full fusion-ladder sweep (QT_BENCH_LADDER=1): tokens/s and
    # vs_baseline for every rung, no_fusion -> residual_fusion.  Kept
    # opt-in so the driver's end-of-round run stays inside its watchdog;
    # the swept numbers are committed as BENCH_LADDER_r{N}.json.
    if os.environ.get("QT_BENCH_LADDER"):
        from quantized_training_tpu.quantize import FUSION_LADDER
        ladder = {}
        for rung, _cats in FUSION_LADDER:
            if rung == "residual_fusion":
                ladder[rung] = {"tokens_per_s": round(q_tps, 1),
                                "vs_baseline": round(q_tps / f_tps, 4)}
                continue
            print(f"measuring ladder rung {rung}...", file=sys.stderr,
                  flush=True)
            rmodel, _ = build(quantized=True, rung=rung)
            rmodel = LlamaForCausalLM(cfg, strip_weight_specs(rmodel.qconfig))
            r_tps = measure(rmodel, {"params": qvars["params"]}, ids)
            ladder[rung] = {"tokens_per_s": round(r_tps, 1),
                            "vs_baseline": round(r_tps / f_tps, 4)}
        extra["ladder"] = ladder

    done.set()
    print(json.dumps({
        "metric": "llama2s_posit8_forward_tokens_per_s",
        "value": round(q_tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(q_tps / f_tps, 4),
        **extra,
    }))


if __name__ == "__main__":
    main()
