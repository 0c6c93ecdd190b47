"""Speculative decoding wall-clock benchmark at flagship geometry.

VERDICT r3 item #4: on-chip evidence for speculative decoding — wall-clock
speedup AND acceptance rate.  The honest difficulty: acceptance depends on
how well the draft predicts the target, which is a property of *trained*
models; with random weights an independent draft agrees with the target
~1/vocab of the time.  No in-env checkpoint exists (ACCURACY.md), so this
bench brackets reality instead of faking it:

  * ``spec_draft``  — real small draft (bench.py geometry): measures the
    true random-weight floor — the full overhead story (draft steps + the
    (k+1)-token verify + rewind) at the acceptance rate it actually gets.
  * ``spec_self``   — draft IS the target model: greedy acceptance is 100%
    by construction, so this is a genuine end-to-end measurement of the
    machinery's ceiling (every round emits k+1 tokens; with a real trained
    draft the draft phase would be cheaper, so trained speedup at the same
    acceptance lies between these brackets).
  * ``plain``       — target-only greedy decode (serving/generate.py), the
    baseline both are judged against.

Target: LLaMA-2 7B geometry, w4a16 storage + packed uint2 KIVI cache +
fused decode kernel (same stack as llama7b_serving.py), B=1 (speculative
decoding is a latency path).  Reference anchor: the reference's generate is
strictly one target forward per token (llm_utils.py:43-112); speculative
rounds amortize 1..k+1 tokens per target dispatch.

Prints one JSON line per measurement (collected into BENCH_SPEC_r{N}).
"""

import json
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from llama7b_serving import build, materialize, start_watchdog  # noqa: E402

S = 256              # prompt length
NEW = 96             # tokens to generate
K = 4                # draft block size


def build_draft():
    from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5504,
        num_hidden_layers=8,
        num_attention_heads=16,
        num_key_value_heads=16,
        max_position_embeddings=S + NEW + K + 2,
        use_flash_attention=True,
    )
    return LlamaForCausalLM(cfg), cfg


def timed(fn, repeats=3):
    """fn must be a PRE-JITTED callable of no arguments: generate() and
    speculative_generate() trace their loops per call, so timing the bare
    functions measures retracing (observed: 3.9 s/token 'decode').  A
    scalar fetch is the completion barrier (block_until_ready is lazy on
    this tunneled backend)."""
    def fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(jnp.asarray(leaves[0]).ravel()[0])

    fetch(fn())                     # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best, fn()


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S", "2500")))

    from quantized_training_tpu.serving.generate import generate
    from quantized_training_tpu.serving.speculative import speculative_generate

    # target: 7B geometry, w4a16 + packed uint2 KIVI (fits one v5e)
    target, tcfg = build("7b", "w4a16", batch=1, max_prefill=S,
                         max_decode=NEW + K + 2, kivi_bits=2)
    print("[spec] materializing 7B target...", file=sys.stderr, flush=True)
    tvars = materialize(target, "w4a16", 64)

    draft, dcfg = build_draft()
    print("[spec] materializing draft...", file=sys.stderr, flush=True)
    dvars = jax.jit(draft.init)(jax.random.PRNGKey(1),
                                jnp.zeros((1, 8), jnp.int32))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, tcfg.vocab_size, (1, S)))

    # ---- baseline: plain greedy decode -----------------------------------
    print("[spec] timing plain decode...", file=sys.stderr, flush=True)
    gen_plain = jax.jit(lambda v, i: generate(target, v, i,
                                              max_new_tokens=NEW))
    t_plain, _ = timed(lambda: gen_plain(tvars, ids))
    plain_tps = NEW / t_plain
    print(json.dumps({
        "metric": "spec7b_plain_decode_tokens_per_s",
        "value": round(plain_tps, 2), "unit": "tokens/s",
        "ms_per_token": round(t_plain / NEW * 1e3, 2),
    }), flush=True)

    # ---- spec with the real (random-weight) draft ------------------------
    print("[spec] timing spec_draft...", file=sys.stderr, flush=True)
    gen_spec = jax.jit(lambda tv, dv, i: speculative_generate(
        target, tv, draft, dv, i, NEW, k=K, return_stats=True))
    t_draft, (out, stats) = timed(lambda: gen_spec(tvars, dvars, ids))
    print(json.dumps({
        "metric": "spec7b_draft_tokens_per_s",
        "value": round(NEW / t_draft, 2), "unit": "tokens/s",
        "speedup_vs_plain": round(t_plain / t_draft, 3),
        "accept_rate": round(float(stats["accept_rate"]), 4),
        "rounds": int(stats["rounds"]), "k": K,
        "note": "random weights: draft/target agreement ~1/vocab, so this "
                "is the overhead floor, not a trained-model speedup",
    }), flush=True)

    # ---- spec_cross: w4a16 draft proposing for a w8a8 target of the SAME
    # weights (VERDICT r04 #6).  Both models are quantizations of one
    # underlying random-weight 7B (same materialize seed), so the
    # acceptance rate measures genuine model agreement between two
    # quantizations — non-degenerate, unlike draft==target — while the
    # draft streams 3.4 GB/step vs the target's 6.6 GB.  The verify step
    # is a (k+1)-token forward: still weight-byte-bound, so a round costs
    # ~(k * draft_ms + target_ms) and emits 1..k+1 tokens.
    if os.environ.get("QT_SPEC_CROSS", "1") == "1":
        from dataclasses import replace as dc_replace
        from quantized_training_tpu.models import (
            LlamaConfig, LlamaForCausalLM,
        )
        from quantized_training_tpu.quantize import QuantConfig

        del tvars  # free the w4 target before materializing the pair
        t8, t8cfg = build("7b", "w8a8", batch=1, max_prefill=S,
                          max_decode=NEW + K + 2, kivi_bits=2)
        print("[spec] materializing w8a8 target...", file=sys.stderr,
              flush=True)
        t8vars = materialize(t8, "w8a8", 64, seed=0)

        d4cfg = dc_replace(
            LlamaConfig.llama2_7b(), kv_cache=None,
            max_position_embeddings=S + NEW + K + 2,
            use_flash_attention=True)
        d4 = LlamaForCausalLM(d4cfg, QuantConfig().with_storage("w4a16", 64))
        print("[spec] materializing w4a16 draft (same weights)...",
              file=sys.stderr, flush=True)
        d4vars = materialize(d4, "w4a16", 64, seed=0)

        gen_plain8 = jax.jit(lambda v, i: generate(t8, v, i,
                                                   max_new_tokens=NEW))
        t_plain8, _ = timed(lambda: gen_plain8(t8vars, ids))
        print(json.dumps({
            "metric": "spec7b_w8a8_plain_decode_tokens_per_s",
            "value": round(NEW / t_plain8, 2), "unit": "tokens/s",
            "ms_per_token": round(t_plain8 / NEW * 1e3, 2),
        }), flush=True)

        for k_cross in (2, 3, 4):
            gen_cross = jax.jit(lambda tv, dv, i, k=k_cross:
                                speculative_generate(
                                    t8, tv, d4, dv, i, NEW, k=k,
                                    return_stats=True))
            t_cross, (outc, statsc) = timed(
                lambda: gen_cross(t8vars, d4vars, ids))
            print(json.dumps({
                "metric": f"spec7b_cross_w4draft_w8target_k{k_cross}",
                "value": round(NEW / t_cross, 2), "unit": "tokens/s",
                "speedup_vs_plain": round(t_plain8 / t_cross, 3),
                "accept_rate": round(float(statsc["accept_rate"]), 4),
                "rounds": int(statsc["rounds"]), "k": k_cross,
                "note": "draft and target are w4a16/w8a8 quantizations of "
                        "the same weights: acceptance = measured agreement "
                        "between the two quantizations",
            }), flush=True)
        del t8vars, d4vars

    # ---- spec with draft == target: 100% greedy acceptance ---------------
    print("[spec] timing spec_self...", file=sys.stderr, flush=True)
    # the draft must use the fp cache: rebuild the 7B geometry without the
    # KIVI cache but sharing the SAME weights won't fit (fp cache + dense
    # weights); instead self-spec the small stack — machinery ceiling is a
    # property of the round structure, measured here at the draft geometry,
    # and the 7B-round cost is already visible in spec_draft's round time.
    gen_self = jax.jit(lambda dv, i: speculative_generate(
        draft, dv, draft, dv, i, NEW, k=K, return_stats=True))
    t_self, (out2, stats2) = timed(lambda: gen_self(dvars, ids))
    gen_small = jax.jit(lambda dv, i: generate(draft, dv, i,
                                               max_new_tokens=NEW))
    t_plain_small, _ = timed(lambda: gen_small(dvars, ids))
    print(json.dumps({
        "metric": "spec_small_self_tokens_per_s",
        "value": round(NEW / t_self, 2), "unit": "tokens/s",
        "speedup_vs_plain": round(t_plain_small / t_self, 3),
        "accept_rate": round(float(stats2["accept_rate"]), 4),
        "rounds": int(stats2["rounds"]), "k": K,
        "note": "draft==target: greedy acceptance is 1.0 by construction — "
                "the machinery ceiling (k+1 tokens per round, draft-priced)",
    }), flush=True)

    done.set()


if __name__ == "__main__":
    main()
