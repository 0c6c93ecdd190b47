"""Decode-path benchmark: fp cache vs fused-KIVI quantized cache.

VERDICT r1 criterion: the uint4/uint2 KIVI cache must decode at least as
fast as the fp cache at the round-1 config (LLaMA-stack 2048x8L, B8,
prefill 512) — the fused dequant-attention kernel reads codes+scales+
residual directly, so the full dequantized K/V never hits HBM.

Timing protocol: the whole generation (prefill + N scan-decode steps) runs
in a few dispatches; we time generate() end-to-end for N and 2N new tokens
and report (t_2N - t_N) / N as ms/step — prefill and dispatch cancel.

Prints one JSON line per cache config.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

# Shared benchmark protocol constants (main, storage_decode_bench and
# combined_decode_bench must stay in sync — ms/step is (t_N2 - t_N1)/(N2 - N1)).
B, S = 8, 512
N1, N2 = 8, 160


def build(kind: str):
    from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
    from quantized_training_tpu.serving.kv_cache import KVCacheConfig

    kcfg = None
    if kind != "fp":
        kcfg = KVCacheConfig.kivi(
            max_prefill=512, max_decode=192,
            k_spec=f"{kind},qs=group_wise_affine,bs=32,ax=-2",
            v_spec=f"{kind},qs=group_wise_affine,bs=32,ax=-1",
            pack=True,
        )
    cfg = LlamaConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5504,
        num_hidden_layers=8,
        num_attention_heads=16,
        num_key_value_heads=16,
        max_position_embeddings=1024,
        kv_cache=kcfg,
        use_fused_kivi=True,
    )
    return LlamaForCausalLM(cfg), cfg


def make_decoder(model, S, n_steps):
    """One jitted (prefill-cache, first-token) -> last-token decode scan.

    Built ONCE per n_steps and reused across timing repeats, so repeats hit
    the jit cache — generate() recreates its jits per call, which costs
    seconds of tracing and would swamp the compute difference."""
    from quantized_training_tpu.serving.generate import fast_argmax

    kivi = getattr(model.config, "kv_cache", None) is not None

    @jax.jit
    def decode_all(var_args, cache, tok0):
        def body(carry, _):
            cache, tok, pos = carry
            logits, upd = model.apply(
                {**var_args, "cache": cache},
                tok[:, None], use_cache=True, cache_index=pos,
                prompt_len=S if kivi else None, mutable=["cache"],
            )
            nxt = fast_argmax(logits[:, -1])
            return (upd["cache"], nxt, pos + 1), None

        (cache, tok, _), _ = jax.lax.scan(
            body, (cache, tok0, jnp.asarray(S, jnp.int32)), None,
            length=n_steps)
        return tok

    return decode_all


def time_decode(model, variables, ids, n_steps, repeats=5):
    kivi = getattr(model.config, "kv_cache", None) is not None
    B, S = ids.shape
    logits, upd = jax.jit(
        lambda v, i: model.apply(v, i, use_cache=True, cache_index=0,
                                 prompt_len=S if kivi else None,
                                 mutable=["cache"])
    )(variables, ids)
    cache = upd["cache"]
    var_args = {k: v for k, v in variables.items() if k != "cache"}
    tok0 = jnp.argmax(logits[:, -1], axis=-1)

    fn = make_decoder(model, S, n_steps)
    np.asarray(fn(var_args, cache, tok0))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        # host fetch = the only reliable completion barrier on this backend
        np.asarray(fn(var_args, cache, tok0))
        best = min(best, time.perf_counter() - t0)
    print(f"  n={n_steps}: {best*1e3:.1f} ms total", file=sys.stderr,
          flush=True)
    return best


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    results = {}
    for kind in ("fp", "uint4", "uint2"):
        model, cfg = build(kind)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        print(f"{kind}: timing...", file=sys.stderr, flush=True)
        t1 = time_decode(model, variables, ids, N1)
        t2 = time_decode(model, variables, ids, N2)
        ms = (t2 - t1) / (N2 - N1) * 1e3
        results[kind] = ms
        print(json.dumps({
            "metric": f"llama2s_decode_{kind}_ms_per_step",
            "value": round(ms, 3),
            "unit": "ms/step",
            "config": "2048x8L B8 prefill512 fused-kivi scan-decode",
        }), flush=True)

    print(json.dumps({
        "metric": "kivi_uint4_vs_fp_decode_speedup",
        "value": round(results["fp"] / results["uint4"], 3),
        "unit": "x",
    }), flush=True)

    storage_decode_bench(rng, results["fp"])
    combined_decode_bench(rng, results["fp"])
    spec_bench(rng)


def combined_decode_bench(rng, fp_ms):
    """The full quantized serving stack in one step: packed storage weights
    (w4a16 / mx8) + the fused-KIVI uint4 cache.  Weight streaming and cache
    reads are both byte-reduced, so this should beat each feature alone."""
    from quantized_training_tpu.quantize import QuantConfig, build_storage

    for fmt, group in (("w4a16", 64), ("mx8", 64)):
        model, cfg = build("uint4")
        st_model = type(model)(cfg, QuantConfig().with_storage(fmt, group))
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        storage, slim = build_storage(variables["params"], fmt, group)
        svars = {"params": slim, "storage": storage}
        if "cache" in variables:
            svars["cache"] = variables["cache"]
        print(f"combined {fmt}+kivi-uint4: timing...", file=sys.stderr,
              flush=True)
        t1 = time_decode(st_model, svars, ids, N1)
        t2 = time_decode(st_model, svars, ids, N2)
        ms = (t2 - t1) / (N2 - N1) * 1e3
        print(json.dumps({
            "metric": f"llama2s_decode_{fmt}_plus_kivi_uint4_ms_per_step",
            "value": round(ms, 3), "unit": "ms/step",
            "vs_fp_baseline": round(fp_ms / ms, 3),
        }), flush=True)


def storage_decode_bench(rng, fp_ms):
    """Decode with deployed storage weights (fp cache): weight streaming is
    the B8 decode bottleneck, so packed kernels should approach the storage
    kernels' standalone byte-ratio wins end-to-end."""
    from quantized_training_tpu.quantize import QuantConfig, build_storage

    for fmt, group in (("mx8", 64), ("w4a16", 64), ("w8a8", 64)):
        model, cfg = build("fp")
        st_model = type(model)(cfg, QuantConfig().with_storage(fmt, group))
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        storage, slim = build_storage(variables["params"], fmt, group)
        svars = {"params": slim, "storage": storage}
        print(f"storage {fmt}: timing...", file=sys.stderr, flush=True)
        t1 = time_decode(st_model, svars, ids, N1)
        t2 = time_decode(st_model, svars, ids, N2)
        ms = (t2 - t1) / (N2 - N1) * 1e3
        print(json.dumps({
            "metric": f"llama2s_decode_storage_{fmt}_ms_per_step",
            "value": round(ms, 3), "unit": "ms/step",
            "vs_bf16_weights": round(fp_ms / ms, 3),
        }), flush=True)


def spec_bench(rng):
    """Speculative decoding latency (B=1): 8L target + 2L draft, greedy.

    With random-init models the draft disagrees almost always, so this
    measures the WORST case (accept_rate ~ 0: every round pays draft k+1
    steps + verify for ~1 token).  Real model pairs see 60-90% acceptance;
    the interesting numbers here are ms/round and the verify-forward cost
    vs k single-token steps."""
    from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
    from quantized_training_tpu.serving.generate import generate
    from quantized_training_tpu.serving.speculative import (
        speculative_generate,
    )

    def cfg(layers):
        return LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5504,
            num_hidden_layers=layers, num_attention_heads=16,
            num_key_value_heads=16, max_position_embeddings=1024)

    target = LlamaForCausalLM(cfg(8))
    draft = LlamaForCausalLM(cfg(2))
    ids = jnp.asarray(rng.integers(0, 32000, (1, 512)))
    t_vars = jax.jit(target.init)(jax.random.PRNGKey(0), ids)
    d_vars = jax.jit(draft.init)(jax.random.PRNGKey(1), ids)

    def timed(fn, n, repeats=3):
        np.asarray(fn(n))  # compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(n))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = 16, 96
    g = lambda n: generate(target, t_vars, ids, n)
    t_plain = (timed(g, n2) - timed(g, n1)) / (n2 - n1)
    # k=4: perfect-draft bound = (t_draft_round + t_verify) / 5 tokens
    s = lambda n: speculative_generate(target, t_vars, draft, d_vars,
                                       ids, n, k=4)
    _, stats = speculative_generate(target, t_vars, draft, d_vars, ids,
                                    n2, k=4, return_stats=True)
    t_spec = (timed(s, n2) - timed(s, n1)) / (n2 - n1)
    print(json.dumps({
        "metric": "b1_decode_plain_ms_per_tok",
        "value": round(t_plain * 1e3, 3), "unit": "ms/tok"}), flush=True)
    print(json.dumps({
        "metric": "b1_decode_speculative_ms_per_tok",
        "value": round(t_spec * 1e3, 3), "unit": "ms/tok",
        "accept_rate": round(stats["accept_rate"], 3),
        "note": "random-init draft: worst-case acceptance"}), flush=True)
    # full-acceptance projection from the measured round time: a real draft
    # at accept_rate a emits 1 + a*k tokens for the same round cost
    tokens_per_round = (n2 - 1) / max(int(stats["rounds"]), 1)
    t_round = t_spec * tokens_per_round
    print(json.dumps({
        "metric": "b1_decode_speculative_best_case_ms_per_tok",
        "value": round(t_round / (4 + 1) * 1e3, 3), "unit": "ms/tok",
        "note": "measured round time / (k+1); reached at accept_rate=1",
    }), flush=True)


if __name__ == "__main__":
    main()
