"""Composed-layer prefill probe: one real model layer vs component sum."""
import json, sys, time
from functools import partial
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def timed_chain(step, operands, state0, n1=4, n2=40, repeats=4):
    @partial(jax.jit, static_argnames="n")
    def run(operands, state, n):
        def body(i, c):
            return step(operands, c)
        out = jax.lax.fori_loop(0, n, body, state)
        return sum(l.ravel()[0].astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(out))
    float(run(operands, state0, n1)); float(run(operands, state0, n2))
    def t(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); float(run(operands, state0, n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(n2, repeats) - t(n1, repeats)) / (n2 - n1)

from dataclasses import replace
from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.quantize import QuantConfig
from quantized_training_tpu.serving.kv_cache import KVCacheConfig
sys.path.insert(0, "/root/repo/benchmarks")
from llama7b_serving import materialize

S = 2048
for nlayer in (2, 6):
    base = LlamaConfig.llama2_7b()
    kcfg = KVCacheConfig.int_sym(max_prefill=S, max_decode=128, bits=4)
    cfg = replace(base, num_hidden_layers=nlayer, kv_cache=kcfg,
                  use_flash_attention=True, fused_qkv=True,
                  max_position_embeddings=S + 128)
    model = LlamaForCausalLM(cfg, QuantConfig().with_storage("w4a16", 64))
    variables = materialize(model, "w4a16", 64)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 32000, (1, S)))

    def step(v, c):
        ids_i, acc = c
        logits, upd = model.apply(
            v, ids_i, use_cache=True, cache_index=0,
            prompt_len=jnp.asarray(S, jnp.int32), mutable=["cache"])
        logits, upd = jax.lax.optimization_barrier((logits, upd))
        probe = sum(l.ravel()[0].astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(upd))
        return (ids_i + 1) % 32000, acc + logits[0, -1, 0] + probe

    dt = timed_chain(step, variables, (ids, jnp.zeros((1,), jnp.float32)))
    print(json.dumps({"metric": f"composed_prefill_{nlayer}layer_ms",
                      "value": round(dt * 1e3, 2)}), flush=True)
