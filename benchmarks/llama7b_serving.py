"""Flagship-scale serving benchmark: LLaMA-2 7B / 13B geometry on one v5e.

Composes the full quantized serving stack the framework exists to produce
(VERDICT r2 item 1): ``build_storage``-packed sub-byte weights (w4a16 RTN
layout — the same plane-packed layout GPTQ emits) x packed uint2 KIVI KV
cache x the fused dequant-attention decode kernel x on-device scan decode,
at real-model geometry (reference serving story: llm_utils.py:43-112 with
LLaMA-2 7B/13B, README.md:99-106).

Weights are random (accuracy is covered elsewhere — ACCURACY.md); they are
materialized leaf-by-leaf and packed on device so the dense bf16 tensor for
the whole model NEVER exists: one v5e (16 GB) cannot even hold 7B bf16
weights + cache, which is itself the capacity story of w4a16 (3.4 GB codes).

Timing protocol per ROUND1/2 notes: iteration loops on device (lax.scan /
fori), scalar fetch as completion barrier, two-point (N2-N1) subtraction so
prefill + dispatch cancel.  Roofline accounting: every decode step must
stream all weight codes + qparams + the live KV cache from HBM; we report
bytes/step, achieved GB/s and the fraction of the v5e HBM bound (819 GB/s),
plus prefill TFLOP/s and MFU against the 197 TFLOP/s bf16 peak.

Prints one JSON line per measurement (collected into BENCH_SERVING7B_r03).
"""

import json
import math
import os
import sys
import threading
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

PEAK_HBM_GBS = 819.0      # v5e HBM bandwidth
PEAK_BF16_TFLOPS = 197.0  # v5e bf16 MXU peak

N1, N2 = 8, 120           # decode-step two-point protocol


def start_watchdog(deadline_s: float):
    """Die loudly if the TPU tunnel hangs (see bench.py)."""
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            print(f"llama7b_serving watchdog: no completion after "
                  f"{deadline_s:.0f}s — TPU tunnel likely down",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    return done


# --------------------------------------------------------------- weights
def _insert(tree, keys, val):
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = val


def materialize(model, fmt, group, seed=0):
    """Memory-safe random weights: eval_shape the param tree, then create
    each leaf on device and pack eligible kernels immediately — peak extra
    HBM is one f32 kernel (the 4096x32000 lm_head, 0.5 GB)."""
    from quantized_training_tpu.quantize.storage import _eligible, _pack_kernel

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    leaves = jax.tree_util.tree_flatten_with_path(shapes)[0]

    gen_cache = {}

    def rand(key, shape, dtype, scale):
        sig = (tuple(shape), str(dtype), float(scale))
        if sig not in gen_cache:
            gen_cache[sig] = jax.jit(
                lambda k, shape=tuple(shape), dtype=dtype, scale=scale:
                (jax.random.normal(k, shape, jnp.float32) * scale
                 ).astype(dtype))
        return gen_cache[sig](key)

    pack_jit = jax.jit(lambda w: _pack_kernel(w, fmt, group)) if fmt else None

    key = jax.random.PRNGKey(seed)
    slim, storage = {}, {}
    for i, (path, leaf) in enumerate(leaves):
        keys = tuple(p.key for p in path)
        key_i = jax.random.fold_in(key, i)
        if leaf.ndim == 1:
            _insert(slim, keys, jnp.ones(leaf.shape, leaf.dtype))
            continue
        scale = 0.02 if keys[-1] == "embedding" else 1.0 / math.sqrt(
            leaf.shape[0])
        if fmt and _eligible(keys, leaf, fmt, group):
            w = rand(key_i, leaf.shape, jnp.float32, scale)
            for name, arr in pack_jit(w).items():
                _insert(storage, keys[:-1] + (name,), arr)
            del w
        else:
            # bf16 for dense kernels/embeddings: halves the baseline
            # footprint and is the serving dtype anyway
            _insert(slim, keys, rand(key_i, leaf.shape, jnp.bfloat16, scale))
    jax.block_until_ready((slim, storage))
    variables = {"params": slim}
    if storage:
        variables["storage"] = storage
    return variables


def tree_bytes(t):
    return sum(l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(t))


# ----------------------------------------------------------------- model
def build(geom: str, fmt, *, batch, max_prefill, max_decode, kivi_bits=2,
          kv_fmt="u2"):
    from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
    from quantized_training_tpu.quantize import QuantConfig
    from quantized_training_tpu.serving.kv_cache import KVCacheConfig
    from dataclasses import replace

    base = (LlamaConfig.llama2_7b() if geom == "7b"
            else LlamaConfig.llama2_13b())
    if kv_fmt in ("i4", "i8"):
        # per-token symmetric int cache + structurally-flat fused decode
        # (BENCH_KVRACE_r05: 2.1x the uint2 kernel at 7B geometry)
        kcfg = KVCacheConfig.int_sym(
            max_prefill=max_prefill, max_decode=max_decode,
            bits=4 if kv_fmt == "i4" else 8)
    else:
        kcfg = KVCacheConfig.kivi(
            max_prefill=max_prefill, max_decode=max_decode,
            k_spec=f"uint{kivi_bits},qs=group_wise_affine,bs=32,ax=-2",
            v_spec=f"uint{kivi_bits},qs=group_wise_affine,bs=32,ax=-1",
            pack=True,
        )
    cfg = replace(base, kv_cache=kcfg, use_fused_kivi=True,
                  use_flash_attention=True,
                  # fused qkv GEMM: +13% on the decode qkvo GEMM (r04),
                  # wired by default for serving (QT_BENCH_FUSED_QKV=0
                  # reverts)
                  fused_qkv=os.environ.get("QT_BENCH_FUSED_QKV", "1") == "1",
                  max_position_embeddings=max_prefill + max_decode)
    qc = QuantConfig().with_storage(fmt, 64) if fmt else None
    return LlamaForCausalLM(cfg, qc), cfg


# ----------------------------------------------------------------- timing
def time_prefill(model, variables, ids, repeats=4):
    """Seconds per padded prefill (B, max_prefill), two-point on-device."""
    S = ids.shape[1]
    vocab = model.config.vocab_size

    @partial(jax.jit, static_argnames="n")
    def run(v, ids0, n):
        def body(i, carry):
            ids_i, acc = carry
            logits, upd = model.apply(
                v, ids_i, use_cache=True, cache_index=0,
                prompt_len=jnp.asarray(S, jnp.int32), mutable=["cache"])
            # barrier: forces the full lm_head (a bare logits[0,-1,0] lets
            # XLA slice the matmul to one column) AND the cache-quantize
            # writes (upd would otherwise be dead code)
            logits, upd = jax.lax.optimization_barrier((logits, upd))
            probe = sum(l.ravel()[0].astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(upd))
            return (ids_i + 1) % vocab, acc + logits[0, -1, 0] + probe
        _, acc = jax.lax.fori_loop(0, n, body, (ids0, jnp.float32(0.0)))
        return acc

    float(run(variables, ids, 1))
    float(run(variables, ids, 4))

    def timed(n, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(variables, ids, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(4, repeats) - timed(1, 2 * repeats)) / 3


def time_decode_steps(model, variables, ids, n_steps, repeats=4):
    """Total seconds for prefill + n_steps scan decode (decode_bench
    protocol: call at N1 and N2 and subtract)."""
    from quantized_training_tpu.serving.generate import fast_argmax

    B, S = ids.shape

    @jax.jit
    def gen(variables, ids):
        # Chunked prefill (VERDICT r04 #3): one slot at a time, so prefill
        # activation temps are B=1-sized — a batch-8 2048-token prefill
        # holds multi-hundred-MB f32 MLP temps per layer next to the full
        # cache and weight codes, which OOM'd both the w8a8 batch-8 arm
        # (r04) and the int4-cache arm (r05).  The real serving engine
        # prefills per-slot exactly like this.  last_logit_only: only the
        # seed token is consumed.
        def prefill_one(b):
            sl = jax.lax.dynamic_slice_in_dim(ids, b, 1, 0)
            logits, upd = model.apply(
                variables, sl, use_cache=True, cache_index=0,
                prompt_len=jnp.asarray(S, jnp.int32), mutable=["cache"],
                last_logit_only=True)
            return logits[:, -1], upd["cache"]

        lg0, c0 = prefill_one(0)

        def widen(leaf):
            if leaf.ndim == 0:
                return leaf
            out = jnp.zeros((B,) + leaf.shape[1:], leaf.dtype)
            return jax.lax.dynamic_update_slice(
                out, leaf, (0,) * out.ndim)

        cache = jax.tree_util.tree_map(widen, c0)
        tok0 = jnp.zeros((B,), jnp.int32).at[0].set(
            fast_argmax(lg0)[0].astype(jnp.int32))

        def pre_body(b, carry):
            cache, toks = carry
            lg, cb = prefill_one(b)

            def merge(big, small):
                if small.ndim == 0:
                    return big
                start = (b,) + (0,) * (small.ndim - 1)
                return jax.lax.dynamic_update_slice(
                    big, small.astype(big.dtype), start)

            cache = jax.tree_util.tree_map(merge, cache, cb)
            toks = toks.at[b].set(fast_argmax(lg)[0].astype(jnp.int32))
            return cache, toks

        cache, tok = jax.lax.fori_loop(1, B, pre_body, (cache, tok0))

        def body(carry, _):
            cache, tok, pos = carry
            logits, upd = model.apply(
                {**variables, "cache": cache}, tok[:, None],
                use_cache=True, cache_index=pos,
                prompt_len=jnp.asarray(S, jnp.int32), mutable=["cache"])
            nxt = fast_argmax(logits[:, -1]).astype(jnp.int32)
            return (upd["cache"], nxt, pos + 1), None

        (cache, tok, _), _ = jax.lax.scan(
            body, (cache, tok, jnp.asarray(S, jnp.int32)), None,
            length=n_steps)
        return tok

    np.asarray(gen(variables, ids))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(gen(variables, ids))
        best = min(best, time.perf_counter() - t0)
    return best


# ------------------------------------------------------------ accounting
def decode_read_bytes(variables, model, cache_proto):
    """HBM bytes every decode step must stream: all weight storage (codes +
    qparams) + dense non-embedding params + the full KV cache tier arrays.
    The embedding table is a 1-row gather, not a stream — excluded."""
    storage_b = tree_bytes(variables.get("storage", {}))
    slim = variables["params"]
    embed_b = tree_bytes(
        slim.get("model", {}).get("embed_tokens", {}))
    slim_b = tree_bytes(slim) - embed_b
    cache_b = tree_bytes(cache_proto)
    return {"weights_storage": storage_b, "params_dense_nonembed": slim_b,
            "kv_cache": cache_b,
            "total": storage_b + slim_b + cache_b}


def matmul_params(variables, model):
    """Weights participating in GEMMs (packed codes count at full logical
    size; the embedding gather does not)."""
    n = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]:
        keys = [p.key for p in path]
        if keys[-1] == "kernel" and leaf.ndim == 2:
            n += leaf.size
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables.get("storage", {}))[0]:
        keys = [p.key for p in path]
        if keys[-1] == "codes":
            # affine codes are packed int32 words: logical = size * 32/nbits
            per = 1
            fmt = model.qconfig.storage_fmt
            if fmt in ("w4a16", "w2a16", "w2x4"):
                per = 16 if fmt == "w2a16" else 8
            n += leaf.size * per
    return n


def check_integer_dot(model, variables, batch, max_prefill):
    """Prove the w8a8 path lowers to a native s8 x s8 -> s32 dot in the
    DEVICE HLO (VERDICT r3 item #4: 'integer dot in the device HLO'), not
    an fp dequant-then-dot.  Strict pattern only — a single HLO instruction
    producing s32[...] from a dot whose operand list contains s8[...] — and
    checked on BOTH the no-cache (prefill) graph and the cached decode-step
    graph (ADVICE r04: the permissive fallback could pass without a real
    integer dot, and the decode path was never inspected)."""
    import re

    def count_s8_dots(txt):
        """Count s32-producing dot/convolution instructions whose operands
        resolve to s8 values.  This TPU toolchain lowers integer dots as
        `%x = s32[...] convolution(%a, %b)` with UNTYPED operand names, so
        the check builds a name -> dtype map first and resolves operands —
        an inline-typed regex can never match here (ADVICE r04 asked for
        strictness; r05 found the strict inline pattern matched nothing)."""
        dtype_of = {}
        for m in re.finditer(r"%([\w.\-]+) = (\w+)\[", txt):
            dtype_of[m.group(1)] = m.group(2)
        n = 0
        for m in re.finditer(
                r"= s32\[[^\]]*\][^\n]*?(?:convolution|dot)\(([^)]*)\)",
                txt):
            ops = re.findall(r"%([\w.\-]+)", m.group(1))
            if len(ops) >= 2 and all(
                    dtype_of.get(o) == "s8" for o in ops[:2]):
                n += 1
        return n

    tok = jnp.zeros((batch, 1), jnp.int32)
    lowered = jax.jit(
        lambda v, t: model.apply(
            v, t, use_cache=False)).lower(variables, tok)
    n_prefill = count_s8_dots(lowered.compile().as_text())

    # cached decode step, lowered with an abstract cache (no allocation)
    ids_s = jax.ShapeDtypeStruct((batch, max_prefill), jnp.int32)
    _, upd = jax.eval_shape(
        lambda v, i: model.apply(
            v, i, use_cache=True, cache_index=0,
            prompt_len=jnp.asarray(max_prefill, jnp.int32),
            mutable=["cache"]),
        variables, ids_s)
    dec = jax.jit(
        lambda v, c, t: model.apply(
            {**v, "cache": c}, t, use_cache=True,
            cache_index=jnp.asarray(max_prefill, jnp.int32),
            prompt_len=jnp.asarray(max_prefill, jnp.int32),
            mutable=["cache"]))
    tok_s = jax.ShapeDtypeStruct((batch, 1), jnp.int32)
    n_decode = count_s8_dots(
        dec.lower(variables, upd["cache"], tok_s).compile().as_text())

    ok = n_prefill > 0 and n_decode > 0
    print(json.dumps({
        "metric": "llama7b_w8a8_integer_dot_in_device_hlo",
        "value": int(ok), "unit": "bool",
        "s8_dot_sites_prefill_graph": n_prefill,
        "s8_dot_sites_decode_graph": n_decode,
    }), flush=True)


def run_geometry(geom, fmt, *, batch, max_prefill, max_decode, kivi_bits=2,
                 label, kv_fmt="u2"):
    model, cfg = build(geom, fmt, batch=batch, max_prefill=max_prefill,
                       max_decode=max_decode, kivi_bits=kivi_bits,
                       kv_fmt=kv_fmt)
    print(f"[{label}] materializing weights...", file=sys.stderr, flush=True)
    variables = materialize(model, fmt, 64)
    wbytes = tree_bytes(variables)
    print(f"[{label}] weights on device: {wbytes/2**30:.2f} GiB",
          file=sys.stderr, flush=True)

    if fmt == "w8a8":
        check_integer_dot(model, variables, batch, max_prefill)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, max_prefill)))

    # cache proto (for byte accounting): eval_shape only — no allocation
    _, upd = jax.eval_shape(
        lambda v, i: model.apply(
            v, i, use_cache=True, cache_index=0,
            prompt_len=jnp.asarray(max_prefill, jnp.int32),
            mutable=["cache"]),
        variables, ids)
    cache_bytes = decode_read_bytes(variables, model, upd["cache"])

    # ---- prefill (B=1: engine prefills one slot at a time) --------------
    ids1 = ids[:1]
    print(f"[{label}] timing prefill...", file=sys.stderr, flush=True)
    t_pre = time_prefill(model, variables, ids1)
    pre_tps = max_prefill / t_pre
    # causal-flop MFU accounting
    n_mat = matmul_params(variables, model)
    L, H, D = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    S = max_prefill
    attn_flops = L * 4 * H * D * S * (S + 1) / 2           # qk + av, causal
    gemm_flops = 2 * n_mat * S
    tflops = (gemm_flops + attn_flops) / t_pre / 1e12
    print(json.dumps({
        "metric": f"{label}_prefill_tokens_per_s",
        "value": round(pre_tps, 1), "unit": "tokens/s",
        "batch": 1, "seq": S,
        "achieved_tflops": round(tflops, 1),
        "mfu": round(tflops / PEAK_BF16_TFLOPS, 3),
    }), flush=True)

    # ---- decode ----------------------------------------------------------
    print(f"[{label}] timing decode...", file=sys.stderr, flush=True)
    t1 = time_decode_steps(model, variables, ids, N1)
    t2 = time_decode_steps(model, variables, ids, N2)
    ms = (t2 - t1) / (N2 - N1) * 1e3
    tok_s = batch / (ms / 1e3)
    read_b = cache_bytes["total"]
    achieved_gbs = read_b / (ms / 1e3) / 1e9
    print(json.dumps({
        "metric": f"{label}_decode_ms_per_step",
        "value": round(ms, 3), "unit": "ms/step",
        "batch_slots": batch, "prefill": max_prefill,
        "tokens_per_s": round(tok_s, 1),
        "tokens_per_s_per_slot": round(tok_s / batch, 2),
        "hbm_bytes_per_step": {k: int(v) for k, v in cache_bytes.items()},
        "hbm_bytes_per_token": int(read_b / batch),
        "achieved_gb_per_s": round(achieved_gbs, 1),
        "fraction_of_hbm_roofline": round(
            achieved_gbs / PEAK_HBM_GBS, 3),
        "roofline_ms_bound": round(read_b / (PEAK_HBM_GBS * 1e9) * 1e3, 3),
    }), flush=True)
    return {"decode_ms": ms, "read_bytes": read_b, "weight_bytes": wbytes,
            "components": cache_bytes, "n_mat": n_mat}


def bf16_roofline_ms(r):
    """Idealized 100%-bandwidth bf16 decode bound at this arm's geometry:
    dense bf16 GEMM weights (2 B per logical matmul weight) + the SAME
    cache tier bytes + dense non-embed params.  This favors bf16 — it is a
    perfect kernel that cannot exist on this chip (bf16 7B does not fit)."""
    read = (r["components"]["kv_cache"]
            + r["components"]["params_dense_nonembed"]
            + 2 * r["n_mat"])
    return read / (PEAK_HBM_GBS * 1e9) * 1e3


def emit_speedup(label, r, bf16_ms, note):
    print(json.dumps({
        "metric": f"{label}_decode_speedup_vs_bf16",
        "value": round(bf16_ms / r["decode_ms"], 2), "unit": "x",
        "bf16_ms_per_step": round(bf16_ms, 3),
        "note": note,
    }), flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    done = start_watchdog(float(os.environ.get("QT_BENCH_WATCHDOG_S", "12000")))
    # partial re-runs: QT_BENCH_ARMS is a comma list of w4,bf16,w8a8,13b
    arms = set(os.environ.get(
        "QT_BENCH_ARMS", "w4,w4kv4,w4kv8,bf16,w8a8,13b,13bw4,13bx").split(","))

    # flagship: 7B w4a16 + packed uint2 KIVI + fused decode + scan decode
    r_w4 = None
    b = int(os.environ.get("QT_BENCH_W4_BATCH", "8"))
    w4_label = "llama7b_w4a16" + (f"_b{b}" if b != 8 else "")
    if "w4" in arms:
        r_w4 = run_geometry("7b", "w4a16", batch=b, max_prefill=2048,
                            max_decode=128, kivi_bits=2, label=w4_label)

    # w4a16 weights + int4 per-token-symmetric cache (the r05 structural
    # rework of the decode attention): same weight bytes, 2x the cache
    # bytes of uint2, but the kernel runs at 0.55 of HBM instead of 0.20 —
    # and the cache quantization error drops ~50x.
    if "w4kv4" in arms:
        label4 = "llama7b_w4a16_kv4" + (f"_b{b}" if b != 8 else "")
        r_kv4 = run_geometry("7b", "w4a16", batch=b, max_prefill=2048,
                             max_decode=128, kv_fmt="i4", label=label4)
        emit_speedup(label4, r_kv4, bf16_roofline_ms(r_kv4),
                     "bf16 baseline = HBM roofline bound at 100% bandwidth "
                     "with the same (int4) cache bytes")
        if r_w4 is not None:
            print(json.dumps({
                "metric": f"{label4}_decode_speedup_vs_u2_kivi",
                "value": round(r_w4["decode_ms"] / r_kv4["decode_ms"], 3),
                "unit": "x",
                "u2_ms_per_step": round(r_w4["decode_ms"], 3),
            }), flush=True)

    # w4a16 + int8 per-token-sym cache: the accuracy-first cache config
    # (0.4% cache error, 0.83-of-HBM kernel) at the same geometry.
    if "w4kv8" in arms:
        label8 = "llama7b_w4a16_kv8" + (f"_b{b}" if b != 8 else "")
        r_kv8 = run_geometry("7b", "w4a16", batch=b, max_prefill=2048,
                             max_decode=128, kv_fmt="i8", label=label8)
        emit_speedup(label8, r_kv8, bf16_roofline_ms(r_kv8),
                     "bf16 baseline = HBM roofline bound at 100% bandwidth "
                     "with the same (int8) cache bytes")

    # bf16-weights baseline at the same geometry (same batch b as the w4
    # arm — a mixed-geometry speedup would be meaningless): 12.6 GiB of
    # weights + cache — expected NOT to fit on one 16 GB v5e. If it OOMs,
    # that IS the result (w4a16 is what makes 7B single-chip); the speed
    # comparison then falls back to the HBM roofline bound for bf16 bytes.
    if "bf16" in arms and r_w4 is not None:
        try:
            r_bf16 = run_geometry("7b", None, batch=b, max_prefill=2048,
                                  max_decode=128, kivi_bits=2,
                                  label="llama7b_bf16"
                                  + (f"_b{b}" if b != 8 else ""))
            vs_ms = r_bf16["decode_ms"]
            note = "measured bf16 baseline"
        except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED expected
            msg = str(e).splitlines()[0][:160]
            print(json.dumps({
                "metric": "llama7b_bf16_weights_fit",
                "value": 0, "unit": "bool",
                "note": f"bf16 7B does not fit on one v5e: {msg}",
            }), flush=True)
            vs_ms = bf16_roofline_ms(r_w4)
            note = ("bf16 baseline = HBM roofline bound at 100% bandwidth "
                    "(bf16 weights do not fit on-chip)")
        emit_speedup(w4_label, r_w4, vs_ms, note)

    # w8a8 end-to-end serving at 7B (VERDICT r3 item #4): int8 weight
    # storage (6.6 GB codes) + the same uint2 KIVI cache, GEMMs on the
    # MXU's native s8 x s8 -> s32 path (2x bf16 throughput on v5e).
    # Default batch from QT_BENCH_W8_BATCH (8 once chunked prefill landed;
    # 4 was the r04 OOM workaround).
    if "w8a8" in arms:
        b8 = int(os.environ.get("QT_BENCH_W8_BATCH", "8"))
        # int4-sym cache by default: the uint2 KIVI v-scale layout
        # (..., P, 4) uncompresses to 32x-padded 128 MB temps around the
        # fused kernel (20 live at once OOM'd batch 8 by 0.5 G); the
        # int-sym scale layout (..., 1, P) is lane-native.
        kvf = os.environ.get("QT_BENCH_W8_KV", "i4")
        label = ("llama7b_w8a8" + ("_kv4" if kvf == "i4" else "")
                 + (f"_b{b8}" if b8 != 8 else ""))
        r_w8 = run_geometry("7b", "w8a8", batch=b8, max_prefill=2048,
                            max_decode=128, kv_fmt=kvf, label=label)
        # the speedup line is computed here, from the same run that
        # produced the decode number (ADVICE r04: this line used to be
        # hand-authored into the artifact)
        emit_speedup(label, r_w8, bf16_roofline_ms(r_w8),
                     "bf16 baseline = HBM roofline bound at 100% bandwidth "
                     "(bf16 weights do not fit on-chip)")

    # 13B w2a16 (VERDICT: "the same at 13B geometry with w2a16 if it fits")
    if "13b" in arms:
        r_13 = run_geometry("13b", "w2a16", batch=4, max_prefill=2048,
                            max_decode=128, kivi_bits=2,
                            label="llama13b_w2a16")
        emit_speedup("llama13b_w2a16", r_13, bf16_roofline_ms(r_13),
                     "bf16 baseline = HBM roofline bound at 100% bandwidth "
                     "(bf16 13B does not fit on-chip)")

    # 13B with w2 NUMERICS in the w4 word layout (storage fmt w2x4): same
    # uint2 group-affine values as the w2a16 arm, 1.7-2.1x the direct w2
    # kernel speed (BENCH_W2X_r05) at w4-size bytes — the answer to
    # "make w2 earn its bytes": it can't on this VPU-issue-bound
    # toolchain, but its *values* can run at w4 speed when the bytes fit.
    if "13bx" in arms:
        r_13x = run_geometry("13b", "w2x4", batch=4, max_prefill=2048,
                             max_decode=128, kv_fmt="i4",
                             label="llama13b_w2x4")
        emit_speedup("llama13b_w2x4", r_13x, bf16_roofline_ms(r_13x),
                     "bf16 baseline = HBM roofline bound at 100% bandwidth "
                     "(bf16 13B does not fit on-chip)")

    # 13B w4a16 — the honest capacity headline: 13B w4 codes (6.5 GB) +
    # qparams + 2 GB cache FIT on one 16 GB v5e, so the capacity format
    # for 13B is w4, not w2 (w2 remains the >20B/off-chip-free headroom
    # format; see PERF_ANALYSIS).
    if "13bw4" in arms:
        r_134 = run_geometry("13b", "w4a16", batch=4, max_prefill=2048,
                             max_decode=128, kv_fmt="i4",
                             label="llama13b_w4a16")
        emit_speedup("llama13b_w4a16", r_134, bf16_roofline_ms(r_134),
                     "bf16 baseline = HBM roofline bound at 100% bandwidth "
                     "(bf16 13B does not fit on-chip)")

    done.set()


if __name__ == "__main__":
    main()
