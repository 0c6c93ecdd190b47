"""Autoregressive generation: prefill + jitted decode over the (optionally
quantized) KV cache.

Equivalent of the reference's greedy ``generate`` with exported-decode
handoff (reference: llm_utils.py:43-112 and the KIVI-cache generate at
llm_utils.py:501-596): prefill runs the model over the prompt and fills the
cache (quantizing it when the model has a KIVI cache config); decode steps
run one token at a time through a single jitted function.

Sampling supports greedy, temperature, top-k, and top-p (nucleus).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["generate", "fast_argmax", "sample_batch"]


def fast_argmax(logits: jax.Array, axis: int = -1) -> jax.Array:
    """argmax via max + masked index-min.

    This environment's TPU compiler takes *minutes* to compile
    ``jnp.argmax`` over a vocab axis inside a decode program (the variadic
    reduce path); two plain reductions compile in seconds and pick the same
    first-occurrence index on ties.
    """
    m = jnp.max(logits, axis=axis, keepdims=True)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, axis if axis >= 0 else logits.ndim + axis)
    big = jnp.iinfo(jnp.int32).max
    # NaN rows: max is NaN so ``logits == m`` is all-false; match jnp.argmax
    # (first-NaN index) instead of silently returning INT32_MAX.
    hit = jnp.logical_or(logits == m, jnp.isnan(logits))
    return jnp.min(jnp.where(hit, idx, big), axis=axis)


def _sample(logits, rng, temperature: float, top_k: Optional[int],
            top_p: Optional[float] = None):
    """Greedy (temperature 0) / temperature / top-k / top-p sampling.

    Filters compose HF-style: top-k first, then nucleus within the
    survivors.  On backends where a full-vocab sort compiles slowly (this
    environment's decode programs), pass top_k alongside top_p — the sort
    then runs over k candidates instead of the vocab.
    """
    if temperature == 0.0:
        return fast_argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k is not None:
        top_vals, _ = jax.lax.top_k(logits, top_k)
        cutoff = top_vals[..., -1:]
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        srt = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative mass *before* them is < top_p, so the
        # most-probable token always survives even when p(top1) > top_p
        keep = (cum - probs) < top_p
        kth = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def sample_batch(logits, rng, temperature, top_k, top_p, max_top_k: int = 64):
    """Per-row sampling for the batched engines (per-request params).

    ``temperature`` (B,) f32 — 0 selects greedy for that row; ``top_k``
    (B,) int32 — 0 disables; ``top_p`` (B,) f32 — 1.0 disables.  Non-greedy
    rows sample within the top-``max_top_k`` candidates (HF-style
    compose: top-k prunes first, nucleus within the survivors), so the
    decode program never sorts the full vocab; per-row top_k is clipped to
    ``max_top_k``.
    """
    B, V = logits.shape
    K = min(max_top_k, V)
    vals, idx = jax.lax.top_k(logits.astype(jnp.float32), K)  # descending
    t = jnp.maximum(temperature[:, None].astype(jnp.float32), 1e-6)
    v = vals / t
    rank = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    keff = jnp.where(top_k > 0, jnp.minimum(top_k, K), K)[:, None]
    v = jnp.where(rank < keff, v, -jnp.inf)
    probs = jax.nn.softmax(v, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose cumulative mass *before* them is < top_p (top-1
    # always survives), same rule as _sample
    keep = ((cum - probs) < top_p[:, None]) & (rank < keff)
    v = jnp.where(keep, v, -jnp.inf)
    choice = jax.random.categorical(rng, v, axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    greedy = fast_argmax(logits, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled).astype(jnp.int32)


def generate(
    model,
    variables,
    input_ids: jax.Array,
    max_new_tokens: int,
    *,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[jax.Array] = None,
    eos_token_id: Optional[int] = None,
    host_loop: bool = False,
) -> jax.Array:
    """Generate ``max_new_tokens`` continuations for ``input_ids`` (B, S).

    Works with both cache modes: full-precision (cfg.kv_cache is None) and
    KIVI quantized (prefill is quantized into the main cache, new tokens go
    to the fp residual; the true prompt length S is threaded through so the
    decode mask is exact for prompts shorter than max_prefill).
    Returns (B, S + max_new_tokens).

    The decode loop runs on-device in one jitted ``lax.scan`` (a single host
    dispatch for the whole generation — remote backends pay ~30ms per
    dispatch otherwise).  ``host_loop=True`` falls back to one dispatch per
    token (debugging; also allows early stopping work to be skipped).
    """
    B, S = input_ids.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)

    kivi = getattr(model.config, "kv_cache", None) is not None
    if kivi:
        assert max_new_tokens <= model.config.kv_cache.max_decode, (
            max_new_tokens, model.config.kv_cache.max_decode)

    # Prefill: fills the cache, returns logits for the last prompt token
    # (last_logit_only drops the (B, S, vocab) prefill logits temp and the
    # full-sequence lm_head GEMM — only position -1 is sampled).
    logits, upd = model.apply(
        variables, input_ids, use_cache=True, cache_index=0,
        prompt_len=S if kivi else None, mutable=["cache"],
        last_logit_only=True,
    )
    cache = upd["cache"]
    rng, step_rng = jax.random.split(rng)
    next_tok = _sample(logits[:, -1], step_rng, temperature, top_k, top_p)

    def step(variables, cache, tok, pos, rng):
        # variables passed as an argument: closing over them would bake the
        # full parameter tree into the program as constants (gigabytes) and
        # blow up compile time on some backends.
        logits, upd = model.apply(
            {**variables, "cache": cache},
            tok[:, None], use_cache=True, cache_index=pos,
            prompt_len=S if kivi else None, mutable=["cache"],
        )
        rng, step_rng = jax.random.split(rng)
        nxt = _sample(logits[:, -1], step_rng, temperature, top_k, top_p)
        return upd["cache"], nxt, rng

    var_args = {k: v for k, v in variables.items() if k != "cache"}
    n_steps = max_new_tokens - 1

    if host_loop:
        decode_step = jax.jit(step)
        tokens = [next_tok]
        pos = S
        for _ in range(n_steps):
            cache, next_tok, rng = decode_step(
                var_args, cache, tokens[-1], jnp.asarray(pos, jnp.int32), rng
            )
            tokens.append(next_tok)
            pos += 1
        out = jnp.stack(tokens, axis=1)
    else:
        @jax.jit
        def decode_all(variables, cache, tok0, rng):
            def body(carry, _):
                cache, tok, pos, rng = carry
                cache, nxt, rng = step(variables, cache, tok, pos, rng)
                return (cache, nxt, pos + 1, rng), nxt

            carry0 = (cache, tok0, jnp.asarray(S, jnp.int32), rng)
            _, toks = jax.lax.scan(body, carry0, None, length=n_steps)
            return toks  # (n_steps, B)

        toks = decode_all(var_args, cache, next_tok, rng)
        out = jnp.concatenate(
            [next_tok[:, None], jnp.moveaxis(toks, 0, 1)], axis=1
        ) if n_steps else next_tok[:, None]
    full = jnp.concatenate([input_ids, out], axis=1)
    if eos_token_id is not None:
        # Mask everything after the first EOS per row.
        gen = full[:, S:]
        is_eos = gen == eos_token_id
        seen = jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
        keep = seen - is_eos.astype(jnp.int32) == 0
        gen = jnp.where(keep, gen, eos_token_id)
        full = jnp.concatenate([full[:, :S], gen], axis=1)
    return full
