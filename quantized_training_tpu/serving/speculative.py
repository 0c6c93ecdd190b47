"""Speculative decoding: a small draft model proposes k tokens per round and
the target model verifies them in ONE batched forward.

Serving extension beyond the reference (its generate is strictly one
target-forward per token, reference llm_utils.py:43-112); with greedy
sampling the accept rule below is *lossless* — the emitted stream is
token-for-token identical to decoding with the target alone (tested), the
rounds just amortize 1..k+1 tokens per target dispatch.  On accelerators
where decode is weight-bandwidth- or dispatch-bound, wall-clock improves by
roughly the mean accepted length.

Round structure (everything inside one jitted ``lax.while_loop``; fixed
shapes throughout):

1. draft phase: k+1 single-token steps through the draft cache collect
   proposals d_1..d_k (the extra step writes d_k's K/V so the draft cache
   always holds exactly the tokens fed so far — no stale entries ever).
2. verify: the target consumes ``[t_last, d_1..d_k]`` at its current length
   p; ``target_next[i] = argmax(logits[i])`` for i = 0..k.
3. accept: m = longest prefix with d_{i+1} == target_next[i].  Because an
   accepted d equals the target's own choice, the emitted block is simply
   ``target_next[0..m]`` — m+1 tokens of pure target-greedy output.
4. rewind-by-index: both caches are full-precision rings indexed by length
   (models/llama.py fp path), so rejected suffix entries need no cleanup —
   the next round's writes start at the new length and overwrite them, and
   the causal mask never exposes slots beyond the current length.

The target may use either cache. Full-precision: rewind is the length
index (stale slots are masked and overwritten).  KIVI quantized: decode
tokens only ever land in the fp *residual* tier (promotion to the
quantized main tier happens exclusively at prefill), so the verify block
appends k+1 residual slots via ``decode_append=True`` and rejection
rewinds by resetting ``res_len`` — bit-equivalent to having appended only
the accepted tokens.  The draft model must use the full-precision cache
(it is small; quantizing it buys nothing).

Batch is restricted to B == 1: rows accept different prefix lengths, which
would need per-row cache indices (a serial-scatter trap under SPMD).
Speculative decoding is a latency technique; throughput batching is the
continuous-batching engine's job.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .generate import fast_argmax, _sample

__all__ = ["speculative_generate"]


def _spec_accept(p_logits, q_logits, x, key, temperature):
    """Rejection-sampling accept rule for ONE position (the Leviathan/Chen
    construction): the draft proposed ``x ~ softmax(q/T)``; accept with
    probability min(1, p(x)/q(x)), else resample from the normalized
    residual max(0, p - q).  The emitted marginal is exactly softmax(p/T)
    (unit-tested by Monte Carlo enumeration in test_speculative.py).

    p_logits/q_logits: (B, V); x: (B,).  Returns (accept (B,), repl (B,)).
    """
    lp = jax.nn.log_softmax(p_logits / temperature, axis=-1)
    lq = jax.nn.log_softmax(q_logits / temperature, axis=-1)
    k_u, k_r = jax.random.split(key)
    lpx = jnp.take_along_axis(lp, x[:, None], axis=1)[:, 0]
    lqx = jnp.take_along_axis(lq, x[:, None], axis=1)[:, 0]
    u = jax.random.uniform(k_u, x.shape)
    accept = jnp.log(u) < lpx - lqx
    resid = jnp.maximum(jnp.exp(lp) - jnp.exp(lq), 0.0)
    norm = jnp.sum(resid, axis=-1, keepdims=True)
    # residual vanishes only when p <= q everywhere, i.e. p == q (both sum
    # to 1) — then sampling from p is the correct conditional anyway
    probs = jnp.where(norm > 0, resid / jnp.maximum(norm, 1e-30),
                      jnp.exp(lp))
    repl = jax.random.categorical(
        k_r, jnp.log(jnp.maximum(probs, 1e-38)), axis=-1)
    return accept, repl.astype(jnp.int32)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _decode_all(target_model, draft_model, S, max_new_tokens, k,
                temperature, t_vars, d_vars, cache_t, cache_d, t_last, rng):
    """The full speculative loop as one device program.  Module-level with
    the (hashable linen) models and scalars static, so repeated generate
    calls with the same models hit the jit cache instead of retracing.

    ``temperature`` is static: 0.0 traces the greedy propose/accept steps
    (argmax match — token-exact vs target-only), any other value traces the
    rejection-sampling steps (exact-distribution); the round skeleton —
    draft scan, verify forward, emit/rewind/count bookkeeping — is shared.
    """
    greedy = temperature == 0.0
    t_kivi = getattr(target_model.config, "kv_cache", None) is not None
    B = t_last.shape[0]
    buf_len = max_new_tokens + k + 1    # rounds may overshoot; sliced below
    n_steps = k + 1

    buffer = jnp.zeros((B, buf_len), jnp.int32)
    buffer = buffer.at[:, 0].set(t_last)

    def draft_phase(cache_d, tok, ld, rng):
        def body(carry, j):
            cache_d, tok, rng = carry
            logits, upd = draft_model.apply(
                {**d_vars, "cache": cache_d}, tok[:, None],
                use_cache=True, cache_index=ld + j, mutable=["cache"])
            if greedy:
                nxt = fast_argmax(logits[:, -1]).astype(jnp.int32)
            else:
                rng, kstep = jax.random.split(rng)
                nxt = jax.random.categorical(
                    kstep, logits[:, -1] / temperature, axis=-1
                ).astype(jnp.int32)
            out = nxt if greedy else (nxt, logits[:, -1])
            return (upd["cache"], nxt, rng), out

        # the (k+1)-th step only exists to write d_k's K/V into the draft
        # cache, so the cache always holds exactly the tokens fed so far
        (cache_d, _, rng), outs = jax.lax.scan(
            body, (cache_d, tok, rng), jnp.arange(n_steps))
        toks = outs if greedy else outs[0]
        qlog = None if greedy else outs[1][:k]     # q-logits per proposal
        return cache_d, jnp.moveaxis(toks[:k], 0, 1), qlog, rng

    def accept_and_emit(logits, d, qlog, rng):
        """Returns (m, emit (B, k+1), rng): accepted count and the emitted
        block (garbage past slot m — overwritten or sliced later)."""
        if greedy:
            target_next = fast_argmax(logits).astype(jnp.int32)  # (B, k+1)
            eq = (d == target_next[:, :k]).astype(jnp.int32)
            m = jnp.sum(jnp.cumprod(eq, axis=1), axis=1)
            # accepted drafts equal the target's own picks, so the whole
            # emitted block is just target_next[0..m]
            return m, target_next, rng
        rng, kacc, kfin = jax.random.split(rng, 3)
        keys = jax.random.split(kacc, k)
        acc, repl = jax.vmap(
            lambda pl, ql, x, key: _spec_accept(pl, ql, x, key, temperature),
            in_axes=(1, 0, 1, 0), out_axes=(1, 1),
        )(logits[:, :k], qlog, d, keys)
        m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        # token at slot m: residual resample if a proposal was rejected,
        # else a fresh sample from the target's k-th position
        t_k = jax.random.categorical(
            kfin, logits[:, k] / temperature, axis=-1).astype(jnp.int32)
        repl_m = jnp.take_along_axis(
            repl, jnp.minimum(m, k - 1)[:, None], axis=1)[:, 0]
        final_tok = jnp.where(m < k, repl_m, t_k)
        iota = jnp.arange(k + 1)[None, :]
        emit = jnp.where(iota < m[:, None], jnp.pad(d, ((0, 0), (0, 1))),
                         final_tok[:, None])
        return m, emit, rng

    def round_body(state):
        cache_t, cache_d, t_last, count, rounds, accepted, buf, rng = state
        p = S + count - 1      # target cache holds tokens 0..p-1
        cache_d, d, qlog, rng = draft_phase(cache_d, t_last, p, rng)
        verify_in = jnp.concatenate([t_last[:, None], d], axis=1)
        logits, upd = target_model.apply(
            {**t_vars, "cache": cache_t}, verify_in,
            use_cache=True, cache_index=p, decode_append=True,
            mutable=["cache"])
        cache_t = upd["cache"]
        m, emit, rng = accept_and_emit(logits, d, qlog, rng)
        if t_kivi:
            # rewind the rejected residual slots: keep [t_last, d_1..d_m]
            # of the k+1 just appended (no promotion happens at decode,
            # so resetting res_len fully undoes the rest)
            delta = jnp.int32(k) - m[0]

            def rewind(node):
                if isinstance(node, dict):
                    return {kk: rewind(vv) for kk, vv in node.items()}
                if hasattr(node, "res_len"):
                    return node._replace(res_len=node.res_len - delta)
                return node

            cache_t = rewind(cache_t)
        buf = jax.lax.dynamic_update_slice(buf, emit, (0, count))
        t_last = jnp.take_along_axis(emit, m[:, None], axis=1)[:, 0]
        return (cache_t, cache_d, t_last, count + m[0] + 1,
                rounds + 1, accepted + m[0], buf, rng)

    state0 = (cache_t, cache_d, t_last, jnp.int32(1), jnp.int32(0),
              jnp.int32(0), buffer, rng)
    final = jax.lax.while_loop(
        lambda s: s[3] < max_new_tokens, round_body, state0)
    _, _, _, count, rounds, accepted, buffer, _ = final
    return buffer[:, :max_new_tokens], rounds, accepted


def speculative_generate(
    target_model,
    target_variables,
    draft_model,
    draft_variables,
    input_ids: jax.Array,
    max_new_tokens: int,
    *,
    k: int = 4,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    eos_token_id: Optional[int] = None,
    return_stats: bool = False,
):
    """Speculative decoding; returns (1, S + max_new_tokens) tokens.

    ``temperature == 0``: greedy — output token-identical to target-only
    greedy decoding.  ``temperature > 0``: rejection-sampling acceptance —
    the output is *distributed* exactly as target-only sampling at that
    temperature (the greedy guarantee's stochastic counterpart); top-k
    filtering is not supported in speculative mode.

    ``target_model``/``draft_model`` must share the tokenizer (vocab).  The
    target may use the full-precision OR the KIVI quantized cache; the
    draft must be full-precision.  With ``return_stats`` also returns
    {"rounds": n, "accept_rate": mean m / k}.
    """
    B, S = input_ids.shape
    assert B == 1, "speculative decoding is a latency path: B must be 1"
    assert getattr(draft_model.config, "kv_cache", None) is None, (
        "the draft model must use the full-precision cache")
    t_kcfg = getattr(target_model.config, "kv_cache", None)
    if t_kcfg is None:
        assert (S + max_new_tokens + k + 1
                <= target_model.config.max_position_embeddings), (
            S, max_new_tokens, k)
    else:
        assert S <= t_kcfg.max_prefill, (S, t_kcfg.max_prefill)
        # every round may write k+1 residual slots before rewinding
        assert max_new_tokens + k <= t_kcfg.max_decode, (
            max_new_tokens, k, t_kcfg.max_decode)
    assert (S + max_new_tokens + k + 1
            <= draft_model.config.max_position_embeddings)
    assert max_new_tokens >= 1 and k >= 1

    t_vars = {key: v for key, v in target_variables.items() if key != "cache"}
    d_vars = {key: v for key, v in draft_variables.items() if key != "cache"}

    # Prefill both caches over the prompt (last-position logits only: the
    # prompt is true-length here, and only position -1 seeds the loop).
    logits_t, upd_t = target_model.apply(
        target_variables, input_ids, use_cache=True, cache_index=0,
        prompt_len=S if t_kcfg is not None else None, mutable=["cache"],
        last_logit_only=True)
    _, upd_d = draft_model.apply(
        draft_variables, input_ids, use_cache=True, cache_index=0,
        mutable=["cache"], last_logit_only=True)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    if temperature == 0.0:
        t_last0 = fast_argmax(logits_t[:, -1]).astype(jnp.int32)  # (B,)
    else:
        rng, k0 = jax.random.split(rng)
        t_last0 = _sample(logits_t[:, -1], k0, temperature,
                          None).astype(jnp.int32)
    out, rounds, accepted = _decode_all(
        target_model, draft_model, S, max_new_tokens, k, float(temperature),
        t_vars, d_vars, upd_t["cache"], upd_d["cache"], t_last0, rng)
    full = jnp.concatenate([input_ids, out], axis=1)
    if eos_token_id is not None:
        gen = full[:, S:]
        is_eos = gen == eos_token_id
        seen = jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
        keep = seen - is_eos.astype(jnp.int32) == 0
        gen = jnp.where(keep, gen, eos_token_id)
        full = jnp.concatenate([full[:, :S], gen], axis=1)
    if return_stats:
        # JAX scalars, not Python numbers: keeps speculative_generate
        # traceable under an outer jit (the wall-clock bench times it that
        # way — per-call retracing measured 3.9 s/token).  ``int()`` /
        # ``float()`` still work on these outside a trace.
        rj = jnp.asarray(rounds, jnp.int32)
        stats = {"rounds": rj,
                 "accept_rate": (jnp.asarray(accepted, jnp.float32)
                                 / jnp.maximum(rj * k, 1))}
        return full, stats
    return full
