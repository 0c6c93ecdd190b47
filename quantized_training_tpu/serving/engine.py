"""Continuous batching engine (iteration-level scheduling) over the
quantized KV cache.

New capability with no reference counterpart (BASELINE.json north star:
"continuous batching across hosts").  Design: a fixed number of batch slots
decode in lockstep through one jitted step; when a request finishes (EOS or
token budget), its slot is immediately refilled from the queue by quantizing
the new request's prefill directly into that slot — other slots keep
decoding, tracked by per-slot (B,) main/residual lengths and per-slot
attention masks (serving/kv_cache.py per-slot ops).

The whole cache is a pytree of static-shape arrays, so the decode step jits
once and the slots shard over the data axis of a mesh.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .generate import _sample, fast_argmax, sample_batch
from .kv_cache import KVCacheConfig

__all__ = ["ContinuousBatchingEngine", "SamplingParams"]


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling overrides.  ``temperature`` 0 = greedy;
    ``top_k`` 0 = disabled; ``top_p`` 1.0 = disabled.  ``stop``: token-id
    sequences that end the request (matched host-side on the generated
    tail and trimmed from the output)."""
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    stop: Tuple[Tuple[int, ...], ...] = ()


@dataclass
class _Slot:
    request_id: Optional[int] = None
    prompt_len: int = 0
    generated: List[int] = field(default_factory=list)
    budget: int = 0
    params: SamplingParams = field(default_factory=SamplingParams)


class ContinuousBatchingEngine:
    """Slot-synchronous continuous batching for a model with a KIVI cache.

    The model's config must carry ``kv_cache`` (KVCacheConfig); its decode
    path must accept ``attention_mask`` and ``positions`` (LlamaForCausalLM
    does).
    """

    def __init__(self, model, variables, *, batch_slots: int = 8,
                 eos_token_id: Optional[int] = None,
                 temperature: float = 0.0, top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 rng: Optional[jax.Array] = None,
                 prefill_buckets: Optional[List[int]] = None,
                 max_top_k: int = 64):
        assert model.config.kv_cache is not None, "model needs a kv_cache"
        self.model = model
        self.variables = {k: v for k, v in variables.items() if k != "cache"}
        self.kcfg: KVCacheConfig = model.config.kv_cache
        self.B = batch_slots
        self.eos = eos_token_id
        # sampling config (greedy when temperature == 0, like generate())
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.max_top_k = max_top_k
        cfg = model.config
        self.cache = None  # jax pytree {layer_path: QuantizedKVCache-like}
        self.slots = [_Slot() for _ in range(batch_slots)]
        self.queue: List[Tuple[int, np.ndarray, int, SamplingParams]] = []
        self.finished: Dict[int, List[int]] = {}
        self._next_id = 0
        self.tokens = jnp.zeros((batch_slots, 1), jnp.int32)
        self._decode = None
        self._prefill = None
        self._dummy = jnp.zeros(
            (batch_slots, min(8, self.kcfg.max_prefill)), jnp.int32)
        # Prefill length buckets: a short prompt pads only to the smallest
        # bucket >= its length instead of the full max_prefill, cutting
        # prefill compute up to 4x in mixed-length workloads.  Each bucket
        # is one extra lazy compile of the prefill program (jit caches by
        # shape); the stored cache is bit-identical either way because
        # prefill_cache pads + masks to max_prefill internally.
        P = self.kcfg.max_prefill
        if prefill_buckets is None:
            prefill_buckets = sorted({min(P, max(32, P // 4)),
                                      min(P, max(32, P // 2)), P})
        assert all(1 <= b <= P for b in prefill_buckets), prefill_buckets
        self.prefill_buckets = sorted(set(prefill_buckets) | {P})
        # whether any non-greedy sampling is in play; flips the decode
        # program between the static greedy fast path and per-slot sampling
        self._dynamic_sampling = (self.temperature != 0.0
                                  or top_k is not None or top_p is not None)

    # ------------------------------------------------------------------ API
    def submit(self, prompt_ids: np.ndarray, max_new_tokens: int, *,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               stop: Optional[List[List[int]]] = None) -> int:
        """Queue a request.  Sampling kwargs override the engine defaults for
        this request only; ``stop`` is a list of token-id sequences that end
        the request (trimmed from the returned tokens)."""
        rid = self._next_id
        self._next_id += 1
        params = SamplingParams(
            temperature=self.temperature if temperature is None
            else float(temperature),
            top_k=(self.top_k or 0) if top_k is None else int(top_k),
            top_p=(1.0 if self.top_p is None else self.top_p)
            if top_p is None else float(top_p),
            stop=tuple(tuple(int(t) for t in s) for s in (stop or ())),
        )
        if params.temperature != 0.0 and not self._dynamic_sampling:
            self._dynamic_sampling = True
            self._decode = None  # switch decode program to per-slot sampling
        self.queue.append((rid, np.asarray(prompt_ids).reshape(-1),
                           max_new_tokens, params))
        return rid

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue; returns {request_id: generated tokens}."""
        while self.queue or any(s.request_id is not None for s in self.slots):
            self._fill_slots()
            self.step()
        out, self.finished = self.finished, {}
        return out

    # ------------------------------------------------------------ internals
    def _init_cache(self):
        """Batched cache with per-slot (B,) lengths, built by running one
        dummy prefill to shape the per-layer pytree."""
        _, upd = self.model.apply(
            self.variables, self._dummy, use_cache=True, cache_index=0,
            mutable=["cache"])
        proto = upd["cache"]

        def widen(leaf):
            # leaf: (B, ...) already batched at engine batch; lengths scalars
            if leaf.ndim == 0:
                return jnp.zeros((self.B,), leaf.dtype)
            return jnp.zeros_like(leaf)

        self.cache = jax.tree_util.tree_map(widen, proto)

    def _fill_slots(self):
        for b, slot in enumerate(self.slots):
            if slot.request_id is None and self.queue:
                rid, ids, budget, params = self.queue.pop(0)
                slot.request_id = rid
                slot.prompt_len = len(ids)
                slot.budget = budget
                slot.params = params
                # prefill seeds slot.generated with the first sampled token
                self._prefill_slot(b, ids)

    def _prefill_slot(self, b: int, ids: np.ndarray):
        if self.cache is None:
            self._init_cache()
        P = self.kcfg.max_prefill
        ids = ids[-P:]
        S = len(ids)
        # smallest bucket that fits the prompt (cache content is identical
        # for any pad length; see prefill_buckets in __init__)
        bucket = next(bk for bk in self.prefill_buckets if bk >= S)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :S] = ids
        # Fixed-shape padded prefill with the true length threaded through:
        # one compile serves every prompt length (this backend's compiles
        # cost 30s-5min each).  prompt_len masks pad slots in attention and
        # zeroes their K/V before cache quantization, so the stored cache is
        # bit-identical to a true-length prefill.
        self._rng, prefill_rng = jax.random.split(self._rng)
        logits, upd = self._prefill_fn()(
            self.variables, jnp.asarray(padded), jnp.asarray(S, jnp.int32))
        self._merge_prefill(b, upd["cache"], logits, S, prefill_rng)

    def _merge_prefill(self, b: int, small, logits, S: int, prefill_rng):
        """Write one prefilled slot (cache leaves + first sampled token) into
        the batched state.  The distributed engine overrides this with a
        jitted merge pinned to the cache shardings."""
        def merge(big, small_leaf):
            if big.ndim == 1 and small_leaf.ndim == 0:   # per-slot lengths
                return big.at[b].set(small_leaf.astype(big.dtype))
            start = (b,) + (0,) * (big.ndim - 1)
            return jax.lax.dynamic_update_slice(
                big, small_leaf.astype(big.dtype), start)

        self.cache = jax.tree_util.tree_map(merge, self.cache, small)
        # last *real* token's logits (host-side gather; S is host-known),
        # sampled with this request's own params
        pr = self.slots[b].params
        next_tok = int(np.asarray(_sample(
            logits[0, S - 1][None], prefill_rng, pr.temperature,
            pr.top_k or None, pr.top_p if pr.top_p < 1.0 else None))[0])
        self.tokens = self.tokens.at[b, 0].set(next_tok)
        self.slots[b].generated = [next_tok]

    def _prefill_fn(self):
        if getattr(self, "_prefill", None) is None:
            model = self.model

            @jax.jit
            def prefill(variables, padded_ids, prompt_len):
                return model.apply(
                    variables, padded_ids, use_cache=True, cache_index=0,
                    prompt_len=prompt_len, mutable=["cache"])

            self._prefill = prefill
        return self._prefill

    def _decode_jit_kwargs(self):
        """Extra jax.jit kwargs for the decode step (the distributed engine
        pins out_shardings here)."""
        return {}

    def _decode_fn(self):
        if self._decode is not None:
            return self._decode
        model, kcfg = self.model, self.kcfg
        temperature, top_k = self.temperature, self.top_k
        top_p = self.top_p
        dynamic, max_top_k = self._dynamic_sampling, self.max_top_k

        @partial(jax.jit, **self._decode_jit_kwargs())
        def decode(variables, cache, tokens, main_len, res_len, rng,
                   temp_b, topk_b, topp_b):
            positions = (main_len + res_len)[:, None]
            # No explicit mask: the attention layer derives per-slot
            # visibility from the cache lengths (and can use the fused
            # dequant-attention kernel when eligible).
            logits, upd = model.apply(
                {**variables, "cache": cache}, tokens,
                positions=positions,
                use_cache=True, mutable=["cache"])
            if dynamic:
                # per-slot sampling params (temperature 0 rows stay greedy)
                nxt = sample_batch(logits[:, -1], rng, temp_b, topk_b,
                                   topp_b, max_top_k=max_top_k)
            else:
                # all-greedy fast path: identical program to the pre-params
                # engine (no top_k op in the decode program at all)
                nxt = _sample(logits[:, -1], rng, temperature,
                              top_k, top_p).astype(jnp.int32)
            return upd["cache"], nxt

        self._decode = decode
        return decode

    def _slot_sampling_arrays(self):
        temp = np.zeros(self.B, np.float32)
        topk = np.zeros(self.B, np.int32)
        topp = np.ones(self.B, np.float32)
        for b, slot in enumerate(self.slots):
            if slot.request_id is not None:
                temp[b] = slot.params.temperature
                topk[b] = slot.params.top_k
                topp[b] = slot.params.top_p
        return (self._put_slot_array(temp), self._put_slot_array(topk),
                self._put_slot_array(topp))

    def _put_slot_array(self, arr: np.ndarray):
        """Place a per-slot host array (the distributed engine pins it to
        the data-axis sharding)."""
        return jnp.asarray(arr)

    def step(self):
        if self.cache is None:
            return
        main_len, res_len = self._lengths()
        decode = self._decode_fn()
        self._rng, step_rng = jax.random.split(self._rng)
        temp_b, topk_b, topp_b = self._slot_sampling_arrays()
        self.cache, nxt = decode(
            self.variables, self.cache, self.tokens, main_len, res_len,
            step_rng, temp_b, topk_b, topp_b)
        nxt_host = self._publish_next(nxt)
        for b, slot in enumerate(self.slots):
            if slot.request_id is None:
                continue
            tok = int(nxt_host[b])
            slot.generated.append(tok)
            done = (self.eos is not None and tok == self.eos) or \
                len(slot.generated) >= slot.budget or \
                len(slot.generated) >= self.kcfg.max_decode
            # host-side stop-sequence match on the generated tail
            for seq in slot.params.stop:
                L = len(seq)
                if L and len(slot.generated) >= L and \
                        tuple(slot.generated[-L:]) == seq:
                    slot.generated = slot.generated[:-L]  # trim the stop
                    done = True
                    break
            if done:
                self.finished[slot.request_id] = slot.generated
                slot.request_id = None

    def _publish_next(self, nxt) -> np.ndarray:
        """Store the sampled ids as the next decode input and return them as
        host numpy (every process; the distributed engine allgathers)."""
        self.tokens = nxt[:, None]
        return np.asarray(nxt)

    def _lengths(self):
        """Per-slot lengths from the first layer's cache entry."""
        node = self.cache
        while isinstance(node, dict):
            node = node[next(iter(node))]
        return node.main_len, node.res_len
