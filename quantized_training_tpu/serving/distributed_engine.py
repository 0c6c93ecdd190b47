"""Multi-host / multi-chip continuous batching over the sharded KIVI cache.

North-star capability (BASELINE.json: "continuous batching across hosts,
>=85% scaling"; no reference counterpart — the reference's only distribution
is sequential layer offload, reference pt2e_utils.py:62-156).

Design — SPMD, not RPC:

* One global ``(data, model)`` mesh spans every chip of every host.  Batch
  slots shard over ``data``; weights and the quantized KV cache (kv-heads)
  shard over ``model`` using the same rule engine as training
  (parallel/sharding.py) — the cache rules match the QuantizedKVCache leaves
  in their head-major (B, KV, T, D) layout.
* The decode step is ONE jitted SPMD program.  Slots never interact: on a
  pure data mesh the compiled step contains **zero collectives** (asserted by
  :func:`decode_collective_report` and the test suite), so adding hosts adds
  throughput at the dispatch-overhead bound — the >=85%-scaling claim is a
  compile-time property, not a tuning hope.  Tensor-parallel meshes add
  exactly the Megatron psums on the ``model`` axis, which rides ICI, never
  DCN: DCN carries nothing per decode step.
* Hosts run in lockstep (single-controller SPMD): every process must submit
  the same requests in the same order.  :meth:`DistributedEngine.submit`
  records locally; :meth:`sync_queue` broadcasts process 0's queue to all
  processes (jax.experimental.multihost_utils) so a front-end only has to
  feed one host.  With one process it is the identity.

The scheduling logic (slot fill, budgets, EOS) is inherited unchanged from
the single-host engine — only array placement changes.
"""

from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from ..parallel.sharding import (
    Rules, apply_sharding_rules, shard_pytree, shard_rules_llama,
)
from .engine import ContinuousBatchingEngine, SamplingParams

__all__ = ["DistributedEngine", "decode_collective_report"]

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


class DistributedEngine(ContinuousBatchingEngine):
    """Continuous batching engine whose cache/tokens/params live sharded on a
    mesh.  ``batch_slots`` must be a multiple of the data-axis size (each
    data shard owns ``batch_slots / data`` slots)."""

    def __init__(self, model, variables, mesh: Mesh, *,
                 batch_slots: int = 8, eos_token_id: Optional[int] = None,
                 rules: Optional[Rules] = None, **sampling_kw):
        self.mesh = mesh
        self.rules = tuple(rules) if rules is not None else shard_rules_llama()
        data = mesh.shape.get(DATA_AXIS, 1)
        assert batch_slots % data == 0, (batch_slots, data)
        variables = {
            k: shard_pytree(v, mesh, self.rules) for k, v in variables.items()
            if k != "cache"
        }
        super().__init__(model, variables, batch_slots=batch_slots,
                         eos_token_id=eos_token_id, **sampling_kw)
        self._tok_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
        self.tokens = jax.device_put(self.tokens, self._tok_sharding)
        self._cache_shardings = None
        self._merge = None

    # ------------------------------------------------------------- multihost
    def sync_queue(self) -> None:
        """Broadcast the root process's pending queue to every process so all
        hosts dispatch identical SPMD programs.  Identity with one process.

        Process identity is derived from the *mesh* (parallel/multihost.py),
        not jax's default backend — jax.process_count() lies when the mesh
        lives on a non-default backend (caught by tests/test_multiprocess.py).
        """
        from ..parallel.multihost import (
            broadcast_from_root, mesh_process_count, mesh_process_indices,
            my_process_index,
        )

        if mesh_process_count(self.mesh) == 1:
            return
        is_root = my_process_index(self.mesh) == mesh_process_indices(
            self.mesh)[0]

        # Serialize the queue to fixed-shape int32 rows:
        #   [rid, budget, len, temp(bits), top_k, top_p(bits),
        #    stop region (STOPW ints: repeated (len, tokens...), 0-len ends),
        #    prompt tokens (MAXP)]
        # Float sampling params travel bit-cast; stop sequences that overflow
        # the fixed region are dropped with a warning (host-side match only).
        MAXP = self.kcfg.max_prefill
        STOPW = 32
        HDR = 6
        n = len(self.queue) if is_root else 0
        n = int(broadcast_from_root(np.int32(n), self.mesh))
        flat = np.zeros((n, HDR + STOPW + MAXP), np.int32)
        if is_root:
            for i, (rid, ids, budget, pr) in enumerate(self.queue[:n]):
                ids = np.asarray(ids).reshape(-1)[-MAXP:]
                flat[i, 0], flat[i, 1], flat[i, 2] = rid, budget, len(ids)
                flat[i, 3] = np.float32(pr.temperature).view(np.int32)
                flat[i, 4] = pr.top_k
                flat[i, 5] = np.float32(pr.top_p).view(np.int32)
                w = HDR
                for seq in pr.stop:
                    if w + 1 + len(seq) > HDR + STOPW:
                        import warnings
                        warnings.warn(
                            "sync_queue: stop sequences exceed the "
                            f"{STOPW}-int wire region; extras dropped")
                        break
                    flat[i, w] = len(seq)
                    flat[i, w + 1:w + 1 + len(seq)] = seq
                    w += 1 + len(seq)
                flat[i, HDR + STOPW:HDR + STOPW + len(ids)] = ids
        flat = broadcast_from_root(flat, self.mesh)

        def _params(r):
            stop = []
            w = HDR
            while w < HDR + STOPW and r[w] > 0:
                L = int(r[w])
                stop.append(tuple(int(t) for t in r[w + 1:w + 1 + L]))
                w += 1 + L
            return SamplingParams(
                temperature=float(r[3:4].view(np.float32)[0]),
                top_k=int(r[4]),
                top_p=float(r[5:6].view(np.float32)[0]),
                stop=tuple(stop),
            )

        self.queue = [
            (int(r[0]), r[HDR + STOPW:HDR + STOPW + int(r[2])].copy(),
             int(r[1]), _params(r))
            for r in flat
        ]
        # a synced non-greedy request must flip every process's decode
        # program, not just the submitting one
        if any(p.temperature != 0.0 for *_, p in self.queue) \
                and not self._dynamic_sampling:
            self._dynamic_sampling = True
            self._decode = None
        # keep ids monotonic: never move _next_id backwards (process 0 may
        # already have handed out higher ids; an empty queue must not reset)
        self._next_id = max(
            self._next_id, max([q[0] for q in self.queue], default=-1) + 1)

    def run(self) -> Dict[int, List[int]]:
        self.sync_queue()
        return super().run()

    # ------------------------------------------------------------- placement
    def _init_cache(self):
        super()._init_cache()
        self._cache_shardings = apply_sharding_rules(
            self.cache, self.mesh, self.rules)
        self.cache = jax.tree_util.tree_map(
            jax.device_put, self.cache, self._cache_shardings)

    def _merge_prefill(self, b: int, small, logits, S: int, prefill_rng):
        # jitted merge pinned to the cache shardings, so the big cache never
        # migrates off its placement (slot index is a static arg: B distinct
        # tiny programs, compiled once each)
        if self._merge is None:
            @partial(jax.jit, static_argnums=2,
                     out_shardings=(self._cache_shardings,
                                    self._tok_sharding))
            def merge(cache, small, b, tokens, tok):
                def one(big, small_leaf):
                    if big.ndim == 1 and small_leaf.ndim == 0:
                        return big.at[b].set(small_leaf.astype(big.dtype))
                    start = (b,) + (0,) * (big.ndim - 1)
                    return jax.lax.dynamic_update_slice(
                        big, small_leaf.astype(big.dtype), start)

                cache = jax.tree_util.tree_map(one, cache, small)
                return cache, tokens.at[b, 0].set(tok)

            self._merge = merge
        from .generate import _sample
        pr = self.slots[b].params
        next_tok = _sample(
            logits[0, S - 1][None], prefill_rng, pr.temperature,
            pr.top_k or None,
            pr.top_p if pr.top_p < 1.0 else None)[0].astype(jnp.int32)
        self.cache, self.tokens = self._merge(
            self.cache, small, b, self.tokens, next_tok)
        self.slots[b].generated = [int(jax.device_get(next_tok))]

    def _publish_next(self, nxt) -> np.ndarray:
        # Host-side scheduling needs every slot's token on every process; the
        # sampled ids are data-sharded, so reshard to replicated on the
        # engine's own mesh first (multihost_utils would gather over the
        # default backend, which may not be the mesh's backend).
        from ..parallel.multihost import mesh_process_count, replicate_to_host

        if mesh_process_count(self.mesh) > 1:
            nxt_host = replicate_to_host(nxt, self.mesh)
        else:
            nxt_host = np.asarray(nxt)
        self.tokens = jax.device_put(nxt[:, None], self._tok_sharding)
        return nxt_host

    def _put_slot_array(self, arr: np.ndarray):
        # per-slot sampling params follow the slots over the data axis
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(self.mesh, P(DATA_AXIS)))

    def _decode_jit_kwargs(self):
        assert self._cache_shardings is not None
        return {"out_shardings": (self._cache_shardings,
                                  NamedSharding(self.mesh, P(DATA_AXIS)))}


def decode_collective_report(engine: DistributedEngine) -> Dict[str, int]:
    """Compile the engine's decode step and count cross-device collectives in
    the optimized HLO.  On a pure data mesh the count must be zero — the
    compile-time proof that slot throughput scales linearly with hosts (the
    only per-step cross-host traffic would be these ops)."""
    if engine.cache is None:
        engine._init_cache()
    main_len, res_len = engine._lengths()
    temp_b, topk_b, topp_b = engine._slot_sampling_arrays()
    lowered = engine._decode_fn().lower(
        engine.variables, engine.cache, engine.tokens, main_len, res_len,
        jax.random.PRNGKey(0), temp_b, topk_b, topp_b)
    text = lowered.compile().as_text()
    report = {}
    for op in _COLLECTIVES:
        n = sum(
            1 for line in text.splitlines()
            if f" {op}(" in line or f" {op}-start(" in line
        )
        if n:
            report[op] = n
    return report
