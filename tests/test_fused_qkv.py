"""Fused qkv projection (LlamaConfig.fused_qkv): one GEMM for q/k/v with a
TP-friendly per-kv-head-interleaved column layout.

r04 measured the fusion +13% on the 7B decode qkvo GEMM but left it
unwired ('param-tree surgery touching sharding + caches'); this is the
wiring plus the tests that pin it: exact logits equality against the
unfused model, serving-storage equality, and the sharding rules resolving
the fused kernel/storage leaves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import (
    LlamaConfig, LlamaForCausalLM, fuse_qkv_params,
)


def make_pair(**kw):
    from dataclasses import replace
    cfg_u = LlamaConfig.tiny(max_position_embeddings=64, **kw)
    cfg_f = replace(cfg_u, fused_qkv=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)))
    m_u = LlamaForCausalLM(cfg_u, None)
    m_f = LlamaForCausalLM(cfg_f, None)
    v_u = m_u.init(jax.random.PRNGKey(0), ids)
    v_f = {"params": fuse_qkv_params(v_u["params"], cfg_u)}
    return cfg_u, m_u, m_f, v_u, v_f, ids


class TestFusedQkv:
    def test_logits_exact_mha(self):
        _, m_u, m_f, v_u, v_f, ids = make_pair()
        lu = np.asarray(m_u.apply(v_u, ids))
        lf = np.asarray(m_f.apply(v_f, ids))
        np.testing.assert_array_equal(lu, lf)

    def test_logits_exact_gqa(self):
        _, m_u, m_f, v_u, v_f, ids = make_pair(
            num_attention_heads=4, num_key_value_heads=2)
        lu = np.asarray(m_u.apply(v_u, ids))
        lf = np.asarray(m_f.apply(v_f, ids))
        np.testing.assert_array_equal(lu, lf)

    def test_param_count_preserved(self):
        _, _, m_f, v_u, v_f, _ = make_pair()
        n_u = sum(l.size for l in jax.tree_util.tree_leaves(v_u))
        n_f = sum(l.size for l in jax.tree_util.tree_leaves(v_f))
        assert n_u == n_f

    def test_serving_storage_decode_matches_unfused(self):
        """w4a16 storage built from the fused tree decodes identically to
        the unfused storage model (per-column quantization is layout-
        independent)."""
        from dataclasses import replace
        from quantized_training_tpu.quantize import QuantConfig
        from quantized_training_tpu.quantize.storage import build_storage
        from quantized_training_tpu.serving.kv_cache import KVCacheConfig

        kcfg = KVCacheConfig.int_sym(max_prefill=16, max_decode=8, bits=8)
        cfg_u = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg,
                                 hidden_size=128, intermediate_size=256)
        cfg_f = replace(cfg_u, fused_qkv=True)
        qc = QuantConfig().with_storage("w4a16", 64)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 10)))

        m_u = LlamaForCausalLM(cfg_u, qc)
        m_f = LlamaForCausalLM(cfg_f, qc)
        v_u = LlamaForCausalLM(cfg_u, None).init(jax.random.PRNGKey(0), ids)
        pf = fuse_qkv_params(v_u["params"], cfg_u)

        def serve_vars(params):
            storage, slim = build_storage(params, "w4a16", 64)
            return {"params": slim, "storage": storage}

        def decode_logits(m, params):
            variables = serve_vars(params)
            _, upd = m.apply(variables, ids, use_cache=True, cache_index=0,
                             prompt_len=10, mutable=["cache"])
            lg, _ = m.apply({**variables, "cache": upd["cache"]},
                            ids[:, :1] * 0 + 3, use_cache=True,
                            cache_index=10, mutable=["cache"])
            return np.asarray(lg, np.float32)

        lu = decode_logits(m_u, v_u["params"])
        lf = decode_logits(m_f, pf)
        np.testing.assert_allclose(lu, lf, atol=2e-3, rtol=2e-3)

    def test_sharding_rules_cover_fused_leaves(self):
        from quantized_training_tpu.parallel import (
            MODEL_AXIS, apply_sharding_rules, create_mesh,
            shard_rules_llama,
        )
        from quantized_training_tpu.parallel.sharding import (
            shard_rules_llama_storage,
        )
        from quantized_training_tpu.quantize.storage import build_storage

        _, _, m_f, v_u, v_f, ids = make_pair()
        mesh = create_mesh(2, 4)
        shardings = apply_sharding_rules(
            v_f["params"], mesh, shard_rules_llama())
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        qkv = [s for p, s in flat if "qkv_proj" in str(p)]
        assert qkv, "no qkv_proj leaf found"
        for s in qkv:
            assert s.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS), s

        storage, slim = build_storage(v_f["params"], "w4a16", 64)
        st_sh = apply_sharding_rules(
            storage, mesh, shard_rules_llama_storage("w4a16"))
        flat = jax.tree_util.tree_flatten_with_path(st_sh)[0]
        codes = [s for p, s in flat
                 if "qkv_proj" in str(p) and "codes" in str(p)]
        assert codes, "no fused storage codes"
        for s in codes:
            assert s.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS), s

    def test_fused_sharded_forward_runs(self):
        """pjit forward with the fused tree sharded on an (1, 4) mesh —
        kv-head blocks align with the model-axis shards."""
        from quantized_training_tpu.parallel import (
            apply_sharding_rules, create_mesh, shard_rules_llama,
        )
        cfg_u, _, m_f, v_u, v_f, ids = make_pair(
            num_attention_heads=4, num_key_value_heads=4)
        mesh = create_mesh(1, 4)
        shardings = apply_sharding_rules(
            v_f["params"], mesh, shard_rules_llama())
        params = jax.device_put(v_f["params"], shardings)
        out = jax.jit(lambda p, i: m_f.apply({"params": p}, i))(params, ids)
        ref = m_f.apply(v_f, ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)
