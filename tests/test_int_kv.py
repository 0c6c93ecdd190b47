"""Tests for the per-token symmetric int8/int4 KV cache and its fused
decode-attention kernel (ops/pallas/int_kv_attention.py).

The format preserves the reference's two-tier semantics (quantized main +
fp residual, llm_utils.py:295-499) while restructuring the main tier so the
decode kernel has no zero-point machinery — the r05 structural answer to
the uint2 KIVI kernel's critical-path bound (BENCH_KVRACE_r05).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.serving.generate import generate
from quantized_training_tpu.serving.kv_cache import (
    KVCacheConfig,
    append_to_cache,
    cache_kv,
    init_cache,
    prefill_cache,
)


class TestIntSymCache:
    # error bound per element: amax/(2*qmax) with amax ~ 4 for the normal
    # draw (plus bf16 input rounding)
    @pytest.mark.parametrize("bits,tol", [(8, 0.02), (4, 0.32)])
    def test_roundtrip_error(self, bits, tol):
        B, S, KV, D = 2, 32, 2, 64
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        cfg = KVCacheConfig.int_sym(max_prefill=S, max_decode=8, bits=bits)
        cache = prefill_cache(init_cache(cfg, B, KV, D), cfg, k, v)
        kd, vd = cache_kv(cache, cfg)
        kd = kd[:, :S]
        vd = vd[:, :S]
        for orig, deq in [(k, kd), (v, vd)]:
            err = np.abs(np.asarray(deq, np.float32)
                         - np.asarray(orig, np.float32))
            # per-token scale: error bounded by scale/2 = amax/(2*qmax)
            assert err.max() <= tol, (bits, err.max())

    def test_int4_codes_packed_shape(self):
        B, S, KV, D = 2, 32, 2, 64
        cfg = KVCacheConfig.int_sym(max_prefill=S, max_decode=8, bits=4)
        cache = init_cache(cfg, B, KV, D)
        assert cache.k_codes.shape == (B, KV, S // 8, D)
        assert cache.k_codes.dtype == jnp.int32
        assert cache.k_scale.shape == (B, KV, 1, S)
        cfg8 = KVCacheConfig.int_sym(max_prefill=S, max_decode=8, bits=8)
        cache8 = init_cache(cfg8, B, KV, D)
        assert cache8.k_codes.shape == (B, KV, S, D)
        assert cache8.k_codes.dtype == jnp.int8

    def test_partial_prefill_padded_rows_masked(self):
        """A padded fixed-shape prefill stores the same visible content as a
        true-length prefill (invalid slots are masked by length)."""
        B, S, KV, D = 1, 16, 2, 64
        rng = np.random.default_rng(1)
        k = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        cfg = KVCacheConfig.int_sym(max_prefill=S, max_decode=4, bits=8)
        c_full = prefill_cache(init_cache(cfg, B, KV, D), cfg, k, v,
                               length=10)
        k_deq, _ = cache_kv(c_full, cfg)
        # visible rows equal the full-prefill quantization of the zeroed
        # input; rows >= length quantize zeros -> dequantize to zeros
        np.testing.assert_array_equal(
            np.asarray(k_deq[:, 10:S].astype(jnp.float32)), 0.0)
        assert int(c_full.main_len) == 10


class TestIntKvKernel:
    def _naive(self, q, cache, cfg, ml, rl):
        k, v = cache_kv(cache, cfg, jnp.float32)
        B, T, KV, D = k.shape
        H = q.shape[1]
        if KV != H:
            k = jnp.repeat(k, H // KV, axis=2)
            v = jnp.repeat(v, H // KV, axis=2)
        s = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(D)
        P = cfg.max_prefill
        t = jnp.arange(T)[None, None, :]
        vis = jnp.where(t < P, t < ml[:, None, None],
                        (t - P) < rl[:, None, None])
        s = jnp.where(vis, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bht,bthd->bhd", p, v.astype(jnp.float32))

    def _build(self, bits, B=2, P=32, R=8, KV=2, D=64):
        cfg = KVCacheConfig.int_sym(max_prefill=P, max_decode=R, bits=bits)
        rng = np.random.default_rng(7)
        k = jnp.asarray(rng.standard_normal((B, P, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, P, KV, D)), jnp.bfloat16)
        cache = prefill_cache(init_cache(cfg, B, KV, D), cfg, k, v,
                              length=20)
        for _ in range(3):
            kn = jnp.asarray(rng.standard_normal((B, 1, KV, D)), jnp.bfloat16)
            vn = jnp.asarray(rng.standard_normal((B, 1, KV, D)), jnp.bfloat16)
            cache = append_to_cache(cache, kn, vn)
        ml = jnp.full((B,), 20, jnp.int32)
        rl = jnp.full((B,), 3, jnp.int32)
        return cfg, cache, ml, rl, rng

    @pytest.mark.parametrize("bits", [8, 4])
    def test_matches_naive(self, bits):
        from quantized_training_tpu.ops.pallas.int_kv_attention import (
            int_kv_decode_attention,
        )
        cfg, cache, ml, rl, rng = self._build(bits)
        B, KV, D, H = 2, 2, 64, 4
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
        out = int_kv_decode_attention(
            q, cache.k_codes, cache.k_scale, cache.v_codes, cache.v_scale,
            cache.k_res, cache.v_res, ml, rl,
            bits=bits, int_dots=False, k_transposed=False)
        ref = self._naive(q, cache, cfg, ml, rl)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=2e-2,
            rtol=2e-2)

    @pytest.mark.parametrize("int_dots,k_transposed",
                             [(True, True), (True, False), (False, True)])
    def test_variants_match_naive(self, int_dots, k_transposed):
        """The raced kernel variants (fully-integer dots, transposed-K
        layout) stay correct even though the bf16 untransposed form is the
        shipping default."""
        from quantized_training_tpu.ops.pallas.int_kv_attention import (
            int_kv_decode_attention,
        )
        cfg, cache, ml, rl, rng = self._build(8)
        B, KV, D, H = 2, 2, 64, 4
        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
        kc = (jnp.swapaxes(cache.k_codes, 2, 3) if k_transposed
              else cache.k_codes)
        out = int_kv_decode_attention(
            q, kc, cache.k_scale, cache.v_codes, cache.v_scale,
            cache.k_res, cache.v_res, ml, rl,
            bits=8, int_dots=int_dots, k_transposed=k_transposed)
        ref = self._naive(q, cache, cfg, ml, rl)
        tol = 0.12 if int_dots else 2e-2   # q/p->s8 rounding noise
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=tol, rtol=tol)


class TestIntKvModel:
    @pytest.mark.parametrize("bits", [8, 4])
    def test_model_fused_decode_logits_match_naive_path(self, bits):
        kcfg = KVCacheConfig.int_sym(max_prefill=16, max_decode=8, bits=bits)
        ids = jnp.asarray(np.random.default_rng(8).integers(0, 256, (2, 10)))
        cfg_f = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg,
                                 use_fused_kivi=True)
        cfg_n = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg,
                                 use_fused_kivi=False)
        m_f = LlamaForCausalLM(cfg_f, None)
        vars_ = m_f.init(jax.random.PRNGKey(0), ids)
        m_n = LlamaForCausalLM(cfg_n, None)
        tok = ids[:, :1] * 0 + 7

        _, upd = m_f.apply(vars_, ids, use_cache=True, cache_index=0,
                           prompt_len=10, mutable=["cache"])
        lg_f, _ = m_f.apply({**vars_, "cache": upd["cache"]}, tok,
                            use_cache=True, cache_index=10,
                            mutable=["cache"])
        lg_n, _ = m_n.apply({**vars_, "cache": upd["cache"]}, tok,
                            use_cache=True, cache_index=10,
                            mutable=["cache"])
        np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_n),
                                   atol=0.15, rtol=0.05)

    def test_generate_fused_runs_finite(self):
        kcfg = KVCacheConfig.int_sym(max_prefill=16, max_decode=8, bits=4)
        ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (2, 10)))
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        m = LlamaForCausalLM(cfg, None)
        vars_ = m.init(jax.random.PRNGKey(0), ids)
        out = generate(m, vars_, ids, max_new_tokens=6)
        assert out.shape == (2, 16)
        assert np.asarray(out).min() >= 0

    def test_int8_cache_tracks_fp_logits(self):
        """int8 per-token cache decode logits stay close to the fp-cache
        decode logits — the accuracy upgrade over uint2 the format claims."""
        ids = jnp.asarray(np.random.default_rng(10).integers(0, 256, (2, 10)))
        kcfg = KVCacheConfig.int_sym(max_prefill=16, max_decode=8, bits=8)
        cfg_q = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        cfg_fp = LlamaConfig.tiny(
            max_position_embeddings=64,
            kv_cache=KVCacheConfig(max_prefill=16, max_decode=8))
        m_q = LlamaForCausalLM(cfg_q, None)
        m_fp = LlamaForCausalLM(cfg_fp, None)
        vars_ = m_q.init(jax.random.PRNGKey(0), ids)
        tok = ids[:, :1] * 0 + 7

        def decode_logits(m):
            _, upd = m.apply(vars_, ids, use_cache=True, cache_index=0,
                             prompt_len=10, mutable=["cache"])
            lg, _ = m.apply({**vars_, "cache": upd["cache"]}, tok,
                            use_cache=True, cache_index=10,
                            mutable=["cache"])
            return np.asarray(lg, np.float32)

        lq, lfp = decode_logits(m_q), decode_logits(m_fp)
        assert np.max(np.abs(lq - lfp)) / (np.max(np.abs(lfp)) + 1e-6) < 0.05


class TestIntKvEngineAndSpeculative:
    def test_engine_int_sym_cache_matches_generate(self):
        """Continuous batching over the int-sym cache: one request through
        the engine equals generate() on the same model (same quantized
        cache content per slot)."""
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig.int_sym(max_prefill=8, max_decode=8, bits=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(11)
        prompt = rng.integers(0, 256, 8)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(prompt[None]))

        ref = generate(model, {"params": vars_["params"]},
                       jnp.asarray(prompt[None]), max_new_tokens=4)
        expected = np.asarray(ref[0, 8:]).tolist()

        engine = ContinuousBatchingEngine(
            model, {"params": vars_["params"]}, batch_slots=2)
        rid = engine.submit(prompt, max_new_tokens=4)
        results = engine.run()
        assert results[rid] == expected

    def test_speculative_int_sym_target_token_identical(self):
        """Greedy speculative decoding with an int-sym-cached target is
        token-identical to target-only greedy decoding (the two-tier rewind
        semantics are format-agnostic: verify blocks live in the fp
        residual ring)."""
        from quantized_training_tpu.serving.speculative import (
            speculative_generate,
        )
        kcfg = KVCacheConfig.int_sym(max_prefill=16, max_decode=16, bits=4)
        cfg_t = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        cfg_d = LlamaConfig.tiny(max_position_embeddings=64)
        ids = jnp.asarray(np.random.default_rng(12).integers(0, 256, (1, 8)))
        m_t = LlamaForCausalLM(cfg_t, None)
        m_d = LlamaForCausalLM(cfg_d, None)
        v = m_t.init(jax.random.PRNGKey(0), ids)

        ref = generate(m_t, v, ids, max_new_tokens=6)
        out = speculative_generate(m_t, v, m_d, v, ids, 6, k=2)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
