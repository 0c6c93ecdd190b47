"""Serving-layer tests: quantized KV cache round trips, KIVI generate
consistency, code packing, flash attention vs naive."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.serving import (
    KVCacheConfig, generate, init_cache, prefill_cache, append_to_cache,
    cache_kv, pack_codes, unpack_codes,
)


class TestKVCache:
    def test_groupwise_roundtrip_error(self):
        cfg = KVCacheConfig.kivi(max_prefill=32, max_decode=8)
        rng = np.random.default_rng(0)
        B, S, KV, D = 2, 32, 2, 64
        k = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        cache = init_cache(cfg, B, KV, D)
        cache = prefill_cache(cache, cfg, k, v)
        k2, v2 = cache_kv(cache, cfg)
        # uint2 with 32-wide groups: coarse but bounded reconstruction
        k_err = float(jnp.max(jnp.abs(k2[:, :S] - k)))
        assert k_err < 2.5  # (max-min)/3 per group bound-ish
        assert cache.k_codes.dtype == jnp.uint8
        assert int(cache.k_codes.max()) <= 3 and int(cache.k_codes.min()) >= 0

    def test_residual_append(self):
        cfg = KVCacheConfig.kivi(max_prefill=16, max_decode=4)
        B, KV, D = 1, 2, 32
        cache = init_cache(cfg, B, KV, D)
        k1 = jnp.ones((B, 1, KV, D), jnp.bfloat16)
        cache = append_to_cache(cache, k1, k1 * 2)
        cache = append_to_cache(cache, k1 * 3, k1 * 4)
        assert int(cache.res_len) == 2
        # head-major residual layout: (B, KV, R, D)
        np.testing.assert_array_equal(
            np.asarray(cache.k_res[:, :, 0].astype(jnp.float32)), 1.0)
        np.testing.assert_array_equal(
            np.asarray(cache.k_res[:, :, 1].astype(jnp.float32)), 3.0)
        # residual tokens come back exactly (full precision)
        k_full, v_full = cache_kv(cache, cfg)
        np.testing.assert_array_equal(
            np.asarray(k_full[:, 16].astype(jnp.float32)), 1.0)
        np.testing.assert_array_equal(
            np.asarray(v_full[:, 17].astype(jnp.float32)), 4.0)

    def test_unquantized_cache_config(self):
        cfg = KVCacheConfig(max_prefill=8, max_decode=4)
        B, KV, D = 1, 2, 16
        k = jnp.asarray(np.random.default_rng(1).standard_normal((B, 8, KV, D)),
                        jnp.bfloat16)
        cache = prefill_cache(init_cache(cfg, B, KV, D), cfg, k, k)
        k2, _ = cache_kv(cache, cfg)
        np.testing.assert_array_equal(
            np.asarray(k2[:, :8].astype(jnp.float32)),
            np.asarray(k.astype(jnp.float32)))


class TestPacking:
    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_pack_roundtrip(self, bits):
        rng = np.random.default_rng(2)
        codes = jnp.asarray(
            rng.integers(0, 2 ** bits, (3, 5, 16)), jnp.int8)
        packed = pack_codes(codes, bits)
        assert packed.shape == (3, 5, 16 * bits // 8)
        out = unpack_codes(packed, bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    @pytest.mark.parametrize("bits", [2, 4])
    def test_pack_roundtrip_signed(self, bits):
        """Signed intN codes need sign extension on unpack: int4 -1 packs as
        0b1111 and must come back as -1, not 15."""
        rng = np.random.default_rng(3)
        lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1)
        codes = jnp.asarray(rng.integers(lo, hi, (2, 16)), jnp.int8)
        packed = pack_codes(codes, bits)
        out = unpack_codes(packed, bits, signed=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


class TestPlanarPacking:
    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_tokens_planar_roundtrip(self, bits):
        from quantized_training_tpu.serving.kv_cache import (
            pack_tokens_planar, unpack_tokens_planar,
        )
        rng = np.random.default_rng(5)
        # head-major layout: token axis is -2, lanes (D) last; P must be a
        # multiple of 32//bits codes-per-int32-word
        codes = jnp.asarray(
            rng.integers(0, 2 ** bits, (2, 3, 64, 8)), jnp.uint8)
        packed = pack_tokens_planar(codes, bits)
        assert packed.shape == (2, 3, 64 * bits // 32, 8)
        assert packed.dtype == jnp.int32
        out = unpack_tokens_planar(packed, bits)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))

    def test_packed_cache_matches_unpacked(self):
        """cache_kv over a packed cache == over the unpacked cache."""
        B, S, KV, D = 2, 32, 2, 64
        rng = np.random.default_rng(6)
        k = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, S, KV, D)), jnp.bfloat16)
        cfg_u = KVCacheConfig.kivi(max_prefill=32, max_decode=8)
        cfg_p = KVCacheConfig.kivi(max_prefill=32, max_decode=8, pack=True)
        cu = prefill_cache(init_cache(cfg_u, B, KV, D), cfg_u, k, v)
        cp = prefill_cache(init_cache(cfg_p, B, KV, D), cfg_p, k, v)
        assert cp.k_codes.shape[2] == 32 * 2 // 32  # uint2: 16 codes/word
        ku, vu = cache_kv(cu, cfg_u)
        kp, vp = cache_kv(cp, cfg_p)
        np.testing.assert_array_equal(np.asarray(ku.astype(jnp.float32)),
                                      np.asarray(kp.astype(jnp.float32)))
        np.testing.assert_array_equal(np.asarray(vu.astype(jnp.float32)),
                                      np.asarray(vp.astype(jnp.float32)))


class TestFusedKiviAttention:
    """The fused dequant-attention kernel vs the cache_kv + jnp reference."""

    def _naive(self, q, cache, cfg, ml, rl):
        kcfg = cfg
        k, v = cache_kv(cache, kcfg, jnp.float32)
        B, T, KV, D = k.shape
        H = q.shape[1]
        if KV != H:
            k = jnp.repeat(k, H // KV, axis=2)
            v = jnp.repeat(v, H // KV, axis=2)
        s = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(D)
        P = kcfg.max_prefill
        t = jnp.arange(T)[None, None, :]
        vis = jnp.where(t < P, t < ml[:, None, None],
                        (t - P) < rl[:, None, None])
        s = jnp.where(vis, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bht,bthd->bhd", p, v.astype(jnp.float32))

    @pytest.mark.parametrize("pack", [False, True])
    def test_matches_naive(self, pack):
        from quantized_training_tpu.ops.pallas.kivi_attention import (
            kivi_decode_attention,
        )
        from quantized_training_tpu.serving.kv_cache import append_to_cache
        B, P, R, KV, H, D = 2, 32, 8, 2, 4, 64
        kcfg = KVCacheConfig.kivi(max_prefill=P, max_decode=R, pack=pack)
        rng = np.random.default_rng(7)
        k = jnp.asarray(rng.standard_normal((B, P, KV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, P, KV, D)), jnp.bfloat16)
        cache = prefill_cache(init_cache(kcfg, B, KV, D), kcfg, k, v,
                              length=20)  # short prompt: 20 < P
        for _ in range(3):
            kn = jnp.asarray(rng.standard_normal((B, 1, KV, D)), jnp.bfloat16)
            vn = jnp.asarray(rng.standard_normal((B, 1, KV, D)), jnp.bfloat16)
            cache = append_to_cache(cache, kn, vn)

        q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
        ml = jnp.full((B,), 20, jnp.int32)
        rl = jnp.full((B,), 3, jnp.int32)
        out = kivi_decode_attention(
            q, cache.k_codes, cache.k_scale, cache.k_zp,
            cache.v_codes, cache.v_scale, cache.v_zp,
            cache.k_res, cache.v_res, ml, rl,
            bits_k=kcfg._pack_bits(kcfg.k_spec),
            bits_v=kcfg._pack_bits(kcfg.v_spec),
        )
        ref = self._naive(q, cache, kcfg, ml, rl)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def test_model_fused_decode_logits_match_naive_path(self):
        """End-to-end through the model: a decode step with the fused kernel
        produces the same logits as use_fused_kivi=False (same quantized
        cache).  Tolerance covers the naive path's bf16 softmax vs the
        kernel's f32 softmax."""
        kcfg = KVCacheConfig.kivi(
            max_prefill=16, max_decode=8,
            k_spec="uint4,qs=group_wise_affine,bs=16,ax=-2",
            v_spec="uint4,qs=group_wise_affine,bs=16,ax=-1", pack=True)
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
        kcfg = KVCacheConfig.kivi(max_prefill=16, max_decode=8, pack=True)
        ids = jnp.asarray(np.random.default_rng(9).integers(0, 256, (2, 10)))
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        m = LlamaForCausalLM(cfg, None)
        vars_ = m.init(jax.random.PRNGKey(0), ids)
        out = generate(m, vars_, ids, max_new_tokens=6)
        assert out.shape == (2, 16)
        assert np.asarray(out).min() >= 0


class TestGenerate:
    def setup_method(self, _):
        self.cfg_fp = LlamaConfig.tiny(max_position_embeddings=64)
        self.ids = jnp.asarray(
            np.random.default_rng(3).integers(0, 256, (2, 8)))

    def test_greedy_fp_cache(self):
        model = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model.init(jax.random.PRNGKey(0), self.ids)
        out = generate(model, vars_, self.ids, max_new_tokens=5)
        assert out.shape == (2, 13)
        # greedy must be deterministic
        out2 = generate(model, vars_, self.ids, max_new_tokens=5)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_greedy_matches_no_cache_argmax(self):
        """First generated token == argmax of the full forward's last logits."""
        model = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model.init(jax.random.PRNGKey(0), self.ids)
        logits = model.apply(vars_, self.ids)
        expected = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        out = generate(model, vars_, self.ids, max_new_tokens=1)
        np.testing.assert_array_equal(np.asarray(out[:, -1]), expected)

    def test_two_tier_mechanics_exact(self):
        """Two-tier cache with *unquantized* main must reproduce the fp-cache
        generate exactly — isolates the main/residual plumbing from
        quantization error."""
        kcfg = KVCacheConfig(max_prefill=8, max_decode=8)
        cfg_kivi = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model_fp = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model_fp.init(jax.random.PRNGKey(0), self.ids)
        out_fp = generate(model_fp, vars_, self.ids, max_new_tokens=4)

        model_kivi = LlamaForCausalLM(cfg_kivi, None)
        vars_k = model_kivi.init(jax.random.PRNGKey(0), self.ids)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            vars_["params"], vars_k["params"])
        out_kivi = generate(model_kivi, vars_k, self.ids, max_new_tokens=4)
        np.testing.assert_array_equal(np.asarray(out_kivi), np.asarray(out_fp))

    def test_kivi_uint8_logits_close(self):
        """uint8-quantized cache decode logits track the fp-cache logits."""
        kcfg = KVCacheConfig.kivi(
            max_prefill=8, max_decode=8,
            k_spec="uint8,qs=group_wise_affine,bs=16,ax=-2",
            v_spec="uint8,qs=group_wise_affine,bs=16,ax=-1",
        )
        cfg_kivi = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model_fp = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model_fp.init(jax.random.PRNGKey(0), self.ids)
        model_kivi = LlamaForCausalLM(cfg_kivi, None)

        tok = self.ids[:, :1] * 0 + 5
        # prefill both, decode one step, compare logits
        _, upd_fp = model_fp.apply(vars_, self.ids, use_cache=True,
                                   cache_index=0, mutable=["cache"])
        lg_fp, _ = model_fp.apply(
            {**vars_, "cache": upd_fp["cache"]}, tok, use_cache=True,
            cache_index=8, mutable=["cache"])
        _, upd_k = model_kivi.apply(vars_, self.ids, use_cache=True,
                                    cache_index=0, mutable=["cache"])
        lg_k, _ = model_kivi.apply(
            {**vars_, "cache": upd_k["cache"]}, tok, use_cache=True,
            cache_index=8, mutable=["cache"])
        a, b = np.asarray(lg_fp).ravel(), np.asarray(lg_k).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.99

    def test_kivi_uint2_generates_finite(self):
        kcfg = KVCacheConfig.kivi(max_prefill=8, max_decode=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        vars_ = model.init(jax.random.PRNGKey(0), self.ids)
        out = generate(model, vars_, self.ids, max_new_tokens=4)
        assert out.shape == (2, 12)

    def test_two_tier_short_prompt_exact(self):
        """Regression: prompts shorter than max_prefill must decode exactly.

        Previously the decode mask assumed main_len == max_prefill, so a
        short prompt attended zero-padded main-cache slots and masked the
        fresh residual token.  Unquantized two-tier vs fp-cache isolates the
        mask/plumbing from quantization error."""
        kcfg = KVCacheConfig(max_prefill=16, max_decode=8)  # S=8 < P=16
        cfg_kivi = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model_fp = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model_fp.init(jax.random.PRNGKey(0), self.ids)
        out_fp = generate(model_fp, vars_, self.ids, max_new_tokens=5)

        model_kivi = LlamaForCausalLM(cfg_kivi, None)
        out_kivi = generate(model_kivi, vars_, self.ids, max_new_tokens=5)
        np.testing.assert_array_equal(np.asarray(out_kivi), np.asarray(out_fp))

    def test_kivi_uint8_short_prompt_finite_and_tracks_fp(self):
        kcfg = KVCacheConfig.kivi(
            max_prefill=16, max_decode=8,
            k_spec="uint8,qs=group_wise_affine,bs=16,ax=-2",
            v_spec="uint8,qs=group_wise_affine,bs=16,ax=-1",
        )
        cfg_kivi = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model_fp = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model_fp.init(jax.random.PRNGKey(0), self.ids)
        model_kivi = LlamaForCausalLM(cfg_kivi, None)

        tok = self.ids[:, :1] * 0 + 5
        _, upd_fp = model_fp.apply(vars_, self.ids, use_cache=True,
                                   cache_index=0, mutable=["cache"])
        lg_fp, _ = model_fp.apply(
            {**vars_, "cache": upd_fp["cache"]}, tok, use_cache=True,
            cache_index=8, mutable=["cache"])
        # short prompt (8 < max_prefill 16) with true length threaded
        _, upd_k = model_kivi.apply(vars_, self.ids, use_cache=True,
                                    cache_index=0, prompt_len=8,
                                    mutable=["cache"])
        lg_k, _ = model_kivi.apply(
            {**vars_, "cache": upd_k["cache"]}, tok, use_cache=True,
            cache_index=8, prompt_len=8, mutable=["cache"])
        a, b = np.asarray(lg_fp).ravel(), np.asarray(lg_k).ravel()
        assert np.all(np.isfinite(b))
        assert np.corrcoef(a, b)[0, 1] > 0.99

    def test_host_loop_matches_scan(self):
        """The on-device lax.scan decode loop produces the same tokens as
        the per-token host loop."""
        kcfg = KVCacheConfig(max_prefill=8, max_decode=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        vars_ = model.init(jax.random.PRNGKey(0), self.ids)
        out_scan = generate(model, vars_, self.ids, max_new_tokens=6)
        out_host = generate(model, vars_, self.ids, max_new_tokens=6,
                            host_loop=True)
        np.testing.assert_array_equal(
            np.asarray(out_scan), np.asarray(out_host))

    def test_fast_argmax_nan_matches_argmax(self):
        from quantized_training_tpu.serving.generate import fast_argmax
        x = jnp.asarray([[1.0, float("nan"), 2.0],
                         [3.0, 1.0, 3.0],
                         [float("nan"), 0.0, 1.0]])
        np.testing.assert_array_equal(
            np.asarray(fast_argmax(x)), np.asarray(jnp.argmax(x, axis=-1)))

    def test_sampling_temperature(self):
        model = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model.init(jax.random.PRNGKey(0), self.ids)
        out1 = generate(model, vars_, self.ids, max_new_tokens=4,
                        temperature=1.0, rng=jax.random.PRNGKey(1))
        out2 = generate(model, vars_, self.ids, max_new_tokens=4,
                        temperature=1.0, rng=jax.random.PRNGKey(2))
        assert not np.array_equal(np.asarray(out1), np.asarray(out2))

    def test_top_p_nucleus_support(self):
        # tokens outside the nucleus are never sampled; tokens inside keep
        # their renormalized relative frequencies
        from quantized_training_tpu.serving.generate import _sample
        probs = np.asarray([0.45, 0.30, 0.15, 0.07, 0.03], np.float32)
        logits = jnp.log(jnp.asarray(probs))[None, :]
        draws = np.asarray(jax.vmap(
            lambda k: _sample(logits, k, 1.0, None, 0.80)[0]
        )(jax.random.split(jax.random.PRNGKey(0), 4000)))
        counts = np.bincount(draws, minlength=5)
        # nucleus at p=0.8: cumulative-before {0, .45, .75, .90} < 0.8 keeps
        # tokens 0,1,2 only
        assert counts[3] == 0 and counts[4] == 0, counts
        freq = counts[:3] / counts[:3].sum()
        np.testing.assert_allclose(freq, probs[:3] / probs[:3].sum(),
                                   atol=0.03)

    def test_top_p_keeps_top1_when_p_tiny(self):
        from quantized_training_tpu.serving.generate import _sample
        logits = jnp.log(jnp.asarray([[0.9, 0.06, 0.04]], jnp.float32))
        toks = np.asarray(jax.vmap(
            lambda k: _sample(logits, k, 1.0, None, 0.05)[0]
        )(jax.random.split(jax.random.PRNGKey(1), 64)))
        assert (toks == 0).all()

    def test_top_p_composes_with_top_k(self):
        # top-k prunes first, nucleus applies within the survivors
        from quantized_training_tpu.serving.generate import _sample
        probs = np.asarray([0.35, 0.30, 0.20, 0.10, 0.05], np.float32)
        logits = jnp.log(jnp.asarray(probs))[None, :]
        draws = np.asarray(jax.vmap(
            lambda k: _sample(logits, k, 1.0, 3, 0.99)[0]
        )(jax.random.split(jax.random.PRNGKey(2), 2000)))
        counts = np.bincount(draws, minlength=5)
        assert counts[3] == 0 and counts[4] == 0, counts
        assert (counts[:3] > 0).all()

    def test_generate_with_top_p(self):
        model = LlamaForCausalLM(self.cfg_fp, None)
        vars_ = model.init(jax.random.PRNGKey(0), self.ids)
        out = generate(model, vars_, self.ids, max_new_tokens=4,
                       temperature=0.8, top_p=0.9,
                       rng=jax.random.PRNGKey(3))
        assert out.shape == (self.ids.shape[0], self.ids.shape[1] + 4)


class TestFlashInModel:
    def test_flash_matches_naive_model(self):
        cfg_naive = LlamaConfig.tiny(
            hidden_size=512, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128)
        cfg_flash = LlamaConfig.tiny(
            hidden_size=512, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, use_flash_attention=True)
        ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (1, 128)))
        m1 = LlamaForCausalLM(cfg_naive, None)
        vars_ = m1.init(jax.random.PRNGKey(0), ids)
        out1 = m1.apply(vars_, ids)
        m2 = LlamaForCausalLM(cfg_flash, None)
        out2 = m2.apply(vars_, ids)
        a, b = np.asarray(out1), np.asarray(out2)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
        np.testing.assert_allclose(a, b, rtol=8e-2, atol=8e-2)

    def test_flash_grad_flows(self):
        cfg_flash = LlamaConfig.tiny(
            hidden_size=512, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, use_flash_attention=True)
        ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (1, 128)))
        m = LlamaForCausalLM(cfg_flash, None)
        vars_ = m.init(jax.random.PRNGKey(0), ids)

        def loss(p):
            return jnp.mean(jnp.square(m.apply({"params": p}, ids)))

        g = jax.grad(loss)(vars_["params"])
        total = sum(float(jnp.sum(jnp.abs(x)))
                    for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_flash_kivi_prefill_matches_masked_naive(self):
        """Flash prefill over the KIVI cache (serving hot path): the stored
        cache must be IDENTICAL to the masked naive prefill's, and the
        logits at real (non-pad) positions must match — causality alone
        hides the pad slots, so dropping the explicit pad mask is safe."""
        def cfg_for(flash):
            return LlamaConfig.tiny(
                hidden_size=512, num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=256, use_flash_attention=flash,
                kv_cache=KVCacheConfig.kivi(
                    max_prefill=128, max_decode=16,
                    k_spec="uint4,qs=group_wise_affine,bs=16,ax=-2",
                    v_spec="uint4,qs=group_wise_affine,bs=16,ax=-1",
                    pack=True))

        rng = np.random.default_rng(11)
        P, true_len = 128, 100
        padded = np.zeros((1, P), np.int32)
        padded[0, :true_len] = rng.integers(1, 256, true_len)
        ids = jnp.asarray(padded)
        plen = jnp.asarray(true_len, jnp.int32)

        m_naive = LlamaForCausalLM(cfg_for(False), None)
        vars_ = m_naive.init(jax.random.PRNGKey(0), ids)
        out1, upd1 = m_naive.apply(
            vars_, ids, use_cache=True, cache_index=0, prompt_len=plen,
            mutable=["cache"])
        m_flash = LlamaForCausalLM(cfg_for(True), None)
        out2, upd2 = m_flash.apply(
            vars_, ids, use_cache=True, cache_index=0, prompt_len=plen,
            mutable=["cache"])

        # layer-0 cache: bit-identical (its k/v inputs are identical in both
        # models; deeper layers see ulp-level hidden-state differences from
        # the flash-vs-naive attention arithmetic, so codes there may
        # legitimately differ at group-boundary ties)
        c1 = upd1["cache"]["model"]["layers_0"]["self_attn"]["kivi"]
        c2 = upd2["cache"]["model"]["layers_0"]["self_attn"]["kivi"]
        for a, b in zip(jax.tree_util.tree_leaves(c1),
                        jax.tree_util.tree_leaves(c2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # logits at real positions: flash vs naive numerical tolerance
        a = np.asarray(out1)[:, :true_len]
        b = np.asarray(out2)[:, :true_len]
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
        np.testing.assert_allclose(a, b, rtol=8e-2, atol=8e-2)


class TestContinuousBatching:
    def test_engine_drains_queue(self):
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig(max_prefill=8, max_decode=8)  # unquantized main
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(7)
        ids0 = jnp.asarray(rng.integers(0, 256, (1, 8)))
        vars_ = model.init(jax.random.PRNGKey(0), ids0)

        engine = ContinuousBatchingEngine(
            model, {"params": vars_["params"]}, batch_slots=2)
        rids = [engine.submit(rng.integers(0, 256, 6), max_new_tokens=4)
                for _ in range(5)]
        results = engine.run()
        assert set(results) == set(rids)
        assert all(len(v) == 4 for v in results.values())

    def test_engine_matches_sequential_generate(self):
        """One request through the engine == generate() on the same model
        (unquantized cache => decode math identical)."""
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig(max_prefill=8, max_decode=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(8)
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

    def test_engine_matches_generate_short_prompt(self):
        """A prompt shorter than max_prefill through the engine's
        fixed-shape padded prefill == generate() with the true-length
        prefill (unquantized cache => decode math identical)."""
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig(max_prefill=16, max_decode=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(11)
        prompt = rng.integers(0, 256, 6)  # 6 < max_prefill 16
        vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(prompt[None]))

        ref = generate(model, {"params": vars_["params"]},
                       jnp.asarray(prompt[None]), max_new_tokens=4)
        expected = np.asarray(ref[0, 6:]).tolist()

        engine = ContinuousBatchingEngine(
            model, {"params": vars_["params"]}, batch_slots=2)
        rid = engine.submit(prompt, max_new_tokens=4)
        results = engine.run()
        assert results[rid] == expected

    def test_quantized_cache_engine(self):
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig.kivi(
            max_prefill=8, max_decode=8,
            k_spec="uint8,qs=group_wise_affine,bs=16,ax=-2",
            v_spec="uint8,qs=group_wise_affine,bs=16,ax=-1")
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(9)
        vars_ = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(rng.integers(0, 256, (1, 8))))
        engine = ContinuousBatchingEngine(
            model, {"params": vars_["params"]}, batch_slots=3)
        rids = [engine.submit(rng.integers(0, 256, 5), max_new_tokens=3)
                for _ in range(4)]
        results = engine.run()
        assert set(results) == set(rids)


class TestEngineSampling:
    """Sampling in the continuous-batching engine (parity with generate())."""

    def _engine(self, **kw):
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig(max_prefill=8, max_decode=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(13)
        ids0 = jnp.asarray(rng.integers(0, 256, (1, 8)))
        vars_ = model.init(jax.random.PRNGKey(0), ids0)
        return ContinuousBatchingEngine(
            model, {"params": vars_["params"]}, batch_slots=2, **kw), rng

    def test_temperature_sampling_deterministic_given_seed(self):
        eng1, rng = self._engine(temperature=0.8, top_k=20,
                                 rng=jax.random.PRNGKey(7))
        prompt = rng.integers(0, 256, 8)
        r1 = eng1.submit(prompt, max_new_tokens=5)
        out1 = eng1.run()
        eng2, _ = self._engine(temperature=0.8, top_k=20,
                               rng=jax.random.PRNGKey(7))
        r2 = eng2.submit(prompt, max_new_tokens=5)
        out2 = eng2.run()
        assert out1[r1] == out2[r2]
        eng3, _ = self._engine(temperature=0.8, top_k=20,
                               rng=jax.random.PRNGKey(8))
        r3 = eng3.submit(prompt, max_new_tokens=5)
        out3 = eng3.run()
        assert out1[r1] != out3[r3]  # different seed, different tokens

    def test_greedy_default_unchanged(self):
        eng, rng = self._engine()
        prompt = rng.integers(0, 256, 8)
        rid = eng.submit(prompt, max_new_tokens=4)
        ref = generate(eng.model, {"params": eng.variables["params"]},
                       jnp.asarray(prompt[None]), max_new_tokens=4)
        assert eng.run()[rid] == np.asarray(ref[0, 8:]).tolist()


class TestEngineRequestParams:
    """Per-request sampling params, stop sequences, and prefill buckets."""

    def _engine(self, max_prefill=8, **kw):
        from quantized_training_tpu.serving.engine import (
            ContinuousBatchingEngine,
        )
        kcfg = KVCacheConfig(max_prefill=max_prefill, max_decode=8)
        cfg = LlamaConfig.tiny(max_position_embeddings=256, kv_cache=kcfg)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(13)
        ids0 = jnp.asarray(rng.integers(0, 256, (1, 8)))
        vars_ = model.init(jax.random.PRNGKey(0), ids0)
        return ContinuousBatchingEngine(
            model, {"params": vars_["params"]}, batch_slots=2, **kw), rng

    def test_per_request_params_mix_greedy_and_sampled(self):
        """A greedy and a sampled request decode in the same batch; the
        greedy one matches generate() exactly."""
        eng, rng = self._engine()
        prompt = rng.integers(0, 256, 8)
        ref = generate(eng.model, {"params": eng.variables["params"]},
                       jnp.asarray(prompt[None]), max_new_tokens=4)
        r_greedy = eng.submit(prompt, max_new_tokens=4)
        r_sampled = eng.submit(rng.integers(0, 256, 6), max_new_tokens=4,
                               temperature=0.9, top_k=10, top_p=0.9)
        out = eng.run()
        assert out[r_greedy] == np.asarray(ref[0, 8:]).tolist()
        assert len(out[r_sampled]) == 4

    def test_stop_sequence_ends_and_trims(self):
        """A stop sequence equal to the first greedy tokens ends the request
        immediately with the stop trimmed."""
        eng, rng = self._engine()
        prompt = rng.integers(0, 256, 8)
        base = eng.submit(prompt, max_new_tokens=6)
        first = eng.run()[base][:2]

        eng2, _ = self._engine()
        rid = eng2.submit(prompt, max_new_tokens=6, stop=[list(first)])
        out = eng2.run()
        assert out[rid] == []  # stopped at the 2nd token, both trimmed

        # stop sequence that never occurs changes nothing
        eng3, _ = self._engine()
        rid3 = eng3.submit(prompt, max_new_tokens=6, stop=[[257, 258]])
        full = eng3.run()[rid3]
        assert len(full) == 6

    def test_prefill_buckets_tokens_identical(self):
        """Bucketed prefill (pad to 64/128/256) produces token-for-token the
        same output as single-bucket (pad to max_prefill) for every length."""
        eng_b, rng = self._engine(max_prefill=256)
        assert eng_b.prefill_buckets == [64, 128, 256]
        eng_1, _ = self._engine(max_prefill=256, prefill_buckets=[256])
        prompts = [rng.integers(0, 256, n) for n in (5, 64, 100, 256)]
        rb = [eng_b.submit(p, max_new_tokens=4) for p in prompts]
        r1 = [eng_1.submit(p, max_new_tokens=4) for p in prompts]
        ob, o1 = eng_b.run(), eng_1.run()
        assert [ob[r] for r in rb] == [o1[r] for r in r1]
