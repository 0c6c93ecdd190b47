"""Speculative decoding (serving/speculative.py): greedy acceptance must be
lossless — output token-identical to plain target-only greedy decoding —
for both a perfect draft (the target itself) and a disagreeing draft."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.serving.generate import generate
from quantized_training_tpu.serving.speculative import speculative_generate


def _make(seed, layers=2):
    cfg = LlamaConfig.tiny(num_hidden_layers=layers)
    model = LlamaForCausalLM(cfg, None)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), ids)
    return model, variables


@pytest.fixture(scope="module")
def target():
    return _make(0, layers=3)


@pytest.fixture(scope="module")
def draft():
    return _make(7, layers=1)


def _prompt(seed=3, S=11):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (1, S)), jnp.int32)


class TestSpeculativeGenerate:
    def test_perfect_draft_equals_greedy(self, target):
        model, variables = target
        ids = _prompt()
        ref = generate(model, variables, ids, 17)
        out, stats = speculative_generate(
            model, variables, model, variables, ids, 17, k=4,
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # the draft IS the target: every proposal accepted
        assert stats["accept_rate"] == 1.0
        # 1 prefill token + ceil(16 / 5) rounds
        assert stats["rounds"] == 4

    def test_disagreeing_draft_equals_greedy(self, target, draft):
        t_model, t_vars = target
        d_model, d_vars = draft
        ids = _prompt(5)
        ref = generate(t_model, t_vars, ids, 21)
        for k in (1, 3, 6):
            out = speculative_generate(
                t_model, t_vars, d_model, d_vars, ids, 21, k=k)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                          err_msg=f"k={k}")

    def test_single_token(self, target, draft):
        t_model, t_vars = target
        d_model, d_vars = draft
        ids = _prompt(9)
        ref = generate(t_model, t_vars, ids, 1)
        out = speculative_generate(t_model, t_vars, d_model, d_vars, ids, 1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_eos_masking_matches_generate(self, target, draft):
        t_model, t_vars = target
        d_model, d_vars = draft
        ids = _prompt(4)
        ref = generate(t_model, t_vars, ids, 19, eos_token_id=5)
        out = speculative_generate(
            t_model, t_vars, d_model, d_vars, ids, 19, k=4, eos_token_id=5)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_rejects_kivi_draft(self, target):
        # KIVI targets are supported (TestKiviSpeculative); a KIVI DRAFT is
        # not — the draft loop needs the fp cache's positional indexing
        from quantized_training_tpu.serving.kv_cache import KVCacheConfig
        model, variables = target
        kcfg = KVCacheConfig(max_prefill=16, max_decode=16)
        cfg = LlamaConfig.tiny(kv_cache=kcfg)
        qdraft = LlamaForCausalLM(cfg, None)
        with pytest.raises(AssertionError):
            speculative_generate(model, variables, qdraft, variables,
                                 _prompt(), 4)


class TestSampledSpeculative:
    """temperature > 0: the rejection rule must emit exactly softmax(p/T)."""

    def test_accept_rule_marginal_is_target_dist(self):
        # Monte Carlo over the pure accept rule (no model): propose from q,
        # accept/resample per _spec_accept; the emitted marginal must match
        # softmax(p/T) to sampling noise.
        from quantized_training_tpu.serving.speculative import _spec_accept
        V, n, T = 8, 200_000, 0.7
        rng = np.random.default_rng(0)
        p_logits = jnp.asarray(rng.standard_normal((1, V)) * 2, jnp.float32)
        q_logits = jnp.asarray(rng.standard_normal((1, V)) * 2, jnp.float32)

        key = jax.random.PRNGKey(1)
        kx, ka = jax.random.split(key)
        x = jax.random.categorical(
            kx, jnp.broadcast_to(q_logits / T, (n, V)), axis=-1
        ).astype(jnp.int32)                                     # (n,)
        keys = jax.random.split(ka, n)
        acc, repl = jax.vmap(
            lambda xi, ki: _spec_accept(p_logits, q_logits, xi[None], ki, T)
        )(x, keys)
        emitted = np.where(np.asarray(acc[:, 0]), np.asarray(x),
                           np.asarray(repl[:, 0]))
        emp = np.bincount(emitted, minlength=V) / n
        want = np.asarray(jax.nn.softmax(p_logits[0] / T))
        tv = 0.5 * np.abs(emp - want).sum()
        assert tv < 0.01, (tv, emp, want)

    def test_draft_equals_target_accepts_everything(self, target):
        model, variables = target
        ids = _prompt(6)
        out, stats = speculative_generate(
            model, variables, model, variables, ids, 15, k=4,
            temperature=0.8, rng=jax.random.PRNGKey(3), return_stats=True)
        assert stats["accept_rate"] == 1.0
        assert out.shape == (1, ids.shape[1] + 15)

    def test_sampled_runs_and_varies_with_rng(self, target, draft):
        t_model, t_vars = target
        d_model, d_vars = draft
        ids = _prompt(8)
        outs = [
            np.asarray(speculative_generate(
                t_model, t_vars, d_model, d_vars, ids, 12, k=3,
                temperature=1.0, rng=jax.random.PRNGKey(s)))
            for s in range(3)
        ]
        assert any(not np.array_equal(outs[0], o) for o in outs[1:])
        for o in outs:
            assert o.shape == (1, ids.shape[1] + 12)
            assert (o >= 0).all() and (o < 256).all()


class TestKiviSpeculative:
    """Speculative decoding over the KIVI quantized cache: verify blocks
    append to the fp residual and rejections rewind res_len."""

    def _kivi_model(self, layers=3):
        from quantized_training_tpu.serving.kv_cache import KVCacheConfig
        kcfg = KVCacheConfig.kivi(
            max_prefill=16, max_decode=32,
            k_spec="uint4,qs=group_wise_affine,bs=8,ax=-2",
            v_spec="uint4,qs=group_wise_affine,bs=8,ax=-1", pack=True)
        # use_fused_kivi=False: token-for-token equality needs generate()
        # and the verify block on the same (naive) compute path — the fused
        # kernel's float ordering differs by ulps, which greedy argmax can
        # amplify into different chains (both correct)
        cfg = LlamaConfig.tiny(num_hidden_layers=layers, kv_cache=kcfg,
                               use_fused_kivi=False)
        model = LlamaForCausalLM(cfg, None)
        v = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
        return model, v

    def test_greedy_equals_kivi_generate(self, draft):
        t_model, t_vars = self._kivi_model()
        d_model, d_vars = draft
        ids = _prompt(11, S=10)
        ref = generate(t_model, t_vars, ids, 12)
        for k in (2, 4):
            out, stats = speculative_generate(
                t_model, t_vars, d_model, d_vars, ids, 12, k=k,
                return_stats=True)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                          err_msg=f"k={k}")

    def test_perfect_kivi_draft_needs_fp_draft(self):
        # the draft must be fp: a KIVI draft is rejected loudly
        t_model, t_vars = self._kivi_model()
        with pytest.raises(AssertionError):
            speculative_generate(t_model, t_vars, t_model, t_vars,
                                 _prompt(1, S=8), 4)

    def test_residual_capacity_bound(self, draft):
        t_model, t_vars = self._kivi_model()
        d_model, d_vars = draft
        with pytest.raises(AssertionError):
            # max_new + k > max_decode (32)
            speculative_generate(t_model, t_vars, d_model, d_vars,
                                 _prompt(1, S=8), 30, k=4)

    def test_sampled_kivi_runs(self, draft):
        t_model, t_vars = self._kivi_model()
        d_model, d_vars = draft
        out = speculative_generate(
            t_model, t_vars, d_model, d_vars, _prompt(2, S=9), 10, k=3,
            temperature=0.9, rng=jax.random.PRNGKey(1))
        a = np.asarray(out)
        assert a.shape == (1, 19) and ((a >= 0) & (a < 256)).all()
