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

    def test_rejects_kivi_cache(self, target):
        from quantized_training_tpu.serving.kv_cache import KVCacheConfig
        model, variables = target
        kcfg = KVCacheConfig(max_prefill=16, max_decode=16)
        cfg = LlamaConfig.tiny(kv_cache=kcfg)
        qmodel = LlamaForCausalLM(cfg, None)
        with pytest.raises(AssertionError):
            speculative_generate(qmodel, variables, model, variables,
                                 _prompt(), 4)
