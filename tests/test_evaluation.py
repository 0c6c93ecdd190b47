"""Evaluation-protocol tests: sliding-window ppl consistency, SQuAD metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.utils.evaluation import (
    sliding_window_perplexity, squad_em_f1, postprocess_qa_predictions,
)


class TestPerplexity:
    def test_matches_full_context(self):
        """When max_length covers the whole stream, sliding-window ppl equals
        direct full-context next-token ppl."""
        cfg = LlamaConfig.tiny(max_position_embeddings=64)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, 256, 48)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens[None]))
        fwd = lambda ids: model.apply(vars_, ids)

        ppl = sliding_window_perplexity(fwd, tokens, max_length=48, stride=48)

        logits = np.asarray(fwd(jnp.asarray(tokens[None])), np.float32)[0]
        logp = jax.nn.log_softmax(jnp.asarray(logits[:-1]), axis=-1)
        nll = -np.asarray(jnp.take_along_axis(
            logp, jnp.asarray(tokens[1:][:, None]), axis=-1)).squeeze(-1)
        expected = float(np.exp(nll.mean()))
        assert ppl == pytest.approx(expected, rel=1e-3)

    def test_overlap_windows_finite(self):
        cfg = LlamaConfig.tiny(max_position_embeddings=32)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(1)
        tokens = rng.integers(0, 256, 100)
        vars_ = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(tokens[None, :32]))
        fwd = jax.jit(lambda ids: model.apply(vars_, ids))
        ppl = sliding_window_perplexity(fwd, tokens, max_length=32, stride=16)
        assert np.isfinite(ppl) and ppl > 1.0

    def test_stride_insensitivity(self):
        """Different strides give similar (not wildly different) ppl."""
        cfg = LlamaConfig.tiny(max_position_embeddings=32)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(2)
        tokens = rng.integers(0, 256, 96)
        vars_ = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(tokens[None, :32]))
        fwd = jax.jit(lambda ids: model.apply(vars_, ids))
        p1 = sliding_window_perplexity(fwd, tokens, max_length=32, stride=16)
        p2 = sliding_window_perplexity(fwd, tokens, max_length=32, stride=32)
        assert abs(np.log(p1) - np.log(p2)) < 0.25


class TestSquadMetrics:
    def test_exact_match(self):
        preds = {"q1": "the cat", "q2": "dogs"}
        refs = {"q1": ["The cat."], "q2": ["a dog"]}
        m = squad_em_f1(preds, refs)
        assert m["exact_match"] == 50.0
        # "dogs" vs "dog" share no normalized token -> f1 only from q1
        assert m["f1"] == 50.0

    def test_f1_partial_overlap(self):
        m = squad_em_f1({"q": "new york city"}, {"q": ["new york"]})
        assert m["exact_match"] == 0.0
        assert m["f1"] == pytest.approx(80.0)

    def test_postprocess_picks_best_span(self):
        examples = [{"id": "q", "context": "Paris is the capital of France."}]
        # tokens: [CLS] paris is the capital
        offsets = [None, (0, 5), (6, 8), (9, 12), (13, 20)]
        features = [{"example_id": "q", "offset_mapping": offsets}]
        start = np.array([[0.0, 5.0, 0.0, 0.0, 1.0]])
        end = np.array([[0.0, 4.0, 0.0, 0.0, 2.0]])
        preds = postprocess_qa_predictions(examples, features, start, end)
        assert preds["q"] == "Paris"
