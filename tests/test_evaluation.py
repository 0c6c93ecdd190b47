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


class TestRecommend:
    """Format recommendation from exponent histograms (utils/recommend.py)."""

    def _hist(self, exps, counts):
        from quantized_training_tpu.utils.histogram import MIN_EXP, NUM_BINS
        h = np.zeros(NUM_BINS)
        for e, c in zip(exps, counts):
            h[e - MIN_EXP] = c
        return h

    def test_narrow_centered_prefers_posit(self):
        from quantized_training_tpu.utils.recommend import recommend_formats
        # activations-like: mass in [-6, 4] around 0 — e4m3 covers, posit
        # covers AND the center is in the taper sweet zone
        h = {"site": {"hist": self._hist(range(-6, 5), [100] * 11)}}
        r = recommend_formats(h)["site"]
        assert r["direct"] == "posit8_1", r
        assert "fp8_e4m3" in r["fits"]

    def test_wide_range_needs_e5m2_or_posit2(self):
        from quantized_training_tpu.utils.recommend import recommend_formats
        h = {"site": {"hist": self._hist(range(-15, 15), [10] * 30)}}
        r = recommend_formats(h)["site"]
        assert r["direct"] in ("fp8_e5m2", "posit8_2")
        assert "fp8_e4m3" not in r["fits"]

    def test_beyond_all_direct_formats(self):
        from quantized_training_tpu.utils.recommend import recommend_formats
        h = {"site": {"hist": self._hist(range(-40, 40), [1] * 80)}}
        r = recommend_formats(h)["site"]
        assert r["direct"] is None
        assert r["scaled_int8"] is None  # span 79 >> int8

    def test_outlier_tail_is_trimmed_by_coverage(self):
        from quantized_training_tpu.utils.recommend import recommend_formats
        # 99.99% of mass in [-4, 4]; 4 outlier values at exp 30
        exps = list(range(-4, 5)) + [30]
        counts = [10000] * 9 + [4]
        h = {"site": {"hist": self._hist(exps, counts)}}
        r = recommend_formats(h, coverage=0.999)["site"]
        assert r["window"][1] <= 8, r
        assert r["direct"] is not None

    def test_narrow_span_fits_scaled_int4(self):
        from quantized_training_tpu.utils.recommend import recommend_formats
        h = {"site": {"hist": self._hist([2, 3, 4], [50, 100, 50])}}
        r = recommend_formats(h)["site"]
        assert r["scaled_int8"] == "int4"

    def test_render_and_real_calibration_flow(self):
        # end-to-end: calibrate a quantized model with histograms on, then
        # recommend from the recorded collection
        from quantized_training_tpu.models import (
            LlamaConfig, LlamaForCausalLM,
        )
        from quantized_training_tpu.quantize import QConfig, QuantConfig
        from quantized_training_tpu.utils.recommend import (
            recommend_formats, render_recommendations,
        )
        qc = QuantConfig(
            global_qconfig=QConfig.from_strs(activation="posit8_1"),
            record_histogram=True)
        model = LlamaForCausalLM(LlamaConfig.tiny(), qc)
        ids = jnp.zeros((1, 8), jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        _, upd = model.apply(variables, ids,
                             mutable=["quant_histogram", "quant_state"])
        recs = recommend_formats(upd["quant_histogram"])
        assert recs, "no sites recorded"
        table = render_recommendations(recs)
        assert "direct" in table and len(table.splitlines()) > 2
