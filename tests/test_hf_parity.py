"""Model-implementation parity vs HuggingFace transformers (torch, CPU).

Random-initialized HF models are built from configs (no downloads), their
state dicts converted with models/hf_loader.py, and outputs compared — this
pins our flax implementations to the reference model family semantics
(the reference framework runs on exactly these HF models)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.models.bert import (
    BertConfig, BertForQuestionAnswering, BertForSequenceClassification,
)
from quantized_training_tpu.models.mobilebert import (
    MobileBertConfig, MobileBertForQuestionAnswering,
)
from quantized_training_tpu.models.hf_loader import (
    convert_bert, convert_llama, convert_mobilebert,
)


def assert_close(ours, theirs, rtol=2e-2, atol=2e-2, label=""):
    a = np.asarray(ours, dtype=np.float32)
    b = theirs.detach().float().numpy()
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=label)


class TestLlamaParity:
    def test_forward_matches_hf(self):
        hf_cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()

        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            dtype="float32",
        )
        params = convert_llama(hf.state_dict(), cfg.num_hidden_layers)
        model = LlamaForCausalLM(cfg, None)

        ids = np.random.default_rng(0).integers(0, 128, (2, 10))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits
        ours = model.apply({"params": params}, jnp.asarray(ids))
        assert_close(ours, ref, label="llama logits")


class TestBertParity:
    def test_qa_matches_hf(self):
        hf_cfg = transformers.BertConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, hidden_act="gelu",
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = transformers.BertForQuestionAnswering(hf_cfg).eval()

        cfg = BertConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, dtype="float32",
        )
        params = convert_bert(hf.state_dict(), cfg.num_hidden_layers)
        model = BertForQuestionAnswering(cfg, None)

        rng = np.random.default_rng(1)
        ids = rng.integers(0, 128, (2, 12))
        mask = np.ones((2, 12), np.int32)
        mask[1, 8:] = 0
        with torch.no_grad():
            ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        start, end = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        assert_close(start, ref.start_logits, label="start")
        assert_close(end, ref.end_logits, label="end")

    def test_classifier_matches_hf(self):
        hf_cfg = transformers.BertConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, num_labels=3,
            attn_implementation="eager",
        )
        torch.manual_seed(1)
        hf = transformers.BertForSequenceClassification(hf_cfg).eval()
        cfg = BertConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, num_labels=3, dtype="float32",
        )
        params = convert_bert(hf.state_dict(), cfg.num_hidden_layers)
        model = BertForSequenceClassification(cfg, None)
        ids = np.random.default_rng(2).integers(0, 128, (2, 12))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits
        ours = model.apply({"params": params}, jnp.asarray(ids))
        assert_close(ours, ref, label="cls logits")


class TestMobileBertParity:
    def test_qa_matches_hf(self):
        hf_cfg = transformers.MobileBertConfig(
            vocab_size=128, hidden_size=64, embedding_size=16,
            intra_bottleneck_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            num_feedforward_networks=2, max_position_embeddings=64,
            normalization_type="no_norm", hidden_act="relu",
            trigram_input=True, use_bottleneck=True,
            key_query_shared_bottleneck=True,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = transformers.MobileBertForQuestionAnswering(hf_cfg).eval()

        cfg = MobileBertConfig.test_tiny(dtype="float32", vocab_size=128)
        params = convert_mobilebert(
            hf.state_dict(), cfg.num_hidden_layers,
            cfg.num_feedforward_networks)
        model = MobileBertForQuestionAnswering(cfg, None)

        rng = np.random.default_rng(3)
        ids = rng.integers(0, 128, (2, 12))
        mask = np.ones((2, 12), np.int32)
        mask[0, 10:] = 0
        with torch.no_grad():
            ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        start, end = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        assert_close(start, ref.start_logits, label="start")
        assert_close(end, ref.end_logits, label="end")


class TestGPT2Parity:
    def test_lm_matches_hf(self):
        from quantized_training_tpu.models.gpt2 import (
            GPT2Config, GPT2LMHeadModel, convert_gpt2,
        )
        hf_cfg = transformers.GPT2Config(
            vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
        cfg = GPT2Config.tiny(vocab_size=128, dtype="float32")
        params = convert_gpt2(hf.state_dict(), cfg.n_layer)
        model = GPT2LMHeadModel(cfg, None)
        ids = np.random.default_rng(4).integers(0, 128, (2, 10))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits
        ours = model.apply({"params": params}, jnp.asarray(ids))
        assert_close(ours, ref, label="gpt2 logits")


class TestDistilBertParity:
    def test_qa_matches_hf(self):
        from quantized_training_tpu.models.hf_loader import convert_distilbert
        hf_cfg = transformers.DistilBertConfig(
            vocab_size=128, dim=64, n_layers=2, n_heads=4, hidden_dim=128,
            max_position_embeddings=64, attn_implementation="eager",
        )
        torch.manual_seed(2)
        hf = transformers.DistilBertForQuestionAnswering(hf_cfg).eval()
        cfg = BertConfig(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, type_vocab_size=0, dtype="float32",
        )
        params = convert_distilbert(hf.state_dict(), cfg.num_hidden_layers)
        model = BertForQuestionAnswering(cfg, None)
        rng = np.random.default_rng(5)
        ids = rng.integers(0, 128, (2, 12))
        mask = np.ones((2, 12), np.int32); mask[1, 9:] = 0
        with torch.no_grad():
            ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        start, end = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask))
        assert_close(start, ref.start_logits, label="start")
        assert_close(end, ref.end_logits, label="end")


class TestWhisperParity:
    def test_seq2seq_matches_hf(self):
        from quantized_training_tpu.models.whisper import (
            WhisperConfig, WhisperForConditionalGeneration, convert_whisper,
        )
        hf_cfg = transformers.WhisperConfig(
            vocab_size=256, num_mel_bins=16, d_model=32,
            encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_source_positions=50, max_target_positions=32,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1, suppress_tokens=[],
            begin_suppress_tokens=[],
            attn_implementation="eager",
        )
        torch.manual_seed(3)
        hf = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
        cfg = WhisperConfig.tiny(dtype="float32")
        params = convert_whisper(hf.state_dict(), cfg)
        model = WhisperForConditionalGeneration(cfg, None)

        rng = np.random.default_rng(6)
        feats = rng.standard_normal((1, 16, 100)).astype(np.float32)
        dec_ids = rng.integers(0, 256, (1, 8))
        with torch.no_grad():
            ref = hf(input_features=torch.tensor(feats),
                     decoder_input_ids=torch.tensor(dec_ids)).logits
        ours = model.apply({"params": params}, jnp.asarray(feats),
                           jnp.asarray(dec_ids))
        assert_close(ours, ref, label="whisper logits")


class TestMambaParity:
    def test_lm_matches_hf(self):
        from quantized_training_tpu.models.mamba import (
            MambaConfig, MambaForCausalLM, convert_mamba,
        )
        hf_cfg = transformers.MambaConfig(
            vocab_size=128, hidden_size=32, state_size=8,
            num_hidden_layers=2, intermediate_size=64,
            conv_kernel=4, time_step_rank=4,
        )
        torch.manual_seed(5)
        hf = transformers.MambaForCausalLM(hf_cfg).eval()
        cfg = MambaConfig.tiny()
        params = convert_mamba(hf.state_dict(), cfg.num_hidden_layers)
        model = MambaForCausalLM(cfg, None)
        ids = np.random.default_rng(17).integers(0, 128, (2, 12))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits
        ours = model.apply({"params": params}, jnp.asarray(ids))
        assert_close(ours, ref, rtol=3e-2, atol=3e-2, label="mamba logits")


class TestPhi3Parity:
    def test_phi3_via_llama_module(self):
        """Phi-3 loads into our LLaMA module by splitting the fused
        projections (the reference needed a rotary export patch instead)."""
        from quantized_training_tpu.models.hf_loader import convert_phi3
        hf_cfg = transformers.Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            attn_implementation="eager",
        )
        torch.manual_seed(6)
        hf = transformers.Phi3ForCausalLM(hf_cfg).eval()
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            dtype="float32",
        )
        params = convert_phi3(hf.state_dict(), 2, 4, 2, 16)
        model = LlamaForCausalLM(cfg, None)
        ids = np.random.default_rng(19).integers(0, 128, (2, 10))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits
        ours = model.apply({"params": params}, jnp.asarray(ids))
        assert_close(ours, ref, label="phi3 logits")
