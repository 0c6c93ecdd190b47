"""BERT / RoBERTa / DistilBERT family in flax with quantization sites.

Covers the reference's eager-QAT targets (reference:
modules/quantizable/modeling_bert.py, modeling_distilbert.py and the module
swap table at quantization_mappings.py:27-43): self-attention with
MatmulFunctional-style qk/av quant points, attention scaling (scaling
category), softmax (activation), residual adds wrapped in quant sites, and
LayerNorm inputs (layernorm category).  Heads: question answering (SQuAD),
sequence classification (GLUE), masked LM.

HF checkpoint compatible via models/hf_loader.py (parameter names mirror the
HF module tree).
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QDense, QLayerNorm, QSoftmax, QuantMixin

__all__ = [
    "BertConfig",
    "BertModel",
    "BertForQuestionAnswering",
    "BertForSequenceClassification",
    "BertForMaskedLM",
]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    position_offset: int = 0  # RoBERTa uses 2
    hidden_act: str = "gelu"
    dtype: str = "bfloat16"
    num_labels: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "BertConfig":
        d = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=128,
                 max_position_embeddings=64, type_vocab_size=2)
        d.update(kw)
        return BertConfig(**d)

    @staticmethod
    def bert_base() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def bert_large() -> "BertConfig":
        return BertConfig(hidden_size=1024, num_hidden_layers=24,
                          num_attention_heads=16, intermediate_size=4096)


class BertSelfAttention(nn.Module, QuantMixin):
    config: BertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S, _ = hidden.shape
        H, D = cfg.num_attention_heads, cfg.head_dim

        dense = lambda name: QDense(H * D, dtype=dtype, qconfig=self.qconfig,
                                    name=name)
        q = dense("query")(hidden).reshape(B, S, H, D)
        k = dense("key")(hidden).reshape(B, S, H, D)
        v = dense("value")(hidden).reshape(B, S, H, D)

        qq = self.quant_input(q, "matmul", OpCategory.GEMM, 0)
        kk = self.quant_input(k, "matmul", OpCategory.GEMM, 1)
        scores = jnp.einsum("bshd,bthd->bhst", qq, kk,
                            preferred_element_type=jnp.float32)
        scale = jnp.asarray(1.0 / jnp.sqrt(D), dtype)
        scores = self.quant_mul(scores.astype(dtype), scale).astype(jnp.float32)

        if attention_mask is not None:
            scores = scores + attention_mask.astype(jnp.float32)

        probs = QSoftmax(dtype=dtype, qconfig=self.qconfig, name="softmax")(
            scores.astype(dtype))

        pp = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                              hook="av_pre_process")
        vv = self.quant_input(v, "matmul", OpCategory.GEMM, 1,
                              hook="av_pre_process")
        ctx = jnp.einsum("bhst,bthd->bshd", pp, vv,
                         preferred_element_type=jnp.float32).astype(dtype)
        return ctx.reshape(B, S, H * D)


class BertLayer(nn.Module, QuantMixin):
    config: BertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        attn_out = BertSelfAttention(cfg, self.qconfig, name="attention_self")(
            hidden, attention_mask)
        attn_out = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                          name="attention_output_dense")(attn_out)
        hidden = self.quant_residual(attn_out, hidden, hook="attn_residual")
        hidden = QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                            qconfig=self.qconfig,
                            name="attention_output_layernorm")(hidden)

        inter = QDense(cfg.intermediate_size, dtype=dtype,
                       qconfig=self.qconfig, name="intermediate_dense")(hidden)
        inter = self.quant_activation_input(inter, "gelu")
        inter = nn.gelu(inter.astype(jnp.float32), approximate=False).astype(dtype)
        out = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                     name="output_dense")(inter)
        hidden = self.quant_residual(out, hidden, hook="ffn_residual")
        hidden = QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                            qconfig=self.qconfig,
                            name="output_layernorm")(hidden)
        return hidden


class BertEmbeddings(nn.Module, QuantMixin):
    config: BertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(S)[None, :] + cfg.position_offset
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                        param_dtype=jnp.float32, name="word_embeddings")
        pos = nn.Embed(cfg.max_position_embeddings + cfg.position_offset,
                       cfg.hidden_size, dtype=dtype,
                       param_dtype=jnp.float32, name="position_embeddings")
        emb = word(input_ids) + pos(position_ids)
        if cfg.type_vocab_size > 0:
            tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=dtype,
                           param_dtype=jnp.float32,
                           name="token_type_embeddings")
            emb = emb + tok(token_type_ids)
        return QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                          qconfig=self.qconfig, name="layernorm")(emb)


def extended_attention_mask(attention_mask, dtype=jnp.float32):
    """(B, S) 1/0 mask -> additive (B, 1, 1, S); bf16-safe fill value."""
    mask_value = float(jnp.finfo(jnp.bfloat16).min)
    add = (1.0 - attention_mask.astype(jnp.float32)) * mask_value
    return add[:, None, None, :].astype(dtype)


class BertModel(nn.Module, QuantMixin):
    config: BertConfig
    qconfig: Optional[QuantConfig] = None
    add_pooler: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None):
        cfg = self.config
        if attention_mask is not None:
            mask = extended_attention_mask(attention_mask)
        else:
            mask = None

        hidden = BertEmbeddings(cfg, self.qconfig, name="embeddings")(
            input_ids, token_type_ids, position_ids)
        for i in range(cfg.num_hidden_layers):
            hidden = BertLayer(cfg, self.qconfig, name=f"layer_{i}")(
                hidden, mask)

        pooled = None
        if self.add_pooler:
            first = hidden[:, 0]
            pooled = QDense(cfg.hidden_size, dtype=jnp.dtype(cfg.dtype),
                            qconfig=self.qconfig, name="pooler_dense")(first)
            pooled = jnp.tanh(pooled.astype(jnp.float32)).astype(hidden.dtype)
        return hidden, pooled


class BertForQuestionAnswering(nn.Module, QuantMixin):
    """SQuAD head: start/end logits (the reference's headline benchmark)."""

    config: BertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        hidden, _ = BertModel(self.config, self.qconfig, name="bert")(
            input_ids, attention_mask, token_type_ids)
        logits = QDense(2, dtype=jnp.dtype(self.config.dtype),
                        qconfig=self.qconfig, name="qa_outputs")(hidden)
        start, end = jnp.split(logits.astype(jnp.float32), 2, axis=-1)
        return start.squeeze(-1), end.squeeze(-1)


class BertForSequenceClassification(nn.Module, QuantMixin):
    """GLUE head."""

    config: BertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        _, pooled = BertModel(self.config, self.qconfig, add_pooler=True,
                              name="bert")(
            input_ids, attention_mask, token_type_ids)
        return QDense(self.config.num_labels,
                      dtype=jnp.dtype(self.config.dtype),
                      qconfig=self.qconfig, name="classifier")(
            pooled).astype(jnp.float32)


class BertForMaskedLM(nn.Module, QuantMixin):
    config: BertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        hidden, _ = BertModel(cfg, self.qconfig, name="bert")(
            input_ids, attention_mask, token_type_ids)
        x = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                   name="transform_dense")(hidden)
        x = nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)
        x = QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                       qconfig=self.qconfig, name="transform_layernorm")(x)
        return QDense(cfg.vocab_size, dtype=dtype, qconfig=self.qconfig,
                      name="decoder")(x).astype(jnp.float32)
