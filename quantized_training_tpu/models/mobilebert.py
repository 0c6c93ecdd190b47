"""MobileBERT in flax with quantization sites — the reference's primary
edge-deployment model (reference: modules/quantizable/modeling_mobilebert.py
and the full fork at modules/modeling_mobilebert.py; mobilebert_tiny config
at models/mobilebert_tiny/config.json).

Architecture notes (HF-compatible):
  * trigram input: embeddings of size E are concatenated with their +-1
    shifted neighbours (3E) and projected to hidden H;
  * bottleneck: each layer projects H -> intra (B) for attention/FFN and
    back; with key_query_shared_bottleneck, Q/K come from a second shared
    bottleneck while V uses the raw layer input;
  * NoNorm (elementwise scale+shift) instead of LayerNorm — a layernorm-
    category quant site like the reference's NoNorm entry
    (quantization_mappings.py:61-65);
  * stacked FFNs (num_feedforward_networks) between attention and output.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import NoNorm, QDense, QLayerNorm, QSoftmax, QuantMixin
from .bert import extended_attention_mask

__all__ = [
    "MobileBertConfig",
    "MobileBertModel",
    "MobileBertForQuestionAnswering",
    "MobileBertForSequenceClassification",
]


@dataclass(frozen=True)
class MobileBertConfig:
    vocab_size: int = 30522
    hidden_size: int = 512
    embedding_size: int = 128
    intra_bottleneck_size: int = 128
    num_hidden_layers: int = 24
    num_attention_heads: int = 4
    intermediate_size: int = 512
    num_feedforward_networks: int = 2
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    trigram_input: bool = True
    use_bottleneck: bool = True
    key_query_shared_bottleneck: bool = True
    normalization_type: str = "no_norm"
    hidden_act: str = "relu"
    dtype: str = "bfloat16"
    num_labels: int = 2

    @property
    def true_hidden_size(self) -> int:
        return self.intra_bottleneck_size if self.use_bottleneck else self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.true_hidden_size // self.num_attention_heads

    @staticmethod
    def tiny() -> "MobileBertConfig":
        """The reference's mobilebert_tiny (models/mobilebert_tiny/config.json):
        24 layers, hidden 512, bottleneck 128, 2 FFNs, relu, NoNorm."""
        return MobileBertConfig()

    @staticmethod
    def mobilebert() -> "MobileBertConfig":
        """google/mobilebert-uncased: 4 FFNs, intermediate 512."""
        return MobileBertConfig(num_feedforward_networks=4)

    @staticmethod
    def test_tiny(**kw) -> "MobileBertConfig":
        d = dict(vocab_size=256, hidden_size=64, embedding_size=16,
                 intra_bottleneck_size=32, num_hidden_layers=2,
                 num_attention_heads=2, intermediate_size=64,
                 num_feedforward_networks=2, max_position_embeddings=64)
        d.update(kw)
        return MobileBertConfig(**d)


def _norm(cfg: MobileBertConfig, qconfig, name):
    if cfg.normalization_type == "no_norm":
        return NoNorm(dtype=jnp.dtype(cfg.dtype), qconfig=qconfig, name=name)
    return QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.dtype(cfg.dtype),
                      qconfig=qconfig, name=name)


def _act(cfg: MobileBertConfig, x):
    xf = x.astype(jnp.float32)
    if cfg.hidden_act == "relu":
        out = jax.nn.relu(xf)
    else:
        out = jax.nn.gelu(xf, approximate=False)
    return out.astype(jnp.dtype(cfg.dtype))


class MobileBertSelfAttention(nn.Module, QuantMixin):
    config: MobileBertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, q_in, k_in, v_in, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S, _ = q_in.shape
        H, D = cfg.num_attention_heads, cfg.head_dim

        q = QDense(H * D, dtype=dtype, qconfig=self.qconfig, name="query")(
            q_in).reshape(B, S, H, D)
        k = QDense(H * D, dtype=dtype, qconfig=self.qconfig, name="key")(
            k_in).reshape(B, S, H, D)
        v = QDense(H * D, dtype=dtype, qconfig=self.qconfig, name="value")(
            v_in).reshape(B, S, H, D)

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


class MobileBertLayer(nn.Module, QuantMixin):
    config: MobileBertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        if cfg.use_bottleneck:
            # input bottleneck: H -> B
            bn_in = QDense(cfg.intra_bottleneck_size, dtype=dtype,
                           qconfig=self.qconfig, name="bottleneck_input_dense")(
                hidden)
            bn_in = _norm(cfg, self.qconfig, "bottleneck_input_norm")(bn_in)
            if cfg.key_query_shared_bottleneck:
                shared = QDense(cfg.intra_bottleneck_size, dtype=dtype,
                                qconfig=self.qconfig,
                                name="bottleneck_attention_dense")(hidden)
                shared = _norm(cfg, self.qconfig,
                               "bottleneck_attention_norm")(shared)
                q_in, k_in, v_in = shared, shared, hidden
            else:
                q_in = k_in = v_in = bn_in
            layer_input = bn_in
        else:
            q_in = k_in = v_in = hidden
            layer_input = hidden

        attn = MobileBertSelfAttention(cfg, self.qconfig,
                                       name="attention_self")(
            q_in, k_in, v_in, attention_mask)
        attn = QDense(cfg.true_hidden_size, dtype=dtype, qconfig=self.qconfig,
                      name="attention_output_dense")(attn)
        attn = self.quant_residual(attn, layer_input, hook="attn_residual")
        hidden_b = _norm(cfg, self.qconfig, "attention_output_norm")(attn)

        # stacked FFNs at bottleneck width
        for i in range(cfg.num_feedforward_networks - 1):
            inter = QDense(cfg.intermediate_size, dtype=dtype,
                           qconfig=self.qconfig, name=f"ffn_{i}_intermediate")(
                hidden_b)
            inter = self.quant_input(inter, cfg.hidden_act,
                                     OpCategory.ACTIVATION, 0,
                                     hook=f"ffn_{i}_act")
            inter = _act(cfg, inter)
            out = QDense(cfg.true_hidden_size, dtype=dtype,
                         qconfig=self.qconfig, name=f"ffn_{i}_output")(inter)
            out = self.quant_residual(out, hidden_b, hook=f"ffn_{i}_residual")
            hidden_b = _norm(cfg, self.qconfig, f"ffn_{i}_norm")(out)

        # final FFN + output bottleneck back to H
        inter = QDense(cfg.intermediate_size, dtype=dtype,
                       qconfig=self.qconfig, name="intermediate_dense")(
            hidden_b)
        inter = self.quant_input(inter, cfg.hidden_act,
                                 OpCategory.ACTIVATION, 0, hook="inter_act")
        inter = _act(cfg, inter)
        out_b = QDense(cfg.true_hidden_size, dtype=dtype, qconfig=self.qconfig,
                       name="output_dense")(inter)
        out_b = self.quant_residual(out_b, hidden_b, hook="out_residual")
        out_b = _norm(cfg, self.qconfig, "output_norm")(out_b)

        if cfg.use_bottleneck:
            out = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                         name="output_bottleneck_dense")(out_b)
            out = self.quant_residual(out, hidden, hook="bottleneck_residual")
            out = _norm(cfg, self.qconfig, "output_bottleneck_norm")(out)
        else:
            out = out_b
        return out


class MobileBertEmbeddings(nn.Module, QuantMixin):
    config: MobileBertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(S)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(cfg.vocab_size, cfg.embedding_size, dtype=dtype,
                        param_dtype=jnp.float32, name="word_embeddings")(
            input_ids)
        if cfg.trigram_input:
            # [x_{t-1}; x_t; x_{t+1}] with zero padding at the borders
            prev = jnp.pad(word[:, 1:], ((0, 0), (0, 1), (0, 0)))
            nxt = jnp.pad(word[:, :-1], ((0, 0), (1, 0), (0, 0)))
            word = jnp.concatenate([prev, word, nxt], axis=-1)
        if cfg.trigram_input or cfg.embedding_size != cfg.hidden_size:
            word = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                          name="embedding_transformation")(word)

        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=dtype, param_dtype=jnp.float32,
                       name="position_embeddings")(position_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=dtype,
                       param_dtype=jnp.float32,
                       name="token_type_embeddings")(token_type_ids)
        emb = word + pos + tok
        return _norm(cfg, self.qconfig, "norm")(emb)


class MobileBertModel(nn.Module, QuantMixin):
    config: MobileBertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.config
        mask = (extended_attention_mask(attention_mask)
                if attention_mask is not None else None)
        hidden = MobileBertEmbeddings(cfg, self.qconfig, name="embeddings")(
            input_ids, token_type_ids)
        for i in range(cfg.num_hidden_layers):
            hidden = MobileBertLayer(cfg, self.qconfig, name=f"layer_{i}")(
                hidden, mask)
        return hidden


class MobileBertForQuestionAnswering(nn.Module, QuantMixin):
    config: MobileBertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        hidden = MobileBertModel(self.config, self.qconfig, name="mobilebert")(
            input_ids, attention_mask, token_type_ids)
        logits = QDense(2, dtype=jnp.dtype(self.config.dtype),
                        qconfig=self.qconfig, name="qa_outputs")(hidden)
        start, end = jnp.split(logits.astype(jnp.float32), 2, axis=-1)
        return start.squeeze(-1), end.squeeze(-1)


class MobileBertForSequenceClassification(nn.Module, QuantMixin):
    config: MobileBertConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        hidden = MobileBertModel(self.config, self.qconfig, name="mobilebert")(
            input_ids, attention_mask, token_type_ids)
        first = hidden[:, 0]
        return QDense(self.config.num_labels,
                      dtype=jnp.dtype(self.config.dtype),
                      qconfig=self.qconfig, name="classifier")(
            first).astype(jnp.float32)
