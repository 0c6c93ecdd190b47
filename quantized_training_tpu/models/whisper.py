"""Whisper (speech-to-text encoder-decoder) in flax with quantization sites
(reference: quantizable WhisperEncoderLayer/WhisperDecoderLayer at
modules/quantizable/modeling_whisper.py, swap table quantization_mappings.py:41-42,
driver examples/speech_recognition/run_speech_recognition_seq2seq.py).

Encoder: two 1-D convs over mel features (GELU) + sinusoidal-free learned
positions + pre-LN transformer.  Decoder: causal self-attention +
cross-attention over encoder states.  HF-compatible parameter layout via
``convert_whisper``.
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QDense, QLayerNorm, QSoftmax, QuantMixin
from .llama import causal_mask

__all__ = ["WhisperConfig", "WhisperForConditionalGeneration",
           "convert_whisper"]


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    @staticmethod
    def tiny(**kw) -> "WhisperConfig":
        d = dict(vocab_size=256, num_mel_bins=16, d_model=32,
                 encoder_layers=2, decoder_layers=2,
                 encoder_attention_heads=2, decoder_attention_heads=2,
                 encoder_ffn_dim=64, decoder_ffn_dim=64,
                 max_source_positions=50, max_target_positions=32)
        d.update(kw)
        return WhisperConfig(**d)


class WhisperAttention(nn.Module, QuantMixin):
    config: WhisperConfig
    num_heads: int
    causal: bool = False
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, kv_source=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S, E = hidden.shape
        H = self.num_heads
        D = E // H
        kv = hidden if kv_source is None else kv_source
        T = kv.shape[1]

        q = QDense(E, dtype=dtype, qconfig=self.qconfig, name="q_proj")(
            hidden).reshape(B, S, H, D)
        k = QDense(E, use_bias=False, dtype=dtype, qconfig=self.qconfig,
                   name="k_proj")(kv).reshape(B, T, H, D)
        v = QDense(E, dtype=dtype, qconfig=self.qconfig, name="v_proj")(
            kv).reshape(B, T, H, D)

        qq = self.quant_input(q, "matmul", OpCategory.GEMM, 0)
        kk = self.quant_input(k, "matmul", OpCategory.GEMM, 1)
        scores = jnp.einsum("bshd,bthd->bhst", qq, kk,
                            preferred_element_type=jnp.float32)
        scale = jnp.asarray(1.0 / jnp.sqrt(D), dtype)
        scores = self.quant_mul(scores.astype(dtype), scale).astype(jnp.float32)
        if self.causal:
            scores = scores + causal_mask(B, S, T).astype(jnp.float32)
        probs = QSoftmax(dtype=dtype, qconfig=self.qconfig, name="softmax")(
            scores.astype(dtype))
        pp = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                              hook="av_pre_process")
        vv = self.quant_input(v, "matmul", OpCategory.GEMM, 1,
                              hook="av_pre_process")
        ctx = jnp.einsum("bhst,bthd->bshd", pp, vv,
                         preferred_element_type=jnp.float32).astype(dtype)
        ctx = ctx.reshape(B, S, E)
        return QDense(E, dtype=dtype, qconfig=self.qconfig, name="out_proj")(ctx)


class WhisperEncoderLayer(nn.Module, QuantMixin):
    config: WhisperConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        normed = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                            name="self_attn_layer_norm")(hidden)
        attn = WhisperAttention(cfg, cfg.encoder_attention_heads,
                                qconfig=self.qconfig, name="self_attn")(normed)
        hidden = self.quant_residual(hidden, attn, hook="attn_residual")
        normed = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                            name="final_layer_norm")(hidden)
        x = QDense(cfg.encoder_ffn_dim, dtype=dtype, qconfig=self.qconfig,
                   name="fc1")(normed)
        x = self.quant_activation_input(x, "gelu")
        x = nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)
        x = QDense(cfg.d_model, dtype=dtype, qconfig=self.qconfig,
                   name="fc2")(x)
        return self.quant_residual(hidden, x, hook="ffn_residual")


class WhisperDecoderLayer(nn.Module, QuantMixin):
    config: WhisperConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, encoder_hidden):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        normed = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                            name="self_attn_layer_norm")(hidden)
        attn = WhisperAttention(cfg, cfg.decoder_attention_heads, causal=True,
                                qconfig=self.qconfig, name="self_attn")(normed)
        hidden = self.quant_residual(hidden, attn, hook="self_attn_residual")

        normed = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                            name="encoder_attn_layer_norm")(hidden)
        attn = WhisperAttention(cfg, cfg.decoder_attention_heads,
                                qconfig=self.qconfig, name="encoder_attn")(
            normed, encoder_hidden)
        hidden = self.quant_residual(hidden, attn, hook="cross_attn_residual")

        normed = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                            name="final_layer_norm")(hidden)
        x = QDense(cfg.decoder_ffn_dim, dtype=dtype, qconfig=self.qconfig,
                   name="fc1")(normed)
        x = self.quant_activation_input(x, "gelu")
        x = nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)
        x = QDense(cfg.d_model, dtype=dtype, qconfig=self.qconfig,
                   name="fc2")(x)
        return self.quant_residual(hidden, x, hook="ffn_residual")


class WhisperForConditionalGeneration(nn.Module, QuantMixin):
    config: WhisperConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_features, decoder_input_ids):
        """input_features: (B, num_mel_bins, T) like HF; decoder ids (B, S)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B = input_features.shape[0]

        # Encoder: conv1d(k=3, same) + GELU, conv1d(k=3, stride 2) + GELU.
        x = input_features.transpose(0, 2, 1).astype(dtype)  # (B, T, mel)
        x = nn.Conv(cfg.d_model, (3,), padding=1, dtype=dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)
        x = nn.Conv(cfg.d_model, (3,), strides=(2,), padding=1, dtype=dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = nn.gelu(x.astype(jnp.float32), approximate=False).astype(dtype)

        enc_pos = self.param("encoder_positions",
                             nn.initializers.normal(0.02),
                             (cfg.max_source_positions, cfg.d_model),
                             jnp.float32)
        x = x + enc_pos[None, : x.shape[1]].astype(dtype)
        for i in range(cfg.encoder_layers):
            x = WhisperEncoderLayer(cfg, self.qconfig,
                                    name=f"encoder_layer_{i}")(x)
        enc = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                         name="encoder_layer_norm")(x)

        # Decoder.
        tok = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dtype,
                       param_dtype=jnp.float32, name="decoder_embed_tokens")
        dec_pos = self.param("decoder_positions",
                             nn.initializers.normal(0.02),
                             (cfg.max_target_positions, cfg.d_model),
                             jnp.float32)
        S = decoder_input_ids.shape[1]
        h = tok(decoder_input_ids) + dec_pos[None, :S].astype(dtype)
        for i in range(cfg.decoder_layers):
            h = WhisperDecoderLayer(cfg, self.qconfig,
                                    name=f"decoder_layer_{i}")(h, enc)
        h = QLayerNorm(epsilon=1e-5, dtype=dtype, qconfig=self.qconfig,
                       name="decoder_layer_norm")(h)
        # tied output head
        embed = self.variables["params"]["decoder_embed_tokens"]["embedding"]
        return (h @ embed.T.astype(h.dtype)).astype(jnp.float32)


def convert_whisper(state: Dict, cfg: WhisperConfig) -> Dict:
    """HF WhisperForConditionalGeneration state dict -> our params."""
    import numpy as np

    def np_(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float()
            return t.numpy()
        return np.asarray(t)

    p: Dict = {}

    def set_(path, value):
        node = p
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    def dense(ours, theirs):
        set_(f"{ours}/kernel", np_(state[f"{theirs}.weight"]).T)
        if f"{theirs}.bias" in state:
            set_(f"{ours}/bias", np_(state[f"{theirs}.bias"]))

    def norm(ours, theirs):
        set_(f"{ours}/scale", np_(state[f"{theirs}.weight"]))
        set_(f"{ours}/bias", np_(state[f"{theirs}.bias"]))

    enc, dec = "model.encoder", "model.decoder"
    # torch Conv1d weight (out, in, k) -> flax (k, in, out)
    set_("conv1/kernel", np_(state[f"{enc}.conv1.weight"]).transpose(2, 1, 0))
    set_("conv1/bias", np_(state[f"{enc}.conv1.bias"]))
    set_("conv2/kernel", np_(state[f"{enc}.conv2.weight"]).transpose(2, 1, 0))
    set_("conv2/bias", np_(state[f"{enc}.conv2.bias"]))
    set_("encoder_positions", np_(state[f"{enc}.embed_positions.weight"]))
    set_("decoder_positions", np_(state[f"{dec}.embed_positions.weight"]))
    set_("decoder_embed_tokens/embedding",
         np_(state[f"{dec}.embed_tokens.weight"]))
    norm("encoder_layer_norm", f"{enc}.layer_norm")
    norm("decoder_layer_norm", f"{dec}.layer_norm")

    for i in range(cfg.encoder_layers):
        hf = f"{enc}.layers.{i}"
        ours = f"encoder_layer_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(f"{ours}/self_attn/{proj}", f"{hf}.self_attn.{proj}")
        norm(f"{ours}/self_attn_layer_norm", f"{hf}.self_attn_layer_norm")
        norm(f"{ours}/final_layer_norm", f"{hf}.final_layer_norm")
        dense(f"{ours}/fc1", f"{hf}.fc1")
        dense(f"{ours}/fc2", f"{hf}.fc2")

    for i in range(cfg.decoder_layers):
        hf = f"{dec}.layers.{i}"
        ours = f"decoder_layer_{i}"
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                dense(f"{ours}/{attn}/{proj}", f"{hf}.{attn}.{proj}")
        norm(f"{ours}/self_attn_layer_norm", f"{hf}.self_attn_layer_norm")
        norm(f"{ours}/encoder_attn_layer_norm", f"{hf}.encoder_attn_layer_norm")
        norm(f"{ours}/final_layer_norm", f"{hf}.final_layer_norm")
        dense(f"{ours}/fc1", f"{hf}.fc1")
        dense(f"{ours}/fc2", f"{hf}.fc2")
    return p
