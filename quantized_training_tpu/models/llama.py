"""LLaMA-family causal LM in flax, with quantization woven at every site the
reference annotates.

Written fresh for TPU (not a port of the HF fork the reference patches):
bf16 activations, f32 RoPE/softmax/norm statistics, GQA via einsum-friendly
reshapes, static-shape KV cache in a linen ``cache`` collection.  Quant sites
mirror the reference's annotator coverage (reference:
quantizer/xnnpack_quantizer_utils.py:85-505 and the quantizable attention at
modules/quantizable/modeling_llama.py): q/k/v/o and MLP projections (gemm),
the qk and av matmuls (gemm, per-input), attention scaling (scaling), softmax
(activation), RMSNorm inputs (layernorm), both residual adds (residual).

The model also runs full-precision when ``qconfig is None`` — same params.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QDense, QRMSNorm, QSoftmax, QuantMixin

__all__ = ["LlamaConfig", "LlamaForCausalLM", "LlamaModel"]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Small config for tests / CPU smoke runs."""
        defaults = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def llama2_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llama2_13b() -> "LlamaConfig":
        return LlamaConfig(hidden_size=5120, intermediate_size=13824,
                           num_hidden_layers=40, num_attention_heads=40)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """RoPE tables in float32: (..., seq, head_dim/2)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (HF convention: split halves).  x: (B, S, H, D)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


class LlamaAttention(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: Optional[jax.Array],
        positions: jax.Array,
        use_cache: bool = False,
        cache_index: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S, _ = hidden.shape
        H, KV, D = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

        dense = lambda feat, name: QDense(
            feat, use_bias=False, dtype=dtype, qconfig=self.qconfig, name=name
        )
        q = dense(H * D, "q_proj")(hidden).reshape(B, S, H, D)
        k = dense(KV * D, "k_proj")(hidden).reshape(B, S, KV, D)
        v = dense(KV * D, "v_proj")(hidden).reshape(B, S, KV, D)

        cos, sin = rope_cos_sin(positions, D, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if use_cache:
            # Static-shape decode cache (max_position_embeddings slots).
            cache_k = self.variable(
                "cache", "cache_k",
                lambda: jnp.zeros((B, cfg.max_position_embeddings, KV, D), dtype))
            cache_v = self.variable(
                "cache", "cache_v",
                lambda: jnp.zeros((B, cfg.max_position_embeddings, KV, D), dtype))
            idx = cache_index if cache_index is not None else 0
            cache_k.value = jax.lax.dynamic_update_slice(
                cache_k.value, k, (0, idx, 0, 0))
            cache_v.value = jax.lax.dynamic_update_slice(
                cache_v.value, v, (0, idx, 0, 0))
            k, v = cache_k.value, cache_v.value

        # GQA: repeat kv heads.
        if KV != H:
            rep = H // KV
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        # qk matmul: both inputs quantized (MatmulFunctional semantics).
        qq = self.quant_input(q, "matmul", OpCategory.GEMM, 0)
        kk = self.quant_input(k, "matmul", OpCategory.GEMM, 1)
        scores = jnp.einsum(
            "bshd,bthd->bhst", qq, kk, preferred_element_type=jnp.float32
        )
        # attention scaling (scaling category input quant on the scores).
        scale = jnp.asarray(1.0 / jnp.sqrt(D).astype(jnp.float32))
        scores = self.quant_mul(
            scores.astype(dtype), scale.astype(dtype)
        ).astype(jnp.float32)

        if attention_mask is not None:
            scores = scores + attention_mask.astype(jnp.float32)

        probs = QSoftmax(dtype=dtype, qconfig=self.qconfig, name="softmax")(
            scores.astype(dtype)
        )

        # av matmul: both inputs quantized.
        pp = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                              hook="av_pre_process")
        vv = self.quant_input(v, "matmul", OpCategory.GEMM, 1,
                              hook="av_pre_process")
        ctx = jnp.einsum(
            "bhst,bthd->bshd", pp, vv, preferred_element_type=jnp.float32
        ).astype(dtype)
        ctx = ctx.reshape(B, S, H * D)
        return dense(cfg.hidden_size, "o_proj")(ctx)


class LlamaMLP(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        dense = lambda feat, name: QDense(
            feat, use_bias=False, dtype=dtype, qconfig=self.qconfig, name=name
        )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        gate = self.quant_activation_input(gate, "silu")
        act = nn.silu(gate.astype(jnp.float32)).astype(jnp.dtype(cfg.dtype))
        # gate*up product is a scaling-category site.
        hidden = self.quant_mul(act, up)
        return dense(cfg.hidden_size, "down_proj")(hidden)


class LlamaDecoderLayer(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask, positions,
                 use_cache=False, cache_index=None):
        cfg = self.config
        normed = QRMSNorm(epsilon=cfg.rms_norm_eps, dtype=jnp.dtype(cfg.dtype),
                          qconfig=self.qconfig, name="input_layernorm")(hidden)
        attn_out = LlamaAttention(cfg, self.qconfig, name="self_attn")(
            normed, attention_mask, positions, use_cache, cache_index
        )
        hidden = self.quant_residual(hidden, attn_out, hook="attn_residual")

        normed = QRMSNorm(epsilon=cfg.rms_norm_eps, dtype=jnp.dtype(cfg.dtype),
                          qconfig=self.qconfig,
                          name="post_attention_layernorm")(hidden)
        mlp_out = LlamaMLP(cfg, self.qconfig, name="mlp")(normed)
        return self.quant_residual(hidden, mlp_out, hook="mlp_residual")


# Additive-mask fill value: the *bf16* minimum, like HF models use the
# compute dtype's min.  float32's min would overflow to -inf when cast to
# bf16, and quantizing -inf yields NaN (posit/FP8 semantics).
MASK_VALUE = float(jnp.finfo(jnp.bfloat16).min)


def causal_mask(
    batch: int, q_len: int, kv_len: int, q_offset=0, dtype=jnp.float32
) -> jax.Array:
    """Additive causal mask of shape (B, 1, q_len, kv_len)."""
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len)[None, :]
    allowed = kv_pos <= q_pos
    mask = jnp.where(allowed, 0.0, MASK_VALUE).astype(dtype)
    return jnp.broadcast_to(mask[None, None], (batch, 1, q_len, kv_len))


class LlamaModel(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, positions=None,
                 use_cache=False, cache_index=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S = input_ids.shape

        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         dtype=dtype, param_dtype=jnp.float32,
                         name="embed_tokens")
        hidden = embed(input_ids)

        if positions is None:
            start = cache_index if cache_index is not None else 0
            positions = jnp.arange(S)[None, :] + start
            positions = jnp.broadcast_to(positions, (B, S))

        if attention_mask is None:
            kv_len = cfg.max_position_embeddings if use_cache else S
            offset = cache_index if cache_index is not None else 0
            attention_mask = causal_mask(B, S, kv_len, offset)
            if use_cache:
                # Also mask not-yet-written cache slots beyond current pos.
                kv_pos = jnp.arange(kv_len)[None, None, None, :]
                valid = kv_pos <= (offset + S - 1)
                attention_mask = jnp.where(valid, attention_mask, MASK_VALUE)

        for i in range(cfg.num_hidden_layers):
            hidden = LlamaDecoderLayer(
                cfg, self.qconfig, name=f"layers_{i}"
            )(hidden, attention_mask, positions, use_cache, cache_index)

        return QRMSNorm(epsilon=cfg.rms_norm_eps, dtype=dtype,
                        qconfig=self.qconfig, name="norm")(hidden)


class LlamaForCausalLM(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, positions=None,
                 use_cache=False, cache_index=None):
        cfg = self.config
        hidden = LlamaModel(cfg, self.qconfig, name="model")(
            input_ids, attention_mask, positions, use_cache, cache_index
        )
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["model"]["embed_tokens"]["embedding"]
            logits = hidden @ embed.T.astype(hidden.dtype)
        else:
            logits = QDense(cfg.vocab_size, use_bias=False,
                            dtype=jnp.dtype(cfg.dtype), qconfig=self.qconfig,
                            name="lm_head")(hidden)
        return logits.astype(jnp.float32)
