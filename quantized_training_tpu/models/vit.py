"""Vision Transformer in flax with quantization sites (reference compiles
ViT through its codegen path, test/test_codegen.py:617-641; padding pass for
the patch embedding at codegen/passes/padding.py:438-491).

HF-compatible (google/vit-*) pre-LN encoder: conv patch embedding, [CLS]
token, learned position embeddings.  NHWC images (TPU-native layout).
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QConv, QDense, QLayerNorm, QSoftmax, QuantMixin

__all__ = ["ViTConfig", "ViTForImageClassification", "convert_vit"]


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    num_labels: int = 1000
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def tiny(**kw) -> "ViTConfig":
        d = dict(image_size=32, patch_size=8, hidden_size=64,
                 num_hidden_layers=2, num_attention_heads=4,
                 intermediate_size=128, num_labels=10)
        d.update(kw)
        return ViTConfig(**d)


class ViTSelfAttention(nn.Module, QuantMixin):
    config: ViTConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden):
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
        probs = QSoftmax(dtype=dtype, qconfig=self.qconfig, name="softmax")(
            scores.astype(dtype))
        pp = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                              hook="av_pre_process")
        vv = self.quant_input(v, "matmul", OpCategory.GEMM, 1,
                              hook="av_pre_process")
        ctx = jnp.einsum("bhst,bthd->bshd", pp, vv,
                         preferred_element_type=jnp.float32).astype(dtype)
        return ctx.reshape(B, S, H * D)


class ViTLayer(nn.Module, QuantMixin):
    config: ViTConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        normed = QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                            qconfig=self.qconfig,
                            name="layernorm_before")(hidden)
        attn = ViTSelfAttention(cfg, self.qconfig, name="attention_self")(
            normed)
        attn = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                      name="attention_output_dense")(attn)
        hidden = self.quant_residual(attn, hidden, hook="attn_residual")

        normed = QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                            qconfig=self.qconfig,
                            name="layernorm_after")(hidden)
        inter = QDense(cfg.intermediate_size, dtype=dtype,
                       qconfig=self.qconfig, name="intermediate_dense")(normed)
        inter = self.quant_activation_input(inter, "gelu")
        inter = nn.gelu(inter.astype(jnp.float32), approximate=False).astype(dtype)
        out = QDense(cfg.hidden_size, dtype=dtype, qconfig=self.qconfig,
                     name="output_dense")(inter)
        return self.quant_residual(out, hidden, hook="ffn_residual")


class ViTForImageClassification(nn.Module, QuantMixin):
    config: ViTConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, C) NHWC."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B = pixel_values.shape[0]

        patches = QConv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=dtype, qconfig=self.qconfig, name="patch_embed",
        )(pixel_values.astype(dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros_init(),
                         (1, 1, cfg.hidden_size), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(dtype), (B, 1, cfg.hidden_size))
        hidden = jnp.concatenate([cls, patches], axis=1)

        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.hidden_size),
                         jnp.float32)
        hidden = hidden + pos.astype(dtype)

        for i in range(cfg.num_hidden_layers):
            hidden = ViTLayer(cfg, self.qconfig, name=f"layer_{i}")(hidden)
        hidden = QLayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                            qconfig=self.qconfig, name="layernorm")(hidden)
        return QDense(cfg.num_labels, dtype=dtype, qconfig=self.qconfig,
                      name="classifier")(hidden[:, 0]).astype(jnp.float32)


def convert_vit(state: Dict, num_layers: int) -> Dict:
    """HF ViTForImageClassification state dict -> our params.  HF conv weight
    (out, in, kh, kw) transposes to HWIO; NCHW inputs become NHWC at the
    caller."""
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

    emb = "vit.embeddings"
    set_("cls_token", np_(state[f"{emb}.cls_token"]))
    set_("position_embeddings", np_(state[f"{emb}.position_embeddings"]))
    conv_w = np_(state[f"{emb}.patch_embeddings.projection.weight"])
    set_("patch_embed/kernel", conv_w.transpose(2, 3, 1, 0))  # OIHW->HWIO
    set_("patch_embed/bias",
         np_(state[f"{emb}.patch_embeddings.projection.bias"]))

    for i in range(num_layers):
        hf = f"vit.encoder.layer.{i}"
        ours = f"layer_{i}"
        for proj in ("query", "key", "value"):
            dense(f"{ours}/attention_self/{proj}",
                  f"{hf}.attention.attention.{proj}")
        dense(f"{ours}/attention_output_dense", f"{hf}.attention.output.dense")
        dense(f"{ours}/intermediate_dense", f"{hf}.intermediate.dense")
        dense(f"{ours}/output_dense", f"{hf}.output.dense")
        norm(f"{ours}/layernorm_before", f"{hf}.layernorm_before")
        norm(f"{ours}/layernorm_after", f"{hf}.layernorm_after")

    norm("layernorm", "vit.layernorm")
    if "classifier.weight" in state:
        dense("classifier", "classifier")
    return p
