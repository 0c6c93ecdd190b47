"""MobileViT image classifier with quantization sites.

The reference compiles timm's mobilevit_xxs as a PTQ target (reference:
test/test_codegen.py:687-727 — prepare_pt2e over tiny-imagenet calibration,
convert/transform/fuse/compile).  Fresh flax implementation of the same
architecture (MobileViT: MobileNetV2 inverted-residual stages interleaved
with MobileViT blocks that run a small transformer over unfolded 2x2
patches), NHWC/TPU-native, every conv/dense routed through QConv/QDense.

Config follows mobilevit_xxs: channels (16,16,24,48,64,80), transformer dims
(64, 80, 96) with 2/4/3 layers, expansion 2.
"""

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QConv, QDense, QLayerNorm, QSoftmax, QuantMixin

__all__ = ["MobileViTConfig", "MobileViT"]


@dataclass(frozen=True)
class MobileViTConfig:
    num_classes: int = 1000
    channels: Tuple[int, ...] = (16, 16, 24, 48, 64, 80)  # xxs
    transformer_dims: Tuple[int, ...] = (64, 80, 96)
    transformer_depths: Tuple[int, ...] = (2, 4, 3)
    num_heads: int = 4
    expansion: int = 2
    patch: int = 2
    head_channels: int = 320
    dtype: str = "bfloat16"

    @staticmethod
    def xxs(**kw) -> "MobileViTConfig":
        return MobileViTConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "MobileViTConfig":
        d = dict(num_classes=10, channels=(8, 8, 8, 16, 16, 16),
                 transformer_dims=(16, 16, 16),
                 transformer_depths=(1, 1, 1), num_heads=2, head_channels=32)
        d.update(kw)
        return MobileViTConfig(**d)


class ConvBNSiLU(nn.Module, QuantMixin):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = QConv(self.features, (self.kernel, self.kernel),
                  strides=(self.stride, self.stride),
                  padding=[(pad, pad), (pad, pad)],
                  feature_group_count=self.groups, use_bias=False,
                  dtype=self.dtype, qconfig=self.qconfig, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return jax.nn.silu(x.astype(jnp.float32)).astype(self.dtype)


class MV2Block(nn.Module, QuantMixin):
    """MobileNetV2 inverted residual (expand 1x1 -> depthwise 3x3 -> project)."""

    features: int
    stride: int = 1
    expansion: int = 2
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expansion
        y = x
        if self.expansion != 1:
            y = ConvBNSiLU(hidden, 1, 1, dtype=self.dtype,
                           qconfig=self.qconfig, name="expand")(y, train)
        y = ConvBNSiLU(hidden, 3, self.stride, groups=hidden,
                       dtype=self.dtype, qconfig=self.qconfig,
                       name="depthwise")(y, train)
        y = QConv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                  qconfig=self.qconfig, name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="project_bn")(y)
        if self.stride == 1 and cin == self.features:
            return self.quant_residual(x, y, hook="add")
        return y


class TransformerBlock(nn.Module, QuantMixin):
    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x):
        # x: (B*, N, dim)
        cfg_dtype = self.dtype
        h = QLayerNorm(dtype=cfg_dtype, qconfig=self.qconfig, name="norm1")(x)
        B, N, D = h.shape
        hd = D // self.num_heads

        def proj(name):
            return QDense(D, dtype=cfg_dtype, qconfig=self.qconfig,
                          name=name)(h)

        q = proj("q").reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = proj("k").reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = proj("v").reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        q = self.quant_input(q, "matmul", OpCategory.GEMM, 0, hook="qk_q")
        k = self.quant_input(k, "matmul", OpCategory.GEMM, 1, hook="qk_k")
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        probs = QSoftmax(dtype=cfg_dtype, qconfig=self.qconfig,
                         name="softmax")(scores)
        probs = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                                 hook="pv_p")
        v = self.quant_input(v, "matmul", OpCategory.GEMM, 1, hook="pv_v")
        ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                         preferred_element_type=jnp.float32).astype(cfg_dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
        attn = QDense(D, dtype=cfg_dtype, qconfig=self.qconfig,
                      name="attn_out")(ctx)
        x = self.quant_residual(x, attn, hook="attn_residual")

        h = QLayerNorm(dtype=cfg_dtype, qconfig=self.qconfig, name="norm2")(x)
        h = QDense(int(D * self.mlp_ratio), dtype=cfg_dtype,
                   qconfig=self.qconfig, name="fc1")(h)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(cfg_dtype)
        h = QDense(D, dtype=cfg_dtype, qconfig=self.qconfig, name="fc2")(h)
        return self.quant_residual(x, h, hook="mlp_residual")


class MobileViTBlock(nn.Module, QuantMixin):
    """Local conv -> unfold to patches -> transformer -> fold -> fuse."""

    dim: int
    depth: int
    num_heads: int
    patch: int
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        y = ConvBNSiLU(cin, 3, 1, dtype=self.dtype, qconfig=self.qconfig,
                       name="local3x3")(x, train)
        y = QConv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                  qconfig=self.qconfig, name="local1x1")(y)

        # unfold (B, H, W, d) -> (B*p*p, H/p * W/p, d): each of the p*p
        # intra-patch offsets becomes an independent "pixel sequence"
        B, H, W, D = y.shape
        p = self.patch
        assert H % p == 0 and W % p == 0, (H, W, p)
        y = y.reshape(B, H // p, p, W // p, p, D)
        y = y.transpose(0, 2, 4, 1, 3, 5).reshape(B * p * p,
                                                  (H // p) * (W // p), D)
        for i in range(self.depth):
            y = TransformerBlock(self.dim, self.num_heads, dtype=self.dtype,
                                 qconfig=self.qconfig, name=f"tf_{i}")(y)
        y = QLayerNorm(dtype=self.dtype, qconfig=self.qconfig,
                       name="norm")(y)
        # fold back
        y = y.reshape(B, p, p, H // p, W // p, D)
        y = y.transpose(0, 3, 1, 4, 2, 5).reshape(B, H, W, D)

        y = ConvBNSiLU(cin, 1, 1, dtype=self.dtype, qconfig=self.qconfig,
                       name="proj")(y, train)
        y = jnp.concatenate([x, y], axis=-1)
        return ConvBNSiLU(cin, 3, 1, dtype=self.dtype, qconfig=self.qconfig,
                          name="fuse")(y, train)


class MobileViT(nn.Module, QuantMixin):
    config: MobileViTConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        ch = cfg.channels
        x = images.astype(dtype)

        x = ConvBNSiLU(ch[0], 3, 2, dtype=dtype, qconfig=self.qconfig,
                       name="stem")(x, train)
        x = MV2Block(ch[1], 1, cfg.expansion, dtype, self.qconfig,
                     name="mv2_1")(x, train)
        x = MV2Block(ch[2], 2, cfg.expansion, dtype, self.qconfig,
                     name="mv2_2")(x, train)
        x = MV2Block(ch[2], 1, cfg.expansion, dtype, self.qconfig,
                     name="mv2_3")(x, train)
        x = MV2Block(ch[3], 2, cfg.expansion, dtype, self.qconfig,
                     name="mv2_4")(x, train)
        x = MobileViTBlock(cfg.transformer_dims[0], cfg.transformer_depths[0],
                           cfg.num_heads, cfg.patch, dtype, self.qconfig,
                           name="mvit_1")(x, train)
        x = MV2Block(ch[4], 2, cfg.expansion, dtype, self.qconfig,
                     name="mv2_5")(x, train)
        x = MobileViTBlock(cfg.transformer_dims[1], cfg.transformer_depths[1],
                           cfg.num_heads, cfg.patch, dtype, self.qconfig,
                           name="mvit_2")(x, train)
        x = MV2Block(ch[5], 2, cfg.expansion, dtype, self.qconfig,
                     name="mv2_6")(x, train)
        x = MobileViTBlock(cfg.transformer_dims[2], cfg.transformer_depths[2],
                           cfg.num_heads, cfg.patch, dtype, self.qconfig,
                           name="mvit_3")(x, train)

        x = ConvBNSiLU(cfg.head_channels, 1, 1, dtype=dtype,
                       qconfig=self.qconfig, name="head_conv")(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(dtype)
        return QDense(cfg.num_classes, dtype=dtype, qconfig=self.qconfig,
                      name="classifier")(x)
