"""SegFormer semantic segmentation with quantization sites.

The reference's segmentation example fine-tunes a SegFormer-class model on
ADE20k (reference: examples/semantic_segmentation/run_semantic_segmentation.py
— HF AutoModelForSemanticSegmentation, 1,022 LoC with utils).  Fresh flax
implementation of the SegFormer architecture (MiT hierarchical encoder +
all-MLP decode head), NHWC/TPU-native, quant sites on every conv/dense.

Encoder (MiT): 4 stages of [overlapped patch embedding (strided conv) ->
transformer blocks with spatial-reduction attention + Mix-FFN (3x3 depthwise
conv between the MLP layers) -> LayerNorm].  Decoder: per-stage linear
projection to a common dim, bilinear upsample to 1/4 scale, concat, 1x1
fuse conv, classifier.

MiT-b0 defaults: dims (32, 64, 160, 256), depths (2, 2, 2, 2), heads
(1, 2, 5, 8), sr_ratios (8, 4, 2, 1), decoder dim 256.
"""

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QConv, QDense, QLayerNorm, QSoftmax, QuantMixin

__all__ = ["SegFormerConfig", "SegFormer", "segmentation_loss", "mean_iou"]


@dataclass(frozen=True)
class SegFormerConfig:
    num_classes: int = 150                 # ADE20k
    dims: Tuple[int, ...] = (32, 64, 160, 256)      # MiT-b0
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratio: float = 4.0
    decoder_dim: int = 256
    dtype: str = "bfloat16"

    @staticmethod
    def b0(**kw) -> "SegFormerConfig":
        return SegFormerConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "SegFormerConfig":
        d = dict(num_classes=8, dims=(8, 16, 16, 32), depths=(1, 1, 1, 1),
                 num_heads=(1, 2, 2, 2), sr_ratios=(4, 2, 2, 1),
                 mlp_ratio=2.0, decoder_dim=32)
        d.update(kw)
        return SegFormerConfig(**d)


class SRAttention(nn.Module, QuantMixin):
    """Self-attention with spatial reduction of K/V (SegFormer's efficient
    attention): K/V computed on a sr x sr strided-conv-downsampled map."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, N, D = x.shape
        hd = D // self.num_heads
        q = QDense(D, dtype=self.dtype, qconfig=self.qconfig, name="q")(x)

        kv_in = x
        if self.sr_ratio > 1:
            sr = self.sr_ratio
            kv_in = x.reshape(B, H, W, D)
            kv_in = QConv(D, (sr, sr), strides=(sr, sr), padding="VALID",
                          dtype=self.dtype, qconfig=self.qconfig,
                          name="sr")(kv_in)
            kv_in = kv_in.reshape(B, -1, D)
            kv_in = QLayerNorm(dtype=self.dtype, qconfig=self.qconfig,
                               name="sr_norm")(kv_in)
        k = QDense(D, dtype=self.dtype, qconfig=self.qconfig, name="k")(kv_in)
        v = QDense(D, dtype=self.dtype, qconfig=self.qconfig, name="v")(kv_in)

        M = k.shape[1]
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, self.num_heads, hd).transpose(0, 2, 1, 3)
        q = self.quant_input(q, "matmul", OpCategory.GEMM, 0, hook="qk_q")
        k = self.quant_input(k, "matmul", OpCategory.GEMM, 1, hook="qk_k")
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        probs = QSoftmax(dtype=self.dtype, qconfig=self.qconfig,
                         name="softmax")(scores)
        probs = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                                 hook="pv_p")
        v = self.quant_input(v, "matmul", OpCategory.GEMM, 1, hook="pv_v")
        ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, N, D)
        return QDense(D, dtype=self.dtype, qconfig=self.qconfig,
                      name="proj")(ctx)


class MixFFN(nn.Module, QuantMixin):
    """SegFormer Mix-FFN: dense -> 3x3 depthwise conv (positional mixing)
    -> GELU -> dense."""

    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, N, D = x.shape
        h = QDense(self.hidden, dtype=self.dtype, qconfig=self.qconfig,
                   name="fc1")(x)
        h = h.reshape(B, H, W, self.hidden)
        h = QConv(self.hidden, (3, 3), feature_group_count=self.hidden,
                  dtype=self.dtype, qconfig=self.qconfig, name="dwconv")(h)
        h = h.reshape(B, N, self.hidden)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
            self.dtype)
        return QDense(D, dtype=self.dtype, qconfig=self.qconfig,
                      name="fc2")(h)


class MiTBlock(nn.Module, QuantMixin):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, H: int, W: int):
        h = QLayerNorm(dtype=self.dtype, qconfig=self.qconfig,
                       name="norm1")(x)
        h = SRAttention(self.dim, self.num_heads, self.sr_ratio, self.dtype,
                        self.qconfig, name="attn")(h, H, W)
        x = self.quant_residual(x, h, hook="attn_residual")
        h = QLayerNorm(dtype=self.dtype, qconfig=self.qconfig,
                       name="norm2")(x)
        h = MixFFN(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                   self.qconfig, name="ffn")(h, H, W)
        return self.quant_residual(x, h, hook="mlp_residual")


class SegFormer(nn.Module, QuantMixin):
    config: SegFormerConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images (B, H, W, C) -> logits (B, H, W, num_classes)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, H0, W0, _ = images.shape
        x = images.astype(dtype)

        feats = []
        for s in range(4):
            # overlapped patch embedding: 7x7/4 first stage, 3x3/2 after
            k, stride = (7, 4) if s == 0 else (3, 2)
            pad = k // 2
            x = QConv(cfg.dims[s], (k, k), strides=(stride, stride),
                      padding=[(pad, pad), (pad, pad)], dtype=dtype,
                      qconfig=self.qconfig, name=f"patch_embed_{s}")(x)
            B_, H, W, D = x.shape
            x = x.reshape(B_, H * W, D)
            x = QLayerNorm(dtype=dtype, qconfig=self.qconfig,
                           name=f"embed_norm_{s}")(x)
            for b in range(cfg.depths[s]):
                x = MiTBlock(cfg.dims[s], cfg.num_heads[s], cfg.sr_ratios[s],
                             cfg.mlp_ratio, dtype, self.qconfig,
                             name=f"stage{s}_block{b}")(x, H, W)
            x = QLayerNorm(dtype=dtype, qconfig=self.qconfig,
                           name=f"stage_norm_{s}")(x)
            x = x.reshape(B_, H, W, D)
            feats.append(x)

        # all-MLP decode head: project each scale, upsample to 1/4, concat
        target = feats[0].shape[1:3]
        parts = []
        for i, f in enumerate(feats):
            p = QDense(cfg.decoder_dim, dtype=dtype, qconfig=self.qconfig,
                       name=f"linear_c{i}")(f)
            if p.shape[1:3] != target:
                p = jax.image.resize(
                    p.astype(jnp.float32),
                    (B, target[0], target[1], cfg.decoder_dim),
                    method="bilinear").astype(dtype)
            parts.append(p)
        fused = jnp.concatenate(parts[::-1], axis=-1)
        fused = QConv(cfg.decoder_dim, (1, 1), use_bias=False, dtype=dtype,
                      qconfig=self.qconfig, name="linear_fuse")(fused)
        fused = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dtype, name="fuse_bn")(fused)
        fused = jax.nn.relu(fused.astype(jnp.float32)).astype(dtype)
        logits = QConv(cfg.num_classes, (1, 1), dtype=dtype,
                       qconfig=self.qconfig, name="classifier")(fused)
        return jax.image.resize(
            logits.astype(jnp.float32), (B, H0, W0, cfg.num_classes),
            method="bilinear")


def segmentation_loss(logits, labels, ignore_index: int = 255):
    """Per-pixel CE with ignore label (the reference driver's semantic-loss
    protocol: reduce over labeled pixels only)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def mean_iou(preds, labels, num_classes: int, ignore_index: int = 255):
    """Mean intersection-over-union over classes present in labels."""
    valid = labels != ignore_index
    ious = []
    for c in range(num_classes):
        p = jnp.logical_and(preds == c, valid)
        t = jnp.logical_and(labels == c, valid)
        inter = jnp.sum(jnp.logical_and(p, t))
        union = jnp.sum(jnp.logical_or(p, t))
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1),
                              jnp.nan))
    ious = jnp.stack(ious)
    return jnp.nanmean(ious)
