"""Semantic segmentation with quantization sites (reference:
examples/semantic_segmentation/ — an ADE20k SegFormer-style driver).

Round-1 model: an FCN-style head over the quantized ResNet backbone —
stride-8/16/32 features fused with 1x1 convs and bilinear upsampling to
per-pixel class logits.  NHWC throughout.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import QuantConfig
from .layers import QConv, QuantMixin
from .resnet import BasicBlock, ResNetConfig

__all__ = ["SegmentationConfig", "FCNSegmenter"]


@dataclass(frozen=True)
class SegmentationConfig:
    num_classes: int = 150           # ADE20k
    backbone: ResNetConfig = ResNetConfig((2, 2, 2, 2), 64, 1000)
    head_channels: int = 128
    dtype: str = "bfloat16"

    @staticmethod
    def tiny(**kw) -> "SegmentationConfig":
        d = dict(num_classes=8,
                 backbone=ResNetConfig((1, 1), 8, 10),
                 head_channels=16)
        d.update(kw)
        return SegmentationConfig(**d)


class FCNSegmenter(nn.Module, QuantMixin):
    config: SegmentationConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, C) NHWC -> (B, H, W, num_classes) logits."""
        cfg = self.config
        bcfg = cfg.backbone
        dtype = jnp.dtype(cfg.dtype)
        B, H, W, _ = images.shape

        x = images.astype(dtype)
        x = QConv(bcfg.num_filters, (7, 7), strides=(2, 2), use_bias=True,
                  dtype=dtype, qconfig=self.qconfig, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=dtype, name="bn_stem")(x)
        x = jax.nn.relu(x.astype(jnp.float32)).astype(dtype)

        feats = []
        for stage, num_blocks in enumerate(bcfg.stage_sizes):
            for block in range(num_blocks):
                strides = (2, 2) if block == 0 else (1, 1)
                x = BasicBlock(
                    bcfg.num_filters * (2 ** stage), strides, dtype,
                    self.qconfig, name=f"stage{stage}_block{block}",
                )(x, train)
            feats.append(x)

        # FCN head: project each scale to head_channels, upsample, sum.
        target = feats[0].shape[1:3]
        fused = None
        for i, f in enumerate(feats):
            p = QConv(cfg.head_channels, (1, 1), dtype=dtype,
                      qconfig=self.qconfig, name=f"lateral_{i}")(f)
            if p.shape[1:3] != target:
                p = jax.image.resize(
                    p.astype(jnp.float32),
                    (B, target[0], target[1], cfg.head_channels),
                    method="bilinear").astype(dtype)
            fused = p if fused is None else self.quant_residual(
                fused, p, hook=f"fuse_{i}")

        fused = jax.nn.relu(fused.astype(jnp.float32)).astype(dtype)
        logits = QConv(cfg.num_classes, (1, 1), dtype=dtype,
                       qconfig=self.qconfig, name="classifier")(fused)
        logits = jax.image.resize(
            logits.astype(jnp.float32), (B, H, W, cfg.num_classes),
            method="bilinear")
        return logits
