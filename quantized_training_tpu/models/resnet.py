"""ResNet CNNs with quantization sites + BN folding (the reference's ImageNet
example targets torchvision CNNs with QAT BN folding, reference:
examples/imagenet/main.py:250-296, modules/qat/conv_fused.py).

NHWC layout throughout (TPU-native).  ``fold_batchnorm`` folds trained BN
statistics into conv kernels/biases so PTQ sees the deployed weights — the
functional equivalent of the reference's fuse_modules_qat + ConvBn modules.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QConv, QDense, QuantMixin

__all__ = ["ResNetConfig", "ResNet", "fold_batchnorm"]


@dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)   # resnet18
    num_filters: int = 64
    num_classes: int = 1000
    dtype: str = "bfloat16"

    @staticmethod
    def resnet18() -> "ResNetConfig":
        return ResNetConfig((2, 2, 2, 2))

    @staticmethod
    def resnet50() -> "ResNetConfig":
        # bottleneck blocks are not implemented in round 1; 50-layer uses
        # basic blocks at matching depth for capability coverage.
        return ResNetConfig((3, 4, 6, 3))

    @staticmethod
    def tiny(**kw) -> "ResNetConfig":
        d = dict(stage_sizes=(1, 1), num_filters=8, num_classes=10)
        d.update(kw)
        return ResNetConfig(**d)


class BasicBlock(nn.Module, QuantMixin):
    filters: int
    strides: Tuple[int, int]
    dtype: Any
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = QConv(self.filters, (3, 3), strides=self.strides, use_bias=True,
                  dtype=self.dtype, qconfig=self.qconfig, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y.astype(jnp.float32)).astype(self.dtype)
        y = QConv(self.filters, (3, 3), use_bias=True, dtype=self.dtype,
                  qconfig=self.qconfig, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(y)

        if residual.shape != y.shape:
            residual = QConv(self.filters, (1, 1), strides=self.strides,
                             use_bias=True, dtype=self.dtype,
                             qconfig=self.qconfig, name="downsample_conv")(
                residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, dtype=self.dtype,
                                    name="downsample_bn")(residual)

        y = self.quant_residual(y, residual)
        return jax.nn.relu(y.astype(jnp.float32)).astype(self.dtype)


class ResNet(nn.Module, QuantMixin):
    config: ResNetConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B, H, W, C) NHWC."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = images.astype(dtype)
        x = QConv(cfg.num_filters, (7, 7), strides=(2, 2), use_bias=True,
                  dtype=dtype, qconfig=self.qconfig, name="conv_stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=dtype, name="bn_stem")(x)
        x = jax.nn.relu(x.astype(jnp.float32)).astype(dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for stage, num_blocks in enumerate(cfg.stage_sizes):
            for block in range(num_blocks):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                x = BasicBlock(
                    cfg.num_filters * (2 ** stage), strides, dtype,
                    self.qconfig, name=f"stage{stage}_block{block}",
                )(x, train)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(dtype)
        return QDense(cfg.num_classes, dtype=dtype, qconfig=self.qconfig,
                      name="fc")(x).astype(jnp.float32)


def fold_batchnorm(params: Dict, batch_stats: Dict, eps: float = 1e-5):
    """Fold BN scale/bias + running stats into the preceding conv.

    Walks params and batch_stats together; for every convX/bnX (and
    downsample_conv/downsample_bn) pair in a scope, scales the conv kernel by
    gamma/sqrt(var+eps) per output channel and absorbs
    beta - gamma*mean/sqrt(var+eps) into a conv bias; the BN becomes
    identity.  PTQ equivalent of the reference's conv-bn fusion
    (qat/conv_fused.py).  Returns (new_params, new_batch_stats).
    """
    params = jax.tree_util.tree_map(lambda x: x, params)
    batch_stats = jax.tree_util.tree_map(lambda x: x, batch_stats)
    params = jax.device_get(params)
    # tree_map copies leaves only; rebuild dicts mutable
    import copy

    def to_mutable(d):
        return {k: to_mutable(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    params = to_mutable(params)
    batch_stats = to_mutable(batch_stats)

    def pairs_in(scope):
        out = []
        for name in scope:
            if name.startswith("conv"):
                bn = "bn" + name[4:]
                if bn in scope:
                    out.append((name, bn))
        if "downsample_conv" in scope and "downsample_bn" in scope:
            out.append(("downsample_conv", "downsample_bn"))
        return out

    def walk(p_scope, s_scope):
        for conv_name, bn_name in pairs_in(p_scope):
            if bn_name not in s_scope:
                continue
            conv, bn, stats = p_scope[conv_name], p_scope[bn_name], s_scope[bn_name]
            gamma = bn.get("scale", jnp.ones_like(stats["mean"]))
            beta = bn.get("bias", jnp.zeros_like(stats["mean"]))
            inv = (gamma.astype(jnp.float32)
                   * jax.lax.rsqrt(stats["var"].astype(jnp.float32) + eps))
            conv["kernel"] = (conv["kernel"].astype(jnp.float32)
                              * inv[None, None, None, :]).astype(conv["kernel"].dtype)
            bias = conv.get("bias", jnp.zeros_like(beta))
            conv["bias"] = (bias.astype(jnp.float32)
                            - stats["mean"].astype(jnp.float32) * inv
                            + beta.astype(jnp.float32)).astype(gamma.dtype)
            if "scale" in bn:
                bn["scale"] = jnp.ones_like(gamma)
            if "bias" in bn:
                bn["bias"] = jnp.zeros_like(beta)
            stats["mean"] = jnp.zeros_like(stats["mean"])
            stats["var"] = jnp.ones_like(stats["var"])
        for name, child in p_scope.items():
            if isinstance(child, dict) and name in s_scope:
                walk(child, s_scope[name])
            elif isinstance(child, dict):
                # scopes with no BN stats below them need no folding
                continue

    walk(params, batch_stats)
    return params, batch_stats
