"""YOLOv5-face detector with quantization sites.

The reference compiles the yolov5-face checkpoint as a PTQ target
(reference: test/test_codegen.py:642-686 — attempt_load + prepare_pt2e over
WIDER-Face calibration, then convert/transform/compile).  This is a fresh
flax implementation of the same architecture family (CSP backbone + SPPF +
PAN neck + multi-scale Detect head with 5 facial landmarks per anchor),
NHWC/TPU-native, with every conv routed through QConv so the whole ladder of
activation/weight specs applies.

Structure (yolov5s-face):
  backbone: stem CBS(s2) -> [CBS(s2), C3] x 3 -> CBS(s2) -> SPPF -> C3
  neck:     PAN — top-down 1x1 + upsample + concat + C3, then bottom-up
  head:     Detect — 1x1 conv per scale, na*(5 + nl*2 + nc) channels
            (box 4 + obj 1 + 10 landmark coords + classes)

Landmark decoding follows yolov5-face's Detect.forward: xy/wh via sigmoid
with anchor grids; landmarks are linear offsets scaled by anchor wh.
"""

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import QuantConfig
from .layers import QConv, QuantMixin

__all__ = ["YoloFaceConfig", "YoloV5Face", "decode_detections"]


@dataclass(frozen=True)
class YoloFaceConfig:
    num_classes: int = 1             # face
    num_landmarks: int = 5           # 5 facial keypoints (x, y each)
    depth_multiple: float = 0.33     # yolov5s
    width_multiple: float = 0.50
    anchors: Tuple[Tuple[int, ...], ...] = (
        (4, 5, 8, 10, 13, 16),        # P3/8
        (23, 29, 43, 55, 73, 105),    # P4/16
        (146, 217, 231, 300, 335, 433),  # P5/32
    )
    dtype: str = "bfloat16"

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        # per-anchor outputs: box(4) + obj(1) + landmarks(2*nl) + classes
        return 5 + 2 * self.num_landmarks + self.num_classes

    def depth(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1)

    def width(self, c: int) -> int:
        return int(-(-c * self.width_multiple // 8) * 8)  # ceil to /8

    @staticmethod
    def tiny(**kw) -> "YoloFaceConfig":
        d = dict(depth_multiple=0.34, width_multiple=0.125)
        d.update(kw)
        return YoloFaceConfig(**d)


class CBS(nn.Module, QuantMixin):
    """Conv-BN-SiLU (yolov5 Conv block)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # yolov5 autopad: k//2 for odd kernels; the 6x6/s2 stem explicitly
        # uses pad 2 so H/2 stays exact ((k-1)//2 covers both cases).
        pad = (self.kernel - 1) // 2
        x = QConv(self.features, (self.kernel, self.kernel),
                  strides=(self.stride, self.stride),
                  padding=[(pad, pad), (pad, pad)], use_bias=False,
                  dtype=self.dtype, qconfig=self.qconfig, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return jax.nn.silu(x.astype(jnp.float32)).astype(self.dtype)


class Bottleneck(nn.Module, QuantMixin):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = CBS(self.features, 1, dtype=self.dtype, qconfig=self.qconfig,
                name="cv1")(x, train)
        y = CBS(self.features, 3, dtype=self.dtype, qconfig=self.qconfig,
                name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return self.quant_residual(x, y, hook="add")
        return y


class C3(nn.Module, QuantMixin):
    """CSP bottleneck with 3 convs (yolov5 C3)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        a = CBS(c, 1, dtype=self.dtype, qconfig=self.qconfig, name="cv1")(
            x, train)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.dtype, self.qconfig,
                           name=f"m_{i}")(a, train)
        b = CBS(c, 1, dtype=self.dtype, qconfig=self.qconfig, name="cv2")(
            x, train)
        y = jnp.concatenate([a, b], axis=-1)
        return CBS(self.features, 1, dtype=self.dtype, qconfig=self.qconfig,
                   name="cv3")(y, train)


class SPPF(nn.Module, QuantMixin):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools, concat."""

    features: int
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = CBS(c, 1, dtype=self.dtype, qconfig=self.qconfig, name="cv1")(
            x, train)

        def pool(v):
            return nn.max_pool(v, (5, 5), strides=(1, 1), padding="SAME")

        p1 = pool(x)
        p2 = pool(p1)
        p3 = pool(p2)
        y = jnp.concatenate([x, p1, p2, p3], axis=-1)
        return CBS(self.features, 1, dtype=self.dtype, qconfig=self.qconfig,
                   name="cv2")(y, train)


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x.astype(jnp.float32), (B, 2 * H, 2 * W, C),
                            method="nearest").astype(x.dtype)


class YoloV5Face(nn.Module, QuantMixin):
    """Returns raw per-scale maps [(B, Hs, Ws, na*no)] for strides 8/16/32.

    Use :func:`decode_detections` for inference-time box/landmark decoding
    (kept out of the module so training/PTQ sees only conv outputs, like the
    reference's exported graph)."""

    config: YoloFaceConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        w, d = cfg.width, cfg.depth
        x = images.astype(dtype)

        # backbone
        x = CBS(w(64), 6, 2, dtype, self.qconfig, name="stem")(x, train)
        x = CBS(w(128), 3, 2, dtype, self.qconfig, name="down1")(x, train)
        x = C3(w(128), d(3), True, dtype, self.qconfig, name="c3_1")(x, train)
        x = CBS(w(256), 3, 2, dtype, self.qconfig, name="down2")(x, train)
        p3 = C3(w(256), d(6), True, dtype, self.qconfig, name="c3_2")(x, train)
        x = CBS(w(512), 3, 2, dtype, self.qconfig, name="down3")(p3, train)
        p4 = C3(w(512), d(9), True, dtype, self.qconfig, name="c3_3")(x, train)
        x = CBS(w(1024), 3, 2, dtype, self.qconfig, name="down4")(p4, train)
        x = C3(w(1024), d(3), True, dtype, self.qconfig, name="c3_4")(x, train)
        x = SPPF(w(1024), dtype, self.qconfig, name="sppf")(x, train)

        # PAN neck: top-down
        t5 = CBS(w(512), 1, 1, dtype, self.qconfig, name="lat5")(x, train)
        y = jnp.concatenate([_upsample2(t5), p4], axis=-1)
        n4 = C3(w(512), d(3), False, dtype, self.qconfig, name="n_c3_4")(
            y, train)
        t4 = CBS(w(256), 1, 1, dtype, self.qconfig, name="lat4")(n4, train)
        y = jnp.concatenate([_upsample2(t4), p3], axis=-1)
        n3 = C3(w(256), d(3), False, dtype, self.qconfig, name="n_c3_3")(
            y, train)

        # bottom-up
        y = CBS(w(256), 3, 2, dtype, self.qconfig, name="bu3")(n3, train)
        y = jnp.concatenate([y, t4], axis=-1)
        m4 = C3(w(512), d(3), False, dtype, self.qconfig, name="m_c3_4")(
            y, train)
        y = CBS(w(512), 3, 2, dtype, self.qconfig, name="bu4")(m4, train)
        y = jnp.concatenate([y, t5], axis=-1)
        m5 = C3(w(1024), d(3), False, dtype, self.qconfig, name="m_c3_5")(
            y, train)

        # detect head: one 1x1 conv per scale
        outs = []
        for i, f in enumerate((n3, m4, m5)):
            outs.append(
                QConv(cfg.na * cfg.no, (1, 1), use_bias=True, dtype=dtype,
                      qconfig=self.qconfig, name=f"detect_{i}")(f))
        return outs


def decode_detections(
    maps: Sequence[jax.Array], cfg: YoloFaceConfig,
    strides: Sequence[int] = (8, 16, 32),
) -> jax.Array:
    """yolov5-face Detect.forward inference decoding.

    xy = (2*sig(t_xy) - 0.5 + grid) * stride; wh = (2*sig(t_wh))^2 * anchor;
    landmarks = t_lm * anchor + grid*stride (linear, no sigmoid); obj/cls
    sigmoid.  Returns (B, sum(Hs*Ws*na), no)."""
    rows = []
    nl2 = 2 * cfg.num_landmarks
    for x, stride, anchors in zip(maps, strides, cfg.anchors):
        B, H, W, _ = x.shape
        a = jnp.asarray(anchors, jnp.float32).reshape(cfg.na, 2)
        x = x.reshape(B, H, W, cfg.na, cfg.no).astype(jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)  # (H, W, 2)
        grid = grid[None, :, :, None, :]
        xy = (2 * jax.nn.sigmoid(x[..., 0:2]) - 0.5 + grid) * stride
        wh = (2 * jax.nn.sigmoid(x[..., 2:4])) ** 2 * a[None, None, None]
        obj = jax.nn.sigmoid(x[..., 4:5])
        lm = (x[..., 5:5 + nl2].reshape(B, H, W, cfg.na, cfg.num_landmarks, 2)
              * a[None, None, None, :, None] + grid[..., None, :] * stride
              ).reshape(B, H, W, cfg.na, nl2)
        cls = jax.nn.sigmoid(x[..., 5 + nl2:])
        rows.append(jnp.concatenate([xy, wh, obj, lm, cls], axis=-1)
                    .reshape(B, H * W * cfg.na, cfg.no))
    return jnp.concatenate(rows, axis=1)
