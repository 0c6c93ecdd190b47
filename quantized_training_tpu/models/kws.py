"""Keyword-spotting residual CNNs (Honk res8 / res15) with quantization
sites (reference: examples/audio_classification/honk_model.py — the Speech
Commands models trained by honk_train.py with eager quantize or PT2E).

Input is a log-mel/MFCC spectrogram (B, time, freq) treated as a 1-channel
NHWC image.  res8 pools the input 4x3 then runs 3 residual conv pairs at 45
channels; res15 runs 6 dilated residual pairs.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import QuantConfig
from .layers import QConv, QDense, QuantMixin

__all__ = ["KWSConfig", "KWSResNet"]


@dataclass(frozen=True)
class KWSConfig:
    n_labels: int = 12
    n_feature_maps: int = 45
    n_layers: int = 6          # conv layers in residual pairs (res8: 6)
    use_dilation: bool = False
    pool: Tuple[int, int] = (4, 3)
    dtype: str = "bfloat16"

    @staticmethod
    def res8() -> "KWSConfig":
        return KWSConfig(n_layers=6, use_dilation=False, pool=(4, 3))

    @staticmethod
    def res15() -> "KWSConfig":
        return KWSConfig(n_layers=13, use_dilation=True, pool=(1, 1))


class KWSResNet(nn.Module, QuantMixin):
    config: KWSConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, time, freq) spectrogram."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = x[..., None].astype(dtype)  # NHWC with 1 channel

        x = QConv(cfg.n_feature_maps, (3, 3), use_bias=False, dtype=dtype,
                  qconfig=self.qconfig, name="conv0")(x)
        if cfg.pool != (1, 1):
            x = nn.avg_pool(x, cfg.pool, strides=cfg.pool)

        y = x
        for i in range(cfg.n_layers):
            dilation = 2 ** (i // 3) if cfg.use_dilation else 1
            z = jax.nn.relu(y.astype(jnp.float32)).astype(dtype)
            z = QConv(cfg.n_feature_maps, (3, 3), use_bias=False,
                      dtype=dtype, qconfig=self.qconfig,
                      name=f"conv{i + 1}")(z)
            if i % 2 == 1:
                y = self.quant_residual(z, y, hook=f"res_{i // 2}")
            else:
                y = z
        x = jax.nn.relu(y.astype(jnp.float32)).astype(dtype)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(dtype)
        return QDense(cfg.n_labels, dtype=dtype, qconfig=self.qconfig,
                      name="output")(x).astype(jnp.float32)
