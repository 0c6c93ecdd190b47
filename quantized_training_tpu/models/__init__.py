"""Model zoo: flax implementations with built-in quantization sites."""

from .layers import (
    FakeQuant,
    QuantMixin,
    QDense,
    QLoRADense,
    QConv,
    QLayerNorm,
    QRMSNorm,
    NoNorm,
    QSoftmax,
    bwd_quantize,
)
from .llama import LlamaConfig, LlamaForCausalLM, LlamaModel, causal_mask

__all__ = [
    "FakeQuant",
    "QuantMixin",
    "QDense",
    "QLoRADense",
    "QConv",
    "QLayerNorm",
    "QRMSNorm",
    "NoNorm",
    "QSoftmax",
    "bwd_quantize",
    "LlamaConfig",
    "LlamaForCausalLM",
    "LlamaModel",
    "causal_mask",
]
