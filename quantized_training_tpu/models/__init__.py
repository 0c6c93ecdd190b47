"""Model zoo: flax implementations with built-in quantization sites."""

from .layers import (
    FakeQuant,
    QuantMixin,
    QDense,
    QLoRADense,
    QConv,
    QConvBn,
    QLayerNorm,
    QRMSNorm,
    NoNorm,
    QSoftmax,
    bwd_quantize,
)
from .llama import (LlamaConfig, LlamaForCausalLM, LlamaModel, causal_mask,
                    fuse_qkv_params)
from .bert import (
    BertConfig,
    BertModel,
    BertForQuestionAnswering,
    BertForSequenceClassification,
    BertForMaskedLM,
)
from .mobilebert import (
    MobileBertConfig,
    MobileBertModel,
    MobileBertForQuestionAnswering,
    MobileBertForSequenceClassification,
)
from .gpt2 import GPT2Config, GPT2LMHeadModel
from .mamba import MambaConfig, MambaForCausalLM
from .yolov5_face import YoloFaceConfig, YoloV5Face, decode_detections
from .mobilevit import MobileViTConfig, MobileViT
from .segformer import SegFormerConfig, SegFormer
from . import hf_loader

__all__ = [
    "FakeQuant",
    "QuantMixin",
    "QDense",
    "QLoRADense",
    "QConv",
    "QConvBn",
    "QLayerNorm",
    "QRMSNorm",
    "NoNorm",
    "QSoftmax",
    "bwd_quantize",
    "LlamaConfig",
    "LlamaForCausalLM",
    "LlamaModel",
    "causal_mask",
    "BertConfig",
    "BertModel",
    "BertForQuestionAnswering",
    "BertForSequenceClassification",
    "BertForMaskedLM",
    "MobileBertConfig",
    "MobileBertModel",
    "MobileBertForQuestionAnswering",
    "MobileBertForSequenceClassification",
    "GPT2Config",
    "GPT2LMHeadModel",
    "MambaConfig",
    "MambaForCausalLM",
    "YoloFaceConfig",
    "YoloV5Face",
    "decode_detections",
    "MobileViTConfig",
    "MobileViT",
    "SegFormerConfig",
    "SegFormer",
    "hf_loader",
]
