"""GPT-2 in flax with quantization sites (reference: the quantizable
GPT2Block at modules/quantizable/modeling_gpt.py and the HF swap table entry
at quantization_mappings.py:32).

HF GPT-2 uses Conv1D layers whose weights are already (in, out) — the loader
below does NOT transpose them, unlike true Linear layers.  Supports the
BASELINE config "GPT-2 WikiText-103 perplexity, FP8/FP6/FP4 sweep with
quantized KV-cache" via the same generate/serving stack as LLaMA.
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QDense, QLayerNorm, QSoftmax, QuantMixin
from .llama import causal_mask

__all__ = ["GPT2Config", "GPT2LMHeadModel", "convert_gpt2"]


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @staticmethod
    def tiny(**kw) -> "GPT2Config":
        d = dict(vocab_size=256, n_positions=64, n_embd=64, n_layer=2,
                 n_head=4)
        d.update(kw)
        return GPT2Config(**d)

    @staticmethod
    def gpt2() -> "GPT2Config":
        return GPT2Config()


class GPT2Attention(nn.Module, QuantMixin):
    config: GPT2Config
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S, _ = hidden.shape
        H, D = cfg.n_head, cfg.head_dim

        qkv = QDense(3 * cfg.n_embd, dtype=dtype, qconfig=self.qconfig,
                     name="c_attn")(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)

        qq = self.quant_input(q, "matmul", OpCategory.GEMM, 0)
        kk = self.quant_input(k, "matmul", OpCategory.GEMM, 1)
        scores = jnp.einsum("bshd,bthd->bhst", qq, kk,
                            preferred_element_type=jnp.float32)
        scale = jnp.asarray(1.0 / jnp.sqrt(D), dtype)
        scores = self.quant_mul(scores.astype(dtype), scale).astype(jnp.float32)
        scores = scores + attention_mask.astype(jnp.float32)

        probs = QSoftmax(dtype=dtype, qconfig=self.qconfig, name="softmax")(
            scores.astype(dtype))
        pp = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                              hook="av_pre_process")
        vv = self.quant_input(v, "matmul", OpCategory.GEMM, 1,
                              hook="av_pre_process")
        ctx = jnp.einsum("bhst,bthd->bshd", pp, vv,
                         preferred_element_type=jnp.float32).astype(dtype)
        ctx = ctx.reshape(B, S, H * D)
        return QDense(cfg.n_embd, dtype=dtype, qconfig=self.qconfig,
                      name="c_proj")(ctx)


class GPT2Block(nn.Module, QuantMixin):
    config: GPT2Config
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        normed = QLayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=dtype,
                            qconfig=self.qconfig, name="ln_1")(hidden)
        attn = GPT2Attention(cfg, self.qconfig, name="attn")(
            normed, attention_mask)
        hidden = self.quant_residual(hidden, attn, hook="attn_residual")

        normed = QLayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=dtype,
                            qconfig=self.qconfig, name="ln_2")(hidden)
        inner = QDense(4 * cfg.n_embd, dtype=dtype, qconfig=self.qconfig,
                       name="mlp_c_fc")(normed)
        inner = self.quant_activation_input(inner, "gelu")
        inner = nn.gelu(inner.astype(jnp.float32), approximate=True).astype(dtype)
        mlp = QDense(cfg.n_embd, dtype=dtype, qconfig=self.qconfig,
                     name="mlp_c_proj")(inner)
        return self.quant_residual(hidden, mlp, hook="mlp_residual")


class GPT2LMHeadModel(nn.Module, QuantMixin):
    config: GPT2Config
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, positions=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.arange(S)[None, :]

        wte = nn.Embed(cfg.vocab_size, cfg.n_embd, dtype=dtype,
                       param_dtype=jnp.float32, name="wte")
        wpe = nn.Embed(cfg.n_positions, cfg.n_embd, dtype=dtype,
                       param_dtype=jnp.float32, name="wpe")
        hidden = wte(input_ids) + wpe(positions)

        mask = causal_mask(B, S, S)
        for i in range(cfg.n_layer):
            hidden = GPT2Block(cfg, self.qconfig, name=f"h_{i}")(hidden, mask)
        hidden = QLayerNorm(epsilon=cfg.layer_norm_epsilon, dtype=dtype,
                            qconfig=self.qconfig, name="ln_f")(hidden)
        # tied LM head
        embed = self.variables["params"]["wte"]["embedding"]
        return (hidden @ embed.T.astype(hidden.dtype)).astype(jnp.float32)


def convert_gpt2(state: Dict, n_layer: int) -> Dict:
    """HF GPT2LMHeadModel state dict -> our params.  Conv1D weights are
    already (in, out): no transpose."""
    import numpy as np
    import jax.numpy as jnp

    def np_(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu()
            if str(t.dtype) == "torch.bfloat16":
                t = t.float()
            return t.numpy()
        return np.asarray(t)

    p: Dict = {}

    def set_(path, value):
        node = p
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    set_("wte/embedding", np_(state["transformer.wte.weight"]))
    set_("wpe/embedding", np_(state["transformer.wpe.weight"]))
    for i in range(n_layer):
        hf = f"transformer.h.{i}"
        set_(f"h_{i}/ln_1/scale", np_(state[f"{hf}.ln_1.weight"]))
        set_(f"h_{i}/ln_1/bias", np_(state[f"{hf}.ln_1.bias"]))
        set_(f"h_{i}/ln_2/scale", np_(state[f"{hf}.ln_2.weight"]))
        set_(f"h_{i}/ln_2/bias", np_(state[f"{hf}.ln_2.bias"]))
        # Conv1D: weight already (in, out)
        set_(f"h_{i}/attn/c_attn/kernel", np_(state[f"{hf}.attn.c_attn.weight"]))
        set_(f"h_{i}/attn/c_attn/bias", np_(state[f"{hf}.attn.c_attn.bias"]))
        set_(f"h_{i}/attn/c_proj/kernel", np_(state[f"{hf}.attn.c_proj.weight"]))
        set_(f"h_{i}/attn/c_proj/bias", np_(state[f"{hf}.attn.c_proj.bias"]))
        set_(f"h_{i}/mlp_c_fc/kernel", np_(state[f"{hf}.mlp.c_fc.weight"]))
        set_(f"h_{i}/mlp_c_fc/bias", np_(state[f"{hf}.mlp.c_fc.bias"]))
        set_(f"h_{i}/mlp_c_proj/kernel", np_(state[f"{hf}.mlp.c_proj.weight"]))
        set_(f"h_{i}/mlp_c_proj/bias", np_(state[f"{hf}.mlp.c_proj.bias"]))
    set_("ln_f/scale", np_(state["transformer.ln_f.weight"]))
    set_("ln_f/bias", np_(state["transformer.ln_f.bias"]))
    return p
