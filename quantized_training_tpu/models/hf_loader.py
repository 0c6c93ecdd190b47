"""HuggingFace checkpoint conversion: torch/safetensors state dicts -> our
flax parameter trees.

The reference consumes HF models directly (PyTorch); this framework has its
own flax modules, so loading is a pure name/layout mapping: torch Linear
weights (out, in) transpose to flax kernels (in, out); LayerNorm/NoNorm
weight/bias become scale/bias; embeddings stay as-is.  Works from an
in-memory torch state dict (parity tests build random HF models) or a
directory of .safetensors shards (production checkpoints; no torch needed).
"""

import os
import re
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

__all__ = [
    "load_state_dict_dir",
    "convert_llama",
    "convert_bert",
    "convert_distilbert",
    "convert_phi3",
    "convert_mobilebert",
]


def load_state_dict_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all .safetensors shards in a directory into one numpy dict."""
    from safetensors import safe_open

    state = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".safetensors"):
            continue
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    if not state:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return state


def _np(t):
    """torch tensor or numpy array -> numpy (f32 for bf16 storage)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _set(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = jnp.asarray(value)


def _dense(tree, ours, state, theirs):
    _set(tree, f"{ours}/kernel", _np(state[f"{theirs}.weight"]).T)
    if f"{theirs}.bias" in state:
        _set(tree, f"{ours}/bias", _np(state[f"{theirs}.bias"]))


def _norm_(tree, ours, state, theirs):
    _set(tree, f"{ours}/scale", _np(state[f"{theirs}.weight"]))
    if f"{theirs}.bias" in state:
        _set(tree, f"{ours}/bias", _np(state[f"{theirs}.bias"]))


def _embed(tree, ours, state, theirs):
    _set(tree, f"{ours}/embedding", _np(state[f"{theirs}.weight"]))


def convert_llama(state: Dict, num_layers: int,
                  tie_word_embeddings: bool = False) -> Dict:
    """HF LlamaForCausalLM state dict -> LlamaForCausalLM params."""
    p: Dict = {}
    _embed(p, "model/embed_tokens", state, "model.embed_tokens")
    for i in range(num_layers):
        hf = f"model.layers.{i}"
        ours = f"model/layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _dense(p, f"{ours}/self_attn/{proj}", state, f"{hf}.self_attn.{proj}")
        for proj in ("gate_proj", "up_proj", "down_proj"):
            _dense(p, f"{ours}/mlp/{proj}", state, f"{hf}.mlp.{proj}")
        _norm_(p, f"{ours}/input_layernorm", state, f"{hf}.input_layernorm")
        _norm_(p, f"{ours}/post_attention_layernorm", state,
               f"{hf}.post_attention_layernorm")
    _norm_(p, "model/norm", state, "model.norm")
    if not tie_word_embeddings and "lm_head.weight" in state:
        _dense(p, "lm_head", state, "lm_head")
    return p


def maybe_fuse_qkv(params: Dict, cfg) -> Dict:
    """Apply the fused-qkv layout conversion when cfg.fused_qkv is set
    (checkpoints store unfused q/k/v; see llama.fuse_qkv_params)."""
    if getattr(cfg, "fused_qkv", False):
        from .llama import fuse_qkv_params
        return fuse_qkv_params(params, cfg)
    return params


def convert_bert(state: Dict, num_layers: int, prefix: str = "bert",
                 heads=("qa_outputs", "classifier")) -> Dict:
    """HF BertFor* state dict -> BertFor* params (also RoBERTa with
    prefix="roberta")."""
    p: Dict = {}
    emb = f"{prefix}.embeddings"
    _embed(p, "bert/embeddings/word_embeddings", state, f"{emb}.word_embeddings")
    _embed(p, "bert/embeddings/position_embeddings", state,
           f"{emb}.position_embeddings")
    if f"{emb}.token_type_embeddings.weight" in state:
        _embed(p, "bert/embeddings/token_type_embeddings", state,
               f"{emb}.token_type_embeddings")
    _norm_(p, "bert/embeddings/layernorm", state, f"{emb}.LayerNorm")

    for i in range(num_layers):
        hf = f"{prefix}.encoder.layer.{i}"
        ours = f"bert/layer_{i}"
        for proj in ("query", "key", "value"):
            _dense(p, f"{ours}/attention_self/{proj}", state,
                   f"{hf}.attention.self.{proj}")
        _dense(p, f"{ours}/attention_output_dense", state,
               f"{hf}.attention.output.dense")
        _norm_(p, f"{ours}/attention_output_layernorm", state,
               f"{hf}.attention.output.LayerNorm")
        _dense(p, f"{ours}/intermediate_dense", state, f"{hf}.intermediate.dense")
        _dense(p, f"{ours}/output_dense", state, f"{hf}.output.dense")
        _norm_(p, f"{ours}/output_layernorm", state, f"{hf}.output.LayerNorm")

    if f"{prefix}.pooler.dense.weight" in state:
        _dense(p, "bert/pooler_dense", state, f"{prefix}.pooler.dense")
    for head in heads:
        if f"{head}.weight" in state:
            _dense(p, head, state, head)
    return p


def convert_mobilebert(state: Dict, num_layers: int,
                       num_ffn: int = 2) -> Dict:
    """HF MobileBertFor* state dict -> MobileBertFor* params."""
    p: Dict = {}
    emb = "mobilebert.embeddings"
    _embed(p, "mobilebert/embeddings/word_embeddings", state,
           f"{emb}.word_embeddings")
    _embed(p, "mobilebert/embeddings/position_embeddings", state,
           f"{emb}.position_embeddings")
    _embed(p, "mobilebert/embeddings/token_type_embeddings", state,
           f"{emb}.token_type_embeddings")
    _dense(p, "mobilebert/embeddings/embedding_transformation", state,
           f"{emb}.embedding_transformation")
    _norm_(p, "mobilebert/embeddings/norm", state, f"{emb}.LayerNorm")

    for i in range(num_layers):
        hf = f"mobilebert.encoder.layer.{i}"
        ours = f"mobilebert/layer_{i}"
        for proj in ("query", "key", "value"):
            _dense(p, f"{ours}/attention_self/{proj}", state,
                   f"{hf}.attention.self.{proj}")
        _dense(p, f"{ours}/attention_output_dense", state,
               f"{hf}.attention.output.dense")
        _norm_(p, f"{ours}/attention_output_norm", state,
               f"{hf}.attention.output.LayerNorm")
        _dense(p, f"{ours}/bottleneck_input_dense", state,
               f"{hf}.bottleneck.input.dense")
        _norm_(p, f"{ours}/bottleneck_input_norm", state,
               f"{hf}.bottleneck.input.LayerNorm")
        if f"{hf}.bottleneck.attention.dense.weight" in state:
            _dense(p, f"{ours}/bottleneck_attention_dense", state,
                   f"{hf}.bottleneck.attention.dense")
            _norm_(p, f"{ours}/bottleneck_attention_norm", state,
                   f"{hf}.bottleneck.attention.LayerNorm")
        for j in range(num_ffn - 1):
            _dense(p, f"{ours}/ffn_{j}_intermediate", state,
                   f"{hf}.ffn.{j}.intermediate.dense")
            _dense(p, f"{ours}/ffn_{j}_output", state,
                   f"{hf}.ffn.{j}.output.dense")
            _norm_(p, f"{ours}/ffn_{j}_norm", state,
                   f"{hf}.ffn.{j}.output.LayerNorm")
        _dense(p, f"{ours}/intermediate_dense", state, f"{hf}.intermediate.dense")
        _dense(p, f"{ours}/output_dense", state, f"{hf}.output.dense")
        _norm_(p, f"{ours}/output_norm", state, f"{hf}.output.LayerNorm")
        _dense(p, f"{ours}/output_bottleneck_dense", state,
               f"{hf}.output.bottleneck.dense")
        _norm_(p, f"{ours}/output_bottleneck_norm", state,
               f"{hf}.output.bottleneck.LayerNorm")

    for head in ("qa_outputs", "classifier"):
        if f"{head}.weight" in state:
            _dense(p, head, state, head)
    return p


def convert_distilbert(state: Dict, num_layers: int) -> Dict:
    """HF DistilBertFor* state dict -> BertFor* params (DistilBERT is our
    BertModel with type_vocab_size=0; HF names differ layer-wise)."""
    p: Dict = {}
    emb = "distilbert.embeddings"
    _embed(p, "bert/embeddings/word_embeddings", state, f"{emb}.word_embeddings")
    _embed(p, "bert/embeddings/position_embeddings", state,
           f"{emb}.position_embeddings")
    _norm_(p, "bert/embeddings/layernorm", state, f"{emb}.LayerNorm")

    for i in range(num_layers):
        hf = f"distilbert.transformer.layer.{i}"
        ours = f"bert/layer_{i}"
        _dense(p, f"{ours}/attention_self/query", state, f"{hf}.attention.q_lin")
        _dense(p, f"{ours}/attention_self/key", state, f"{hf}.attention.k_lin")
        _dense(p, f"{ours}/attention_self/value", state, f"{hf}.attention.v_lin")
        _dense(p, f"{ours}/attention_output_dense", state,
               f"{hf}.attention.out_lin")
        _norm_(p, f"{ours}/attention_output_layernorm", state,
               f"{hf}.sa_layer_norm")
        _dense(p, f"{ours}/intermediate_dense", state, f"{hf}.ffn.lin1")
        _dense(p, f"{ours}/output_dense", state, f"{hf}.ffn.lin2")
        _norm_(p, f"{ours}/output_layernorm", state, f"{hf}.output_layer_norm")

    for head in ("qa_outputs", "classifier", "pre_classifier"):
        if f"{head}.weight" in state:
            _dense(p, head, state, head)
    return p


def convert_phi3(state: Dict, num_layers: int, num_heads: int,
                 num_kv_heads: int, head_dim: int) -> Dict:
    """HF Phi3ForCausalLM -> LlamaForCausalLM params.

    Phi-3 is architecturally LLaMA with fused projections (reference patches
    its rotary for export, modules/pt2e/modeling_phi3.py; here no patching is
    needed — we split qkv_proj into q/k/v and gate_up_proj into gate/up and
    reuse the LLaMA module).
    """
    p: Dict = {}
    _embed(p, "model/embed_tokens", state, "model.embed_tokens")
    q_rows = num_heads * head_dim
    kv_rows = num_kv_heads * head_dim
    for i in range(num_layers):
        hf = f"model.layers.{i}"
        ours = f"model/layers_{i}"
        qkv = _np(state[f"{hf}.self_attn.qkv_proj.weight"])
        _set(p, f"{ours}/self_attn/q_proj/kernel", qkv[:q_rows].T)
        _set(p, f"{ours}/self_attn/k_proj/kernel",
             qkv[q_rows:q_rows + kv_rows].T)
        _set(p, f"{ours}/self_attn/v_proj/kernel",
             qkv[q_rows + kv_rows:].T)
        _dense(p, f"{ours}/self_attn/o_proj", state, f"{hf}.self_attn.o_proj")
        gate_up = _np(state[f"{hf}.mlp.gate_up_proj.weight"])
        inter = gate_up.shape[0] // 2
        _set(p, f"{ours}/mlp/gate_proj/kernel", gate_up[:inter].T)
        _set(p, f"{ours}/mlp/up_proj/kernel", gate_up[inter:].T)
        _dense(p, f"{ours}/mlp/down_proj", state, f"{hf}.mlp.down_proj")
        _norm_(p, f"{ours}/input_layernorm", state, f"{hf}.input_layernorm")
        _norm_(p, f"{ours}/post_attention_layernorm", state,
               f"{hf}.post_attention_layernorm")
    _norm_(p, "model/norm", state, "model.norm")
    if "lm_head.weight" in state:
        _dense(p, "lm_head", state, "lm_head")
    return p
