"""Sharding rules: regex path -> PartitionSpec, with Megatron-style tensor
parallelism for the model zoo.

Weights, activations, optimizer state, observer state, and the KV cache are
all plain pytrees, so one rule engine shards everything.  The LLaMA rules
implement the standard TP layout: column-parallel qkv/gate/up (output dim on
the model axis), row-parallel o_proj/down (input dim on the model axis), so
each decoder layer needs exactly one psum per block — XLA inserts it from the
shardings; no hand-written collectives.

Quantization interacts with TP cleanly because fake-quant scale state is
either scalar (replicated) or per-channel on the sharded axis (sharded with
its tensor): ``shard_rules_llama`` includes rules for the ``quant_state``
collection too.
"""

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = [
    "apply_sharding_rules",
    "shard_rules_llama",
    "shard_rules_llama_storage",
    "shard_rules_transformer",
    "shard_pytree",
    "batch_sharding",
]

Rules = Sequence[Tuple[str, P]]


def shard_rules_llama() -> Rules:
    """Tensor-parallel partition specs for LlamaForCausalLM params.

    Kernel layout is (in, out); column-parallel layers shard dim 1,
    row-parallel shard dim 0.
    """
    m = MODEL_AXIS
    return (
        # attention: qkv column-parallel, o row-parallel
        (r"\.(q_proj|k_proj|v_proj|qkv_proj)\.kernel$", P(None, m)),
        (r"\.o_proj\.kernel$", P(m, None)),
        # mlp: gate/up column-parallel, down row-parallel
        (r"\.(gate_proj|up_proj)\.kernel$", P(None, m)),
        (r"\.down_proj\.kernel$", P(m, None)),
        # embeddings / head: shard the hidden or vocab dim
        (r"embed_tokens\.embedding$", P(m, None)),
        (r"lm_head\.kernel$", P(None, m)),
        # norms replicated
        (r"\.scale$", P()),
        (r"\.bias$", P()),
        # per-channel fake-quant state follows its tensor's sharded axis when
        # ch_axis is the output dim; scalar state replicates
        (r"quant_state.*", P()),
        # fp KV cache: shard heads over the model axis, batch over data
        (r"cache_[kv]$", P(DATA_AXIS, None, m, None)),
        # KIVI quantized cache (QuantizedKVCache leaves, head-major layout):
        # lengths replicate; codes (B, KV, P*, D), k scales (B, KV, gP, D),
        # v scales (B, KV, P, gD) and fp residuals (B, KV, R, D) all shard
        # batch over data and kv-heads over model (the divisibility guard in
        # apply_sharding_rules drops an axis that doesn't divide, e.g. tiny
        # KV counts on wide meshes).
        # per-slot (B,) lengths shard with their slots; scalar lengths
        # (generate mode) have no dims and fall back to replicated
        (r"\.kivi\.(main_len|res_len)$", P(DATA_AXIS)),
        (r"\.kivi\.", P(DATA_AXIS, m, None, None)),
    )


def shard_rules_llama_storage(fmt: str = "posit8") -> Rules:
    """Megatron TP specs for the packed-weight ``storage`` collection
    (quantize/storage.py): codes shard exactly like the kernels they
    replaced — (in, out) layout, column-parallel output dim / row-parallel
    input dim; group qparams ((K/G, N) for the scale-carrying formats)
    shard with their codes."""
    m = MODEL_AXIS
    if fmt == "w8a8":
        # per-output-channel (N,) scales: shard with the output dim on
        # column-parallel layers, replicate on row-parallel (N unsharded)
        col_q, row_q = P(m), P()
    else:
        col_q, row_q = P(None, m), P(m, None)
    return (
        (r"\.(q_proj|k_proj|v_proj|qkv_proj|gate_proj|up_proj|lm_head)\.codes$",
         P(None, m)),
        (r"\.(o_proj|down_proj)\.codes$", P(m, None)),
        (r"\.(q_proj|k_proj|v_proj|qkv_proj|gate_proj|up_proj|lm_head)"
         r"\.(scales|zero_points)$", col_q),
        (r"\.(o_proj|down_proj)\.(scales|zero_points)$", row_q),
    )


def shard_rules_transformer() -> Rules:
    """Generic TP rules for the encoder models (BERT/MobileBERT/GPT-2/
    Whisper/ViT): attention q/k/v and FFN-up column-parallel, attention-out
    and FFN-down row-parallel, norms/embeddings replicated."""
    m = MODEL_AXIS
    return (
        (r"\.(query|key|value|q_proj|k_proj|v_proj|c_attn)\.kernel$", P(None, m)),
        (r"\.(attention_output_dense|out_proj|c_proj)\.kernel$", P(m, None)),
        (r"\.(intermediate_dense|fc1|mlp_c_fc|ffn_\d+_intermediate)\.kernel$",
         P(None, m)),
        (r"\.(output_dense|fc2|mlp_c_proj|ffn_\d+_output)\.kernel$", P(m, None)),
        (r"\.scale$", P()),
        (r"\.bias$", P()),
        (r"embedding$", P()),
    )


def _key_str(k) -> str:
    # DictKey -> .key, GetAttrKey (NamedTuple fields like kivi.k_codes)
    # -> .name, SequenceKey -> .idx
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _path_str(path) -> str:
    return ".".join(_key_str(k) for k in path)


def _axis_size(mesh: Mesh, axis) -> int:
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def apply_sharding_rules(
    tree, mesh: Mesh, rules: Rules, default: P = P()
):
    """NamedSharding pytree matching ``tree`` by regex rules (first match
    wins).  Axes the leaf doesn't have are dropped, and an axis whose mesh
    size doesn't divide the corresponding dim falls back to replicated for
    that dim (small head counts / scale-group dims on wide meshes)."""

    def resolve(path, leaf):
        p = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, p):
                ndim = getattr(leaf, "ndim", 0)
                shape = getattr(leaf, "shape", ())
                entries = list(spec)[:ndim]
                fixed = [
                    ax if (ax is None or shape[d] % _axis_size(mesh, ax) == 0)
                    else None
                    for d, ax in enumerate(entries)
                ]
                return NamedSharding(mesh, P(*fixed))
        return NamedSharding(mesh, default)

    return jax.tree_util.tree_map_with_path(resolve, tree)


def shard_pytree(tree, mesh: Mesh, rules: Rules):
    """Move a pytree onto the mesh with the given rules."""
    shardings = apply_sharding_rules(tree, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over the data axis, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))
