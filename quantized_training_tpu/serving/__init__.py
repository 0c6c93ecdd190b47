"""LLM serving: quantized KV cache (KIVI-style two-tier) and generation."""

from .kv_cache import (
    KVCacheConfig,
    QuantizedKVCache,
    init_cache,
    prefill_cache,
    append_to_cache,
    cache_kv,
    residual_causal_mask,
    pack_codes,
    unpack_codes,
)
from .generate import generate, fast_argmax
from .speculative import speculative_generate

__all__ = [
    "speculative_generate",
    "KVCacheConfig",
    "QuantizedKVCache",
    "init_cache",
    "prefill_cache",
    "append_to_cache",
    "cache_kv",
    "residual_causal_mask",
    "pack_codes",
    "unpack_codes",
    "generate",
    "fast_argmax",
]
