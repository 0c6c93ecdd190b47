"""LLaMA-family causal LM in flax, with quantization woven at every site the
reference annotates.

Written fresh for TPU (not a port of the HF fork the reference patches):
bf16 activations, f32 RoPE/softmax/norm statistics, GQA via einsum-friendly
reshapes, static-shape KV cache in a linen ``cache`` collection.  Quant sites
mirror the reference's annotator coverage (reference:
quantizer/xnnpack_quantizer_utils.py:85-505 and the quantizable attention at
modules/quantizable/modeling_llama.py): q/k/v/o and MLP projections (gemm),
the qk and av matmuls (gemm, per-input), attention scaling (scaling), softmax
(activation), RMSNorm inputs (layernorm), both residual adds (residual).

The model also runs full-precision when ``qconfig is None`` — same params.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from ..serving.kv_cache import KVCacheConfig
from .layers import QDense, QRMSNorm, QSoftmax, QuantMixin

__all__ = ["LlamaConfig", "LlamaForCausalLM", "LlamaModel",
           "fuse_qkv_params"]


def fuse_qkv_params(params, cfg) -> dict:
    """Convert an unfused param tree (q_proj/k_proj/v_proj) to the fused
    ``qkv_proj`` layout of ``LlamaConfig(fused_qkv=True)``.

    Column order is per-kv-head-interleaved: for kv head j the fused block
    is [q_{j·g..j·g+g-1} | k_j | v_j] (g = H // KV heads per group), so a
    model-axis shard owning whole kv heads owns contiguous fused columns.
    The fused GEMM computes bit-identical outputs to the three separate
    GEMMs (each output column's dot is unchanged)."""
    import copy

    H, KV, D = (cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim)
    group = H // KV

    def walk(node):
        if not isinstance(node, dict):
            return node
        if all(p in node for p in ("q_proj", "k_proj", "v_proj")):
            out = {k: walk(v) for k, v in node.items()
                   if k not in ("q_proj", "k_proj", "v_proj")}
            q = node["q_proj"]["kernel"]
            k = node["k_proj"]["kernel"]
            v = node["v_proj"]["kernel"]
            cin = q.shape[0]
            fused = jnp.concatenate([
                q.reshape(cin, KV, group * D),
                k.reshape(cin, KV, D),
                v.reshape(cin, KV, D),
            ], axis=-1).reshape(cin, KV * (group + 2) * D)
            out["qkv_proj"] = {"kernel": fused}
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(copy.copy(params))


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"
    # Optional KIVI-style quantized KV cache (serving); None = fp cache.
    kv_cache: Optional["KVCacheConfig"] = None
    # Route eligible attention through the Pallas flash kernel (quantization
    # hooks fused in).  Falls back to the naive path when the config needs
    # sites flash cannot host (posit softmax, scaling/softmax-input quant).
    use_flash_attention: bool = False
    # Route eligible KIVI decode steps through the fused dequant-attention
    # Pallas kernel (cache codes dequantized in VMEM; the dequantized K/V
    # never touch HBM).  Falls back to cache_kv + naive attention when the
    # cache is unquantized, a custom mask is passed, or attention sites are
    # themselves quantized.
    use_fused_kivi: bool = True
    # Fuse the q/k/v projections into ONE GEMM ("qkv_proj"): at decode the
    # three weight streams merge into a single (hidden, KV*(group+2)*D)
    # call — measured +13% on the qkvo GEMM at 7B decode (r04).  Column
    # layout is per-kv-head-interleaved ([q-group | k | v] per kv head), so
    # model-axis TP shards along whole kv-head blocks and the post-GEMM
    # split is shard-local (no resharding).  fuse_qkv_params() converts an
    # unfused checkpoint tree.
    fused_qkv: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Small config for tests / CPU smoke runs."""
        defaults = dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def llama2_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llama2_13b() -> "LlamaConfig":
        return LlamaConfig(hidden_size=5120, intermediate_size=13824,
                           num_hidden_layers=40, num_attention_heads=40)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """RoPE tables in float32: (..., seq, head_dim/2)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (HF convention: split halves).  x: (B, S, H, D)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


class LlamaAttention(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: Optional[jax.Array],
        positions: jax.Array,
        use_cache: bool = False,
        cache_index: Optional[jax.Array] = None,
        prompt_len: Optional[jax.Array] = None,
        decode_append: bool = False,
    ) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S, _ = hidden.shape
        H, KV, D = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

        dense = lambda feat, name, skip=False: QDense(
            feat, use_bias=False, dtype=dtype, qconfig=self.qconfig,
            skip_input_quant=skip, name=name
        )
        if cfg.fused_qkv:
            # Single fused GEMM, per-kv-head-interleaved columns
            # ([q-group | k | v] per kv head — see LlamaConfig.fused_qkv).
            group = H // KV
            fused = dense(KV * (group + 2) * D, "qkv_proj")(hidden)
            r = fused.reshape(B, S, KV, (group + 2) * D)
            q = r[..., :group * D].reshape(B, S, H, D)
            k = r[..., group * D:(group + 1) * D]
            v = r[..., (group + 1) * D:]
        else:
            # One rounding of the shared input feeds all three projections
            # when their specs agree (saves 2 full-tensor quantize passes
            # per layer; identical values — the sites would round the same
            # tensor).
            shared = self._shared_input_quant(
                hidden, ("q_proj", "k_proj", "v_proj"), "qkv_pre_process")
            hidden_qkv, skip = shared if shared else (hidden, False)
            q = dense(H * D, "q_proj", skip)(hidden_qkv).reshape(B, S, H, D)
            k = dense(KV * D, "k_proj", skip)(hidden_qkv).reshape(B, S, KV, D)
            v = dense(KV * D, "v_proj", skip)(hidden_qkv).reshape(B, S, KV, D)

        cos, sin = rope_cos_sin(positions, D, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if use_cache and cfg.kv_cache is not None:
            # KIVI two-tier cache: quantized main (prefill) + fp residual
            # (decode), reference llm_utils.py:295-596.
            from ..serving.kv_cache import (
                append_to_cache, cache_kv, init_cache, prefill_cache,
            )

            kcfg = cfg.kv_cache
            cache_var = self.variable(
                "cache", "kivi",
                lambda: init_cache(kcfg, B, KV, D, dtype))
            if S > 1 and not decode_append:
                # Prefill: attend over the raw K/V; store them quantized.
                # prompt_len zeroes padded slots so a fixed-shape padded
                # prefill stores identical cache content to a true-length one.
                cache_var.value = prefill_cache(
                    cache_var.value, kcfg, k, v, length=prompt_len)
            else:
                # Decode append: S == 1 (ordinary decode) or an S-token
                # verify block (speculative decoding, decode_append=True) —
                # all S tokens land in the fp residual; no promotion ever
                # happens at decode, so the caller can rewind by resetting
                # res_len (rejected slots are masked and overwritten).
                if cache_var.value.res_len.ndim == 1:
                    # continuous-batching mode: per-slot residual indices
                    assert S == 1, "per-slot engine decode is single-token"
                    from ..serving.kv_cache import append_per_slot
                    cache_var.value = append_per_slot(cache_var.value, k, v)
                else:
                    cache_var.value = append_to_cache(cache_var.value, k, v)

                c = cache_var.value
                per_slot = c.res_len.ndim == 1
                ml = c.main_len if per_slot else jnp.broadcast_to(
                    c.main_len[None], (B,))
                rl = c.res_len if per_slot else jnp.broadcast_to(
                    c.res_len[None], (B,))
                if S > 1:
                    # verify-block decode: multi-token causal mask over
                    # [main; residual] — query i sees residual slots
                    # r <= rl_before + i (its own slot and earlier)
                    from ..serving.kv_cache import residual_causal_mask
                    if attention_mask is None:
                        attention_mask = residual_causal_mask(
                            kcfg, B, S, c.main_len, c.res_len - S)
                elif (attention_mask is None and kcfg.sym_bits is not None
                      and self._int_kv_fused_eligible(kcfg, D)):
                    # Fused int-sym decode: per-token scales fold out of
                    # the (P, D) path; no zero-point machinery at all
                    # (ops/pallas/int_kv_attention.py — 2.1x the uint2
                    # KIVI kernel on chip, BENCH_KVRACE_r05).
                    from ..ops.pallas.int_kv_attention import (
                        int_kv_decode_attention,
                    )
                    ctx = int_kv_decode_attention(
                        q[:, 0], c.k_codes, c.k_scale,
                        c.v_codes, c.v_scale,
                        c.k_res.astype(dtype), c.v_res.astype(dtype),
                        ml, rl,
                        bits=kcfg.sym_bits, int_dots=False,
                        k_transposed=False,
                    )
                    ctx = ctx.reshape(B, 1, H * D)
                    return dense(cfg.hidden_size, "o_proj")(ctx)
                elif attention_mask is None and self._kivi_fused_eligible(kcfg, D):
                    # Fused dequant-attention: codes + scales + residual read
                    # directly, mask derived from the cache's own lengths
                    # (exact for any prompt length, scalar or per-slot).
                    from ..ops.pallas.kivi_attention import (
                        kivi_decode_attention,
                    )
                    ctx = kivi_decode_attention(
                        q[:, 0], c.k_codes, c.k_scale, c.k_zp,
                        c.v_codes, c.v_scale, c.v_zp,
                        c.k_res.astype(dtype), c.v_res.astype(dtype),
                        ml, rl,
                        bits_k=kcfg._pack_bits(kcfg.k_spec),
                        bits_v=kcfg._pack_bits(kcfg.v_spec),
                    )
                    ctx = ctx.reshape(B, 1, H * D)
                    return dense(cfg.hidden_size, "o_proj")(ctx)
                if attention_mask is None:
                    # Naive decode without an external mask: build it from
                    # the cache lengths (post-append: res slot r visible iff
                    # r < res_len, i.e. per_slot_mask with res_len - 1).
                    from ..serving.kv_cache import per_slot_mask
                    attention_mask = per_slot_mask(kcfg, ml, rl - 1)
                k, v = cache_kv(cache_var.value, kcfg, dtype)
        elif use_cache:
            # Static-shape full-precision decode cache.
            cache_k = self.variable(
                "cache", "cache_k",
                lambda: jnp.zeros((B, cfg.max_position_embeddings, KV, D), dtype))
            cache_v = self.variable(
                "cache", "cache_v",
                lambda: jnp.zeros((B, cfg.max_position_embeddings, KV, D), dtype))
            idx = cache_index if cache_index is not None else 0
            cache_k.value = jax.lax.dynamic_update_slice(
                cache_k.value, k, (0, idx, 0, 0))
            cache_v.value = jax.lax.dynamic_update_slice(
                cache_v.value, v, (0, idx, 0, 0))
            k, v = cache_k.value, cache_v.value

        # KIVI prefill may run flash: the cache write (prefill_cache) is
        # independent of attention, and causality alone excludes the padded
        # kv slots (they sit at positions >= prompt_len) for every real
        # query row; pad rows' outputs are never consumed.  This keeps the
        # (B, H, S, S) score tensor out of HBM on the serving prefill path.
        kivi_prefill = (use_cache and cfg.kv_cache is not None
                        and S > 1 and not decode_append)
        if self._flash_eligible(attention_mask, use_cache, S, D,
                                kivi_prefill):
            ctx, o_prequantized = self._flash_path(q, k, v)
        else:
            ctx = self._naive_path(
                q, k, v, attention_mask, use_cache, cache_index, B, S)
            o_prequantized = False
        ctx = ctx.reshape(B, S, H * D)
        return dense(cfg.hidden_size, "o_proj", o_prequantized)(ctx)

    # -- fused KIVI decode path ---------------------------------------------

    def _int_kv_fused_eligible(self, kcfg, D) -> bool:
        """Static gate for the fused int-sym decode kernel: config flag on,
        sym_bits cache, MXU-friendly head dim on TPU, and no quantization
        hooks on the attention matmuls / scaling / softmax."""
        cfg = self.config
        if not cfg.use_fused_kivi or kcfg.sym_bits is None:
            return False
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        if platform == "tpu" and D % 128 != 0:
            return False
        return self._attention_sites_clear()

    def _kivi_fused_eligible(self, kcfg, D) -> bool:
        """Static gate for the fused dequant-attention decode kernel.

        Requires: config flag on, both cache sides quantized in the KIVI
        group layout (K along tokens, V along features), MXU-friendly head
        dim on TPU, and no quantization hooks on the attention matmuls /
        scaling / softmax (those need the naive path's explicit sites)."""
        cfg = self.config
        if not cfg.use_fused_kivi:
            return False
        if kcfg.k_spec is None or kcfg.v_spec is None:
            return False
        # head-major cache layout (B, KV, T, D): K grouped along tokens
        # (axis 2), V along features (axis 3)
        if kcfg.k_spec.ch_axis != 2 or kcfg.v_spec.ch_axis != 3:
            return False
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        if platform == "tpu" and D % 128 != 0:
            return False
        return self._attention_sites_clear()

    def _attention_sites_clear(self) -> bool:
        """No quantization hooks on attention matmuls / scaling / softmax
        (those need the naive path's explicit sites)."""
        cfg_q = self._qconfig()
        if cfg_q is None:
            return True
        if cfg_q.posit_exp or cfg_q.posit_exp_shifted or cfg_q.posit_reciprocal:
            return False
        path = self._path_str
        sites = [
            cfg_q.activation_spec(path, "matmul", OpCategory.GEMM, 0),
            cfg_q.activation_spec(path, "matmul", OpCategory.GEMM, 1),
            cfg_q.activation_spec(path, "mul", OpCategory.SCALING, 0),
            cfg_q.activation_spec(path, "softmax", OpCategory.ACTIVATION, 0),
            cfg_q.error_spec(path, "matmul", OpCategory.GEMM, 0),
        ]
        return all(s is None for s in sites)

    # -- flash path ---------------------------------------------------------

    def _site_direct_dtype(self, op, category, index, hook=None):
        """dtype string if the site uses direct rounding (flash-fusable);
        False if the site needs machinery flash cannot host; None if off."""
        cfg_q = self._qconfig()
        if cfg_q is None:
            return None
        spec = cfg_q.activation_spec(self._path_str, op, category, index)
        if spec is None:
            return None
        if spec.qscheme is None and spec.outlier_threshold is None:
            return spec.dtype
        return False

    def _flash_eligible(self, attention_mask, use_cache, S, D,
                        kivi_prefill=False):
        cfg = self.config
        if not cfg.use_flash_attention or (use_cache and not kivi_prefill):
            return False
        if attention_mask is not None:
            return False
        if D % 128 != 0 or S % 128 != 0:
            return False
        cfg_q = self._qconfig()
        if cfg_q is None:
            return True
        sites = [
            self._site_direct_dtype("matmul", OpCategory.GEMM, 0),
            self._site_direct_dtype("matmul", OpCategory.GEMM, 1),
            self._site_direct_dtype("matmul", OpCategory.GEMM, 0, "av"),
            self._site_direct_dtype("matmul", OpCategory.GEMM, 1, "av"),
        ]
        if any(s is False for s in sites):
            return False
        # scaling / softmax-input quantization and posit softmax need the
        # naive path ("no fusion" ladder rungs).
        if cfg_q.posit_exp or cfg_q.posit_exp_shifted or cfg_q.posit_reciprocal:
            return False
        if cfg_q.activation_spec(self._path_str, "mul", OpCategory.SCALING, 0) is not None:
            return False
        if cfg_q.activation_spec(self._path_str, "softmax", OpCategory.ACTIVATION, 0) is not None:
            return False
        # backward error quantization on the attention matmuls: the flash
        # backward hosts it (err_qfn) when both input-index specs are the
        # same direct rounding; anything fancier needs the naive path's
        # explicit bwd_quantize sites.
        e0 = self._site_err_direct(0)
        e1 = self._site_err_direct(1)
        if e0 is False or e1 is False:
            return False
        if (e0 is not None or e1 is not None) and e0 != e1:
            return False
        return True

    def _site_err_direct(self, index):
        """Error-spec dtype for an attention-matmul input cotangent if it is
        a direct rounding (flash-hostable); False if the site needs
        machinery flash cannot host; None if off."""
        cfg_q = self._qconfig()
        if cfg_q is None:
            return None
        spec = cfg_q.error_spec(
            self._path_str, "matmul", OpCategory.GEMM, index)
        if spec is None:
            return None
        if spec.qscheme is None and spec.outlier_threshold is None:
            return spec.dtype
        return False

    def _flash_path(self, q, k, v):
        """Quantization-fused flash attention (q/k/v in (B, S, H, D)).

        Returns (context, o_prequantized): when the o_proj GEMM-input site
        is a direct rounding, the kernel quantizes its own output in the
        epilogue (no extra HBM pass) and o_proj skips its input quant."""
        from ..numerics import quantize_fn, quantize_fn_unit
        from ..ops.pallas.flash_attention import flash_attention

        qd = self._site_direct_dtype("matmul", OpCategory.GEMM, 0)
        kd = self._site_direct_dtype("matmul", OpCategory.GEMM, 1)
        pd = self._site_direct_dtype("matmul", OpCategory.GEMM, 0, "av")
        vd = self._site_direct_dtype("matmul", OpCategory.GEMM, 1, "av")
        ed = self._site_err_direct(0) or self._site_err_direct(1)
        od = None
        cfg_q = self._qconfig()
        if cfg_q is not None:
            ospec = cfg_q.activation_spec(
                f"{self._path_str}.o_proj", "linear", OpCategory.GEMM, 0)
            if (ospec is not None and ospec.qscheme is None
                    and ospec.outlier_threshold is None):
                od = ospec.dtype
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            q_qfn=quantize_fn(qd) if qd else None,
            k_qfn=quantize_fn(kd) if kd else None,
            # probs live in [0, 1]: the unit-specialized kernel (bit-equal
            # on that domain, exhaustively tested) is the O(S^2) hot path
            p_qfn=quantize_fn_unit(pd) if pd else None,
            v_qfn=quantize_fn(vd) if vd else None,
            out_qfn=quantize_fn(od) if od else None,
            err_qfn=quantize_fn(ed) if ed else None,
        )
        return out.transpose(0, 2, 1, 3), od is not None

    # -- naive path ---------------------------------------------------------

    def _naive_path(self, q, k, v, attention_mask, use_cache, cache_index,
                    B, S):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        H, KV, D = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

        # qk/av matmul input quantization runs *before* GQA expansion:
        # repeat duplicates values, so quantize(repeat(x)) == repeat(quantize)
        # at 1/rep the VPU work.
        qq = self.quant_input(q, "matmul", OpCategory.GEMM, 0)
        kk = self.quant_input(k, "matmul", OpCategory.GEMM, 1)
        vv = self.quant_input(v, "matmul", OpCategory.GEMM, 1,
                              hook="av_pre_process")

        # GQA: repeat kv heads.
        if kk.shape[2] != H:
            rep = H // kk.shape[2]
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)

        if attention_mask is None:
            attention_mask = causal_mask(B, S, kk.shape[1],
                                         cache_index if use_cache else 0)
        scores = jnp.einsum(
            "bshd,bthd->bhst", qq, kk, preferred_element_type=jnp.float32
        )
        # attention scaling (scaling category input quant on the scores).
        scale = jnp.asarray(1.0 / jnp.sqrt(D).astype(jnp.float32))
        scores = self.quant_mul(
            scores.astype(dtype), scale.astype(dtype)
        ).astype(jnp.float32)

        scores = scores + attention_mask.astype(jnp.float32)

        probs = QSoftmax(dtype=dtype, qconfig=self.qconfig, name="softmax")(
            scores.astype(dtype)
        )

        # av matmul: probs quantized here; v was quantized pre-expansion.
        pp = self.quant_input(probs, "matmul", OpCategory.GEMM, 0,
                              hook="av_pre_process")
        return jnp.einsum(
            "bhst,bthd->bshd", pp, vv, preferred_element_type=jnp.float32
        ).astype(dtype)


class LlamaMLP(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        dense = lambda feat, name, skip=False: QDense(
            feat, use_bias=False, dtype=dtype, qconfig=self.qconfig,
            skip_input_quant=skip, name=name
        )
        shared = self._shared_input_quant(
            x, ("gate_proj", "up_proj"), "gateup_pre_process")
        x, skip = shared if shared else (x, False)
        gate = dense(cfg.intermediate_size, "gate_proj", skip)(x)
        up = dense(cfg.intermediate_size, "up_proj", skip)(x)
        gate = self.quant_activation_input(gate, "silu")
        act = nn.silu(gate.astype(jnp.float32)).astype(jnp.dtype(cfg.dtype))
        # gate*up product is a scaling-category site.
        hidden = self.quant_mul(act, up)
        return dense(cfg.hidden_size, "down_proj")(hidden)


class LlamaDecoderLayer(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden, attention_mask, positions,
                 use_cache=False, cache_index=None, prompt_len=None,
                 decode_append=False):
        cfg = self.config
        normed = QRMSNorm(epsilon=cfg.rms_norm_eps, dtype=jnp.dtype(cfg.dtype),
                          qconfig=self.qconfig, name="input_layernorm")(hidden)
        attn_out = LlamaAttention(cfg, self.qconfig, name="self_attn")(
            normed, attention_mask, positions, use_cache, cache_index,
            prompt_len, decode_append,
        )
        hidden = self.quant_residual(hidden, attn_out, hook="attn_residual")

        normed = QRMSNorm(epsilon=cfg.rms_norm_eps, dtype=jnp.dtype(cfg.dtype),
                          qconfig=self.qconfig,
                          name="post_attention_layernorm")(hidden)
        mlp_out = LlamaMLP(cfg, self.qconfig, name="mlp")(normed)
        return self.quant_residual(hidden, mlp_out, hook="mlp_residual")


# Additive-mask fill value: the *bf16* minimum, like HF models use the
# compute dtype's min.  float32's min would overflow to -inf when cast to
# bf16, and quantizing -inf yields NaN (posit/FP8 semantics).
MASK_VALUE = float(jnp.finfo(jnp.bfloat16).min)


def causal_mask(
    batch: int, q_len: int, kv_len: int, q_offset=0, dtype=jnp.float32
) -> jax.Array:
    """Additive causal mask of shape (B, 1, q_len, kv_len)."""
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    kv_pos = jnp.arange(kv_len)[None, :]
    allowed = kv_pos <= q_pos
    mask = jnp.where(allowed, 0.0, MASK_VALUE).astype(dtype)
    return jnp.broadcast_to(mask[None, None], (batch, 1, q_len, kv_len))


class LlamaModel(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, positions=None,
                 use_cache=False, cache_index=None, prompt_len=None,
                 decode_append=False):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, S = input_ids.shape

        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         dtype=dtype, param_dtype=jnp.float32,
                         name="embed_tokens")
        hidden = embed(input_ids)

        if positions is None:
            start = cache_index if cache_index is not None else 0
            positions = jnp.arange(S)[None, :] + start
            positions = jnp.broadcast_to(positions, (B, S))

        if attention_mask is None:
            if use_cache and cfg.kv_cache is not None:
                if S > 1 and not decode_append:
                    if (cfg.use_flash_attention and cfg.head_dim % 128 == 0
                            and S % 128 == 0):
                        # Leave the mask None so the attention layer can run
                        # the flash kernel (causality fused in-kernel).  The
                        # pad mask is not needed for correctness: padded kv
                        # slots sit at positions >= prompt_len, so causality
                        # already hides them from every real query row, and
                        # pad rows' outputs are never consumed (the cache
                        # write zeroes pad slots via prompt_len separately).
                        pass
                    else:
                        # kivi prefill attends over the current tokens only;
                        # with a padded fixed-shape prefill, prompt_len also
                        # masks the pad slots.
                        attention_mask = causal_mask(B, S, S, 0)
                        if prompt_len is not None:
                            kv_pos = jnp.arange(S)[None, None, None, :]
                            attention_mask = jnp.where(
                                kv_pos < prompt_len, attention_mask,
                                MASK_VALUE)
                # S == 1 decode: leave the mask None — the attention layer
                # owns the cache and derives the exact visibility from its
                # main_len/res_len (scalar or per-slot), or fuses it into
                # the dequant-attention kernel.
            elif use_cache:
                kv_len = cfg.max_position_embeddings
                offset = cache_index if cache_index is not None else 0
                attention_mask = causal_mask(B, S, kv_len, offset)
                # Also mask not-yet-written cache slots beyond current pos.
                kv_pos = jnp.arange(kv_len)[None, None, None, :]
                valid = kv_pos <= (offset + S - 1)
                attention_mask = jnp.where(valid, attention_mask, MASK_VALUE)
            # else: leave None — attention builds its own causal mask on the
            # naive path, and a None mask is what makes the flash kernel
            # eligible (causality is fused into the kernel).

        for i in range(cfg.num_hidden_layers):
            hidden = LlamaDecoderLayer(
                cfg, self.qconfig, name=f"layers_{i}"
            )(hidden, attention_mask, positions, use_cache, cache_index,
              prompt_len, decode_append)

        return QRMSNorm(epsilon=cfg.rms_norm_eps, dtype=dtype,
                        qconfig=self.qconfig, name="norm")(hidden)


class LlamaForCausalLM(nn.Module, QuantMixin):
    config: LlamaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, positions=None,
                 use_cache=False, cache_index=None, prompt_len=None,
                 decode_append=False, last_logit_only=False):
        cfg = self.config
        hidden = LlamaModel(cfg, self.qconfig, name="model")(
            input_ids, attention_mask, positions, use_cache, cache_index,
            prompt_len, decode_append,
        )
        if last_logit_only:
            # Serving prefill: only the last position's logits are consumed
            # (the cache write is the prefill's real product).  Slicing the
            # hidden state before lm_head drops a (B, S, vocab) temp —
            # 1.05 GB bf16 at (8, 2048, 32000) — and the full-sequence
            # lm_head GEMM from the decode graph.
            hidden = hidden[:, -1:]
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["model"]["embed_tokens"]["embedding"]
            logits = hidden @ embed.T.astype(hidden.dtype)
        else:
            logits = QDense(cfg.vocab_size, use_bias=False,
                            dtype=jnp.dtype(cfg.dtype), qconfig=self.qconfig,
                            name="lm_head")(hidden)
        return logits.astype(jnp.float32)
