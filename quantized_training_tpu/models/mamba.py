"""Mamba (selective state space) language model with quantization sites
(reference: the Mamba compile fixture, test/test_codegen.py:728-755).

TPU-native design: the selective-scan recurrence h_t = dA_t h_{t-1} + dBx_t
is a first-order linear recurrence, computed here with
``jax.lax.associative_scan`` (log-depth, XLA-parallel) instead of the
sequential loop of the HF slow path — same math, verified against
transformers' MambaForCausalLM output.

Quant sites: in/x/dt/out projections (gemm), conv input (gemm), silu gates
(activation), gating product (scaling), RMSNorm input (layernorm), residual
adds (residual).
"""

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quantize.config import OpCategory, QuantConfig
from .layers import QDense, QRMSNorm, QuantMixin

__all__ = ["MambaConfig", "MambaForCausalLM", "convert_mamba"]


@dataclass(frozen=True)
class MambaConfig:
    vocab_size: int = 50280
    hidden_size: int = 768
    state_size: int = 16
    num_hidden_layers: int = 24
    intermediate_size: int = 1536
    conv_kernel: int = 4
    time_step_rank: int = 48
    layer_norm_epsilon: float = 1e-5
    dtype: str = "float32"   # SSM dynamics are precision-sensitive

    @staticmethod
    def tiny(**kw) -> "MambaConfig":
        d = dict(vocab_size=128, hidden_size=32, state_size=8,
                 num_hidden_layers=2, intermediate_size=64,
                 conv_kernel=4, time_step_rank=4)
        d.update(kw)
        return MambaConfig(**d)


class MambaMixer(nn.Module, QuantMixin):
    config: MambaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B_, L, H = hidden.shape
        E, N, R, K = (cfg.intermediate_size, cfg.state_size,
                      cfg.time_step_rank, cfg.conv_kernel)

        proj = QDense(2 * E, use_bias=False, dtype=dtype,
                      qconfig=self.qconfig, name="in_proj")(hidden)
        x, z = jnp.split(proj, 2, axis=-1)

        # causal depthwise conv along L (per-channel kernel K).
        conv_w = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (K, E), jnp.float32).astype(dtype)
        conv_b = self.param("conv_bias", nn.initializers.zeros_init(), (E,),
                            jnp.float32).astype(dtype)
        x = self.quant_input(x, "conv1d", OpCategory.GEMM, 0)
        xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
        x = sum(xp[:, i:i + L] * conv_w[i] for i in range(K)) + conv_b
        x = self.quant_activation_input(x, "silu")
        x = jax.nn.silu(x.astype(jnp.float32)).astype(dtype)

        ssm = QDense(R + 2 * N, use_bias=False, dtype=dtype,
                     qconfig=self.qconfig, name="x_proj")(x)
        dt_raw, Bm, Cm = jnp.split(ssm, [R, R + N], axis=-1)
        dt = QDense(E, dtype=dtype, qconfig=self.qconfig,
                    name="dt_proj")(dt_raw)
        dt = jax.nn.softplus(dt.astype(jnp.float32))          # (B, L, E)

        A_log = self.param("A_log", nn.initializers.zeros_init(), (E, N),
                           jnp.float32)
        D = self.param("D", nn.initializers.ones_init(), (E,), jnp.float32)
        A = -jnp.exp(A_log)                                    # (E, N)

        dA = jnp.exp(dt[..., None] * A[None, None])            # (B, L, E, N)
        dBx = (dt[..., None] * Bm[:, :, None, :].astype(jnp.float32)
               * x[..., None].astype(jnp.float32))             # (B, L, E, N)

        # First-order linear recurrence via associative scan over L.
        def combine(left, right):
            a1, b1 = left
            a2, b2 = right
            return a1 * a2, a2 * b1 + b2

        _, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
        y = jnp.einsum("blen,bln->ble", h, Cm.astype(jnp.float32))
        y = y + D[None, None] * x.astype(jnp.float32)
        z = self.quant_activation_input(z, "silu_gate")
        y = self.quant_mul(
            y.astype(dtype), jax.nn.silu(z.astype(jnp.float32)).astype(dtype))
        return QDense(H, use_bias=False, dtype=dtype, qconfig=self.qconfig,
                      name="out_proj")(y)


class MambaForCausalLM(nn.Module, QuantMixin):
    config: MambaConfig
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        hidden = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                          param_dtype=jnp.float32, name="embeddings")(
            input_ids)
        for i in range(cfg.num_hidden_layers):
            normed = QRMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=dtype,
                              qconfig=self.qconfig, name=f"norm_{i}")(hidden)
            mixed = MambaMixer(cfg, self.qconfig, name=f"mixer_{i}")(normed)
            hidden = self.quant_residual(hidden, mixed, hook=f"residual_{i}")
        hidden = QRMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=dtype,
                          qconfig=self.qconfig, name="norm_f")(hidden)
        return QDense(cfg.vocab_size, use_bias=False, dtype=dtype,
                      qconfig=self.qconfig, name="lm_head")(
            hidden).astype(jnp.float32)


def convert_mamba(state: Dict, num_layers: int) -> Dict:
    """HF MambaForCausalLM state dict -> our params."""
    import numpy as np

    def np_(t):
        if hasattr(t, "detach"):
            return t.detach().cpu().float().numpy()
        return np.asarray(t)

    p: Dict = {}

    def set_(path, value):
        node = p
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = jnp.asarray(value)

    set_("embeddings/embedding", np_(state["backbone.embeddings.weight"]))
    for i in range(num_layers):
        hf = f"backbone.layers.{i}"
        set_(f"norm_{i}/scale", np_(state[f"{hf}.norm.weight"]))
        mx = f"mixer_{i}"
        set_(f"{mx}/in_proj/kernel", np_(state[f"{hf}.mixer.in_proj.weight"]).T)
        set_(f"{mx}/x_proj/kernel", np_(state[f"{hf}.mixer.x_proj.weight"]).T)
        set_(f"{mx}/dt_proj/kernel", np_(state[f"{hf}.mixer.dt_proj.weight"]).T)
        set_(f"{mx}/dt_proj/bias", np_(state[f"{hf}.mixer.dt_proj.bias"]))
        set_(f"{mx}/out_proj/kernel", np_(state[f"{hf}.mixer.out_proj.weight"]).T)
        # torch conv1d weight (E, 1, K) -> (K, E)
        set_(f"{mx}/conv_kernel",
             np_(state[f"{hf}.mixer.conv1d.weight"])[:, 0, :].T)
        set_(f"{mx}/conv_bias", np_(state[f"{hf}.mixer.conv1d.bias"]))
        set_(f"{mx}/A_log", np_(state[f"{hf}.mixer.A_log"]))
        set_(f"{mx}/D", np_(state[f"{hf}.mixer.D"]))
    set_("norm_f/scale", np_(state["backbone.norm_f.weight"]))
    set_("lm_head/kernel", np_(state["lm_head.weight"]).T)
    return p
