"""Mixture-of-Experts FFN with expert parallelism.

New capability with no reference counterpart (the graft north star names
``ep`` alongside dp/tp/pp/sp).  Switch-Transformer-style top-1 routing with
a fixed per-expert capacity, formulated densely (one-hot dispatch/combine
einsums) so every shape is static and the whole layer is one XLA program:

    dispatch: (tokens, E, C) one-hot  x  (tokens, d)  -> (E, C, d)
    experts : batched FFN over the leading E dim
    combine : (tokens, E, C) gate-weighted  x  (E, C, d) -> (tokens, d)

Expert parallelism is pure sharding: the expert weights carry a leading E
dim, the dispatched buffer is (E, C, d), and sharding E over a mesh axis
(``shard_rules_moe``) makes XLA insert exactly one all-to-all pair around
the expert compute — no hand-written collectives (tested: EP forward equals
the single-device forward on the virtual 8-device mesh).

Quantization composes: the expert FFN uses batched kernels fake-quantized
through the same QuantConfig sites as QDense (gemm category), so MoE layers
ride the existing posit8/fp8 ladders.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from jax.sharding import PartitionSpec as P

from ..quantize.config import OpCategory, QuantConfig
from .layers import FakeQuant, QuantMixin

__all__ = ["QMoEFFN", "shard_rules_moe", "EXPERT_AXIS"]

EXPERT_AXIS = "expert"


def shard_rules_moe():
    """Partition specs for QMoEFFN params: experts shard over the expert
    axis; the router replicates."""
    return (
        (r"(?:^|\.)(w_in|w_out)$", P(EXPERT_AXIS, None, None)),
        (r"router", P()),
    )


class QMoEFFN(nn.Module, QuantMixin):
    """Top-1 (switch) MoE FFN: x (B, S, d) -> (B, S, d)."""

    num_experts: int
    ffn_dim: int
    capacity_factor: float = 1.25
    dtype: Any = jnp.bfloat16
    qconfig: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, S, d = x.shape
        E, F = self.num_experts, self.ffn_dim
        T = B * S
        C = max(1, int(self.capacity_factor * T / E))
        xt = x.reshape(T, d)

        # --- router (f32 for a stable softmax; replicated) ------------------
        router = self.param(
            "router", nn.initializers.lecun_normal(), (d, E), jnp.float32)
        logits = xt.astype(jnp.float32) @ router          # (T, E)
        probs = jax.nn.softmax(logits, axis=-1)
        expert_idx = jnp.argmax(probs, axis=-1)           # (T,)
        gate = jnp.take_along_axis(
            probs, expert_idx[:, None], axis=-1)[:, 0]    # (T,)

        # --- capacity-limited one-hot dispatch ------------------------------
        onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)  # (T, E)
        # position of each token within its expert's queue
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0            # (T, E)
        keep = (pos >= 0) & (pos < C)
        disp = onehot * keep                                        # (T, E)
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), C,
                                dtype=jnp.float32)                  # (T,E,C)
        dispatch = disp[..., None] * pos_oh                         # (T,E,C)
        combine = dispatch * gate[:, None, None]

        # --- expert compute on the (E, C, d) buffer -------------------------
        buf = jnp.einsum("tec,td->ecd", dispatch,
                         xt.astype(jnp.float32)).astype(self.dtype)
        w_in = self.param(
            "w_in", nn.initializers.lecun_normal(), (E, d, F), jnp.float32)
        w_out = self.param(
            "w_out", nn.initializers.lecun_normal(), (E, F, d), jnp.float32)
        # gemm-site quantization (same ladder sites as QDense)
        buf = self.quant_input(buf, "linear", OpCategory.GEMM, 0)
        w_in_q = self._quant_w(w_in.astype(self.dtype), "w_in_fake_quant")
        h = jnp.einsum("ecd,edf->ecf", buf, w_in_q,
                       preferred_element_type=jnp.float32)
        h = jax.nn.silu(h).astype(self.dtype)
        h = self.quant_input(h, "linear", OpCategory.GEMM, 0,
                             hook="expert_out")
        w_out_q = self._quant_w(w_out.astype(self.dtype), "w_out_fake_quant")
        out_buf = jnp.einsum("ecf,efd->ecd", h, w_out_q,
                             preferred_element_type=jnp.float32)

        # --- combine back to token order ------------------------------------
        y = jnp.einsum("tec,ecd->td", combine, out_buf)
        return y.astype(x.dtype).reshape(B, S, d)

    def _quant_w(self, w, name):
        cfg = self._qconfig()
        if cfg is None:
            return w
        spec = cfg.weight_spec(self._path_str, "linear")
        if spec is None:
            return w
        return FakeQuant(spec, record_histogram=cfg.record_histogram,
                         name=name)(w)
