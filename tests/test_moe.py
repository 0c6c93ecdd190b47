"""MoE FFN with expert parallelism (models/moe.py): routing semantics,
quantized smoke, and EP-sharded == single-device on the 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_training_tpu.models.moe import (
    EXPERT_AXIS, QMoEFFN, shard_rules_moe,
)
from quantized_training_tpu.parallel import apply_sharding_rules

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices"
)


def make(num_experts=8, d=16, ffn=32, qconfig=None, cap=4.0):
    model = QMoEFFN(num_experts=num_experts, ffn_dim=ffn,
                    capacity_factor=cap, qconfig=qconfig)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, d)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


class TestMoE:
    def test_top1_routing_matches_manual(self):
        """With ample capacity, output = gate * expert_fn(token) for the
        argmax expert of each token."""
        model, params, x = make()
        out = model.apply({"params": params}, x)
        B, S, d = x.shape
        xt = np.asarray(x.reshape(-1, d), np.float32)
        router = np.asarray(params["router"])
        logits = xt @ router
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        idx = probs.argmax(-1)
        gate = probs[np.arange(len(idx)), idx]
        w_in = np.asarray(params["w_in"]); w_out = np.asarray(params["w_out"])

        def silu(v):
            return v / (1 + np.exp(-v))

        ref = np.stack([
            gate[t] * (silu((xt[t].astype(np.float32).astype("bfloat16")
                             .astype(np.float32) @ w_in[e]))
                       .astype("bfloat16").astype(np.float32) @ w_out[e])
            for t, e in enumerate(idx)
        ])
        got = np.asarray(out.reshape(-1, d), np.float32)
        np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)

    def test_capacity_drops_overflow_tokens(self):
        """capacity_factor small enough that some tokens are dropped: their
        output rows are exactly zero (residual connections carry them)."""
        model, params, x = make(num_experts=2, cap=0.25)
        out = np.asarray(model.apply({"params": params}, x).reshape(-1, 16))
        zero_rows = np.all(out == 0.0, axis=1).sum()
        assert zero_rows > 0  # overflow happened and was dropped cleanly

    def test_quantized_smoke_and_grad(self):
        from quantized_training_tpu.quantize import QConfig, QuantConfig
        qc = QuantConfig(global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1")).with_fusion(
            forward="gemm")
        model, params, x = make(qconfig=qc)
        out = model.apply({"params": params}, x)
        assert bool(jnp.all(jnp.isfinite(out)))

        def loss(p):
            return jnp.mean(jnp.square(
                model.apply({"params": p}, x).astype(jnp.float32)))

        g = jax.grad(loss)(params)
        total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0

    def test_expert_parallel_matches_single_device(self):
        """Experts sharded over an 8-way expert axis: same outputs, with XLA
        inserting the dispatch/combine collectives."""
        model, params, x = make(num_experts=8)
        ref = model.apply({"params": params}, x)

        mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), (EXPERT_AXIS,))
        shardings = apply_sharding_rules(params, mesh, shard_rules_moe())
        p_sh = jax.tree_util.tree_map(jax.device_put, params, shardings)
        x_sh = jax.device_put(x, NamedSharding(mesh, P()))
        with mesh:
            out = jax.jit(lambda p, x: model.apply({"params": p}, x))(
                p_sh, x_sh)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)
        # the expert weights really are sharded
        leaf = jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(lambda v: v.sharding, p_sh))
        w_in_spec = [s.spec for path, s in leaf
                     if "w_in" in str(path)][0]
        assert w_in_spec[0] == EXPERT_AXIS
