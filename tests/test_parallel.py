"""Distribution-layer tests on the 8-device virtual CPU mesh: sharding rules,
TP-sharded forward/train-step equivalence, KV-cache sharding."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.parallel import (
    DATA_AXIS, MODEL_AXIS, apply_sharding_rules, batch_sharding,
    create_mesh, shard_rules_llama,
)
from quantized_training_tpu.quantize import QConfig, QuantConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices"
)


def cpu_mesh(data, model):
    return create_mesh(data=data, model=model, devices=jax.devices("cpu"))


class TestShardingRules:
    def test_llama_param_specs(self):
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, None)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)))
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        mesh = cpu_mesh(2, 4)
        shardings = apply_sharding_rules(params, mesh, shard_rules_llama())

        def spec_of(path_regex):
            import flax
            flat = flax.traverse_util.flatten_dict(shardings)
            for k, v in flat.items():
                if re.search(path_regex, ".".join(k)):
                    return v.spec
            raise KeyError(path_regex)

        assert spec_of(r"q_proj.kernel") == P(None, MODEL_AXIS)
        assert spec_of(r"o_proj.kernel") == P(MODEL_AXIS, None)
        assert spec_of(r"down_proj.kernel") == P(MODEL_AXIS, None)
        assert spec_of(r"input_layernorm.scale") == P()

    def test_tp_forward_matches_single_device(self):
        """Sharded forward == unsharded forward (XLA inserts the collectives)."""
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, None)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (4, 8)))
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        ref = model.apply({"params": params}, ids)

        mesh = cpu_mesh(2, 4)
        shardings = apply_sharding_rules(params, mesh, shard_rules_llama())
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
        ids_s = jax.device_put(ids, batch_sharding(mesh))
        with mesh:
            out = jax.jit(lambda p, i: model.apply({"params": p}, i))(
                sharded, ids_s)
        a, b = np.asarray(out), np.asarray(ref)
        # per-shard bf16 rounding before the psum shifts values slightly
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
        np.testing.assert_allclose(a, b, rtol=8e-2, atol=8e-2)

    def test_quantized_tp_forward(self):
        """Direct-rounding quantization commutes with TP sharding."""
        qc = QuantConfig(global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1")).with_fusion(
            forward="gemm")
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, qc)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (4, 8)))
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        ref = model.apply({"params": params}, ids)

        mesh = cpu_mesh(1, 8)
        shardings = apply_sharding_rules(params, mesh, shard_rules_llama())
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
        with mesh:
            out = jax.jit(lambda p, i: model.apply({"params": p}, i))(
                sharded, ids)
        # Quantization amplifies per-shard reduction-order noise (values near
        # a posit step can flip), so assert strong agreement, not exactness.
        a, b = np.asarray(out), np.asarray(ref)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
        assert np.median(np.abs(a - b)) < 0.05

    def test_dryrun_entrypoint(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestTransformerRules:
    def test_bert_tp_forward(self):
        from quantized_training_tpu.models.bert import (
            BertConfig, BertForQuestionAnswering,
        )
        from quantized_training_tpu.parallel import shard_rules_transformer

        cfg = BertConfig.tiny()
        model = BertForQuestionAnswering(cfg, None)
        ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (4, 16)))
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        s_ref, e_ref = model.apply({"params": params}, ids)

        mesh = cpu_mesh(2, 4)
        shardings = apply_sharding_rules(
            params, mesh, shard_rules_transformer())
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
        with mesh:
            s, e = jax.jit(lambda p, i: model.apply({"params": p}, i))(
                sharded, ids)
        a, b = np.asarray(s), np.asarray(s_ref)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
