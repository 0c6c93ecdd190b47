"""Training-layer tests: QAT train steps, LoRA-by-config, checkpointing,
exponent histograms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax
import optax

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.models.bert import (
    BertConfig, BertForQuestionAnswering,
)
from quantized_training_tpu.quantize import QConfig, QuantConfig
from quantized_training_tpu.training.trainer import (
    TrainState, causal_lm_loss, make_train_step, qa_loss,
    save_checkpoint, restore_checkpoint,
)


def qat_config():
    return QuantConfig(
        global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1",
            error="e5m2,qs=per_tensor_symmetric,qmax=57344",
        )
    ).with_fusion(forward="gemm", backward="gemm")


class TestTrainStep:
    def test_loss_decreases_llama(self):
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, qat_config())
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 16)))
        variables = model.init(jax.random.PRNGKey(0), ids)
        tx = optax.adam(1e-2)
        state = TrainState.create(model, variables, tx)
        step = make_train_step(
            model, tx, lambda logits, batch: causal_lm_loss(logits, batch))
        batch = {"input_ids": ids}
        losses = []
        for _ in range(8):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8

    def test_qa_train_step(self):
        cfg = BertConfig.tiny()
        model = BertForQuestionAnswering(cfg, qat_config())
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, 256, (4, 16)))
        batch = {
            "input_ids": ids,
            "start_positions": jnp.asarray(rng.integers(0, 16, (4,))),
            "end_positions": jnp.asarray(rng.integers(0, 16, (4,))),
        }
        variables = model.init(jax.random.PRNGKey(0), ids)
        tx = optax.adam(1e-2)
        state = TrainState.create(model, variables, tx)
        step = make_train_step(model, tx, qa_loss)
        losses = []
        for _ in range(6):
            state, loss = step(state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestLoRA:
    def test_lora_params_created_and_trained(self):
        cfg = LlamaConfig.tiny()
        qc = qat_config().with_lora(
            rank=4, targets=(r"\.(q_proj|v_proj)$",))
        model = LlamaForCausalLM(cfg, qc)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)))
        variables = model.init(jax.random.PRNGKey(0), ids)
        flat = flax.traverse_util.flatten_dict(variables["params"])
        lora_keys = [k for k in flat if "lora_a" in k or "lora_b" in k]
        assert len(lora_keys) == 2 * 2 * cfg.num_hidden_layers  # a+b per q,v
        assert not any("k_proj" in "/".join(k) for k in lora_keys)

        # lora_b starts zero -> merged == base weights -> same logits as
        # the lora-free quantized model
        base = LlamaForCausalLM(cfg, qat_config())
        base_vars = base.init(jax.random.PRNGKey(0), ids)
        l1 = model.apply(variables, ids)
        l2 = base.apply(base_vars, ids)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_lora_only_training(self):
        """Freeze base params, train only LoRA (optax.masked)."""
        cfg = LlamaConfig.tiny()
        qc = qat_config().with_lora(rank=4, targets=(r"\.q_proj$",))
        model = LlamaForCausalLM(cfg, qc)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, (2, 8)))
        variables = model.init(jax.random.PRNGKey(0), ids)

        def is_lora(path_tuple):
            return any("lora" in str(p) for p in path_tuple)

        labels = flax.traverse_util.unflatten_dict({
            k: ("lora" if is_lora(k) else "frozen") for k in
            flax.traverse_util.flatten_dict(variables["params"])
        })
        tx = optax.multi_transform(
            {"lora": optax.adam(1e-2), "frozen": optax.set_to_zero()},
            param_labels=labels)
        state = TrainState.create(model, variables, tx)
        step = make_train_step(
            model, tx, lambda logits, batch: causal_lm_loss(logits, batch))
        orig = jax.tree_util.tree_leaves(state.params)
        state2, _ = step(state, {"input_ids": ids})
        # base weights unchanged, lora weights changed
        flat0 = flax.traverse_util.flatten_dict(state.params)
        flat1 = flax.traverse_util.flatten_dict(state2.params)
        changed = {k: not np.array_equal(np.asarray(flat0[k]),
                                         np.asarray(flat1[k]))
                   for k in flat0}
        # B=0 at init, so the first step's gradient reaches only lora_b
        assert any(v for k, v in changed.items() if "lora_b" in k)
        assert not any(v for k, v in changed.items() if "lora" not in "/".join(map(str, k)))


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, qat_config())
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 8)))
        variables = model.init(jax.random.PRNGKey(0), ids)
        tx = optax.adam(1e-3)
        state = TrainState.create(model, variables, tx)
        step = make_train_step(
            model, tx, lambda logits, batch: causal_lm_loss(logits, batch))
        state, _ = step(state, {"input_ids": ids})

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state)
        fresh = TrainState.create(model, variables, tx)
        restored = restore_checkpoint(path, fresh)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params, restored.params)
        assert int(restored.step) == 1


class TestHistograms:
    def test_exponent_histogram_counts(self):
        from quantized_training_tpu.utils.histogram import (
            exponent_histogram, histogram_summary)
        x = jnp.asarray([0.0, 1.0, 2.0, 0.5, 1e30, jnp.inf, jnp.nan])
        h = np.asarray(exponent_histogram(x))
        assert h.sum() == 4  # zero/inf/nan excluded
        s = histogram_summary(h)
        assert s["min_exp"] == -1.0 and s["max_exp"] == 99.0

    def test_model_records_histograms(self):
        cfg = LlamaConfig.tiny()
        qc = QuantConfig(
            global_qconfig=QConfig.from_strs(activation="posit8_1")
        ).with_fusion(forward="gemm").with_histograms()
        model = LlamaForCausalLM(cfg, qc)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)))
        variables = model.init(jax.random.PRNGKey(0), ids)
        _, upd = model.apply(
            variables, ids, mutable=["quant_histogram"])
        leaves = jax.tree_util.tree_leaves(upd["quant_histogram"])
        assert len(leaves) > 0
        assert all(float(jnp.sum(l)) > 0 for l in leaves)


class TestQConvBn:
    """In-training BN folding (reference modules/qat/conv_fused.py)."""

    def _data(self, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32)

    def test_eval_equals_folded_conv(self):
        """After training steps, eval-mode QConvBn(x) == conv with the
        folded weight + bias correction (the deployment identity)."""
        from quantized_training_tpu.models.layers import QConvBn
        import numpy as np

        m = QConvBn(8, (3, 3))
        x = self._data()
        vars_ = m.init(jax.random.PRNGKey(0), x, train=True)
        # run a few train-mode passes so running stats move off init
        bs = vars_["batch_stats"]
        for i in range(3):
            _, upd = m.apply({"params": vars_["params"], "batch_stats": bs},
                             self._data(i), train=True,
                             mutable=["batch_stats"])
            bs = upd["batch_stats"]

        out = m.apply({"params": vars_["params"], "batch_stats": bs}, x)

        p = vars_["params"]
        scale = np.asarray(p["scale"]) / np.sqrt(np.asarray(bs["var"]) + 1e-5)
        w_fold = jnp.asarray(
            np.asarray(p["kernel"]) * scale[None, None, None, :],
            jnp.bfloat16)
        ref = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w_fold, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = ref + jnp.asarray(
            np.asarray(p["bias"]) - np.asarray(bs["mean"]) * scale,
            jnp.float32)[None, None, None, :]
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref.astype(jnp.bfloat16),
                                                    np.float32),
            rtol=0, atol=1e-2)

    def test_quantized_weight_is_folded_weight(self):
        """The fake-quantized tensor must be the *scaled* weight: with a
        weight spec, training output changes iff quantize(w*scale) != w*scale
        — checked by comparing against manual recomputation."""
        from quantized_training_tpu.models.layers import QConvBn
        from quantized_training_tpu.numerics import quantize_fn
        import numpy as np

        qc = QuantConfig(global_qconfig=QConfig.from_strs(weight="posit8_1"))
        m = QConvBn(8, (3, 3), qconfig=qc)
        x = self._data()
        vars_ = m.init(jax.random.PRNGKey(1), x, train=True)
        p, bs = vars_["params"], vars_["batch_stats"]
        out = m.apply({"params": p, "batch_stats": bs}, x)

        scale = np.asarray(p["scale"]) / np.sqrt(np.asarray(bs["var"]) + 1e-5)
        w_scaled = jnp.asarray(
            np.asarray(p["kernel"]) * scale[None, None, None, :], jnp.bfloat16)
        wq = quantize_fn("posit8_1")(w_scaled)
        ref = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = ref + jnp.asarray(
            np.asarray(p["bias"]) - np.asarray(bs["mean"]) * scale,
            jnp.float32)[None, None, None, :]
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(ref.astype(jnp.bfloat16), np.float32),
            rtol=0, atol=1e-2)

    def test_train_step_gradients_and_stats(self):
        """QAT training through QConvBn: grads flow to kernel/scale/bias and
        running stats update."""
        from quantized_training_tpu.models.layers import QConvBn
        import numpy as np
        import optax

        qc = QuantConfig(global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1"))
        m = QConvBn(8, (3, 3), qconfig=qc)
        x = self._data(2)
        vars_ = m.init(jax.random.PRNGKey(2), x, train=True)
        params, bs = vars_["params"], vars_["batch_stats"]
        tx = optax.sgd(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, bs, opt):
            def loss_fn(p):
                y, upd = m.apply({"params": p, "batch_stats": bs}, x,
                                 train=True, mutable=["batch_stats"])
                return jnp.mean(jnp.square(y.astype(jnp.float32))), upd
            (loss, upd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), upd["batch_stats"], opt, loss, grads

        losses = []
        for _ in range(4):
            params, bs, opt, loss, grads = step(params, bs, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.any(g != 0)) for g in flat)
        assert not np.allclose(np.asarray(bs["mean"]), 0.0)


class TestShardedCheckpoint:
    """orbax save/restore must preserve NamedShardings across the round trip
    (multi-host resume: the restored state can continue pjit training with
    no resharding migration)."""

    @pytest.mark.skipif(len(jax.devices("cpu")) < 8,
                        reason="needs 8 virtual devices")
    def test_tp_sharded_roundtrip(self, tmp_path):
        import optax
        from quantized_training_tpu.models import (
            LlamaConfig, LlamaForCausalLM,
        )
        from quantized_training_tpu.parallel import (
            apply_sharding_rules, create_mesh, shard_rules_llama,
        )

        mesh = create_mesh(data=2, model=4, devices=jax.devices("cpu"))
        model = LlamaForCausalLM(LlamaConfig.tiny(), None)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32))
        shardings = apply_sharding_rules(
            variables["params"], mesh, shard_rules_llama())
        params = jax.tree_util.tree_map(
            jax.device_put, variables["params"], shardings)
        tx = optax.adamw(1e-4)
        state = TrainState(params, tx.init(params), {},
                           jnp.zeros((), jnp.int32))

        path = str(tmp_path / "ck")
        save_checkpoint(path, state)
        restored = restore_checkpoint(path, state)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            assert a.sharding == b.sharding
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
