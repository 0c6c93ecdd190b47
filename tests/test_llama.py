"""LLaMA model tests: float/quantized paths, fusion ladder, calibration flow,
KV-cache decode consistency, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.quantize import QConfig, QuantConfig

CFG = LlamaConfig.tiny()


def make_model(qconfig=None):
    return LlamaForCausalLM(CFG, qconfig)


def init_inputs(batch=2, seq=8):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, CFG.vocab_size, (batch, seq)))


def posit8_qconfig(forward="gemm,residual,layernorm,activation,scaling"):
    # Paper mode: direct posit rounding, no scaling (reference
    # run_quantized_training.py passes bare "posit8_1").
    qc = QConfig.from_strs(activation="posit8_1", weight="posit8_1")
    return QuantConfig(global_qconfig=qc).with_fusion(forward=forward)


class TestForward:
    def test_float_forward(self):
        model = make_model()
        ids = init_inputs()
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        logits = model.apply(vars_, ids)
        assert logits.shape == (2, 8, CFG.vocab_size)
        assert logits.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_quantized_forward_differs_but_close(self):
        ids = init_inputs()
        fmodel = make_model()
        fvars = fmodel.init(jax.random.PRNGKey(0), ids)
        flogits = fmodel.apply(fvars, ids)

        qmodel = make_model(posit8_qconfig())
        qvars = qmodel.init(jax.random.PRNGKey(0), ids)
        # float params must be identical between the two models
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            fvars["params"], qvars["params"],
        )
        qlogits = qmodel.apply(qvars, ids)
        ours, ref = np.asarray(qlogits).ravel(), np.asarray(flogits).ravel()
        assert np.isfinite(ours).all()
        assert np.abs(ours - ref).max() > 0  # quantization actually happened
        corr = np.corrcoef(ours, ref)[0, 1]
        assert corr > 0.98  # posit8 forward tracks the float model

    def test_fusion_ladder_changes_outputs(self):
        """Walking the ladder (fewer quantized categories) changes logits and
        moves them toward the float model."""
        ids = init_inputs()
        fmodel = make_model()
        fvars = fmodel.init(jax.random.PRNGKey(0), ids)
        flogits = np.asarray(fmodel.apply(fvars, ids)).ravel()
        errs = []
        for fwd in ["gemm,residual,layernorm,activation,scaling", "gemm"]:
            model = make_model(posit8_qconfig(fwd))
            vars_ = model.init(jax.random.PRNGKey(0), ids)
            logits = np.asarray(model.apply(vars_, ids)).ravel()
            errs.append(np.abs(logits - flogits).mean())
        assert errs[1] < errs[0]  # more fusion -> closer to float

    def test_calibrate_then_freeze(self):
        ids = init_inputs()
        qc = QConfig.from_strs(
            activation="e4m3,qs=per_tensor_symmetric",
            weight="e4m3,qs=per_tensor_symmetric",
        )
        model = make_model(QuantConfig(global_qconfig=qc))
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        # calibration: observer on
        _, upd = model.apply(vars_, ids, mutable=["quant_state"])
        state1 = upd["quant_state"]
        vars_ = {**vars_, "quant_state": state1}
        # frozen eval: observer off, state unchanged
        logits = model.apply(vars_, ids)
        logits2 = model.apply(vars_, ids)
        np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))

    def test_mx_weights_group_affine(self):
        """Mixed config: MXINT6 weights + e4m3 activations resolves and runs."""
        qc = QConfig.from_strs(
            activation="e4m3,qs=per_tensor_symmetric",
            weight="int6,qs=microscaling,bs=32,ax=-1",
        )
        cfgq = QuantConfig(global_qconfig=qc)
        ids = init_inputs()
        model = make_model(cfgq)
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        logits, _ = model.apply(vars_, ids, mutable=["quant_state"])
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_module_name_scope_override(self):
        """lm_head can be overridden to stay unquantized (set_module_name)."""
        cfgq = posit8_qconfig().set_module_name("lm_head", None)
        ids = init_inputs()
        model = make_model(cfgq)
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        qs = vars_.get("quant_state", {})
        flat = flax.traverse_util.flatten_dict(qs) if qs else {}
        assert not any("lm_head" in "/".join(map(str, k)) for k in flat)


class TestKVCache:
    def test_decode_matches_full_forward(self):
        ids = init_inputs(batch=1, seq=6)
        model = make_model()
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        full = model.apply(vars_, ids)

        # prefill 4 tokens, then decode 2 one at a time
        prefill, cache_upd = model.apply(
            vars_, ids[:, :4], use_cache=True, cache_index=0, mutable=["cache"]
        )
        cache = cache_upd["cache"]
        np.testing.assert_allclose(
            np.asarray(prefill), np.asarray(full[:, :4]), rtol=2e-2, atol=2e-2
        )
        for t in range(4, 6):
            step_logits, cache_upd = model.apply(
                {**vars_, "cache": cache},
                ids[:, t : t + 1], use_cache=True, cache_index=t,
                mutable=["cache"],
            )
            cache = cache_upd["cache"]
            np.testing.assert_allclose(
                np.asarray(step_logits[:, 0]), np.asarray(full[:, t]),
                rtol=2e-2, atol=2e-2,
            )


class TestGradients:
    def test_grad_flows_through_quantized_model(self):
        ids = init_inputs()
        model = make_model(posit8_qconfig())
        vars_ = model.init(jax.random.PRNGKey(0), ids)

        def loss(params):
            logits, _ = model.apply(
                {**vars_, "params": params}, ids, mutable=["quant_state"]
            )
            return jnp.mean(jnp.square(logits))

        g = jax.grad(loss)(vars_["params"])
        norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(norms))
        assert sum(norms) > 0

    def test_error_quantization_changes_grads(self):
        ids = init_inputs()
        qc = QConfig.from_strs(
            activation="posit8_1,qs=per_tensor_symmetric",
            weight="posit8_1,qs=per_tensor_symmetric",
            error="e5m2,qs=per_tensor_symmetric",
        )
        base = QuantConfig(global_qconfig=qc)
        with_err = base.with_fusion(forward="gemm", backward="gemm")
        without = base.with_fusion(forward="gemm", backward=None)

        def grads(cfgq):
            model = make_model(cfgq)
            vars_ = model.init(jax.random.PRNGKey(0), ids)

            def loss(params):
                logits, _ = model.apply(
                    {**vars_, "params": params}, ids, mutable=["quant_state"]
                )
                return jnp.mean(jnp.square(logits))

            return jax.grad(loss)(vars_["params"])

        g1, g2 = grads(with_err), grads(without)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
