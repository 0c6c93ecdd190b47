"""Activation smoothing (quantize/smooth.py): exact in full precision,
and it reduces activation-quantization error on outlier channels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.quantize import QConfig, QuantConfig
from quantized_training_tpu.quantize.smooth import (
    awq_search_llama, calibrate_llama_amax, smooth_llama, smoothing_scales,
)


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, None)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (2, 16)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    # manufacture an activation outlier channel: 40x one norm gain
    params = jax.device_get(variables["params"])
    g = params["model"]["layers_0"]["input_layernorm"]["scale"]
    params["model"]["layers_0"]["input_layernorm"]["scale"] = \
        np.asarray(g).copy()
    params["model"]["layers_0"]["input_layernorm"]["scale"][7] *= 40.0
    return cfg, model, {"params": params}, ids


class TestSmoothing:
    def test_scales_balance_act_and_weight(self):
        s = smoothing_scales(jnp.asarray([100.0, 1.0, 0.0]),
                             jnp.asarray([1.0, 1.0, 1.0]), alpha=0.5)
        assert float(s[0]) == pytest.approx(10.0, rel=1e-4)
        assert float(s[1]) == pytest.approx(1.0, rel=1e-4)
        assert float(s[2]) > 0  # dead channel clamped, not zero/inf

    def test_tensor_level_error_reduction(self):
        # per-token int8 quantization of an outlier-channel activation:
        # smoothing must cut the matmul error
        rng = np.random.default_rng(1)
        y = rng.standard_normal((64, 128)).astype(np.float32)
        y[:, 5] *= 80.0                      # outlier channel
        w = rng.standard_normal((128, 64)).astype(np.float32) * 0.1
        exact = y @ w

        def q_rowwise(a):
            s = np.abs(a).max(axis=1, keepdims=True) / 127.0
            return np.round(a / s) * s

        err_plain = np.abs(q_rowwise(y) @ w - exact).max()
        s = np.asarray(smoothing_scales(
            jnp.asarray(np.abs(y).max(axis=0)),
            jnp.asarray(np.abs(w).max(axis=1))))
        err_smooth = np.abs(q_rowwise(y / s) @ (s[:, None] * w)
                            - exact).max()
        assert err_smooth < err_plain / 4, (err_smooth, err_plain)

    def test_fp_forward_unchanged(self, setup):
        cfg, model, variables, ids = setup
        ref = model.apply(variables, ids)
        amax = calibrate_llama_amax(model, variables, [ids])
        assert set(amax) == {f"layers_{i}.{k}" for i in range(2)
                             for k in ("attn", "mlp")}
        smoothed, scales = smooth_llama(variables["params"], amax)
        out = model.apply({"params": smoothed}, ids)
        # the fold is an exact linear identity at f32 (checked to 1e-6 on
        # g*W == (g/s)*(sW)); the residual diff here is bf16 activations
        # re-rounding at the shifted magnitudes (~1% relative with an 18x
        # channel scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=6e-2, atol=8e-2)
        # the outlier channel's scale is large
        assert float(scales["layers_0.attn"][7]) > 3.0

    def test_quantized_error_drops(self, setup):
        cfg, model, variables, ids = setup
        ref = model.apply(variables, ids)

        # per-token dynamic int8 activations on the projection inputs
        # (stateless microscaling row; op-type rule keeps it off the
        # head_dim-sized attention matmul inputs)
        qc = QuantConfig(op_type_rules=(
            ("linear", QConfig.from_strs(
                activation=f"int8,qs=microscaling,bs={cfg.hidden_size},"
                           f"ax=-1")),
        ))
        qmodel = LlamaForCausalLM(cfg, qc)

        def err(params):
            out = qmodel.apply({"params": params}, ids)
            return float(jnp.abs(out.astype(jnp.float32)
                                 - ref.astype(jnp.float32)).mean())

        e_plain = err(variables["params"])
        amax = calibrate_llama_amax(model, variables, [ids])
        smoothed, _ = smooth_llama(variables["params"], amax)
        e_smooth = err(smoothed)
        assert e_smooth < e_plain * 0.8, (e_smooth, e_plain)


class TestAwqSearch:
    def test_search_and_fold(self, setup):
        from quantized_training_tpu.quantize import (
            QuantConfig, build_storage,
        )
        cfg, model, variables, ids = setup
        spec = "uint4,qs=group_wise_affine,bs=16,ax=0"
        alphas, amax = awq_search_llama(model, variables, ids,
                                        weight_spec=spec)
        # one alpha per (layer, side), all from the grid
        assert set(alphas) == {f"layers_{i}.{k}" for i in range(2)
                               for k in ("attn", "mlp")}
        assert all(a in (0.0, 0.25, 0.5, 0.75, 1.0)
                   for a in alphas.values())
        assert set(amax) == set(alphas)

        # the fold with searched alphas is still an fp near-identity
        ref = model.apply(variables, ids)
        smoothed, _ = smooth_llama(variables["params"], amax, alphas)
        out = model.apply({"params": smoothed}, ids)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=6e-2, atol=8e-2)

    def test_awq_not_worse_than_unsmoothed_for_w4_storage(self, setup):
        # end-to-end: w4a16 storage serving error with AWQ-chosen migration
        # vs no smoothing at all, measured against the fp model.  The grid
        # includes alpha=0 per site (= no migration), so a correct search
        # can't lose by more than cross-layer interaction noise.
        from quantized_training_tpu.quantize import QuantConfig, build_storage
        cfg, model, variables, ids = setup
        ref = np.asarray(model.apply(variables, ids), np.float32)

        def w4_err(params):
            storage, slim = build_storage(params, "w4a16", 16)
            st = LlamaForCausalLM(cfg, QuantConfig().with_storage(
                "w4a16", 16))
            out = st.apply({"params": slim, "storage": storage}, ids)
            return float(np.abs(np.asarray(out, np.float32) - ref).mean())

        e_plain = w4_err(variables["params"])
        alphas, amax = awq_search_llama(
            model, variables, ids,
            weight_spec="uint4,qs=group_wise_affine,bs=16,ax=0")
        smoothed, _ = smooth_llama(variables["params"], amax, alphas)
        e_awq = w4_err(smoothed)
        assert e_awq < e_plain * 1.1, (e_awq, e_plain)
