"""Tests for ViT, ResNet (+BN folding), and mixed-precision presets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models.vit import ViTConfig, ViTForImageClassification
from quantized_training_tpu.models.resnet import (
    ResNetConfig, ResNet, fold_batchnorm,
)
from quantized_training_tpu.quantize import QConfig, QuantConfig
from quantized_training_tpu.quantize.presets import (
    QUANTIZATION_CONFIGS, build_preset,
)


def posit8():
    return QuantConfig(global_qconfig=QConfig.from_strs(
        activation="posit8_1", weight="posit8_1")).with_fusion(forward="gemm")


class TestViT:
    def test_forward_float_and_quantized(self):
        cfg = ViTConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
            jnp.float32)
        for qc in (None, posit8()):
            model = ViTForImageClassification(cfg, qc)
            vars_ = model.init(jax.random.PRNGKey(0), imgs)
            out = model.apply(vars_, imgs)
            assert out.shape == (2, 10)
            assert bool(jnp.all(jnp.isfinite(out)))


class TestResNet:
    def test_forward_and_bn_fold(self):
        cfg = ResNetConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 32, 32, 3)),
            jnp.float32)
        model = ResNet(cfg, None)
        vars_ = model.init(jax.random.PRNGKey(0), imgs, train=False)
        # run a few "training" steps to move BN stats off init
        v = vars_
        for _ in range(3):
            _, upd = model.apply(v, imgs, train=True,
                                 mutable=["batch_stats"])
            v = {**v, "batch_stats": upd["batch_stats"]}
        out_ref = model.apply(v, imgs, train=False)

        folded_params, folded_stats = fold_batchnorm(
            v["params"], v["batch_stats"])
        out_folded = model.apply(
            {"params": folded_params, "batch_stats": folded_stats},
            imgs, train=False)
        np.testing.assert_allclose(
            np.asarray(out_folded), np.asarray(out_ref),
            rtol=2e-2, atol=2e-2)

    def test_quantized_resnet(self):
        cfg = ResNetConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 32, 32, 3)),
            jnp.float32)
        model = ResNet(cfg, posit8())
        vars_ = model.init(jax.random.PRNGKey(0), imgs, train=False)
        out = model.apply(vars_, imgs, train=False)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestPresets:
    def test_all_presets_build(self):
        for name in QUANTIZATION_CONFIGS:
            cfg = build_preset(name)
            qc = cfg.resolve("model.layers_0.mlp.gate_proj", "linear")
            if name.startswith("linear") or name == "matmul4":
                pass  # presence depends on preset; just ensure no crash

    def test_mixhead_scopes(self):
        cfg = build_preset("linear4_matmul6_fp8_mixhead")
        head = cfg.resolve("lm_head", "linear", 0)
        assert head is not None
        assert head.weight.dtype == "nf4_6"
        body = cfg.resolve("model.layers_0.mlp.gate_proj", "linear")
        assert body.weight.dtype == "nf4_6"
        mm = cfg.resolve("model.layers_0.self_attn", "matmul")
        assert mm.activation.dtype == "int6"
        assert mm.activation.scale_dtype == "fp8_e5m3"

    def test_preset_runs_on_model(self):
        from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
        cfg = build_preset("linear4_matmul6")
        model = LlamaForCausalLM(LlamaConfig.tiny(), cfg)
        ids = jnp.asarray(np.random.default_rng(3).integers(0, 256, (1, 8)))
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(vars_, ids)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_outlier_preset_runs(self):
        from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
        cfg = build_preset("linear4_matmul6_fp8_outlier")
        model = LlamaForCausalLM(LlamaConfig.tiny(), cfg)
        ids = jnp.asarray(np.random.default_rng(4).integers(0, 256, (1, 8)))
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(vars_, ids)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestKWS:
    def test_res8_res15(self):
        from quantized_training_tpu.models.kws import KWSConfig, KWSResNet
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 101, 40)),
            jnp.float32)
        for cfg in (KWSConfig.res8(), KWSConfig.res15()):
            for qc in (None, posit8()):
                model = KWSResNet(cfg, qc)
                vars_ = model.init(jax.random.PRNGKey(0), x)
                out = model.apply(vars_, x)
                assert out.shape == (2, 12)
                assert bool(jnp.all(jnp.isfinite(out)))


class TestDerivedBias:
    def test_bias_uses_derived_scale(self):
        from quantized_training_tpu.models.layers import QDense
        qc = QuantConfig(global_qconfig=QConfig.from_strs(
            activation="e4m3,qs=per_tensor_symmetric",
            weight="e4m3,qs=per_tensor_symmetric",
            bias="int32"))
        layer = QDense(8, qconfig=qc)
        x = jnp.asarray(
            np.random.default_rng(6).standard_normal((4, 16)) * 10,
            jnp.float32)
        vars_ = layer.init(jax.random.PRNGKey(0), x)
        for _ in range(2):
            _, upd = layer.apply(vars_, x, mutable=["quant_state"])
            vars_ = {**vars_, "quant_state": upd["quant_state"]}
        y = layer.apply(vars_, x)
        assert bool(jnp.all(jnp.isfinite(y)))
        # effective bias is a multiple of s_a * s_w
        st = vars_["quant_state"]
        s = (float(st["linear_pre_process_0"]["state"].scale)
             * float(st["weight_fake_quant"]["state"].scale))
        bias = np.asarray(vars_["params"]["bias"])
        from quantized_training_tpu.numerics import quantize_fn
        bq = np.asarray(quantize_fn("int32")(jnp.asarray(bias) / s) * s)
        y_nobias = layer.apply(
            {**vars_, "params": {**vars_["params"],
                                 "bias": jnp.zeros_like(vars_["params"]["bias"])}},
            x)
        np.testing.assert_allclose(
            np.asarray(y - y_nobias)[0], bq, rtol=1e-3, atol=1e-4)


class TestRunLogging:
    def test_setup_and_metrics(self, tmp_path):
        from quantized_training_tpu.utils.run_logging import (
            setup_logging, SWEEP_CONFIGS, run_sweep)
        log = setup_logging(str(tmp_path / "run.log"))
        log({"loss": 1.5}, step=1)
        assert (tmp_path / "run.log").exists()

    def test_local_sweep_grid(self):
        from quantized_training_tpu.utils.run_logging import run_sweep
        calls = []
        def train_fn(**kw):
            calls.append(kw)
            return 0.0
        run_sweep("llama_wikitext", train_fn)
        assert len(calls) == 6  # 3 dtypes x 2 ladder rungs


class TestSegmentation:
    def test_fcn_forward(self):
        from quantized_training_tpu.models.segmentation import (
            SegmentationConfig, FCNSegmenter,
        )
        cfg = SegmentationConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(7).standard_normal((1, 32, 32, 3)),
            jnp.float32)
        for qc in (None, posit8()):
            model = FCNSegmenter(cfg, qc)
            vars_ = model.init(jax.random.PRNGKey(0), imgs)
            out = model.apply(vars_, imgs)
            assert out.shape == (1, 32, 32, 8)
            assert bool(jnp.all(jnp.isfinite(out)))


class TestMamba:
    def test_quantized_mamba_runs(self):
        from quantized_training_tpu.models.mamba import (
            MambaConfig, MambaForCausalLM,
        )
        cfg = MambaConfig.tiny()
        ids = jnp.asarray(np.random.default_rng(18).integers(0, 128, (2, 12)))
        model = MambaForCausalLM(cfg, posit8())
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(vars_, ids)
        assert out.shape == (2, 12, 128)
        assert bool(jnp.all(jnp.isfinite(out)))
