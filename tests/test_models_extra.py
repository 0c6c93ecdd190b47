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
