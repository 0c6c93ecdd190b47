"""YOLOv5-face, MobileViT, SegFormer: forward + quantized smoke tests
(the reference's compile workloads, test/test_codegen.py:642-727, and the
segmentation example)."""

import numpy as np

import jax
import jax.numpy as jnp

from quantized_training_tpu.quantize import QConfig, QuantConfig


def posit8():
    return QuantConfig(global_qconfig=QConfig.from_strs(
        activation="posit8_1", weight="posit8_1")).with_fusion(forward="gemm")


class TestYoloV5Face:
    def test_forward_scales_and_decode(self):
        from quantized_training_tpu.models.yolov5_face import (
            YoloFaceConfig, YoloV5Face, decode_detections,
        )
        cfg = YoloFaceConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
            jnp.float32)
        for qc in (None, posit8()):
            model = YoloV5Face(cfg, qc)
            vars_ = model.init(jax.random.PRNGKey(0), imgs)
            outs = model.apply(vars_, imgs)
            assert [o.shape for o in outs] == [
                (1, 8, 8, cfg.na * cfg.no),
                (1, 4, 4, cfg.na * cfg.no),
                (1, 2, 2, cfg.na * cfg.no),
            ]
            det = decode_detections(outs, cfg)
            assert det.shape == (1, (64 + 16 + 4) * cfg.na, cfg.no)
            assert bool(jnp.all(jnp.isfinite(det)))
            # decoded xy must lie inside the image, wh positive
            assert float(jnp.min(det[..., 2:4])) >= 0.0

    def test_landmark_decode_matches_formula(self):
        from quantized_training_tpu.models.yolov5_face import (
            YoloFaceConfig, decode_detections,
        )
        cfg = YoloFaceConfig.tiny()
        # single scale, zero logits: xy = (grid + 0.5*2 - 0.5)*stride,
        # landmarks = grid*stride exactly
        H = W = 2
        x = jnp.zeros((1, H, W, cfg.na * cfg.no))
        det = decode_detections([x], cfg, strides=(8,))
        det = np.asarray(det).reshape(H, W, cfg.na, cfg.no)
        for gy in range(H):
            for gx in range(W):
                np.testing.assert_allclose(
                    det[gy, gx, 0, 0:2], [(gx + 0.5) * 8, (gy + 0.5) * 8])
                a = np.asarray(cfg.anchors[0][:2], np.float32)
                np.testing.assert_allclose(det[gy, gx, 0, 2:4], a)
                np.testing.assert_allclose(
                    det[gy, gx, 0, 5:7], [gx * 8, gy * 8])


class TestMobileViT:
    def test_forward_float_and_quantized(self):
        from quantized_training_tpu.models.mobilevit import (
            MobileViTConfig, MobileViT,
        )
        cfg = MobileViTConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 64, 64, 3)),
            jnp.float32)
        for qc in (None, posit8()):
            model = MobileViT(cfg, qc)
            vars_ = model.init(jax.random.PRNGKey(0), imgs)
            out = model.apply(vars_, imgs)
            assert out.shape == (2, cfg.num_classes)
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_unfold_fold_roundtrip_structure(self):
        # the unfold in MobileViTBlock must be exactly invertible by the fold
        B, H, W, D, p = 2, 8, 8, 4, 2
        y = jnp.arange(B * H * W * D, dtype=jnp.float32).reshape(B, H, W, D)
        u = y.reshape(B, H // p, p, W // p, p, D)
        u = u.transpose(0, 2, 4, 1, 3, 5).reshape(B * p * p,
                                                  (H // p) * (W // p), D)
        f = u.reshape(B, p, p, H // p, W // p, D)
        f = f.transpose(0, 3, 1, 4, 2, 5).reshape(B, H, W, D)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(f))


class TestSegFormer:
    def test_forward_float_and_quantized(self):
        from quantized_training_tpu.models.segformer import (
            SegFormerConfig, SegFormer,
        )
        cfg = SegFormerConfig.tiny()
        imgs = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 64, 64, 3)),
            jnp.float32)
        for qc in (None, posit8()):
            model = SegFormer(cfg, qc)
            vars_ = model.init(jax.random.PRNGKey(0), imgs)
            out = model.apply(vars_, imgs)
            assert out.shape == (1, 64, 64, cfg.num_classes)
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_loss_and_miou(self):
        from quantized_training_tpu.models.segformer import (
            segmentation_loss, mean_iou,
        )
        logits = jnp.zeros((1, 4, 4, 3))
        labels = jnp.zeros((1, 4, 4), jnp.int32)
        # uniform logits -> loss == log(3)
        np.testing.assert_allclose(
            float(segmentation_loss(logits, labels)), np.log(3), rtol=1e-6)
        # ignore_index pixels drop out of the loss
        labels2 = labels.at[0, 0, 0].set(255)
        np.testing.assert_allclose(
            float(segmentation_loss(logits, labels2)), np.log(3), rtol=1e-6)
        # perfect prediction -> mIoU 1 (only class 0 present)
        preds = jnp.zeros((1, 4, 4), jnp.int32)
        assert float(mean_iou(preds, labels, 3)) == 1.0
        # half the pixels wrong class -> class0 IoU .5, class1 IoU .5
        preds2 = preds.at[0, :2].set(1)
        labels3 = labels.at[0, 1:3].set(1)
        got = float(mean_iou(preds2, labels3, 3))
        assert 0.0 < got < 1.0

    def test_train_step_decreases_loss(self):
        from quantized_training_tpu.models.segformer import (
            SegFormerConfig, SegFormer, segmentation_loss,
        )
        import optax

        cfg = SegFormerConfig.tiny()
        model = SegFormer(cfg)
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, cfg.num_classes, (2, 32, 32)))
        variables = model.init(jax.random.PRNGKey(0), imgs)
        tx = optax.adamw(1e-3)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state):
            def compute(p):
                logits, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    imgs, train=True, mutable=["batch_stats"])
                return segmentation_loss(logits, labels), upd["batch_stats"]
            (loss, stats), grads = jax.value_and_grad(
                compute, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), stats, opt_state,
                    loss)

        losses = []
        for _ in range(4):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
