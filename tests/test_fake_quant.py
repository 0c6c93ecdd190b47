"""Semantics tests for the functional fake-quant layer.

The reference's FusedAmaxObsFakeQuantize cannot be imported under current
torch, so these tests pin the *documented* reference semantics directly:
delayed scaling from the amax history (scale excludes the current batch),
ring-buffer rolling, per-channel shapes, microscaling block math, group-wise
affine reconstruction, outlier restore, and straight-through gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.qspec import QuantizationSpec, QScheme
from quantized_training_tpu.quantize.fake_quant import (
    fake_quantize,
    init_state,
)
from quantized_training_tpu.quantize.ops import (
    calculate_mx_qparam,
    expand_scale,
    quantize_mx,
    filter_outlier,
    outlier_matmul,
    to_csr,
)
from quantized_training_tpu.numerics import quantize_fn


def spec_pt(dtype="posit8_1", **kw):
    return QuantizationSpec.from_str(f"{dtype},qs=per_tensor_symmetric").replace(**kw)


class TestDelayedScaling:
    def test_first_step_uses_unit_scale(self):
        """Empty history -> amax 0 -> scale keeps its init value 1.0."""
        spec = spec_pt(amax_history_len=4)
        x = jnp.full((4, 4), 100.0, jnp.bfloat16)
        y, state = fake_quantize(x, spec)
        # quantized with scale 1.0: posit8_1 of 100 is 96
        assert float(y[0, 0]) == 96.0
        assert float(state.scale) == 1.0
        np.testing.assert_allclose(float(state.amax_history[0]), 100.0)

    def test_second_step_uses_history_amax(self):
        spec = spec_pt(amax_history_len=4)
        x1 = jnp.full((4, 4), 8192.0, jnp.float32)
        x2 = jnp.ones((4, 4), jnp.float32)
        _, state = fake_quantize(x1, spec)
        y2, state2 = fake_quantize(x2, spec, state)
        # scale = amax(history)/quant_max = 8192/4096 = 2.0
        assert float(state2.scale) == 2.0
        # y = posit(1/2)*2 = 1.0
        assert float(y2[0, 0]) == 1.0

    def test_history_rolls(self):
        spec = spec_pt(amax_history_len=3)
        state = init_state(spec, (2,))
        for v in [1.0, 2.0, 3.0]:
            _, state = fake_quantize(jnp.full((2,), v), spec, state)
        hist = np.asarray(state.amax_history)
        assert set(hist.tolist()) == {1.0, 2.0, 3.0}
        assert hist[0] == 3.0  # newest in slot 0
        _, state = fake_quantize(jnp.full((2,), 4.0), spec, state)
        hist = np.asarray(state.amax_history)
        assert 1.0 not in hist.tolist()  # oldest evicted

    def test_per_channel_scale_shape(self):
        spec = QuantizationSpec.from_str(
            "e4m3,qs=per_channel_symmetric,ax=-1,ahl=2"
        )
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6)), jnp.float32)
        y, state = fake_quantize(x, spec)
        assert state.scale.shape == (1, 6)
        assert state.amax_history.shape == (2, 1, 6)

    def test_force_scale_power_of_two(self):
        spec = spec_pt(amax_history_len=2, force_scale_power_of_two=True)
        _, state = fake_quantize(jnp.full((2,), 3000.0), spec)
        _, state = fake_quantize(jnp.full((2,), 1.0), spec, state)
        # amax 3000 / 4096 = 0.73 -> 2^ceil(log2 0.73) = 2^0 = 1.0
        assert float(state.scale) == 1.0

    def test_observer_off_freezes_scale(self):
        spec = spec_pt(amax_history_len=4)
        _, state = fake_quantize(jnp.full((2,), 8192.0), spec)
        y, state2 = fake_quantize(
            jnp.full((2,), 123456.0), spec, state, observe=False
        )
        assert float(state2.scale) == float(state.scale)
        np.testing.assert_array_equal(
            np.asarray(state2.amax_history), np.asarray(state.amax_history)
        )

    def test_jit_stable(self):
        spec = spec_pt(amax_history_len=4)
        state = init_state(spec, (8, 8))

        @jax.jit
        def step(x, state):
            return fake_quantize(x, spec, state)

        x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8)), jnp.float32)
        for _ in range(3):
            y, state = step(x, state)
        assert y.shape == x.shape


class TestMicroscaling:
    def test_block_scales(self):
        spec = QuantizationSpec.from_str("int8,qs=microscaling,bs=4,ax=-1")
        x = jnp.asarray(
            [[1.0] * 4 + [100.0] * 4], jnp.float32
        )
        y, _ = fake_quantize(x, spec)
        # block 1 scale = 1/127, block 2 scale = 100/127; reconstruction
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-2)

    def test_qparam_shapes(self):
        x = jnp.ones((3, 10), jnp.float32)
        scale = calculate_mx_qparam(x, (-1,), 4, 127.0)
        assert scale.shape == (3, 3)  # ceil(10/4) blocks

    def test_pow2_scales(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)) * 5,
                        jnp.float32)
        scale = calculate_mx_qparam(x, (-1,), 8, 127.0,
                                    force_scale_power_of_two=True)
        logs = np.log2(np.asarray(scale, np.float64))
        np.testing.assert_array_equal(logs, np.round(logs))

    def test_scale_codebook(self):
        spec = QuantizationSpec.from_str(
            "int6,qs=microscaling,bs=4,ax=-1,scale=fp8_e5m3"
        )
        x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 8)) * 3,
                        jnp.float32)
        y, _ = fake_quantize(x, spec)
        # scales must be exactly representable in the unsigned fp8_e5m3 format
        scale, q = quantize_mx(
            x, quantize_fn("int6"), (-1,), 4, 31.0,
            scale_qfn=quantize_fn("fp8_e5m3"),
        )
        requantized = quantize_fn("fp8_e5m3")(scale)
        np.testing.assert_array_equal(np.asarray(scale), np.asarray(requantized))

    def test_expand_scale_crops_padding(self):
        scale = jnp.asarray([[1.0, 2.0]])
        out = expand_scale(scale, (1, 6), 4)
        np.testing.assert_array_equal(
            np.asarray(out), [[1.0, 1.0, 1.0, 1.0, 2.0, 2.0]]
        )


class TestGroupWiseAffine:
    def test_reconstruction(self):
        spec = QuantizationSpec.from_str(
            "uint4,qs=group_wise_affine,bs=8,ax=-1"
        )
        x = jnp.asarray(
            np.random.default_rng(3).uniform(-2, 5, (4, 16)), jnp.float32
        )
        y, _ = fake_quantize(x, spec)
        step = (x.max() - x.min()) / 15  # worst-case quantization step
        assert float(jnp.max(jnp.abs(y - x))) <= float(step)

    def test_constant_block_passthrough(self):
        """sf<=0 blocks fall back to scale 1 (reference: sf>0 ? sf : 1)."""
        spec = QuantizationSpec.from_str(
            "uint2,qs=group_wise_affine,bs=4,ax=-1"
        )
        x = jnp.full((2, 4), 7.0, jnp.float32)
        y, _ = fake_quantize(x, spec)
        # min==max -> sf=1, zp=-7+0=-7; q=clamp(7/1-7)=0; deq=(0+7)*1=7
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_kv_axis_orientations(self):
        """K quantizes along ax=-2, V along ax=-1 (KIVI convention)."""
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((2, 8, 16)), jnp.float32
        )
        for ax in (-1, -2):
            spec = QuantizationSpec.from_str(
                f"uint2,qs=group_wise_affine,bs=8,ax={ax}"
            )
            y, _ = fake_quantize(x, spec)
            assert y.shape == x.shape


class TestOutlier:
    def test_mask_and_restore(self):
        spec = spec_pt("int4", amax_history_len=2).replace(outlier_threshold=4.0)
        x = jnp.asarray([[0.3, 100.0, -0.7, -50.0]], jnp.float32)
        y, state = fake_quantize(x, spec)
        # outliers pass through exactly; inliers quantized with scale 1.0
        assert float(y[0, 1]) == 100.0
        assert float(y[0, 3]) == -50.0
        # observer sees the masked tensor only (amax from inliers)
        assert float(state.amax_history[0]) == pytest.approx(0.7, rel=1e-2)

    def test_filter_outlier_dense(self):
        x = jnp.asarray([[1.0, 10.0], [-20.0, 0.5]], jnp.float32)
        inlier, outlier = filter_outlier(x, 5.0)
        np.testing.assert_array_equal(np.asarray(inlier), [[1.0, 0.0], [0.0, 0.5]])
        np.testing.assert_array_equal(np.asarray(outlier), [[0.0, 10.0], [-20.0, 0.0]])
        b = jnp.eye(2, dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(outlier_matmul(outlier, b)), np.asarray(outlier)
        )

    def test_to_csr_roundtrip(self):
        x = np.array([[0.0, 3.0, 0.0], [4.0, 0.0, 5.0]], np.float32)
        data, idx, indptr = to_csr(x, max_nnz=4)
        np.testing.assert_array_equal(data[:3], [3.0, 4.0, 5.0])
        np.testing.assert_array_equal(idx[:3], [1, 0, 2])
        np.testing.assert_array_equal(indptr, [0, 1, 3])

    def test_to_csr_truncation_consistent(self):
        """When nnz > max_nnz, indptr must be clamped so consumers iterating
        rows never read past the padded data/indices arrays."""
        x = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
        data, idx, indptr = to_csr(x, max_nnz=3)
        assert indptr[-1] == 3  # not 6
        assert np.all(np.diff(indptr) >= 0)
        assert indptr.max() <= data.shape[0]
        np.testing.assert_array_equal(data, [1.0, 2.0, 3.0])


class TestPallasQuantizeElemwise:
    @pytest.mark.parametrize("dtype", ["posit8_1", "e4m3", "fp4_e2m1", "int8"])
    def test_matches_xla_kernel(self, dtype):
        from quantized_training_tpu.numerics import quantize_fn
        from quantized_training_tpu.ops.pallas.quantize_elemwise import (
            pallas_quantize,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((64, 256)) * 3, jnp.bfloat16)
        qfn = quantize_fn(dtype)
        np.testing.assert_array_equal(
            np.asarray(qfn(x), np.float32),
            np.asarray(pallas_quantize(x, qfn), np.float32))

    def test_fallback_on_odd_shapes(self):
        from quantized_training_tpu.numerics import quantize_fn
        from quantized_training_tpu.ops.pallas.quantize_elemwise import (
            pallas_quantize,
        )
        qfn = quantize_fn("posit8_1")
        x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 5, 7)),
                        jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(qfn(x), np.float32),
            np.asarray(pallas_quantize(x, qfn), np.float32))


class TestStraightThrough:
    def test_identity_gradient(self):
        spec = spec_pt(amax_history_len=2)
        state = init_state(spec, (4,))

        def loss(x):
            y, _ = fake_quantize(x, spec, state)
            return jnp.sum(y * jnp.arange(4.0))

        g = jax.grad(loss)(jnp.asarray([0.1, -2.0, 3.0, 1e9], jnp.float32))
        np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 2.0, 3.0])

    def test_mx_identity_gradient(self):
        spec = QuantizationSpec.from_str("int8,qs=microscaling,bs=4,ax=-1")

        def loss(x):
            y, _ = fake_quantize(x, spec)
            return jnp.sum(y)

        x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 8)), jnp.float32)
        g = jax.grad(loss)(x)
        np.testing.assert_array_equal(np.asarray(g), np.ones_like(np.asarray(g)))


class TestQuantizedMatmul:
    def test_matches_xla_semantics(self):
        from quantized_training_tpu.ops.pallas.quantized_matmul import (
            quantized_matmul,
        )
        p8 = quantize_fn("posit8_1")
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((128, 32)), jnp.bfloat16)
        ref = jnp.dot(p8(x), w, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)
        out = quantized_matmul(x, w, x_qfn=p8)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_straight_through_grad(self):
        from quantized_training_tpu.ops.pallas.quantized_matmul import (
            quantized_matmul,
        )
        p8 = quantize_fn("posit8_1")
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)

        g = jax.grad(lambda a: jnp.sum(
            quantized_matmul(a, w, x_qfn=p8, w_qfn=p8)))(x)
        # STE: dL/dx = 1 @ w_q^T
        expected = jnp.ones((16, 8)) @ p8(w).T
        np.testing.assert_allclose(np.asarray(g), np.asarray(expected),
                                   rtol=1e-4, atol=1e-4)


class TestPositSoftmax:
    def test_forward_values(self):
        from quantized_training_tpu.ops.softmax import posit_softmax
        x = jnp.asarray(np.random.default_rng(9).standard_normal((4, 16)),
                        jnp.float32)
        exact = jax.nn.softmax(x, axis=-1)
        approx = posit_softmax(x, True, True)
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   rtol=5e-3, atol=5e-3)
        assert float(jnp.max(jnp.abs(approx - exact))) > 0  # approximation real
        # rows still ~sum to 1
        np.testing.assert_allclose(
            np.asarray(jnp.sum(approx, axis=-1)), 1.0, atol=2e-3)

    def test_custom_backward_matches_reference_formula(self):
        from quantized_training_tpu.ops.softmax import posit_softmax
        from quantized_training_tpu.numerics import quantize_fn_positive
        x = jnp.asarray(np.random.default_rng(10).standard_normal((8,)),
                        jnp.float32)
        g = jnp.asarray(np.random.default_rng(11).standard_normal((8,)),
                        jnp.float32)
        grad = jax.vjp(lambda t: posit_softmax(t, True, True), x)[1](g)[0]

        # reproduce the reference backward by hand (softmax.py:46-49)
        p16 = quantize_fn_positive("posit16_1")
        shifted = x - jnp.max(x)
        exp_x = p16(jnp.exp(shifted))
        s = jnp.sum(exp_x)
        out = exp_x * p16(1.0 / s)
        deriv = 2.0 ** (jnp.floor(jnp.log2(s)) * -2 - 1)
        expected = out * g - deriv * exp_x * jnp.sum(exp_x * g)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(expected),
                                   rtol=1e-5, atol=1e-6)

    def test_exact_backward_when_no_reciprocal(self):
        from quantized_training_tpu.ops.softmax import posit_softmax
        x = jnp.asarray(np.random.default_rng(12).standard_normal((8,)),
                        jnp.float32)
        g1 = jax.grad(lambda t: jnp.sum(posit_softmax(t, False, False) ** 2))(x)
        g2 = jax.grad(lambda t: jnp.sum(jax.nn.softmax(t) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-6)


class TestWeightFolding:
    def test_folded_matches_unfolded(self):
        from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
        from quantized_training_tpu.quantize import (
            QConfig, QuantConfig, fold_quantized_weights, strip_weight_specs,
        )
        cfgq = QuantConfig(global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1")).with_fusion(
            forward="gemm")
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, cfgq)
        ids = jnp.asarray(np.random.default_rng(13).integers(0, 256, (2, 8)))
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        ref = model.apply(vars_, ids)

        folded = fold_quantized_weights(vars_["params"], cfgq)
        act_only = strip_weight_specs(cfgq)
        model2 = LlamaForCausalLM(cfg, act_only)
        out = model2.apply({"params": folded}, ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestPositStorage:
    def test_encode_decode_roundtrip_exhaustive_8bit(self):
        from quantized_training_tpu.numerics import (
            quantize_to_posit, decode_posit, encode_posit, bf16_universe,
        )
        u = bf16_universe()
        vals = quantize_to_posit(u, 8, 1)
        codes = encode_posit(u, 8, 1)
        dec = decode_posit(codes, 8, 1).astype(jnp.bfloat16)
        vf = np.asarray(vals.astype(jnp.float32))
        df = np.asarray(dec.astype(jnp.float32))
        both_nan = np.isnan(vf) & np.isnan(df)
        assert ((vf != df) & ~both_nan).sum() == 0
        assert codes.dtype == jnp.int32

    def test_posit_matmul_matches_dequant_matmul(self):
        from quantized_training_tpu.ops.pallas.posit_storage import (
            pack_posit_weights, posit_matmul,
        )
        rng = np.random.default_rng(14)
        x = jnp.asarray(rng.standard_normal((8, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.bfloat16)
        codes = pack_posit_weights(w)
        assert codes.dtype == jnp.int8
        out = posit_matmul(x, codes)
        ref = jnp.dot(x, quantize_fn("posit8_1")(w),
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


class TestMXStorage:
    def test_pack_matches_fake_quant_spec(self):
        from quantized_training_tpu.ops.pallas.mx_storage import (
            pack_mx_weights,
        )
        from quantized_training_tpu.quantize.ops import expand_scale
        rng = np.random.default_rng(15)
        w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
        codes, scales = pack_mx_weights(w)
        spec = QuantizationSpec.from_str("int8,qs=microscaling,bs=64,ax=0")
        wq, _ = fake_quantize(w, spec)
        deq = codes.astype(jnp.float32) * expand_scale(
            scales.astype(jnp.float32), codes.shape, 64)
        # bf16 scale storage costs <=0.4% relative error vs the f32 spec path
        np.testing.assert_allclose(np.asarray(deq), np.asarray(wq),
                                   rtol=5e-3, atol=5e-4)

    def test_mx_matmul_matches_dequant(self):
        from quantized_training_tpu.ops.pallas.mx_storage import (
            pack_mx_weights, mx_matmul,
        )
        from quantized_training_tpu.quantize.ops import expand_scale
        rng = np.random.default_rng(16)
        x = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((128, 64)) * 0.2, jnp.bfloat16)
        codes, scales = pack_mx_weights(w)
        out = mx_matmul(x, codes, scales)
        deq = (codes.astype(jnp.float32)
               * expand_scale(scales.astype(jnp.float32), codes.shape, 64))
        ref = jnp.dot(x, deq.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


class TestStorageMatmulBlocks:
    """VMEM-budget block picker for the weight-storage kernels."""

    def test_picks_divide_and_satisfy_mosaic_rules(self):
        from quantized_training_tpu.ops.pallas.autotune import (
            storage_matmul_blocks,
        )
        for m, k, n in [(16, 2048, 5504), (128, 2048, 5504),
                        (4096, 2048, 2048), (8, 4096, 11008),
                        (32, 2048, 256)]:
            picked = storage_matmul_blocks(m, k, n)
            assert picked is not None, (m, k, n)
            bm, bk, bn = picked
            assert m % bm == 0 and k % bk == 0 and n % bn == 0
            assert bm == m or bm % 8 == 0
            assert bn % 128 == 0
            # scales tile sublanes: bk/64 must be a multiple of 8 or whole
            assert bk == k or (bk // 64) % 8 == 0

    def test_prime_lane_factor_uses_full_n(self):
        # 5504 = 128 * 43: no mid-size divisor, so the picker must choose a
        # full-N tile rather than forcing the XLA fallback
        from quantized_training_tpu.ops.pallas.autotune import (
            storage_matmul_blocks,
        )
        bm, bk, bn = storage_matmul_blocks(16, 2048, 5504)
        assert bn in (5504, 128)

    def test_mx_matmul_autopicked_blocks_match_fallback(self):
        from quantized_training_tpu.ops.pallas.mx_storage import (
            mx_matmul, pack_mx_weights,
        )
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(256, 5504)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(16, 256)), jnp.bfloat16)
        codes, scales = pack_mx_weights(w)
        ref = mx_matmul(x, codes, scales, block_k=100)  # indivisible: fallback
        out = mx_matmul(x, codes, scales)               # auto blocks
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


class TestW8A8Matmul:
    """Native-integer W8A8 GEMM (ops/int8_matmul.py): the s32 accumulation
    must equal the f32 evaluation of the dequantized codes exactly."""

    def test_matches_dequant_reference(self):
        from quantized_training_tpu.ops.int8_matmul import (
            pack_int8_weights, quantize_int8_rowwise, w8a8_matmul,
        )
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(32, 128)) * 3, jnp.float32)
        w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
        codes, ws = pack_int8_weights(w)
        xc, xs = quantize_int8_rowwise(x)
        # integer accumulation is exact, so scale *after* the int32 matmul
        acc = np.asarray(xc, np.int32) @ np.asarray(codes, np.int32)
        ref = (acc.astype(np.float32) * np.asarray(xs)[:, None]
               * np.asarray(ws)[None, :])
        out = np.asarray(w8a8_matmul(x, codes, ws, out_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)

    def test_quantization_error_bounded(self):
        from quantized_training_tpu.ops.int8_matmul import (
            pack_int8_weights, w8a8_matmul,
        )
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(256, 96)), jnp.float32)
        exact = np.asarray(x) @ np.asarray(w)
        out = np.asarray(w8a8_matmul(x, *pack_int8_weights(w),
                                     out_dtype=jnp.float32))
        rel = np.abs(out - exact).max() / np.abs(exact).max()
        assert rel < 0.02, rel  # int8 x int8 keeps ~2 decimal digits

    def test_zero_rows_and_channels(self):
        from quantized_training_tpu.ops.int8_matmul import (
            pack_int8_weights, quantize_int8_rowwise, w8a8_matmul,
        )
        x = jnp.zeros((4, 32), jnp.bfloat16)
        w = jnp.zeros((32, 8), jnp.float32)
        codes, ws = pack_int8_weights(w)
        xc, xs = quantize_int8_rowwise(x)
        assert np.all(np.isfinite(np.asarray(xs)))
        assert np.all(np.isfinite(np.asarray(ws)))
        out = np.asarray(w8a8_matmul(x, codes, ws), np.float32)
        np.testing.assert_array_equal(out, 0.0)

    def test_jit_and_dtype(self):
        from quantized_training_tpu.ops.int8_matmul import (
            pack_int8_weights, w8a8_matmul,
        )
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(8, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        codes, ws = pack_int8_weights(w)
        out = jax.jit(w8a8_matmul)(x, codes, ws)
        assert out.dtype == jnp.bfloat16 and out.shape == (8, 32)


class TestAffineStorage:
    """W4A16 / W2A16 group-affine weight storage (ops/pallas/affine_storage)."""

    def test_pack_matches_fake_quant_spec(self):
        from quantized_training_tpu.ops.pallas.affine_storage import (
            pack_affine_weights, affine_spec, _dequant_planes,
        )
        rng = np.random.default_rng(21)
        for nbits, gs in [(4, 128), (2, 64), (8, 128)]:
            per = 32 // nbits
            w = jnp.asarray(rng.standard_normal((gs * 3, 64)), jnp.float32)
            packed, sf, zp = pack_affine_weights(w, nbits, gs)
            assert packed.dtype == jnp.int32
            assert packed.shape == (w.shape[0] // per, 64)
            assert sf.shape == (w.shape[0] // gs, 64)
            wq, _ = fake_quantize(w, affine_spec(nbits, gs))
            deq = _dequant_planes(packed, sf, zp, nbits, gs)
            np.testing.assert_array_equal(np.asarray(deq), np.asarray(wq))

    def test_matmul_fallback_matches_dequant(self):
        from quantized_training_tpu.ops.pallas.affine_storage import (
            pack_affine_weights, affine_matmul, _dequant_planes,
        )
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.standard_normal((8, 512)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((512, 96)) * 0.2, jnp.bfloat16)
        packed, sf, zp = pack_affine_weights(w, 4, 128)
        out = affine_matmul(x, packed, sf, zp, nbits=4, group_size=128)
        deq = _dequant_planes(packed, sf, zp, 4, 128).astype(jnp.bfloat16)
        ref = jnp.dot(x, deq, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ref, np.float32))

    def test_kernel_body_matches_fallback_interpret(self):
        # Runs the actual Pallas kernel (signed-word unpack, per-group
        # rescale, zero-point correction dot, multi-field accumulation)
        # under the interpreter on CPU.  The kernel rounds c'*sf to bf16
        # where the fallback rounds (c-zp)*sf — independent 1-ulp roundings
        # — so the oracle is the exact f32 dequant-dot, with the fallback's
        # own bf16 error as the yardstick.
        from quantized_training_tpu.ops.pallas.affine_storage import (
            pack_affine_weights, affine_matmul, _dequant_planes,
        )
        rng = np.random.default_rng(23)
        for nbits, gs in [(4, 64), (2, 64)]:
            K, N = 1024, 256
            x = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((K, N)) * 0.3, jnp.bfloat16)
            packed, sf, zp = pack_affine_weights(w, nbits, gs)
            deq = _dequant_planes(packed, sf, zp, nbits, gs)
            exact = np.asarray(x, np.float32) @ np.asarray(deq, np.float32)
            ref = np.asarray(affine_matmul(
                x, packed, sf, zp, nbits=nbits, group_size=gs,
                out_dtype=jnp.float32), np.float32)
            kp = K // (32 // nbits)
            out = np.asarray(affine_matmul(
                x, packed, sf, zp, nbits=nbits, group_size=gs,
                block_m=16, block_n=128, block_k=kp // 2,
                out_dtype=jnp.float32,
                interpret=True, force_kernel=True), np.float32)
            ref_err = np.abs(ref - exact).max()
            kern_err = np.abs(out - exact).max()
            assert kern_err <= 3 * ref_err + 1e-4, (nbits, kern_err, ref_err)

    def test_plane_major_dequant_kernel_exact(self):
        # The prefill-shape fallback path (ops/pallas/affine_storage.py
        # dequant_planes_tpu): a Pallas stream writes the dequantized weight
        # in PLANE-MAJOR row order (row p*kp + r == original row r*per + p)
        # and the dense dot consumes plane-major-permuted activations.
        # Values must be bit-identical to _dequant_planes (same f32 math,
        # one bf16 rounding), and the permuted dot must match the original
        # up to f32 summation-order noise.  On chip this path took the
        # (2048, 11008, 4096) down-projection from 0.32 to 0.80 MFU.
        from quantized_training_tpu.ops.pallas.affine_storage import (
            pack_affine_weights, _dequant_planes, dequant_planes_tpu,
            _plane_major_x,
        )
        rng = np.random.default_rng(27)
        # (13824, 640) w2 pins the block picker's lane rule: halving N lands
        # on 160 (not a multiple of 128 — Mosaic rejects it; the 13B w2a16
        # down-projection crashed exactly there on chip), so the picker must
        # choose a 128-multiple divisor instead.
        for (K, N), nbits in [((1376 * 8, 128), 4), ((512, 384), 2),
                              ((13824, 640), 2)]:
            per = 32 // nbits
            kp = K // per
            w = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.float32)
            packed, sf, zp = pack_affine_weights(w, nbits, 64)
            ref = _dequant_planes(packed, sf, zp, nbits, 64).astype(
                jnp.bfloat16)
            wpm = dequant_planes_tpu(packed, sf, zp, nbits, 64,
                                     interpret=True)
            perm = np.arange(K).reshape(kp, per).T.reshape(-1)
            np.testing.assert_array_equal(
                np.asarray(wpm, np.float32), np.asarray(ref, np.float32)[perm])
            x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
            y_ref = np.asarray(jnp.dot(x, ref,
                                       preferred_element_type=jnp.float32))
            y_pm = np.asarray(jnp.dot(_plane_major_x(x, kp, per), wpm,
                                      preferred_element_type=jnp.float32))
            np.testing.assert_allclose(y_pm, y_ref, rtol=1e-5, atol=1e-4)

    def test_autopicked_blocks_match_fallback(self):
        from quantized_training_tpu.ops.pallas.affine_storage import (
            pack_affine_weights, affine_matmul,
        )
        from quantized_training_tpu.ops.pallas.autotune import (
            storage_matmul_blocks,
        )
        # LLaMA MLP shape: 5504 has no mid-size divisor; picker must keep
        # the kernel path at K/per packed words (per=8, gwords=G/per=16).
        picked = storage_matmul_blocks(16, 2048 // 8, 5504, code_bytes=4,
                                       scale_block=16, x_factor=8,
                                       scale_bytes_per_code=2.0 / 16)
        assert picked is not None
        bm, bk, bn = picked
        assert (2048 // 8) % bk == 0 and bk % 16 == 0
        rng = np.random.default_rng(24)
        from quantized_training_tpu.ops.pallas.affine_storage import (
            _dequant_planes,
        )
        x = jnp.asarray(rng.standard_normal((16, 2048)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((2048, 5504)) * 0.1, jnp.bfloat16)
        packed, sf, zp = pack_affine_weights(w, 4, 128)
        deq = _dequant_planes(packed, sf, zp, 4, 128)
        exact = np.asarray(x, np.float32) @ np.asarray(deq, np.float32)
        ref = np.asarray(affine_matmul(
            x, packed, sf, zp, nbits=4, group_size=128,
            out_dtype=jnp.float32, block_k=100), np.float32)  # fallback
        out = np.asarray(affine_matmul(
            x, packed, sf, zp, nbits=4, group_size=128,
            out_dtype=jnp.float32,
            interpret=True, force_kernel=True), np.float32)
        ref_err = np.abs(ref - exact).max()
        kern_err = np.abs(out - exact).max()
        assert kern_err <= 3 * ref_err + 1e-4, (kern_err, ref_err)

    def test_group_straddling_planes_raises(self):
        from quantized_training_tpu.ops.pallas.affine_storage import (
            pack_affine_weights,
        )
        w = jnp.zeros((192, 8), jnp.float32)  # 192 not multiple of 2*128
        with pytest.raises(ValueError):
            pack_affine_weights(w, 4, 128)


class TestMXMatmulSharded:
    """SPMD-partitioned storage matmul (mx_matmul_sharded): Megatron-sharded
    codes must stay sharded (no all-gather of the weight bytes)."""

    @pytest.mark.skipif(len(jax.devices("cpu")) < 8,
                        reason="needs 8 virtual devices")
    def test_column_and_row_parallel_match_local(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from quantized_training_tpu.ops.pallas.mx_storage import (
            mx_matmul, mx_matmul_sharded, pack_mx_weights,
        )
        mesh = Mesh(np.asarray(jax.devices("cpu")[:8]).reshape(8), ("model",))
        rng = np.random.default_rng(11)
        M, K, N = 16, 512, 256
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.bfloat16)
        codes, scales = pack_mx_weights(w)
        ref = mx_matmul(x, codes, scales)

        cases = {
            # column-parallel: codes shard on N
            "col": (P(None, None), P(None, "model"), P(None, "model")),
            # row-parallel: x and codes shard on K (512/8 = 64 = bs-aligned)
            "row": (P(None, "model"), P("model", None), P("model", None)),
        }
        for name, (xs, cs, ss) in cases.items():
            xd = jax.device_put(x, NamedSharding(mesh, xs))
            cd = jax.device_put(codes, NamedSharding(mesh, cs))
            sd = jax.device_put(scales, NamedSharding(mesh, ss))
            with mesh:
                fn = jax.jit(mx_matmul_sharded)
                out = fn(xd, cd, sd)
                hlo = fn.lower(xd, cd, sd).compile().as_text()
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                rtol=2e-2, atol=2e-2, err_msg=name)
            # the int8 codes must never be all-gathered
            gathered_codes = [l for l in hlo.splitlines()
                              if "all-gather" in l and "s8[" in l]
            assert not gathered_codes, (name, gathered_codes[:2])
            if name == "row":
                assert any("all-reduce" in l and "f32[" in l
                           for l in hlo.splitlines()), "row needs one psum"

    def test_unsharded_single_device_equals_plain(self):
        from quantized_training_tpu.ops.pallas.mx_storage import (
            mx_matmul, mx_matmul_sharded, pack_mx_weights,
        )
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((128, 64)) * 0.2, jnp.bfloat16)
        codes, scales = pack_mx_weights(w)
        np.testing.assert_array_equal(
            np.asarray(mx_matmul_sharded(x, codes, scales), np.float32),
            np.asarray(mx_matmul(x, codes, scales), np.float32))
