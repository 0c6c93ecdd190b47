"""Tiled Pallas elementwise quantize == the bit-exact XLA chain (interpret
mode on CPU), plus the flatten-to-lanes view logic and the fake-quant
routing flag."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.numerics import quantize_fn
from quantized_training_tpu.numerics.bitutils import materialize_rounding
from quantized_training_tpu.ops.pallas.quantize_elemwise import (
    _flat_view, pallas_quantize, pallas_quantize_eligible,
)


def edge_values(dtype=jnp.bfloat16):
    vals = np.array(
        [0.0, -0.0, 1.0, -1.0, 0.5, 1.5, 65504.0, -65504.0,
         1e-8, -1e-8, 3.14159, -2.71828, 255.5, 1024.0,
         np.inf, -np.inf, np.nan], np.float32)
    rng = np.random.default_rng(0)
    rand = rng.standard_normal(4096 - len(vals)).astype(np.float32) * 10
    return jnp.asarray(np.concatenate([vals, rand]), dtype).reshape(32, 128)


class TestFlatView:
    def test_prefers_wide_lanes(self):
        assert _flat_view(4096 * 5504) == (4096 * 5504 // 1024, 1024)
        assert _flat_view(8 * 128) == (1, 1024)
        assert _flat_view(3 * 128) == (3, 128)
        assert _flat_view(100) is None

    def test_eligibility(self):
        assert pallas_quantize_eligible(jnp.zeros((64, 128)))
        assert pallas_quantize_eligible(jnp.zeros((2, 16, 2048)))
        assert not pallas_quantize_eligible(jnp.zeros((3, 100)))
        assert not pallas_quantize_eligible(jnp.zeros(()))


class TestBitExact:
    @pytest.mark.parametrize("dtype_str", ["posit8_1", "e4m3", "e5m2",
                                           "posit16_1", "int8"])
    def test_matches_xla_chain(self, dtype_str):
        qfn = quantize_fn(dtype_str)
        x = edge_values()
        ref = qfn(materialize_rounding(x))
        got = pallas_quantize(x, qfn, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(got, np.float32))

    def test_odd_shape_flattens(self):
        qfn = quantize_fn("posit8_1")
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((3, 7, 256)),
            jnp.bfloat16)  # 5376 = 42 * 128
        ref = qfn(materialize_rounding(x))
        got = pallas_quantize(x, qfn, interpret=True)
        assert got.shape == x.shape
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(got, np.float32))


class TestRoutingFlag:
    def test_fake_quantize_env_off(self, monkeypatch):
        from quantized_training_tpu.quantize.fake_quant import (
            _pallas_elemwise_enabled,
        )
        monkeypatch.setenv("QT_PALLAS_ELEMWISE", "0")
        assert not _pallas_elemwise_enabled()

    def test_direct_round_same_on_cpu(self):
        # on CPU the direct-rounding path must stay the XLA chain (pallas
        # interpret would be slow); result equality is what matters
        from quantized_training_tpu.quantize.fake_quant import fake_quantize
        from quantized_training_tpu.qspec import QuantizationSpec
        spec = QuantizationSpec.from_str("posit8_1")
        x = edge_values()
        y, _ = fake_quantize(x, spec)
        ref = quantize_fn("posit8_1")(materialize_rounding(x))
        np.testing.assert_array_equal(
            np.asarray(ref, np.float32), np.asarray(y, np.float32))


class TestDitherRounding:
    """`dither` stochastic rounding (reference fp8.py:117-118:
    mantissa = floor(|a| + U[0,1)))."""

    def test_unbiased_and_bracketing(self):
        from quantized_training_tpu.numerics import quantize_elemwise

        x = jnp.full((4096,), 1.3, jnp.float32)  # between fp8 e4m3 codes
        key = jax.random.PRNGKey(0)
        y = quantize_elemwise(x, bits=5, exp_bits=4, max_norm=448.0,
                              round_mode="dither", key=key)
        vals = np.unique(np.asarray(y, np.float32))
        # every output is one of the two bracketing codes (1.25, 1.375)
        assert set(vals) <= {1.25, 1.375}, vals
        assert len(vals) == 2  # genuinely stochastic
        # unbiased: E[y] == x (1.3 sits at p=0.4 between the codes)
        assert abs(float(np.asarray(y, np.float32).mean()) - 1.3) < 0.01

    def test_deterministic_given_key(self):
        from quantized_training_tpu.numerics import quantize_elemwise

        x = jnp.asarray(np.random.default_rng(1).normal(size=256), jnp.float32)
        k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
        kw = dict(bits=5, exp_bits=4, max_norm=448.0, round_mode="dither")
        y1 = quantize_elemwise(x, key=k1, **kw)
        y1b = quantize_elemwise(x, key=k1, **kw)
        y2 = quantize_elemwise(x, key=k2, **kw)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
        assert np.any(np.asarray(y1) != np.asarray(y2))

    def test_missing_key_raises(self):
        from quantized_training_tpu.numerics import quantize_elemwise

        with pytest.raises(ValueError, match="dither"):
            quantize_elemwise(jnp.ones((8,)), bits=5, exp_bits=4,
                              max_norm=448.0, round_mode="dither")
