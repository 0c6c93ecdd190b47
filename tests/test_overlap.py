"""Collective-overlapped (ring-decomposed) matmuls: parity vs monolithic
collectives, quantized-wire parity + HLO payload dtype, differentiability.

All on the virtual 8-device CPU mesh (conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from quantized_training_tpu.parallel.overlap import (
    allgather_matmul,
    matmul_reducescatter,
)
from quantized_training_tpu.parallel.ring_attention import (
    dequantize_payload,
    group_quantize_payload,
)
from quantized_training_tpu.qspec import QuantizationSpec

M, K, N = 32, 64, 128
PAYLOAD = "int8,qs=group_wise_affine,bs=32,ax=-1"


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices("cpu")[:8])
    return Mesh(devs, ("model",))


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, N)) / np.sqrt(K), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((N, K)) / np.sqrt(N), jnp.float32)
    return x, w1, w2


class TestAllgatherMatmul:
    def test_matches_monolithic(self, mesh, arrays):
        x, w1, _ = arrays
        y = allgather_matmul(x, w1, mesh, axis="model")
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ w1), rtol=1e-6, atol=1e-6)

    def test_quantized_payload_matches_oracle(self, mesh, arrays):
        x, w1, _ = arrays
        y = allgather_matmul(x, w1, mesh, axis="model",
                             payload_spec=PAYLOAD)
        # per-shard group quantization == whole-tensor quantization (groups
        # lie along K; the shard split is along rows), so the oracle is the
        # plain quantize-everything matmul
        spec = QuantizationSpec.from_str(PAYLOAD)
        xq = dequantize_payload(*group_quantize_payload(x, spec), spec)
        ref = xq.astype(x.dtype) @ w1
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # and the wire is int8: every element would otherwise ship f32
        err = np.abs(np.asarray(y) - np.asarray(x @ w1)).max()
        assert err > 1e-4, "payload quantization had no effect"

    def test_wire_dtype_is_int8(self, mesh, arrays):
        x, w1, _ = arrays
        fn = jax.jit(lambda a, b: allgather_matmul(
            a, b, mesh, axis="model", payload_spec=PAYLOAD))
        hlo = fn.lower(x, w1).compile().as_text()
        cperms = [ln for ln in hlo.splitlines() if "collective-permute" in ln]
        assert cperms, "ring was optimized away?"
        assert any("s8[" in ln for ln in cperms), cperms
        # the activation payload (rows x K) must not rotate as f32: only the
        # per-group scale/zp tensors (rows x K/bs) may
        for ln in cperms:
            if "f32[" in ln:
                assert f"f32[{M // 8},{K}]" not in ln, ln

    def test_grad_matches_monolithic(self, mesh, arrays):
        x, w1, _ = arrays
        g_ring = jax.grad(
            lambda a: jnp.sum(allgather_matmul(a, w1, mesh) ** 2))(x)
        g_ref = jax.grad(lambda a: jnp.sum((a @ w1) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


class TestMatmulReduceScatter:
    def test_matches_monolithic(self, mesh, arrays):
        _, _, w2 = arrays
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
        z = matmul_reducescatter(y, w2, mesh, axis="model")
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(y @ w2), rtol=1e-5, atol=1e-5)

    def test_sequence_parallel_mlp_composition(self, mesh, arrays):
        x, w1, w2 = arrays
        h = allgather_matmul(x, w1, mesh, axis="model")
        h = jax.nn.relu(h)
        z = matmul_reducescatter(h, w2, mesh, axis="model")
        ref = jax.nn.relu(x @ w1) @ w2
        np.testing.assert_allclose(np.asarray(z), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
