"""Pipeline parallelism (parallel/pipeline.py): SPMD GPipe schedule over a
``pipe`` mesh axis equals the sequential layer stack, for forward AND
gradients, on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from quantized_training_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices"
)


def pipe_mesh(n):
    return Mesh(np.asarray(jax.devices("cpu")[:n]), ("pipe",))


def stage_fn(params, h):
    w, b = params["w"], params["b"]
    return jnp.tanh(h @ w + b)


def make_stack(n_stages, d, seed=0):
    rng = np.random.default_rng(seed)
    stages = [
        {"w": jnp.asarray(rng.normal(size=(d, d)) / np.sqrt(d), jnp.float32),
         "b": jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)}
        for _ in range(n_stages)
    ]
    return stack_stage_params(stages)


def sequential(stacked, x):
    def body(h, one):
        return stage_fn(one, h), None
    h, _ = jax.lax.scan(body, x, stacked)
    return h


class TestPipeline:
    @pytest.mark.parametrize("n_pipe,n_stages,M", [(4, 4, 4), (4, 8, 2),
                                                   (8, 8, 4), (2, 4, 8)])
    def test_forward_matches_sequential(self, n_pipe, n_stages, M):
        d = 16
        stacked = make_stack(n_stages, d)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(16, d)),
                        jnp.float32)
        ref = sequential(stacked, x)
        mesh = pipe_mesh(n_pipe)
        out = jax.jit(lambda p, x: pipeline_apply(
            stage_fn, p, x, mesh=mesh, n_microbatches=M))(stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_grad_matches_sequential(self):
        d, n_stages, M = 8, 4, 4
        stacked = make_stack(n_stages, d, seed=2)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(8, d)),
                        jnp.float32)
        mesh = pipe_mesh(4)

        def loss_pipe(p):
            return jnp.sum(jnp.square(pipeline_apply(
                stage_fn, p, x, mesh=mesh, n_microbatches=M)))

        def loss_seq(p):
            return jnp.sum(jnp.square(sequential(p, x)))

        g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
        g_seq = jax.grad(loss_seq)(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                        jax.tree_util.tree_leaves(g_seq)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_quantized_stage(self):
        """Pipeline composes with fake-quantized stage math."""
        from quantized_training_tpu.numerics import quantize_fn
        qf = quantize_fn("posit8_1")

        def qstage(params, h):
            return jnp.tanh(qf(h) @ qf(params["w"]) + params["b"])

        d, M = 16, 2
        stacked = make_stack(4, d, seed=4)
        x = jnp.asarray(np.random.default_rng(5).normal(size=(4, d)),
                        jnp.float32)

        def seq(p, h):
            def body(h, one):
                return qstage(one, h), None
            return jax.lax.scan(body, h, p)[0]

        mesh = pipe_mesh(4)
        out = jax.jit(lambda p, x: pipeline_apply(
            qstage, p, x, mesh=mesh, n_microbatches=M))(stacked, x)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(seq(stacked, x)),
                                   rtol=1e-6, atol=1e-6)


class TestQuantizedPayload:
    """payload_spec: the inter-stage hop carries int8 codes; result equals
    the sequential model with dequant(quant(h)) at each device boundary."""

    @pytest.mark.parametrize("spec_s,n_pipe,n_stages", [
        ("int8,qs=group_wise_affine,bs=16,ax=-1", 4, 4),
        ("uint4,qs=group_wise_affine,bs=16,ax=-1", 4, 8),
    ])
    def test_matches_boundary_quant_oracle(self, spec_s, n_pipe, n_stages):
        from quantized_training_tpu.parallel.ring_attention import (
            group_quantize_payload, dequantize_payload,
        )
        from quantized_training_tpu.qspec import QuantizationSpec

        d, M, B = 64, 4, 8
        mesh = pipe_mesh(n_pipe)
        stacked = make_stack(n_stages, d, seed=3)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(B, d)), jnp.float32)
        spec = QuantizationSpec.from_str(spec_s)
        per_dev = n_stages // n_pipe

        def oracle(x):
            h = x.reshape(M, B // M, d)
            def one_mb(h):
                for i in range(n_stages):
                    h = stage_fn(
                        jax.tree_util.tree_map(lambda a: a[i], stacked), h)
                    boundary = (i + 1) % per_dev == 0 and i + 1 < n_stages
                    if boundary:
                        h = dequantize_payload(
                            *group_quantize_payload(h, spec), spec
                        ).astype(h.dtype)
                return h
            return jax.vmap(one_mb)(h).reshape(B, d)

        out = pipeline_apply(stage_fn, stacked, x, mesh=mesh,
                             n_microbatches=M, payload_spec=spec_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(x)),
                                   rtol=1e-6, atol=1e-6)
        # and it must differ from the unquantized pipeline (lossy by design)
        exact = pipeline_apply(stage_fn, stacked, x, mesh=mesh,
                               n_microbatches=M)
        assert not np.allclose(np.asarray(out), np.asarray(exact),
                               rtol=1e-6, atol=1e-6)

    def test_payload_hop_is_int8(self):
        mesh = pipe_mesh(4)
        stacked = make_stack(4, 64)
        x = jnp.zeros((8, 64), jnp.float32)
        fn = jax.jit(lambda s, x: pipeline_apply(
            stage_fn, s, x, mesh=mesh, n_microbatches=4,
            payload_spec="uint4,qs=group_wise_affine,bs=16,ax=-1"))
        hlo = fn.lower(stacked, x).compile().as_text()
        assert any("collective-permute(" in l and "s8[" in l
                   for l in hlo.splitlines())
