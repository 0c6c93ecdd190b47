"""Quantized gradient all-reduce (parallel/grad_compress.py): exact vs a
numpy simulation of the two-phase schedule, error-feedback convergence, and
int8 wire payload in the compiled HLO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from quantized_training_tpu.parallel import create_mesh
from quantized_training_tpu.parallel.grad_compress import (
    compressed_allreduce_mean, compressed_grad_sync, init_error_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual devices"
)

N = 8


def mesh8():
    return create_mesh(data=N, model=1, devices=jax.devices("cpu"))


def run_sync(xs, nbits, errors):
    """xs: (N, *shape) per-device inputs -> per-device (out, new_error)."""
    mesh = mesh8()
    def local(x, e):
        # shard_map hands a (1, *shape) slice; re-add the axis on return
        o, ne = compressed_allreduce_mean(x[0], "data", nbits=nbits,
                                          error=e[0])
        return o[None], ne[None]

    fn = shard_map(local, mesh=mesh, in_specs=(P("data"), P("data")),
                   out_specs=P("data"), check_vma=False)
    out, err = jax.jit(fn)(xs, errors)
    return np.asarray(out), np.asarray(err)


def simulate(xs, nbits, errors, block=512):
    """Bit-faithful numpy model of the two-phase schedule."""
    qmax = 2 ** (nbits - 1) - 1
    n, shape = xs.shape[0], xs.shape[1:]
    size = int(np.prod(shape))
    mult = n * block
    L = -(-size // mult) * mult

    def deq_blocks(a):
        # quantize per block and return the dequantized values directly
        R, Lr = a.shape
        ab = a.reshape(R, Lr // block, block)
        amax = np.abs(ab).max(axis=2, keepdims=True)
        scale = np.where(amax > 0, amax / qmax, 1.0)
        return (np.round(ab / scale) * scale).reshape(R, Lr)

    chunks, deqs = [], []
    for d in range(n):
        g = xs[d].astype(np.float32).ravel() + errors[d].ravel()
        flat = np.pad(g, (0, L - size)).reshape(n, L // n)
        chunks.append(flat)
        deqs.append(deq_blocks(flat))
    outs, errs = [], []
    summed = [sum(deqs[d][c] for d in range(n)) for c in range(n)]
    deq2 = []
    for c in range(n):
        deq2.append(deq_blocks(summed[c][None])[0])
    full = np.concatenate(deq2)[:size] / n
    for d in range(n):
        e = chunks[d] - deqs[d]
        e[d] += summed[d] - deq2[d]
        outs.append(full.reshape(shape))
        errs.append(e.ravel()[:size].reshape(shape))
    return np.stack(outs), np.stack(errs)


class TestCompressedAllreduce:
    @pytest.mark.parametrize("nbits", [8, 4])
    @pytest.mark.parametrize("shape", [(37,), (16, 33), (4, 5, 7)])
    def test_matches_simulation(self, nbits, shape):
        rng = np.random.default_rng(hash((nbits, shape)) % 2**31)
        xs = jnp.asarray(rng.standard_normal((N,) + shape), jnp.float32)
        errors = jnp.asarray(rng.standard_normal((N,) + shape) * 0.1,
                             jnp.float32)
        out, err = run_sync(xs, nbits, errors)
        ref_out, ref_err = simulate(np.asarray(xs), nbits,
                                    np.asarray(errors))
        # tolerance: the numpy model promotes to f64 in places, so allow
        # f32 accumulation-order noise (quantization steps are ~1e-2)
        np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=2e-6)
        np.testing.assert_allclose(err, ref_err, rtol=1e-4, atol=2e-6)
        # every device must hold the identical reduced gradient
        for d in range(1, N):
            np.testing.assert_array_equal(out[d], out[0])

    def test_error_feedback_averages_to_true_mean(self):
        # repeated sync of a CONSTANT per-device gradient: with EF the
        # running average of outputs converges to the exact mean (the
        # compression error is re-injected, so it cancels over time)
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((N, 257)), jnp.float32)
        true_mean = np.asarray(xs).mean(axis=0)
        errors = jnp.zeros_like(xs)
        acc = np.zeros(257, np.float64)
        T = 24
        first_err = None
        for t in range(T):
            out, errors = run_sync(xs, 4, errors)
            acc += np.asarray(out[0], np.float64)
            if t == 0:
                first_err = np.abs(np.asarray(out[0]) - true_mean).max()
        avg_err = np.abs(acc / T - true_mean).max()
        assert avg_err < first_err / 4, (avg_err, first_err)

    def test_wire_is_int8(self):
        mesh = mesh8()
        x = jnp.zeros((N, 1024), jnp.float32)
        fn = jax.jit(shard_map(
            lambda x: compressed_allreduce_mean(x[0], "data")[0],
            mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
            check_vma=False))
        hlo = fn.lower(x).compile().as_text()
        a2a = [l for l in hlo.splitlines() if "all-to-all" in l
               and "s8" in l]
        ag = [l for l in hlo.splitlines() if "all-gather" in l
              and "s8" in l]
        assert a2a, "all-to-all must carry int8 codes"
        assert ag, "all-gather must carry int8 codes"

    def test_tree_sync(self):
        rng = np.random.default_rng(3)
        grads = {
            "w": jnp.asarray(rng.standard_normal((N, 8, 16)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal((N, 16)), jnp.float32),
        }
        mesh = mesh8()
        fn = jax.jit(shard_map(
            lambda g: jax.tree_util.tree_map(
                lambda a: a[None],
                compressed_grad_sync(
                    jax.tree_util.tree_map(lambda a: a[0], g), "data")[0]),
            mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
            check_vma=False))
        out = fn(grads)
        # block-local scales: one EF-less round stays within a quantization
        # step of the *block* amax, which the global amax upper-bounds
        gmax = max(np.abs(np.asarray(g)).max() for g in grads.values())
        for k in grads:
            ref = np.asarray(grads[k]).mean(axis=0)
            got = np.asarray(out[k][0])
            np.testing.assert_allclose(got, ref, atol=gmax / 127)
        # the fused tree sync must launch exactly one collective of each
        # phase kind, not per-leaf
        hlo = fn.lower(grads).compile().as_text()
        n_a2a = sum(1 for l in hlo.splitlines()
                    if " all-to-all(" in l and "s8[" in l)
        assert n_a2a == 1, f"expected one fused s8 all-to-all, got {n_a2a}"


    def test_small_leaf_not_zeroed_by_bucket_fusion(self):
        # a tiny-magnitude leaf sharing the fused buffer with a huge one
        # must keep its own block-local scale: without per-block scales the
        # bucket amax (~1.0) makes every tiny code round to zero
        rng = np.random.default_rng(7)
        big = rng.standard_normal((N, 4096)).astype(np.float32)
        tiny = (rng.standard_normal((N, 4096)) * 1e-5).astype(np.float32)
        grads = {"a_big": jnp.asarray(big), "z_tiny": jnp.asarray(tiny)}
        mesh = mesh8()
        fn = jax.jit(shard_map(
            lambda g: jax.tree_util.tree_map(
                lambda a: a[None],
                compressed_grad_sync(
                    jax.tree_util.tree_map(lambda a: a[0], g), "data")[0]),
            mesh=mesh, in_specs=(P("data"),), out_specs=P("data"),
            check_vma=False))
        out = fn(grads)
        ref = tiny.mean(axis=0)
        got = np.asarray(out["z_tiny"][0])
        assert np.abs(got).max() > 0, "tiny leaf quantized to all-zero"
        # bounded by the tiny leaf's own amax, not the big leaf's
        err = np.abs(got - ref).max()
        assert err < 2 * np.abs(tiny).max() / 127, (
            err, np.abs(tiny).max() / 127)
