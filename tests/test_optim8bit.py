"""8-bit blockwise Adam (training/optim8bit.py).

Contracts: quant/dequant round-trip error is bounded by the block code
resolution; the optimizer tracks exact f32 Adam on a real training loss;
large-leaf state really is int8 (~4x smaller); small leaves stay exact;
the whole thing jits and checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from quantized_training_tpu.training import (
    adam8bit, scale_by_adam8bit, state_nbytes,
)
from quantized_training_tpu.training.optim8bit import (
    _dequantize_signed, _dequantize_sqrt, _quantize_signed, _quantize_sqrt,
)


class TestMomentCodecs:
    def test_signed_roundtrip_bound(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(10_240), jnp.float32) * 0.01
        codes, scale = _quantize_signed(x, 256)
        back = _dequantize_signed(codes, scale, x.shape)
        blocks = np.asarray(x).reshape(-1, 256)
        bound = np.abs(blocks).max(axis=1, keepdims=True) / 127.0 * 0.5 + 1e-9
        err = np.abs(np.asarray(back) - np.asarray(x)).reshape(-1, 256)
        assert (err <= bound + 1e-7).all()

    def test_sqrt_roundtrip_relative(self):
        rng = np.random.default_rng(1)
        # v-like values: squared gradients spanning orders of magnitude
        x = jnp.asarray(rng.standard_normal(8192) ** 2, jnp.float32) * 1e-4
        codes, scale = _quantize_sqrt(x, 256)
        back = np.asarray(_dequantize_sqrt(codes, scale, x.shape))
        xs = np.asarray(x)
        big = xs > xs.max() * 1e-2
        rel = np.abs(back[big] - xs[big]) / xs[big]
        assert rel.max() < 0.05, rel.max()  # sqrt code: ~2/255 per step
        assert (back >= 0).all()

    def test_non_multiple_block_padding(self):
        x = jnp.arange(100, dtype=jnp.float32) - 50.0
        codes, scale = _quantize_signed(x, 64)
        back = _dequantize_signed(codes, scale, x.shape)
        assert back.shape == x.shape
        assert float(jnp.max(jnp.abs(back - x))) <= float(
            jnp.max(jnp.abs(x))) / 127.0 * 0.5 + 1e-6

    def test_zero_block_stable(self):
        x = jnp.zeros(512, jnp.float32)
        for q, d in ((_quantize_signed, _dequantize_signed),
                     (_quantize_sqrt, _dequantize_sqrt)):
            codes, scale = q(x, 256)
            np.testing.assert_array_equal(np.asarray(d(codes, scale,
                                                       x.shape)), 0.0)


class TestAdam8bit:
    def _loss_and_params(self, seed=0):
        rng = np.random.default_rng(seed)
        K, N = 64, 8192 // 64  # one big kernel leaf (8192 elems) + a bias
        params = {
            "kernel": jnp.asarray(rng.standard_normal((K, N)) * 0.1,
                                  jnp.float32),
            "bias": jnp.zeros((N,), jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((256, K)), jnp.float32)
        w_true = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.float32)
        y = x @ w_true

        def loss(p):
            pred = x @ p["kernel"] + p["bias"]
            return jnp.mean((pred - y) ** 2)

        return loss, params

    def test_tracks_f32_adam(self):
        loss, params0 = self._loss_and_params()
        lr = 1e-2

        def run(tx, steps=80):
            @jax.jit
            def step(p, st):
                g = jax.grad(loss)(p)
                u, st2 = tx.update(g, st, p)
                return optax.apply_updates(p, u), st2

            p, st = params0, tx.init(params0)
            for _ in range(steps):
                p, st = step(p, st)
            return float(loss(p))

        l8 = run(adam8bit(lr, block_size=256, min_8bit_size=1024))
        l32 = run(optax.adam(lr))
        # both converge; the 8-bit state costs at most a few percent of the
        # achieved loss reduction
        l0 = float(loss(params0))
        assert l8 < 0.5 * l0, (l8, l0)
        assert abs(l8 - l32) < 0.05 * (l0 - l32) + 1e-6, (l8, l32, l0)

    def test_large_leaf_state_is_int8_and_small(self):
        loss, params = self._loss_and_params()
        tx = scale_by_adam8bit(block_size=256, min_8bit_size=1024)
        st = tx.init(params)
        k_mu = st.mu["kernel"]
        assert k_mu.codes.dtype == jnp.int8
        assert st.nu["kernel"].codes.dtype == jnp.uint8
        # bias is small -> exact f32
        assert st.mu["bias"].codes.dtype == jnp.float32

        f32_bytes = 2 * sum(l.size * 4
                            for l in jax.tree_util.tree_leaves(params))
        got = state_nbytes(st) - 4  # count scalar
        # kernel moments: 8192 codes + 32 scales each; bias f32: ~4x win
        assert got < f32_bytes / 2.8, (got, f32_bytes)

    def test_update_jits_with_fixed_shapes(self):
        loss, params = self._loss_and_params()
        tx = adam8bit(1e-3, min_8bit_size=1024)
        st = tx.init(params)

        @jax.jit
        def step(p, st):
            u, st2 = tx.update(jax.grad(loss)(p), st, p)
            return optax.apply_updates(p, u), st2

        p, st = step(params, st)
        p, st = step(p, st)  # no retrace errors; shapes static
        assert jax.tree_util.tree_structure(st) is not None

    def test_weight_decay_path(self):
        loss, params = self._loss_and_params()
        tx = adam8bit(1e-2, weight_decay=0.01, min_8bit_size=1024)
        st = tx.init(params)
        g = jax.grad(loss)(params)
        u, _ = tx.update(g, st, params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(u))

    def test_trainer_integration(self):
        # drop-in for optax.adam in the TrainState flow
        from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
        from quantized_training_tpu.training import (
            TrainState, causal_lm_loss, make_train_step,
        )
        cfg = LlamaConfig.tiny()
        model = LlamaForCausalLM(cfg, None)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(1, 128, (2, 16)), jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
        tx = adam8bit(1e-3, min_8bit_size=1024)
        state = TrainState.create(model, variables, tx)
        step = make_train_step(model, tx, causal_lm_loss)
        losses = []
        for _ in range(3):
            state, loss = step(state, {"input_ids": ids})
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestFusedPallasStep:
    """The fused TPU moment-update kernel (ops/pallas/adam8bit_step.py)
    must match the XLA path to within compiler fma-contraction ulps — the
    same f32 formulas, but XLA and Mosaic may contract a*b+c differently,
    so block scales can wobble 1 ulp and codes by at most 1 step (it
    replaces a +23.3 ms/step XLA lowering, BENCH_TRAIN_r04.json)."""

    def test_fused_kernel_bit_equals_xla_path(self):
        from quantized_training_tpu.ops.pallas.adam8bit_step import (
            fused_adam8bit_update,
        )
        from quantized_training_tpu.training.optim8bit import _pad_len

        rng = np.random.default_rng(7)
        b1, b2, eps = 0.9, 0.999, 1e-8
        for n, t in ((8192, 1), (4096 * 3 + 100, 5)):
            g = jnp.asarray(rng.standard_normal(n), jnp.float32) * 0.02
            pad = _pad_len(n, 256)
            nb = (n + pad) // 256
            mc = jnp.asarray(
                rng.integers(-127, 128, (nb, 256)), jnp.int8)
            ms = jnp.asarray(rng.random(nb) * 1e-3 + 1e-6, jnp.float32)
            vc = jnp.asarray(rng.integers(0, 256, (nb, 256)), jnp.uint8)
            vs = jnp.asarray(rng.random(nb) * 1e-3 + 1e-6, jnp.float32)
            bc1 = jnp.float32(1.0 - b1 ** t)
            bc2 = jnp.float32(1.0 - b2 ** t)

            # XLA reference (the optim8bit non-fused path, inlined)
            m = (b1 * _dequantize_signed(mc, ms, (n + pad,))
                 + (1.0 - b1) * jnp.pad(g, (0, pad)))
            v = (b2 * _dequantize_sqrt(vc, vs, (n + pad,))
                 + (1.0 - b2) * jnp.pad(g, (0, pad)) ** 2)
            upd_ref = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            mc_ref, ms_ref = _quantize_signed(m, 256)
            vc_ref, vs_ref = _quantize_sqrt(v, 256)

            g2d = jnp.pad(g, (0, pad)).reshape(nb, 256)
            upd, mc2, ms2, vc2, vs2 = fused_adam8bit_update(
                g2d, mc, ms, vc, vs, bc1, bc2, b1=b1, b2=b2, eps=eps,
                interpret=True)

            assert np.max(np.abs(np.asarray(mc2, np.int32)
                                  - np.asarray(mc_ref, np.int32))) <= 1
            assert np.max(np.abs(np.asarray(vc2, np.int32)
                                  - np.asarray(vc_ref, np.int32))) <= 1
            np.testing.assert_allclose(np.asarray(ms2), np.asarray(ms_ref),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_ref),
                                       rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(upd.reshape(-1)), np.asarray(upd_ref),
                rtol=1e-5, atol=1e-6)


class TestPackedMoments:
    """int32-word-packed moment state (the second adam8bit perf fix:
    Mosaic lowers 8-bit lane converts as sublane shuffles, capping the
    int8 fused kernel at ~200 GB/s — packed words unpack with shl/asr on
    32-bit lanes, the affine-storage/KIVI trick applied to the optimizer)."""

    def test_pack_unpack_roundtrip(self):
        from quantized_training_tpu.ops.pallas.adam8bit_step import (
            pack_moment_rows, unpack_moment_rows,
        )
        rng = np.random.default_rng(11)
        sc = jnp.asarray(rng.integers(-127, 128, (1024, 256)), jnp.int32)
        uc = jnp.asarray(rng.integers(0, 256, (1024, 256)), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(unpack_moment_rows(pack_moment_rows(sc), True)),
            np.asarray(sc))
        np.testing.assert_array_equal(
            np.asarray(unpack_moment_rows(pack_moment_rows(uc), False)),
            np.asarray(uc))

    def test_packed_leaf_update_matches_legacy(self):
        # A 131072-element leaf (nb = 512) takes the packed path; the same
        # gradients through a hand-built legacy (unpacked int8) state must
        # produce the same updates and equivalent state.
        from quantized_training_tpu.ops.pallas.adam8bit_step import (
            unpack_moment_rows,
        )
        rng = np.random.default_rng(12)
        p = jnp.asarray(rng.standard_normal(131072), jnp.float32) * 0.02
        g = jnp.asarray(rng.standard_normal(131072), jnp.float32) * 0.01
        tx = scale_by_adam8bit()
        state = tx.init({"w": p})
        assert state.mu["w"].codes.dtype == jnp.int32  # packed
        upd, state2 = tx.update({"w": g}, state)
        # legacy reference: run the same math by hand
        m = (1 - 0.9) * g
        v = (1 - 0.999) * g * g
        ref = (m / (1 - 0.9)) / (jnp.sqrt(v / (1 - 0.999)) + 1e-8)
        np.testing.assert_allclose(np.asarray(upd["w"]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        # second step exercises dequant of nonzero packed state
        upd2, state3 = tx.update({"w": g}, state2)
        assert np.isfinite(np.asarray(upd2["w"])).all()
        mc = unpack_moment_rows(state3.mu["w"].codes, signed=True)
        assert np.asarray(mc).min() >= -127 and np.asarray(mc).max() <= 127

    def test_packed_kernel_interpret_matches_cpu_path(self):
        from quantized_training_tpu.ops.pallas.adam8bit_step import (
            fused_adam8bit_update_packed, pack_moment_rows,
            pack_scale_rows, unpack_scale_rows,
        )
        rng = np.random.default_rng(13)
        nb = 512
        g2d = jnp.asarray(rng.standard_normal((nb, 256)), jnp.float32) * .01
        mcq = jnp.asarray(rng.integers(-127, 128, (nb, 256)), jnp.int32)
        vcq = jnp.asarray(rng.integers(0, 256, (nb, 256)), jnp.int32)
        ms = jnp.asarray(rng.random(nb) * 1e-3 + 1e-6, jnp.float32)
        vs = jnp.asarray(rng.random(nb) * 1e-3 + 1e-6, jnp.float32)
        mw = pack_moment_rows(mcq)
        vw = pack_moment_rows(vcq)
        bc1, bc2 = jnp.float32(0.1), jnp.float32(0.001)
        b1, b2, eps = 0.9, 0.999, 1e-8

        u, mw2, ms2t, vw2, vs2t = fused_adam8bit_update_packed(
            g2d, mw, pack_scale_rows(ms), vw, pack_scale_rows(vs),
            bc1, bc2, b1=b1, b2=b2, eps=eps,
            interpret=True)
        ms2 = unpack_scale_rows(ms2t)
        vs2 = unpack_scale_rows(vs2t)

        m = b1 * (mcq.astype(jnp.float32) * ms[:, None]) + (1 - b1) * g2d
        root = vcq.astype(jnp.float32) * vs[:, None]
        v = b2 * root * root + (1 - b2) * g2d * g2d
        u_ref = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=1e-5, atol=1e-6)
        mc2, ms_ref = _quantize_signed(m, 256)
        np.testing.assert_allclose(np.asarray(ms2), np.asarray(ms_ref),
                                   rtol=1e-6)
        from quantized_training_tpu.ops.pallas.adam8bit_step import (
            unpack_moment_rows,
        )
        d = (np.asarray(unpack_moment_rows(mw2, True), np.int32)
             - np.asarray(mc2, np.int32))
        assert np.abs(d).max() <= 1
