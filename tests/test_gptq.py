"""GPTQ error-compensated rounding (quantize/gptq.py).

Contracts: (1) diagonal Hessian reduces GPTQ to exact RTN packing;
(2) correlated inputs give a strictly better layer-output error than RTN;
(3) the packed result is byte-compatible with the affine storage kernels;
(4) the model-level pipeline (sown Hessians -> build_storage_gptq -> serve)
produces storage the unmodified QDense storage branch consumes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.ops.pallas.affine_storage import (
    _dequant_planes, affine_matmul, pack_affine_weights, plane_pack,
)
from quantized_training_tpu.quantize import (
    QuantConfig, accumulate_gptq, build_storage, build_storage_gptq,
    gptq_quantize, hessian_from_inputs,
)


def _layer_err(x, w, wq):
    return float(np.linalg.norm(x @ w - x @ wq))


class TestGptqCore:
    @pytest.mark.parametrize("nbits", [4, 2])
    def test_identity_hessian_equals_rtn(self, nbits):
        # no input correlation -> no error feedback -> exactly RTN
        rng = np.random.default_rng(0)
        K, N, G = 256, 32, 64
        w = rng.standard_normal((K, N)).astype(np.float32)
        wq, codes, sf, zp = gptq_quantize(w, np.eye(K), nbits, G)

        packed_ref, sf_ref, zp_ref = pack_affine_weights(
            jnp.asarray(w), nbits, G)
        packed, sfp, zpp = plane_pack(codes, sf, zp, nbits, G)
        np.testing.assert_array_equal(np.asarray(packed),
                                      np.asarray(packed_ref))
        np.testing.assert_array_equal(np.asarray(sfp), np.asarray(sf_ref))
        np.testing.assert_array_equal(np.asarray(zpp), np.asarray(zp_ref))

    @pytest.mark.parametrize("nbits", [4, 2])
    def test_beats_rtn_on_correlated_inputs(self, nbits):
        rng = np.random.default_rng(1)
        K, N, G = 256, 64, 64
        w = rng.standard_normal((K, N)).astype(np.float32)
        # correlated calibration inputs: low-rank mixing + noise
        mix = rng.standard_normal((K, K)).astype(np.float32)
        mix = 0.3 * mix + np.eye(K, dtype=np.float32)
        x = (rng.standard_normal((512, K)).astype(np.float32) @ mix)
        H = hessian_from_inputs(x)

        wq_gptq, _, _, _ = gptq_quantize(w, H, nbits, G)
        p, s, z = pack_affine_weights(jnp.asarray(w), nbits, G)
        wq_rtn = np.asarray(_dequant_planes(p, s, z, nbits, G))

        e_gptq = _layer_err(x, w, wq_gptq)
        e_rtn = _layer_err(x, w, wq_rtn)
        # the win is large at 2 bits, solid at 4
        assert e_gptq < 0.9 * e_rtn, (nbits, e_gptq, e_rtn)

    def test_dequant_matches_kernel_bit_for_bit(self):
        rng = np.random.default_rng(2)
        K, N, G, nbits = 256, 32, 64, 4
        w = rng.standard_normal((K, N)).astype(np.float32)
        x = rng.standard_normal((128, K)).astype(np.float32)
        wq, codes, sf, zp = gptq_quantize(w, hessian_from_inputs(x),
                                          nbits, G)
        packed, sfp, zpp = plane_pack(codes, sf, zp, nbits, G)
        # the storage kernel's dequant reconstructs exactly wq
        w_back = np.asarray(
            _dequant_planes(packed, sfp, zpp, nbits, G))
        np.testing.assert_array_equal(w_back, wq)
        # and the full matmul path agrees with x @ wq
        y = affine_matmul(jnp.asarray(x, jnp.float32), packed, sfp, zpp,
                          nbits=nbits, group_size=G, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), x @ wq, rtol=1e-5,
                                   atol=1e-4)

    def test_dead_input_rows_zeroed(self):
        rng = np.random.default_rng(3)
        K, N, G = 128, 16, 64
        w = rng.standard_normal((K, N)).astype(np.float32)
        x = rng.standard_normal((256, K)).astype(np.float32)
        x[:, 5] = 0.0  # input feature 5 never fires
        wq, _, _, _ = gptq_quantize(w, hessian_from_inputs(x), 4, G)
        # row 5's weights contribute nothing; GPTQ quantizes them as zero
        # (plus whatever error feedback landed there)
        y_err = _layer_err(x, w, wq)
        wq_kept = wq.copy()
        assert np.isfinite(y_err)
        # the dead row carries no output error regardless of its value
        x2 = x.copy()
        np.testing.assert_array_equal(x2 @ wq_kept, x2 @ wq)

    def test_block_size_invariance(self):
        # the lazy block update is exact: different block sizes, same codes
        rng = np.random.default_rng(4)
        K, N, G = 256, 24, 32
        w = rng.standard_normal((K, N)).astype(np.float32)
        x = rng.standard_normal((300, K)).astype(np.float32)
        H = hessian_from_inputs(x)
        _, c1, s1, z1 = gptq_quantize(w, H, 4, G, block_size=32)
        _, c2, s2, z2 = gptq_quantize(w, H, 4, G, block_size=256)
        # float error feedback reassociates across block boundaries; codes
        # may differ on exact rounding ties only — demand near-identity
        assert (c1 != c2).mean() < 0.01
        np.testing.assert_allclose(s1, s2, rtol=1e-4)

    def test_shape_validation(self):
        w = np.zeros((100, 8), np.float32)
        with pytest.raises(ValueError, match="group_size"):
            gptq_quantize(w, np.eye(100), 4, 64)
        with pytest.raises(ValueError, match="hessian shape"):
            gptq_quantize(np.zeros((128, 8), np.float32), np.eye(64), 4, 64)


class TestGptqPipeline:
    @pytest.fixture(scope="class")
    def calibrated(self):
        from quantized_training_tpu.models import (
            LlamaConfig, LlamaForCausalLM,
        )
        cfg = LlamaConfig.tiny(hidden_size=256, intermediate_size=512,
                               num_hidden_layers=2)
        model = LlamaForCausalLM(cfg, None)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 256, (2, 16)), jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)

        # enough calibration tokens to make the 256-dim Hessians full-rank
        # (rank-deficient H lets GPTQ shift error into unobserved input
        # directions that fresh eval data then hits)
        hessians = None
        for seed in range(1, 9):
            batch = jnp.asarray(
                np.random.default_rng(seed).integers(0, 256, (4, 16)),
                jnp.int32)
            _, col = model.apply(variables, batch, mutable=["gptq"])
            hessians = accumulate_gptq(hessians, col["gptq"])
        return cfg, model, variables, ids, hessians

    def test_sown_hessians_align_with_kernels(self, calibrated):
        cfg, model, variables, ids, hessians = calibrated
        kernels = {
            jax.tree_util.keystr(p[:-1])
            for p, l in jax.tree_util.tree_leaves_with_path(
                variables["params"])
            if getattr(p[-1], "key", None) == "kernel" and l.ndim == 2}
        hs = {
            jax.tree_util.keystr(p[:-1]): l
            for p, l in jax.tree_util.tree_leaves_with_path(hessians)
            if getattr(p[-1], "key", None) == "hessian"}
        # every QDense kernel got a square PSD Hessian of its in-dim
        assert set(hs) == kernels
        for h in hs.values():
            assert h.shape[0] == h.shape[1]
            assert np.all(np.linalg.eigvalsh(np.asarray(h)) > -1e-3)

    def test_build_and_serve(self, calibrated):
        cfg, model, variables, ids, hessians = calibrated
        from quantized_training_tpu.models import LlamaForCausalLM

        storage, slim = build_storage_gptq(
            variables["params"], hessians, "w4a16", 64)
        # same tree shape as the RTN storage build
        st_rtn, slim_rtn = build_storage(variables["params"], "w4a16", 64)
        assert (jax.tree_util.tree_structure(storage)
                == jax.tree_util.tree_structure(st_rtn))
        assert (jax.tree_util.tree_structure(slim)
                == jax.tree_util.tree_structure(slim_rtn))

        st_model = LlamaForCausalLM(
            cfg, QuantConfig().with_storage("w4a16", 64))
        out_gptq = st_model.apply({"params": slim, "storage": storage}, ids)
        out_rtn = st_model.apply({"params": slim_rtn, "storage": st_rtn},
                                 ids)
        ref = model.apply(variables, ids)

        # GPTQ's logits track the fp model at least as well as RTN's on the
        # calibration distribution
        e_gptq = float(jnp.mean((out_gptq - ref) ** 2))
        e_rtn = float(jnp.mean((out_rtn - ref) ** 2))
        assert np.isfinite(e_gptq)
        assert e_gptq <= e_rtn * 1.05, (e_gptq, e_rtn)

    def test_missing_hessian_falls_back_to_rtn(self, calibrated):
        cfg, model, variables, ids, hessians = calibrated
        storage, _ = build_storage_gptq(
            variables["params"], {}, "w4a16", 64)
        st_rtn, _ = build_storage(variables["params"], "w4a16", 64)
        for a, b in zip(jax.tree_util.tree_leaves(storage),
                        jax.tree_util.tree_leaves(st_rtn)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejects_non_affine_formats(self):
        with pytest.raises(ValueError, match="group-affine"):
            build_storage_gptq({}, {}, "posit8", 64)

    def test_full_modern_ptq_recipe(self, calibrated):
        # the whole serving stack composed: AWQ migration search -> GPTQ
        # rounding -> w4a16 packed storage -> KIVI uint2 cache -> generate
        # (what examples/generate_llm.py --awq --gptq --storage w4a16
        #  --kv_cache uint2 wires)
        from dataclasses import replace
        from quantized_training_tpu.models import LlamaForCausalLM
        from quantized_training_tpu.quantize import (
            awq_search_llama, smooth_llama,
        )
        from quantized_training_tpu.serving.generate import generate
        from quantized_training_tpu.serving.kv_cache import KVCacheConfig

        cfg, model, variables, ids, _ = calibrated
        spec = "uint4,qs=group_wise_affine,bs=64,ax=0"
        alphas, amax = awq_search_llama(model, variables, ids,
                                        weight_spec=spec)
        smoothed, _ = smooth_llama(variables["params"], amax, alphas)

        # GPTQ Hessians must calibrate on the *smoothed* model
        hessians = None
        for seed in range(1, 5):
            batch = jnp.asarray(
                np.random.default_rng(seed).integers(0, 256, (4, 16)),
                jnp.int32)
            _, col = model.apply({"params": smoothed}, batch,
                                 mutable=["gptq"])
            hessians = accumulate_gptq(hessians, col["gptq"])
        storage, slim = build_storage_gptq(smoothed, hessians, "w4a16", 64)

        kcfg = KVCacheConfig.kivi(max_prefill=16, max_decode=8, pack=True)
        scfg = replace(cfg, kv_cache=kcfg)
        st_model = LlamaForCausalLM(
            scfg, QuantConfig().with_storage("w4a16", 64))
        prompt = ids[:1, :12]
        out = generate(st_model, {"params": slim, "storage": storage},
                       prompt, 6)
        assert out.shape == (1, 18)
        assert np.isfinite(np.asarray(out)).all()
