"""Deployed weight storage (quantize/storage.py + QDense storage branch):
packed-code serving must match the equivalent weight-fake-quant model, with
the dense kernels actually absent from params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.quantize import (
    QConfig, QuantConfig, build_storage, fold_quantized_weights,
    strip_weight_specs,
)
from quantized_training_tpu.serving.generate import generate


@pytest.fixture(scope="module")
def base():
    # hidden sizes chosen so every kernel's contraction dim is a multiple
    # of per*group for w4/w2 (64*4 = 256 | 256; 512 % 256 == 0)
    cfg = LlamaConfig.tiny(hidden_size=256, intermediate_size=512,
                           num_hidden_layers=2)
    model = LlamaForCausalLM(cfg, None)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 12)), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    return cfg, variables, ids


class TestBuildStorage:
    def test_kernels_removed_and_packed(self, base):
        cfg, variables, _ = base
        storage, slim = build_storage(variables["params"], "w4a16", 64)

        def leaves_named(tree, name):
            return [p for p, _ in jax.tree_util.tree_leaves_with_path(tree)
                    if any(getattr(k, "key", None) == name for k in p)]

        n_kernels = len(leaves_named(variables["params"], "kernel"))
        assert n_kernels > 0
        # every 2-D kernel left params; codes appeared in storage
        assert len(leaves_named(slim, "kernel")) == 0
        assert len(leaves_named(storage, "codes")) == n_kernels
        # packed bytes are ~1/4 of bf16 kernel bytes (plus qparams)
        kb = sum(l.size * 2 for p, l in
                 jax.tree_util.tree_leaves_with_path(variables["params"])
                 if any(getattr(k, "key", None) == "kernel" for k in p))
        sb = sum(l.size * l.dtype.itemsize for l in
                 jax.tree_util.tree_leaves(storage))
        assert sb < kb / 2.5, (sb, kb)

    def test_posit8_forward_bit_equals_fake_quant_model(self, base):
        # posit8 codes are exact: the storage model must produce logits
        # bit-identical to the dense model with posit8_1-folded weights
        cfg, variables, ids = base
        qc_ref = QuantConfig(
            global_qconfig=QConfig.from_strs(weight="posit8_1"))
        ref_model = LlamaForCausalLM(cfg, None)
        folded = fold_quantized_weights(variables["params"], qc_ref)
        ref = ref_model.apply({"params": folded}, ids)

        storage, slim = build_storage(variables["params"], "posit8", 64)
        st_model = LlamaForCausalLM(
            cfg, QuantConfig().with_storage("posit8", 64))
        out = st_model.apply({"params": slim, "storage": storage}, ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("fmt", ["mx8", "w4a16", "w2a16"])
    def test_forward_bit_equals_dequant_model(self, base, fmt):
        # scale-carrying formats: the storage model must equal a dense model
        # whose kernels are the packed dequant (pack-vs-fake-quant closeness
        # is covered by the per-kernel pack tests; bf16 scale storage for
        # mx8 costs ~0.5% per weight, which this isolates away)
        cfg, variables, ids = base
        storage, slim = build_storage(variables["params"], fmt, 64)

        def dequant(st):
            codes = st["codes"].astype(jnp.float32)
            if fmt == "mx8":
                from quantized_training_tpu.quantize.ops import expand_scale
                return codes * expand_scale(
                    st["scales"].astype(jnp.float32), codes.shape, 64)
            from quantized_training_tpu.ops.pallas.affine_storage import (
                _dequant_planes,
            )
            nbits = 4 if fmt == "w4a16" else 2
            return _dequant_planes(st["codes"], st["scales"],
                                   st["zero_points"], nbits, 64)

        def rebuild(slim_node, st_node):
            out = dict(slim_node)
            if "codes" in st_node:
                out["kernel"] = dequant(st_node)
            for k, v in st_node.items():
                if isinstance(v, dict):
                    out[k] = rebuild(slim_node.get(k, {}), v)
            return out

        ref_params = rebuild(slim, storage)
        ref_model = LlamaForCausalLM(cfg, None)
        ref = ref_model.apply({"params": ref_params}, ids)

        st_model = LlamaForCausalLM(cfg, QuantConfig().with_storage(fmt, 64))
        out = st_model.apply({"params": slim, "storage": storage}, ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_generate_with_storage_weights(self, base):
        cfg, variables, _ = base
        rng = np.random.default_rng(5)
        prompt = jnp.asarray(rng.integers(0, 256, (1, 9)), jnp.int32)

        qc_ref = QuantConfig(
            global_qconfig=QConfig.from_strs(weight="posit8_1"))
        folded = fold_quantized_weights(variables["params"], qc_ref)
        ref_model = LlamaForCausalLM(cfg, None)
        ref = generate(ref_model, {"params": folded}, prompt, 8)

        storage, slim = build_storage(variables["params"], "posit8", 64)
        st_model = LlamaForCausalLM(
            cfg, QuantConfig().with_storage("posit8", 64))
        out = generate(st_model, {"params": slim, "storage": storage},
                       prompt, 8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_w8a8_native_integer_serving(self, base):
        # the w8a8 format runs the GEMMs natively on the s8 x s8 -> s32 MXU
        # path: codes are int8, logits track the float model, and the
        # compiled forward contains integer dots (not dequant + fp dot)
        cfg, variables, ids = base
        storage, slim = build_storage(variables["params"], "w8a8", 64)
        leaves = jax.tree_util.tree_leaves_with_path(storage)
        code_dtypes = {str(l.dtype) for p, l in leaves
                       if getattr(p[-1], "key", None) == "codes"}
        assert code_dtypes == {"int8"}
        scale_ranks = {l.ndim for p, l in leaves
                       if getattr(p[-1], "key", None) == "scales"}
        assert scale_ranks == {1}

        st_model = LlamaForCausalLM(
            cfg, QuantConfig().with_storage("w8a8", 64))
        fwd = jax.jit(lambda v, i: st_model.apply(v, i))
        out = fwd({"params": slim, "storage": storage}, ids)
        ref = LlamaForCausalLM(cfg, None).apply(variables, ids)
        assert np.isfinite(np.asarray(out, np.float32)).all()
        # int8 weights + dynamic int8 activations: expect small logit drift
        err = np.abs(np.asarray(out, np.float32)
                     - np.asarray(ref, np.float32)).mean()
        mag = np.abs(np.asarray(ref, np.float32)).mean()
        assert err < 0.15 * mag, (err, mag)

        hlo = fwd.lower({"params": slim, "storage": storage},
                        ids).compile().as_text()
        # an s32-producing dot is necessarily an integer dot (fp dots cannot
        # accumulate to s32); operand dtypes don't appear on optimized HLO
        # instruction lines
        int_dots = [l for l in hlo.splitlines()
                    if " dot(" in l and "= s32[" in l]
        assert int_dots, "no integer-accumulating dot in the compiled forward"

    def test_w8a8_generate(self, base):
        cfg, variables, _ = base
        storage, slim = build_storage(variables["params"], "w8a8", 64)
        st_model = LlamaForCausalLM(
            cfg, QuantConfig().with_storage("w8a8", 64))
        prompt = jnp.asarray(
            np.random.default_rng(9).integers(0, 256, (1, 9)), jnp.int32)
        out = generate(st_model, {"params": slim, "storage": storage},
                       prompt, 6)
        assert out.shape == (1, 15)

    def test_ineligible_kernel_stays_dense(self):
        # a contraction dim not divisible by per*group keeps its kernel
        from quantized_training_tpu.quantize.storage import build_storage
        params = {"layer": {"kernel": jnp.zeros((96, 32)),
                            "bias": jnp.zeros((32,))}}
        storage, slim = build_storage(params, "w4a16", 64)
        assert "kernel" in slim["layer"]
        assert storage == {}

    def test_storage_composes_with_kivi_cache(self, base):
        # the full serving memory story: packed weights + quantized KV cache
        from quantized_training_tpu.serving.kv_cache import KVCacheConfig
        cfg, variables, _ = base
        kcfg = KVCacheConfig.kivi(
            max_prefill=16, max_decode=8,
            k_spec="uint2,qs=group_wise_affine,bs=8,ax=-2",
            v_spec="uint2,qs=group_wise_affine,bs=8,ax=-1", pack=True)
        from dataclasses import replace
        scfg = replace(cfg, kv_cache=kcfg)

        storage, slim = build_storage(variables["params"], "posit8", 64)
        qc_ref = QuantConfig(
            global_qconfig=QConfig.from_strs(weight="posit8_1"))
        folded = fold_quantized_weights(variables["params"], qc_ref)

        rng = np.random.default_rng(7)
        prompt = jnp.asarray(rng.integers(0, 256, (1, 12)), jnp.int32)
        ref = generate(LlamaForCausalLM(scfg, None), {"params": folded},
                       prompt, 6)
        out = generate(
            LlamaForCausalLM(scfg, QuantConfig().with_storage("posit8", 64)),
            {"params": slim, "storage": storage}, prompt, 6)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_storage_composes_with_speculative(self, base):
        from quantized_training_tpu.serving import speculative_generate
        cfg, variables, _ = base
        storage, slim = build_storage(variables["params"], "posit8", 64)
        qc_ref = QuantConfig(
            global_qconfig=QConfig.from_strs(weight="posit8_1"))
        folded = fold_quantized_weights(variables["params"], qc_ref)

        dcfg = LlamaConfig.tiny(hidden_size=256, intermediate_size=512,
                                num_hidden_layers=1)
        draft = LlamaForCausalLM(dcfg, None)
        d_vars = jax.jit(draft.init)(
            jax.random.PRNGKey(3), jnp.zeros((1, 8), jnp.int32))

        rng = np.random.default_rng(8)
        prompt = jnp.asarray(rng.integers(0, 256, (1, 10)), jnp.int32)
        ref = generate(LlamaForCausalLM(cfg, None), {"params": folded},
                       prompt, 8)
        st_model = LlamaForCausalLM(
            cfg, QuantConfig().with_storage("posit8", 64))
        out = speculative_generate(
            st_model, {"params": slim, "storage": storage},
            draft, d_vars, prompt, 8, k=3)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_generalizes_to_bert(self):
        # build_storage packs any model family's QDense kernels (all dense
        # layers in this package are QDense; embeddings are untouched)
        from quantized_training_tpu.models.bert import (
            BertConfig, BertForSequenceClassification,
        )
        cfg = BertConfig.tiny(hidden_size=128, intermediate_size=256,
                              num_labels=3)
        model = BertForSequenceClassification(cfg, None)
        ids = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, (2, 16)), jnp.int32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)

        qc_ref = QuantConfig(
            global_qconfig=QConfig.from_strs(weight="posit8_1"))
        folded = fold_quantized_weights(variables["params"], qc_ref)
        ref = model.apply({"params": folded}, ids)

        storage, slim = build_storage(variables["params"], "posit8", 64)
        st_model = BertForSequenceClassification(
            cfg, QuantConfig().with_storage("posit8", 64))
        out = st_model.apply({"params": slim, "storage": storage}, ids)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.skipif(len(jax.devices("cpu")) < 8,
                        reason="needs 8 virtual devices")
    def test_tp_sharded_storage_matches_single_device(self, base):
        # TP serving with packed weights: codes/qparams shard with Megatron
        # rules; the forward equals the single-device storage forward
        from quantized_training_tpu.parallel import (
            apply_sharding_rules, create_mesh, shard_pytree,
            shard_rules_llama, shard_rules_llama_storage,
        )
        cfg, variables, ids = base
        for fmt in ("posit8", "w4a16", "mx8", "w8a8"):
            storage, slim = build_storage(variables["params"], fmt, 64)
            st_model = LlamaForCausalLM(
                cfg, QuantConfig().with_storage(fmt, 64))
            ref = st_model.apply({"params": slim, "storage": storage}, ids)

            mesh = create_mesh(data=2, model=4, devices=jax.devices("cpu"))
            slim_sh = shard_pytree(slim, mesh, shard_rules_llama())
            storage_sh = shard_pytree(
                storage, mesh, shard_rules_llama_storage(fmt))
            with mesh:
                out = jax.jit(lambda v, i: st_model.apply(v, i))(
                    {"params": slim_sh, "storage": storage_sh}, ids)
            # row-parallel psums change the f32 summation order: allow
            # bf16-ulp noise (a wrong sharding would produce garbage, not
            # 1-ulp diffs on ~1% of logits)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                rtol=2e-2, atol=2e-2, err_msg=fmt)


class TestW2x4Storage:
    """w2 numerics in the w4 word layout (storage fmt 'w2x4') — identical
    values to w2a16, 1.7-2.1x faster on chip (BENCH_W2X_r05)."""

    def test_dequant_equals_w2a16(self):
        import numpy as np
        import jax.numpy as jnp
        from quantized_training_tpu.ops.pallas.affine_storage import (
            affine_matmul, expand_w2_words_to_w4, pack_affine_weights,
        )
        rng = np.random.default_rng(0)
        K, N, G = 256, 128, 64
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
        x = jnp.asarray(rng.normal(size=(4, K)), jnp.bfloat16)
        c2, sf, zp = pack_affine_weights(w, 2, G)
        y2 = affine_matmul(x, c2, sf, zp, nbits=2, group_size=G,
                           out_dtype=jnp.float32)
        c4 = expand_w2_words_to_w4(c2)
        y4 = affine_matmul(x, c4, sf, zp + 6.0, nbits=4, group_size=G,
                           out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y4),
                                   atol=1e-4, rtol=1e-4)

    def test_model_w2x4_matches_w2a16(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from quantized_training_tpu.models import (
            LlamaConfig, LlamaForCausalLM,
        )
        from quantized_training_tpu.quantize import QuantConfig
        from quantized_training_tpu.quantize.storage import build_storage

        cfg = LlamaConfig.tiny(max_position_embeddings=64, hidden_size=128,
                               intermediate_size=256)
        ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)))
        base = LlamaForCausalLM(cfg, None)
        v = base.init(jax.random.PRNGKey(0), ids)

        def logits(fmt):
            storage, slim = build_storage(v["params"], fmt, 64)
            m = LlamaForCausalLM(cfg, QuantConfig().with_storage(fmt, 64))
            return np.asarray(m.apply(
                {"params": slim, "storage": storage}, ids), np.float32)

        l2 = logits("w2a16")
        lx = logits("w2x4")
        np.testing.assert_allclose(l2, lx, atol=2e-3, rtol=2e-3)
