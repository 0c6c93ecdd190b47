"""Golden test pinning the fusion-ladder quantization-site placement.

VERDICT r04 #7: the accuracy deltas the framework will be judged on hinge on
*which* tensors are quantized per ladder rung (reference:
quantization_mappings.py:46-72 category lists, quantize.py:36-43 backward
taps, run_squad.py:18-26 rung definitions).  Perf work on models/layers must
not silently move placements — this test enumerates every quantization-site
decision the QuantConfig makes during a forward trace (activation, error,
weight, bias — error hooks are resolved at trace time too, layers.py
quant_input) for every ladder rung, on both the bench stack (bench.py
geometry) and the LLaMA-2 7B config, and compares the multiset against a
checked-in golden.

Site keys normalize the layer index (``layers_3`` -> ``layers_*``) and carry
a count, so per-layer drift (a site appearing in some layers only) still
fails.  Regenerate after an *intentional* placement change with:

    QT_REGEN_GOLDEN=1 python -m pytest tests/test_ladder_golden.py -q
"""

import json
import os
import re
from collections import Counter
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.quantize import FUSION_LADDER, QConfig, QuantConfig

GOLDEN = Path(__file__).parent / "golden" / "ladder_sites.json"


class RecordingQuantConfig:
    """Delegating proxy that records every site decision the model asks for."""

    def __init__(self, inner: QuantConfig):
        object.__setattr__(self, "inner", inner)
        object.__setattr__(self, "sites", Counter())

    def __getattr__(self, name):
        return getattr(self.inner, name)

    @staticmethod
    def _norm(path: str) -> str:
        return re.sub(r"(layers[_/.])\d+", r"\1*", path or "")

    def _rec(self, kind, path, op, cat, idx, resolved):
        if resolved:
            self.sites[f"{kind}:{self._norm(path)}:{op}:{cat}:{idx}"] += 1

    def activation_spec(self, path, op, category, index=0):
        spec = self.inner.activation_spec(path, op, category, index)
        self._rec("act", path, op, category.value, index, spec is not None)
        return spec

    def error_spec(self, path, op, category, index=0):
        spec = self.inner.error_spec(path, op, category, index)
        self._rec("err", path, op, category.value, index, spec is not None)
        return spec

    def weight_spec(self, path, op="linear"):
        spec = self.inner.weight_spec(path, op)
        self._rec("weight", path, op, "-", 0, spec is not None)
        return spec

    def bias_spec(self, path, op="linear"):
        spec = self.inner.bias_spec(path, op)
        self._rec("bias", path, op, "-", 0, spec is not None)
        return spec


def bench_stack_config():
    """The bench.py geometry (2 layers — sites repeat per layer and the
    golden keys are layer-normalized with counts, so depth is a pure
    multiplier; 2 layers keeps the trace fast while still catching
    first-vs-rest-layer placement differences)."""
    return LlamaConfig(
        vocab_size=1024,
        hidden_size=256,
        intermediate_size=688,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        use_flash_attention=True,
    )


def llama7b_config():
    from dataclasses import replace
    cfg = LlamaConfig.llama2_7b()
    return replace(cfg, num_hidden_layers=2, vocab_size=1024,
                   max_position_embeddings=128)


def enumerate_sites(cfg, rung_cats, backward_cats):
    qc = QuantConfig(
        global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1", error="posit8_1"),
    ).with_fusion(forward=rung_cats, backward=backward_cats)
    rec = RecordingQuantConfig(qc)
    model = LlamaForCausalLM(cfg, rec)
    ids = jnp.zeros((1, 16), jnp.int32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)
    jax.eval_shape(lambda v, i: model.apply(v, i), variables, ids)
    return dict(sorted(rec.sites.items()))


def collect_all():
    out = {}
    for model_name, cfg_fn in [("bench_stack", bench_stack_config),
                               ("llama7b", llama7b_config)]:
        cfg = cfg_fn()
        for rung, cats in FUSION_LADDER:
            # forward-only enumeration (the ladder is a forward concept:
            # run_squad.py sweeps --quantize_forward)
            out[f"{model_name}/{rung}"] = enumerate_sites(cfg, cats, ())
        # the QAT backward taps at the reference's default error setting
        # (gradients quantized at GEMMs and residual joins,
        # quantize.py:36-43 RESIDUAL_LAYERS_BWD)
        out[f"{model_name}/backward_gemm_residual"] = enumerate_sites(
            cfg, ("gemm",), ("gemm", "residual"))
    return out


def test_ladder_site_placement_golden():
    got = collect_all()
    if os.environ.get("QT_REGEN_GOLDEN") == "1" or not GOLDEN.exists():
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
        if os.environ.get("QT_REGEN_GOLDEN") != "1":
            pytest.fail(
                f"golden file was missing — wrote {GOLDEN}; inspect the "
                "diff and commit it")
        return
    want = json.loads(GOLDEN.read_text())
    assert set(got) == set(want), (
        f"config set drifted: +{set(got) - set(want)} -{set(want) - set(got)}")
    for key in want:
        if got[key] != want[key]:
            extra = {k: v for k, v in got[key].items()
                     if want[key].get(k) != v}
            missing = {k: v for k, v in want[key].items()
                       if got[key].get(k) != v}
            raise AssertionError(
                f"quant-site placement drifted for {key}:\n"
                f"  now-but-not-golden: {json.dumps(extra, indent=2)}\n"
                f"  golden-but-not-now: {json.dumps(missing, indent=2)}\n"
                "If intentional, regenerate with QT_REGEN_GOLDEN=1.")


def test_ladder_monotone():
    """Down the ladder, quantized activation sites only shrink (ops fuse),
    and the GEMM-input sites never change — the rung list controls exactly
    the non-GEMM categories."""
    cfg = bench_stack_config()
    prev = None
    for rung, cats in FUSION_LADDER:
        sites = enumerate_sites(cfg, cats, ())
        acts = {k for k in sites if k.startswith("act:")}
        gemm = {k for k in acts if ":gemm:" in k}
        if prev is not None:
            assert acts <= prev["acts"], f"{rung} added activation sites"
            assert gemm == prev["gemm"], f"{rung} changed GEMM-input sites"
        prev = {"acts": acts, "gemm": gemm}
