"""Compile-subsystem tests: StableHLO export, reports, tensor dumps."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from quantized_training_tpu.compile import (
    compile_report, dump_verification_tensors, export_graph_dot,
    export_stablehlo,
)
from quantized_training_tpu.numerics import quantize_fn


def test_export_stablehlo(tmp_path):
    fn = lambda x: quantize_fn("posit8_1")(x) @ x.T
    x = jnp.ones((8, 16), jnp.bfloat16)
    path = str(tmp_path / "model.mlir")
    text = export_stablehlo(fn, (x,), path)
    assert "stablehlo" in text or "module" in text
    assert os.path.exists(path)


def test_compile_report(tmp_path):
    fn = lambda x: quantize_fn("e4m3")(x) @ x.T
    x = jnp.ones((16, 32), jnp.bfloat16)
    report = compile_report(fn, (x,), str(tmp_path / "report.json"))
    assert report.get("num_instructions", 0) > 0
    assert "op_histogram" in report
    data = json.load(open(tmp_path / "report.json"))
    assert data == report


class TestGraphDot:
    """Graph viz: DOT export of the (optimized) HLO graph — the reference's
    plot_graph SVG analogue (codegen/mapping.py:1793-1866)."""

    def test_optimized_graph(self, tmp_path):
        fn = lambda x, w: quantize_fn("e4m3")(
            jnp.dot(x, w, preferred_element_type=jnp.float32))
        x = jnp.ones((8, 16), jnp.bfloat16)
        w = jnp.ones((16, 32), jnp.bfloat16)
        path = str(tmp_path / "graph.dot")
        dot = export_graph_dot(fn, (x, w), path)
        assert dot.startswith("digraph hlo {") and dot.rstrip().endswith("}")
        assert os.path.exists(path)
        # the matmul node exists and has the MXU style
        assert 'label="dot' in dot and "#f4cccc" in dot
        # at least one edge into some node
        assert "->" in dot
        # parameters appear as nodes
        assert dot.count("[label=") >= 3

    def test_unoptimized_graph(self):
        fn = lambda x: quantize_fn("posit8_1")(x) * 2.0
        x = jnp.ones((4, 8), jnp.bfloat16)
        dot = export_graph_dot(fn, (x,), optimized=False)
        assert dot.startswith("digraph hlo {")
        # pre-fusion: the quantizer's bit ops are visible individually
        assert "bitcast-convert" in dot or "shift-right" in dot

    def test_tuple_typed_instructions_kept(self):
        # while loops (every decode program has one) are tuple-typed; the
        # parser must keep them and their edges
        def fn(x):
            def body(c):
                i, v = c
                return i + 1, v * 1.5
            return jax.lax.while_loop(lambda c: c[0] < 4, body,
                                      (jnp.int32(0), x))[1]

        dot = export_graph_dot(fn, (jnp.ones((8, 8), jnp.float32),))
        # the loop shows up as a tuple-typed while (TPU) or call (CPU's
        # small-call wrapping); either way the node and its edges must exist
        import re
        m = re.search(r'"([\w.\-]+)" \[label="(?:while|call)', dot)
        assert m, dot
        name = m.group(1)
        assert (f'-> "{name}";' in dot or f'"{name}" ->' in dot), dot
        # its tuple operand survived too
        assert 'label="tuple' in dot, dot

    def test_fusion_label_and_balanced_quotes(self):
        fn = lambda x, w: jnp.round(
            jnp.maximum(jnp.dot(x, w, preferred_element_type=jnp.float32), 0)
            * 0.5)
        x = jnp.ones((8, 16), jnp.bfloat16)
        w = jnp.ones((16, 32), jnp.bfloat16)
        dot = export_graph_dot(fn, (x, w))
        # every line is well-formed DOT (quotes balanced)
        for line in dot.splitlines():
            assert line.count('"') % 2 == 0, line


def test_dump_verification_tensors(tmp_path):
    fn = lambda x: x * 2.0
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    manifest = dump_verification_tensors(fn, (x,), str(tmp_path))
    assert set(manifest) == {"input_0", "output_0"}
    out = np.fromfile(tmp_path / "output_0.bin", np.float32).reshape(2, 3)
    np.testing.assert_array_equal(out, np.asarray(x) * 2.0)


def test_native_verifier(tmp_path):
    """End-to-end: dump tensors from two runs, compare with the native tool."""
    import shutil
    import subprocess

    import jax

    exe = os.path.join(os.path.dirname(__file__), "..", "native", "qtt-verify")
    if not os.path.exists(exe):
        make = shutil.which("make")
        if make is None:
            return  # no toolchain: skip silently
        subprocess.run([make, "-C", os.path.dirname(exe)], check=True,
                       capture_output=True)

    fn = lambda x: x * 2.0 + 1.0
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(4, 6))
    dir_a, dir_b, dir_c = (str(tmp_path / d) for d in "abc")
    dump_verification_tensors(fn, (x,), dir_a)
    dump_verification_tensors(fn, (x,), dir_b)
    # identical runs must pass
    r = subprocess.run([exe, dir_a, dir_b], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 failed" in r.stdout
    # perturbed run must fail
    fn2 = lambda t: t * 2.0 + 1.5
    dump_verification_tensors(fn2, (x,), dir_c)
    r = subprocess.run([exe, dir_a, dir_c], capture_output=True, text=True)
    assert r.returncode == 1
    assert "FAIL" in r.stdout


class TestChipDump:
    """Minotaur-equivalent training-step tensor dumps (reference
    minotaur/utils_data.py:23-59)."""

    def test_dump_training_step(self, tmp_path):
        import json
        from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
        from quantized_training_tpu.quantize import QConfig, QuantConfig
        from quantized_training_tpu.utils.chip_dump import dump_training_step

        qc = QuantConfig(global_qconfig=QConfig.from_strs(
            activation="posit8_1", weight="posit8_1")).with_fusion(
            forward="gemm")
        cfg = LlamaConfig.tiny(max_position_embeddings=32)
        model = LlamaForCausalLM(cfg, qc)
        ids = jnp.asarray(np.random.default_rng(0).integers(1, 256, (2, 16)))
        variables = model.init(jax.random.PRNGKey(0), ids)

        def loss_fn(logits, batch):
            tgt = batch["input_ids"][:, 1:]
            lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

        path = dump_training_step(
            model, variables, {"input_ids": ids}, loss_fn,
            str(tmp_path), step=3,
            filter_fn=lambda n: "layers_0" in n or n.startswith("weight."))
        manifest = json.load(open(path))
        assert manifest["step"] == 3 and np.isfinite(manifest["loss"])
        roles = {t["role"] for t in manifest["tensors"]}
        assert {"weight", "grad", "act"} <= roles
        # every dumped file loads back with the manifest shape
        import os
        for t in manifest["tensors"][:8]:
            arr = np.load(os.path.join(os.path.dirname(path), t["file"]))
            assert list(arr.shape) == t["shape"]
