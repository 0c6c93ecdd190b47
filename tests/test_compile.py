"""Compile-subsystem tests: StableHLO export, reports, tensor dumps."""

import json
import os

import numpy as np
import jax.numpy as jnp

from quantized_training_tpu.compile import (
    compile_report, dump_verification_tensors, export_stablehlo,
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


def test_dump_verification_tensors(tmp_path):
    fn = lambda x: x * 2.0
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    manifest = dump_verification_tensors(fn, (x,), str(tmp_path))
    assert set(manifest) == {"input_0", "output_0"}
    out = np.fromfile(tmp_path / "output_0.bin", np.float32).reshape(2, 3)
    np.testing.assert_array_equal(out, np.asarray(x) * 2.0)
