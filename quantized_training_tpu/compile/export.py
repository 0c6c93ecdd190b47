"""Compilation artifacts: the reference codegen layer re-imagined for TPU.

The reference compiles FX graphs to a protobuf instruction stream + tensor
dumps for an external edge accelerator (reference: codegen/mapping.py:1723-1787,
codegen/__init__.py:174-219).  On TPU the compile target is XLA itself, so
the equivalent artifacts are:

  * ``export_stablehlo``   — the portable serialized program (StableHLO),
    the TPU analogue of the reference's ``model.txt`` protobuf stream;
  * ``compile_report``     — per-op statistics, FLOPs and memory analysis of
    the *optimized* program (the analogue of ``layers.txt`` + the memory
    allocator timeline, reference codegen/memory.py:250-316);
  * ``dump_verification_tensors`` — input/output/param binary dumps with a
    JSON manifest, mirroring ``compile(..., dump_verification_file=True)``
    (reference: mapping_utils.py:19-61) for cross-implementation checks.
"""

import collections
import json
import os
import re
from typing import Any, Callable, Dict, Sequence

import numpy as np
import jax

__all__ = ["export_stablehlo", "compile_report", "dump_verification_tensors"]


def export_stablehlo(fn: Callable, args: Sequence[Any],
                     path: str = None) -> str:
    """Lower ``fn(*args)`` to StableHLO text; optionally write it."""
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
    return text


def compile_report(fn: Callable, args: Sequence[Any],
                   path: str = None) -> Dict:
    """Compile ``fn`` and report op mix, FLOPs, and memory usage."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()

    report: Dict[str, Any] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        report["flops"] = float(cost.get("flops", 0.0))
        report["bytes_accessed"] = float(cost.get("bytes accessed", 0.0))
        report["transcendentals"] = float(cost.get("transcendentals", 0.0))
    except Exception as e:  # backend-dependent
        report["cost_analysis_error"] = str(e)

    try:
        mem = compiled.memory_analysis()
        for attr in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "generated_code_size_in_bytes"):
            if hasattr(mem, attr):
                report[attr] = int(getattr(mem, attr))
    except Exception as e:
        report["memory_analysis_error"] = str(e)

    # Op histogram from the optimized HLO (the "layers.txt" analogue).
    try:
        hlo = compiled.as_text()
        # HLO instruction form: "%name = type opname(args)"
        ops = collections.Counter(
            m.group(1)
            for m in re.finditer(r"= \S+ ([a-z][a-z0-9_-]*)\(", hlo)
        )
        report["op_histogram"] = dict(ops.most_common())
        report["num_instructions"] = sum(ops.values())
    except Exception as e:
        report["hlo_error"] = str(e)

    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
    return report


def dump_verification_tensors(
    fn: Callable, args: Sequence[Any], output_dir: str,
    params: Dict = None,
) -> Dict:
    """Run ``fn`` and dump inputs/outputs (+ optional params) as raw .bin
    files with a JSON manifest describing shapes/dtypes — the cross-
    implementation verification format (reference tensor_files/*.bin)."""
    os.makedirs(output_dir, exist_ok=True)
    manifest = {}

    def dump(name, arr):
        arr = np.asarray(jax.device_get(arr))
        if arr.dtype.name == "bfloat16":
            arr = arr.astype(np.float32)
        fname = f"{name}.bin"
        arr.tofile(os.path.join(output_dir, fname))
        manifest[name] = {"file": fname, "shape": list(arr.shape),
                          "dtype": str(arr.dtype)}

    for i, a in enumerate(args):
        dump(f"input_{i}", a)
    out = fn(*args)
    flat_out, _ = jax.tree_util.tree_flatten(out)
    for i, o in enumerate(flat_out):
        dump(f"output_{i}", o)
    if params is not None:
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "param_" + "_".join(
                str(getattr(k, "key", k)) for k in path)
            dump(name, leaf)

    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # plain-text manifest consumed by the native comparator (native/qtt_verify.cc)
    with open(os.path.join(output_dir, "manifest.txt"), "w") as f:
        for name, meta in manifest.items():
            dims = " ".join(str(d) for d in meta["shape"])
            f.write(f"{name} {meta['file']} {meta['dtype']} "
                    f"{len(meta['shape'])} {dims}\n")
    return manifest
