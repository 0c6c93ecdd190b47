"""Chip-validation tensor dumps: per-training-step activations, weights,
gradients and quantized errors for hardware comparison.

TPU-native counterpart of the reference's Minotaur validation flow
(reference minotaur/utils_data.py:23-59 — pickle dumps of
activations/errors/weights/grads consumed by the chip testbench).  Here the
capture is functional: flax ``capture_intermediates`` collects every
module's output during the forward, ``jax.value_and_grad`` supplies the
parameter gradients, and everything lands as little-endian ``.npy`` files
plus a ``manifest.json`` (name, shape, dtype, role, file) — the same
raw-buffer + manifest contract the native verifier (native/qtt_verify.cc)
already consumes for PTQ exports.
"""

import json
import os
from typing import Callable, Dict, Optional

import numpy as np
import jax

__all__ = ["dump_training_step"]


def _flatten(tree, prefix=""):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = prefix + ".".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path
        )
        out[name] = leaf
    return out


def dump_training_step(
    model,
    variables: Dict,
    batch,
    loss_fn: Callable,
    out_dir: str,
    step: int = 0,
    dump_weights: bool = True,
    dump_activations: bool = True,
    dump_grads: bool = True,
    filter_fn: Optional[Callable[[str], bool]] = None,
) -> str:
    """Run one forward+backward and dump every tensor class to ``out_dir``.

    ``loss_fn(outputs, batch) -> scalar``.  ``filter_fn(name)`` optionally
    restricts which tensors are written (name substring checks are typical).
    Returns the manifest path.
    """
    step_dir = os.path.join(out_dir, f"step_{step:06d}")
    os.makedirs(step_dir, exist_ok=True)
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    # Activations from a separate concrete forward (capturing inside the
    # grad trace would leak tracers); the grad pass reruns without capture.
    acts = {}
    if dump_activations:
        _, state = model.apply(
            {**others, "params": params}, batch["input_ids"],
            capture_intermediates=True, mutable=["intermediates"])
        acts.update(_flatten(state["intermediates"], "act."))

    def forward(p):
        out = model.apply({**others, "params": p}, batch["input_ids"])
        return loss_fn(out, batch)

    loss, grads = jax.value_and_grad(forward)(params)

    tensors = {}
    if dump_weights:
        tensors.update(_flatten(params, "weight."))
    if dump_grads:
        tensors.update(_flatten(grads, "grad."))
    tensors.update(acts)

    manifest = {"step": step, "loss": float(loss), "tensors": []}
    for i, (name, leaf) in enumerate(sorted(tensors.items())):
        if filter_fn is not None and not filter_fn(name):
            continue
        arr = np.asarray(jax.device_get(leaf))
        stored_dtype = str(arr.dtype)
        if stored_dtype == "bfloat16":  # .npy has no bf16: widen losslessly
            arr = arr.astype(np.float32)
        fname = f"t{i:05d}.npy"
        np.save(os.path.join(step_dir, fname), arr)
        role = name.split(".", 1)[0]
        manifest["tensors"].append({
            "name": name, "role": role, "file": fname,
            "shape": list(arr.shape), "dtype": stored_dtype,
        })
    path = os.path.join(step_dir, "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1)
    return path
