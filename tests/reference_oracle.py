"""Loader for the reference implementation used as a *test oracle only*.

The reference framework (PyTorch) is mounted read-only at /root/reference.
When present, its numerics modules are imported directly by file path (no
package install) and used to cross-check our JAX kernels bit-for-bit over the
full 2**16 bf16 input space.  All tests using the oracle skip cleanly when
the reference checkout or torch is unavailable — the repo's own golden tests
do not depend on it.
"""

import importlib.util
import os
import sys
import types

REFERENCE_SRC = os.environ.get(
    "QT_REFERENCE_SRC", "/root/reference/src/quantized_training"
)


def _load_module(name, filename):
    path = os.path.join(REFERENCE_SRC, filename)
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


def load_oracle():
    """Returns a namespace with reference posit/fp8/normal_float modules and
    torch, or None if unavailable."""
    try:
        import torch  # noqa: F401
    except ImportError:
        return None

    posit = _load_module("_ref_posit", "posit.py")
    fp8 = _load_module("_ref_fp8", "fp8.py")
    nf = _load_module("_ref_nf", "normal_float.py")
    if posit is None or fp8 is None:
        return None

    import torch

    ns = types.SimpleNamespace(posit=posit, fp8=fp8, nf=nf, torch=torch)

    def bf16_universe_torch():
        return torch.arange(2 ** 16, dtype=torch.int16).view(torch.bfloat16)

    ns.bf16_universe = bf16_universe_torch
    return ns
