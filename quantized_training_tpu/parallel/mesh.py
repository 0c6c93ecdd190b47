"""Device mesh construction for single- and multi-host runs.

The reference framework has no real distribution layer (its "device map" is
sequential layer offload, reference: pt2e_utils.py:62-156).  Here scale-out
is first-class: a named mesh over ICI (and DCN for multi-host), with data /
model (tensor) axes.  All sharding in the framework is expressed against
these axis names, so the same model code runs on 1 chip or a pod slice.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "DATA_AXIS", "MODEL_AXIS", "local_mesh"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, model) mesh.  ``model`` should map to ICI-adjacent devices
    (it carries the tensor-parallel collectives); jax's default device order
    already enumerates ICI neighbors contiguously, so ``model`` is the minor
    mesh axis."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def local_mesh(model: Optional[int] = None) -> Mesh:
    """Mesh over all local devices: full model-parallel unless told otherwise."""
    devs = jax.devices()
    model = model or len(devs)
    return create_mesh(data=len(devs) // model, model=model, devices=devs)


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None, cpu_collectives=None):
    """Join a multi-host job (DCN).  Thin wrapper over
    jax.distributed.initialize.

    Errors propagate: a misconfigured multi-host job must fail loudly, not
    silently degrade to single-host.  The only swallowed case is calling this
    twice (already-initialized), which is a harmless no-op.

    ``cpu_collectives``: cross-process collective implementation for the CPU
    backend ("gloo" or "mpi").  Without one, a multi-process CPU job comes up
    as N isolated single-process backends (process_count("cpu") == 1) — TPU
    backends don't need it (collectives ride ICI/DCN natively), but CPU smoke
    tests of the DCN path do.  Must be set before the backend initializes.
    """
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
