"""Mesh-relative multi-process utilities.

``jax.process_count()`` / ``multihost_utils.*`` consult the *default*
backend — wrong whenever the mesh lives on a different one (e.g. a CPU
gloo job while a TPU plugin is registered, as in this environment's axon
tunnel).  Everything here is derived from the mesh's own devices, so the
same engine code runs single-process, multi-host TPU, or multi-process CPU
without caring what jax's default backend is.

First exercised for real by tests/test_multiprocess.py (two OS processes,
gloo collectives), which caught exactly this class of bug in the serving
engine.  The reference framework has no multi-process path at all
(reference: pt2e_utils.py:62-156 is sequential layer offload).
"""

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "mesh_process_indices",
    "mesh_process_count",
    "my_process_index",
    "broadcast_from_root",
    "replicate_to_host",
]


def mesh_process_indices(mesh: Mesh) -> Sequence[int]:
    """Sorted process indices participating in the mesh."""
    return sorted({d.process_index for d in mesh.devices.flat})


def mesh_process_count(mesh: Mesh) -> int:
    return len(mesh_process_indices(mesh))


def my_process_index(mesh: Mesh) -> int:
    """This process's index, derived from the mesh's backend (NOT the
    default backend)."""
    backend = mesh.devices.flat[0].platform
    return jax.local_devices(backend=backend)[0].process_index


def _one_device_per_process(mesh: Mesh):
    per = {}
    for d in mesh.devices.flat:
        per.setdefault(d.process_index, d)
    procs = mesh_process_indices(mesh)
    return [per[p] for p in procs], procs


def broadcast_from_root(arr: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Broadcast a host numpy array from the mesh's lowest process index to
    every participating process.  Identity when the mesh is single-process.

    Implemented as a sum over a one-device-per-process axis where only the
    root contributes nonzero data — the same trick as
    ``multihost_utils.broadcast_one_to_all`` but pinned to *this* mesh's
    devices/backend.
    """
    if mesh_process_count(mesh) == 1:
        return np.asarray(arr)
    dlist, procs = _one_device_per_process(mesh)
    me = my_process_index(mesh)
    root = procs[0]
    arr = np.asarray(arr)
    src = arr if me == root else np.zeros_like(arr)
    m1 = Mesh(np.asarray(dlist), ("p",))
    mine = dlist[procs.index(me)]
    g = jax.make_array_from_single_device_arrays(
        (len(dlist),) + arr.shape, NamedSharding(m1, P("p")),
        [jax.device_put(src[None], mine)],
    )
    out = jax.jit(
        lambda a: jnp.sum(a, axis=0), out_shardings=NamedSharding(m1, P())
    )(g)
    return np.asarray(out.addressable_shards[0].data)


def replicate_to_host(x: jax.Array, mesh: Mesh) -> np.ndarray:
    """Fetch a mesh-sharded array to host on every process: reshard to fully
    replicated (an all-gather on the mesh's own fabric), then read the local
    shard.  Works regardless of process count or default backend."""
    rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep.addressable_shards[0].data)
