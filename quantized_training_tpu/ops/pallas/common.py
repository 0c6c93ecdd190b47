"""Shared helpers for the Pallas kernel family.

Centralizes two snippets that were drifting toward copy-paste across the
storage/attention kernels:

* interpret-mode resolution — platform detection is a known trap in this
  project's environments (TPU plugins that register under non-"tpu" names,
  CPU pinned via ``jax_default_device``), so the rule must live in exactly
  one place;
* mesh axis sizing for the ``custom_partitioning`` rules.
"""

from typing import Optional

import jax

__all__ = ["resolve_interpret", "mesh_axis_size"]


def resolve_interpret(interpret: Optional[bool]) -> bool:
    """Resolve a kernel's ``interpret`` flag.

    ``None`` (the default everywhere) means "run the real kernel only on a
    real TPU": the Pallas interpreter is the correctness fallback on every
    other backend.  The *effective* platform is the pinned
    ``jax_default_device`` when set (tests pin CPU this way because the TPU
    plugin here ignores ``JAX_PLATFORMS``), else the default backend.
    """
    if interpret is not None:
        return bool(interpret)
    dev = jax.config.jax_default_device
    platform = dev.platform if dev is not None else jax.default_backend()
    return platform != "tpu"


def mesh_axis_size(mesh, ax) -> int:
    """Total devices along a PartitionSpec entry (None / name / tuple)."""
    if ax is None:
        return 1
    if isinstance(ax, (tuple, list)):
        n = 1
        for a in ax:
            n *= mesh.shape[a]
        return n
    return mesh.shape[ax]
