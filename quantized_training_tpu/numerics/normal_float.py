"""NormalFloat (NF4-style) codebook quantization.

Same codebook construction as the reference framework (reference:
src/quantized_training/normal_float.py:4-62), which follows the bitsandbytes
NF4 recipe: codebook values are normal-distribution quantiles, optionally with
an extra positive value (asymmetric), normalized to [-1, 1], and optionally
scaled to integers for ``nfK_B`` formats.

The codebook is built once on the host (scipy quantiles) and cached; the
quantize step is a branchless nearest-value search suited to the TPU VPU
(the codebook has at most 2**k <= 16 entries, so comparisons beat gathers).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["create_normal_map", "quantize_to_nf", "nf_codebook"]


@functools.lru_cache(maxsize=None)
def _normal_map_np(offset: float, use_extra_value: bool, k: int) -> np.ndarray:
    from scipy.stats import norm

    num_values = 2 ** (k - 1)
    if use_extra_value:
        # One extra positive value: asymmetric type with 2**k - 1 non-zeros.
        v1 = norm.ppf(np.linspace(offset, 0.5, num_values + 1)[:-1]).tolist()
        v2 = [0.0]
        v3 = (-norm.ppf(np.linspace(offset, 0.5, num_values)[:-1])).tolist()
    else:
        v1 = norm.ppf(np.linspace(offset, 0.5, num_values)[:-1]).tolist()
        v2 = [0.0] * 2
        v3 = (-norm.ppf(np.linspace(offset, 0.5, num_values)[:-1])).tolist()

    values = np.sort(np.asarray(v1 + v2 + v3, dtype=np.float32))
    values = values / values.max()
    assert values.size == 2 ** k
    return values


def create_normal_map(
    offset: float = 0.9677083, use_extra_value: bool = True, k: int = 4
) -> jax.Array:
    """Normalized normal-quantile codebook with 2**k entries in [-1, 1]."""
    return jnp.asarray(_normal_map_np(offset, use_extra_value, k))


def nf_codebook(k: int = 4, use_extra_value: bool = True,
                int_bits: Optional[int] = None, dtype=jnp.float32) -> jax.Array:
    """Codebook for ``nfK`` / ``nfK_B`` formats, in the requested dtype."""
    values = create_normal_map(k=k, use_extra_value=use_extra_value)
    if int_bits is not None:
        scale_factor = 2 ** (int_bits - 1) - 1
        values = jnp.round(values * scale_factor)
    return values.astype(dtype)


def quantize_to_nf(
    x: jax.Array,
    k: int = 4,
    use_extra_value: bool = True,
    int_bits: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Quantize to the nearest NormalFloat codebook entry.

    Returns ``(indices, values)``: int32 codebook indices plus the codebook in
    ``x.dtype``, mirroring the reference's two-tensor contract.  Ties resolve
    to the lowest index (first-occurrence argmin), like the reference.
    """
    values = nf_codebook(k, use_extra_value, int_bits, x.dtype)
    x = jnp.clip(x, values.min(), values.max())
    # |codebook - x| over a trailing axis of <=16 entries; argmin keeps the
    # first occurrence on ties, matching torch.argmin.
    dist = jnp.abs(values - x[..., None])
    indices = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    return indices, values
