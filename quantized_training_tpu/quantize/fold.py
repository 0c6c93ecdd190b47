"""Offline weight folding: apply weight fake-quant once, serve with an
activation-only config.

QAT semantics re-round weights every step; for inference that is wasted VPU
work on constant tensors.  ``fold_quantized_weights`` rounds every kernel at
its site's weight spec once (the serving deployment step), and
``strip_weight_specs`` drops weight quantization from the config so the
runtime path only quantizes activations — bit-identical outputs to the
unfolded model.
"""

from dataclasses import replace
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import flax

from ..numerics import quantize_fn
from ..qspec import QScheme
from .config import QConfig, QuantConfig
from .fake_quant import fake_quantize

__all__ = ["fold_quantized_weights", "strip_weight_specs"]


def fold_quantized_weights(params: Dict, qconfig: QuantConfig,
                           compute_dtype=jnp.bfloat16) -> Dict:
    """Round every ``kernel`` (and lora_a/lora_b) per its site's weight spec.

    Only direct-rounding and stateless (MX / group-affine) weight schemes are
    foldable; per-tensor delayed-scaling weights keep their runtime observers
    and are left untouched.
    """
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for key, leaf in flat.items():
        name = key[-1]
        if name in ("kernel", "lora_a", "lora_b"):
            site = ".".join(str(k) for k in key[:-1])
            spec = qconfig.weight_spec(site)
            if spec is not None and spec.qscheme in (
                None, QScheme.MICROSCALING, QScheme.GROUP_WISE_AFFINE
            ):
                q, _ = fake_quantize(
                    leaf.astype(compute_dtype), spec, None,
                    observe=False, quantize=True)
                leaf = q.astype(leaf.dtype)
        out[key] = leaf
    return flax.traverse_util.unflatten_dict(out)


def strip_weight_specs(qconfig: QuantConfig) -> QuantConfig:
    """Config with all weight specs removed (use after folding)."""

    def strip(qc):
        return replace(qc, weight=None) if qc is not None else None

    return replace(
        qconfig,
        global_qconfig=strip(qconfig.global_qconfig),
        module_name_rules=tuple(
            (p, strip(qc)) for p, qc in qconfig.module_name_rules),
        op_type_rules=tuple(
            (p, strip(qc)) for p, qc in qconfig.op_type_rules),
        module_name_op_index_rules=tuple(
            (p, o, i, strip(qc))
            for p, o, i, qc in qconfig.module_name_op_index_rules),
    )
