"""Standalone integer-dot HLO verification for the w8a8 path.

The full 7B w8a8 arm takes ~30 min of tunnel compiles; this compiles a
2-layer model at 7B layer geometry instead and runs the same strict
operand-resolving check (llama7b_serving.check_integer_dot) on both the
prefill and cached-decode device HLO.  The count scales linearly with
layers, so sites_per_layer x 32 reproduces the full-model expectation.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import jax
import jax.numpy as jnp

from llama7b_serving import build, check_integer_dot, materialize


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    from dataclasses import replace
    model, cfg = build("7b", "w8a8", batch=2, max_prefill=128,
                       max_decode=16, kv_fmt="i4")
    cfg2 = replace(cfg, num_hidden_layers=2)
    model = type(model)(cfg2, model.qconfig)
    variables = materialize(model, "w8a8", 64)
    check_integer_dot(model, variables, 2, 128)


if __name__ == "__main__":
    main()
