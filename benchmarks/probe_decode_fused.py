"""Decode GEMM probe at the r05 flagship shapes (fused qkv)."""
import json, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np, jax, jax.numpy as jnp
import probe_decode7b as P

P.SHAPES = [
    ("qkv_fused", 4096, 12288, 1),
    ("o", 4096, 4096, 1),
    ("gate_up", 4096, 11008, 2),
    ("down", 11008, 4096, 1),
    ("lm_head", 4096, 32000, 1),
]
P.probe_affine(4)
