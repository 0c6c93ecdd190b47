"""Compilation artifacts: StableHLO export, compile reports, verification
tensor dumps, and graph visualization (the reference codegen layer
re-imagined for TPU)."""

from .export import export_stablehlo, compile_report, dump_verification_tensors
from .viz import export_graph_dot, hlo_to_dot

__all__ = ["export_stablehlo", "compile_report", "dump_verification_tensors",
           "export_graph_dot", "hlo_to_dot"]
