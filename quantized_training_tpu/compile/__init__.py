"""Compilation artifacts: StableHLO export, compile reports, verification
tensor dumps (the reference codegen layer re-imagined for TPU)."""

from .export import export_stablehlo, compile_report, dump_verification_tensors

__all__ = ["export_stablehlo", "compile_report", "dump_verification_tensors"]
