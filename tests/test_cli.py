"""CLI flag-surface tests: the reference's argument grammar maps to
QuantConfig correctly."""

import argparse

from quantized_training_tpu.cli import add_qspec_args, quant_config_from_args
from quantized_training_tpu.quantize.config import OpCategory


def parse(argv):
    parser = argparse.ArgumentParser()
    add_qspec_args(parser)
    return parser.parse_args(argv)


def test_paper_posit8_run():
    """The reference's posit8 training invocation
    (run_quantized_training.py:212-235)."""
    args = parse([
        "--activation", "posit8_1", "--weight", "posit8_1",
        "--error", "posit8_1,qs=per_tensor_symmetric,qmax=64,ahl=10",
        "--quantize_forward", "gemm,residual,layernorm,activation",
        "--quantize_backprop", "gemm",
    ])
    cfg = quant_config_from_args(args)
    qc = cfg.global_qconfig
    assert qc.activation.dtype == "posit8_1" and qc.activation.qscheme is None
    assert qc.error.quant_max == 64.0
    assert qc.error.amax_history_len == 10
    assert OpCategory.SCALING not in cfg.forward_categories
    assert cfg.backward_categories == (OpCategory.GEMM,)


def test_no_quant_args_gives_none():
    assert quant_config_from_args(parse([])) is None


def test_activation_only_defaults_all_categories():
    cfg = quant_config_from_args(parse(["--activation", "e4m3"]))
    assert set(cfg.forward_categories) == set(OpCategory)
    assert cfg.backward_categories == ()


def test_op_fusion_and_lora():
    args = parse([
        "--activation", "e4m3", "--op_fusion", "lm_head,embed",
        "--lora_rank", "8",
    ])
    cfg = quant_config_from_args(args)
    assert cfg.op_fusion == ("lm_head", "embed")
    assert cfg.resolve("model.lm_head", "linear") is None  # fused out
    assert cfg.lora_rank == 8
