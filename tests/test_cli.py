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


class TestLauncher:
    """Thin job launcher (reference utils.py:22-67 slurm analogue)."""

    def test_local_launcher_runs_jobs_and_logs(self, tmp_path):
        import sys
        from quantized_training_tpu.utils.launcher import Job, LocalLauncher

        jobs = [
            Job("ok", [sys.executable, "-c", "print('hello-0')"]),
            Job("fail", [sys.executable, "-c", "import sys; sys.exit(3)"]),
            Job("envjob", [sys.executable, "-c",
                           "import os; print(os.environ['QT_TEST_VAR'])"],
                env={"QT_TEST_VAR": "42"}),
        ]
        res = LocalLauncher(log_dir=str(tmp_path), max_parallel=2).run(jobs)
        assert [r.name for r in res] == ["ok", "fail", "envjob"]
        assert [r.returncode for r in res] == [0, 3, 0]
        assert "hello-0" in open(res[0].log_path).read()
        assert "42" in open(res[2].log_path).read()

    def test_render_tpu_script(self, tmp_path):
        from quantized_training_tpu.utils.launcher import Job, render_tpu_script

        p = render_tpu_script(
            Job("j1", ["python", "train.py", "--lr", "1e-3"],
                env={"X": "a b"}),
            log_dir=str(tmp_path), setup="source /env/setup.sh")
        body = open(p).read()
        assert "python train.py --lr 1e-3" in body
        assert "export X='a b'" in body
        assert "source /env/setup.sh" in body
