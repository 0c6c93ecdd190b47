"""Accuracy-table pipeline rehearsal: execute the exact commands ACCURACY.md
promises for the BASELINE tables, end-to-end, on synthetic real-shaped
fixtures (quantized_training_tpu/data/fixtures.py) — so a mounted real
checkpoint + dataset is a drop-in replacement.

Covers the launcher -> training (LoRA + QAT, posit8 rung) -> eval -> ladder
CSV path for SQuAD (reference: run_quantized_training.py:118-160 command
matrix -> run_qa_no_trainer.py; run_squad.py:18-26 ladder) and the GLUE
driver invocation.  Subprocess-based: each command runs exactly as a user
would type it.
"""

import csv
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

from quantized_training_tpu.data.fixtures import (  # noqa: E402
    write_bert_checkpoint, write_glue_jsonl, write_mobilebert_checkpoint,
    write_squad_json,
)


def run_cmd(cmd, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable] + cmd, capture_output=True, text=True, cwd=REPO,
        timeout=timeout, env=env,
    )
    assert proc.returncode == 0, (
        f"command failed: {' '.join(cmd)}\n--- stdout ---\n"
        f"{proc.stdout[-3000:]}\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    return proc


def last_json(stdout):
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise AssertionError(f"no JSON line in output:\n{stdout[-2000:]}")


@pytest.fixture(scope="module")
def mobilebert_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "mobilebert_tiny"
    return str(write_mobilebert_checkpoint(str(path)))


@pytest.fixture(scope="module")
def squad_json(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "squad_dev.json"
    return str(write_squad_json(str(path), n_questions=12))


def test_squad_posit8_rung_via_launcher(tmp_path, mobilebert_ckpt,
                                        squad_json):
    """The ACCURACY.md squad command, posit8 rung, through the LocalLauncher:
    training (LoRA+QAT) + eval + orbax checkpoint, from the HF fixture."""
    out_dir = str(tmp_path / "out")
    log_dir = str(tmp_path / "logs")
    proc = run_cmd([
        "run_quantized_training.py", "--task", "squad",
        "--model", "mobilebert_tiny",
        "--model_path", mobilebert_ckpt,
        "--squad_json", squad_json,
        "--output_dir", out_dir,
        "-bs", "4", "-epochs", "1",
        "--run_job", "posit8", "--launch", "local",
        "--log_dir", log_dir,
    ])
    # LocalLauncher reports rc per job and writes a log file
    assert "rc=0" in proc.stdout, proc.stdout[-2000:]
    logs = [f for f in os.listdir(log_dir) if f.endswith(".log")]
    assert logs, os.listdir(log_dir)
    with open(os.path.join(log_dir, logs[0])) as f:
        payload = last_json(f.read())
    assert payload["steps"] >= 1
    assert 0.0 <= payload["f1"] <= 100.0
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))


def test_squad_bf16_rung_inline(tmp_path, mobilebert_ckpt, squad_json):
    """The bf16 (unquantized) rung of the same matrix, inline launch."""
    out_dir = str(tmp_path / "out")
    proc = run_cmd([
        "run_quantized_training.py", "--task", "squad",
        "--model", "mobilebert_tiny",
        "--model_path", mobilebert_ckpt,
        "--squad_json", squad_json,
        "--output_dir", out_dir,
        "-bs", "4", "-epochs", "1",
        "--run_job", "bf16",
    ])
    payload = last_json(proc.stdout)
    assert payload["steps"] >= 1 and "f1" in payload


def test_squad_ladder_csv(tmp_path, mobilebert_ckpt, squad_json):
    """run_squad.py fusion-ladder sweep -> CSV with an F1 per rung
    (reference run_squad.py:18-26 Table-1 protocol)."""
    out_csv = str(tmp_path / "squad_f1.csv")
    run_cmd([
        "examples/run_squad.py",
        "--model_path", mobilebert_ckpt,
        "--model_type", "mobilebert",
        "--squad_json", squad_json,
        "--dtypes", "posit8_1",
        "--max_examples", "6",
        "--output_csv", out_csv,
    ], timeout=2400)
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and rows[0]["dtype"] == "posit8_1"
    for rung in ("no_fusion", "gemm_attn_scaling", "activation_fusion",
                 "layernorm_fusion", "residual_fusion"):
        assert rows[0][rung] not in (None, "", "None"), rows[0]
        float(rows[0][rung])


def test_glue_mrpc_posit8(tmp_path, tmp_path_factory):
    """The GLUE command with a BERT fixture + offline JSONL (posit8 rung)."""
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "bert_base")
    write_bert_checkpoint(ckpt, head="cls", num_labels=2)
    data = str(write_glue_jsonl(str(tmp_path / "mrpc.jsonl"), "mrpc", n=16))
    out_dir = str(tmp_path / "out")
    proc = run_cmd([
        "run_quantized_training.py", "--task", "mrpc",
        "--model", "bert_base",
        "--model_path", ckpt,
        "--data_json", data,
        "--output_dir", out_dir,
        "-bs", "4", "-epochs", "1",
        "--run_job", "posit8",
    ])
    payload = last_json(proc.stdout)
    assert payload["steps"] >= 1
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))
