"""Paper-experiment launcher: the command matrix over quantized dtypes.

TPU-native counterpart of the reference's experiment launcher (reference:
run_quantized_training.py:9-74 — per-model hyperparameter tables; :215-235 —
the {bf16, posit8, posit8-approx, posit8-approx-shifted, fp8} command matrix;
asplos_training.sh — the 240-invocation grid).  Differences by design: no
slurm (single-host TPU + mesh parallelism instead of sbatch fan-out), and a
``--sweep`` mode that regenerates the full ladder sweep on tiny synthetic
fixtures offline — one command, one CSV — since GLUE/SQuAD checkpoints are
not downloadable in every environment.

Usage:
  # print (or run) the reference-parity command matrix for a task:
  python run_quantized_training.py --task mrpc --model mobilebert_tiny
  python run_quantized_training.py --task squad --model mobilebert_tiny \
      --run_job posit8 --model_path ckpts/mobilebert

  # regenerate the dtype ladder sweep on synthetic fixtures (writes CSV):
  python run_quantized_training.py --sweep --output_csv sweep.csv
"""

import argparse
import csv
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

# Per-(model, task) hyperparameters: batch size, learning rate, epochs
# (reference run_quantized_training.py:9-41, verbatim semantic table).
HYPERPARAMETERS = {
    "mobilebert_tiny": {
        "mnli": [16, 12e-4, 30],
        "qnli": [16, 8e-4, 50],
        "mrpc": [16, 11e-4, 30],
        "sst2": [16, 10e-4, 60],
        "squad": [16, 10e-2, 30],
    },
    "mobilebert": {
        "mnli": [16, 12e-4, 30],
        "qnli": [16, 8e-4, 50],
        "mrpc": [16, 8e-4, 30],
        "sst2": [16, 8e-4, 60],
        "squad": [16, 10e-2, 30],
    },
    "bert_base": {
        "mnli": [16, 14e-4, 30],
        "qnli": [32, 7e-4, 25],
        "mrpc": [16, 5e-4, 50],
        "sst2": [16, 9e-4, 60],
        "squad": [16, 10e-4, 30],
    },
    "bert_large": {
        "mnli": [4, 7e-4, 10],
        "qnli": [4, 4e-4, 10],
        "mrpc": [4, 5e-4, 20],
        "sst2": [4, 5e-4, 10],
        "squad": [4, 5e-4, 10],
    },
}

# LoRA settings per model (reference run_quantized_training.py:43-74).
LORA_CONFIG = {
    "mobilebert_tiny": {
        "lora_rank": 8, "lora_alpha": 8,
        "target_modules": "query,key,value,dense",
        "quantized_ops": "gemm",
    },
    "mobilebert": {
        "lora_rank": 8, "lora_alpha": 8,
        "target_modules": "query,key,value,dense",
        "quantized_ops": "gemm",
    },
    "bert_base": {
        "lora_rank": 8, "lora_alpha": 8,
        "target_modules": "query,value",
        "quantized_ops": "gemm,residual,layernorm,activation",
    },
    "bert_large": {
        "lora_rank": 8, "lora_alpha": 16,
        "target_modules": "query,value",
        "quantized_ops": "gemm,residual,layernorm,activation",
    },
}

# The dtype command matrix (reference run_quantized_training.py:215-235).
POSIT_ARGS = [
    "--activation", "posit8_1",
    "--weight", "posit8_1",
    "--error", "posit8_1,qs=per_tensor_symmetric,qmax=64,ahl=10",
]
FP8_ARGS = [
    "--activation", "fp8_e4m3",
    "--weight", "fp8_e4m3",
    "--error", "fp8_e5m2,qs=per_tensor_symmetric,qmax=57344,ahl=10",
]
DTYPE_MATRIX = {
    "bf16": [],
    "posit8": POSIT_ARGS,
    "posit8-approx": POSIT_ARGS + ["--posit_reciprocal", "--posit_exp"],
    "posit8-approx-shifted": POSIT_ARGS + ["--posit_reciprocal",
                                           "--posit_exp_shifted"],
    "fp8": FP8_ARGS,
}


def build_commands(args):
    """Reference-parity command matrix for one (model, task, seed)."""
    hp = HYPERPARAMETERS.get(args.model, {}).get(args.task)
    lora = LORA_CONFIG.get(args.model, {})
    bs = args.batch_size or (hp[0] if hp else 16)
    lr = args.learning_rate or (hp[1] if hp else 5e-5)
    epochs = args.num_train_epochs or (hp[2] if hp else 3)
    quantized_ops = args.quantized_ops or lora.get("quantized_ops", "gemm")

    if args.task in {"mnli", "qnli", "mrpc", "sst2"}:
        base = [sys.executable, os.path.join(REPO, "examples/run_glue.py"),
                "--task_name", args.task, "--max_seq_length", "128"]
        if args.data_json:
            base += ["--data_json", args.data_json]
    elif args.task == "squad":
        # training driver (reference run_quantized_training.py:145 launches
        # run_qa_no_trainer.py); the ladder sweep over a trained checkpoint
        # is examples/run_squad.py
        model_type = ("mobilebert" if "mobilebert" in args.model
                      else "roberta" if "roberta" in args.model else "bert")
        base = [sys.executable, os.path.join(REPO, "examples/run_qa.py"),
                "--squad_json", args.squad_json or "squad_dev.json",
                "--model_type", model_type,
                "--max_seq_length", "384"]
    elif args.task == "wikitext":
        base = [sys.executable, os.path.join(REPO, "examples/wikitext.py")]
    else:
        raise ValueError(f"unknown task {args.task}")

    base += ["--model_path", args.model_path or args.model]
    if args.output_dir:
        base += ["--output_dir", args.output_dir]
    if args.task != "wikitext":
        base += [
            "--per_device_train_batch_size", str(bs),
            "--learning_rate", str(lr),
            "--num_train_epochs", str(epochs),
            "--seed", str(args.seed),
        ]
        if lora:
            base += ["--lora_rank", str(lora["lora_rank"]),
                     "--lora_alpha", str(lora["lora_alpha"]),
                     "--lora_target_modules", lora["target_modules"]]

    quant = ["--quantize_forward", quantized_ops,
             "--quantize_backprop", quantized_ops]
    out = {}
    for name, dtype_args in DTYPE_MATRIX.items():
        cmd = list(base)
        if dtype_args:
            cmd += quant + dtype_args
        out[name] = cmd
    return out


# ---------------------------------------------------------------------------
# Offline ladder sweep on synthetic fixtures
# ---------------------------------------------------------------------------

SWEEP_DRIVERS = {
    # driver -> (script, extra args, json key for the result metric)
    "kws": ("examples/run_kws.py", ["--max_steps", "8"], "final_loss"),
    "asr": ("examples/run_speech_recognition.py",
            ["--max_steps", "8"], "final_loss"),
    "segmentation": ("examples/run_segmentation.py",
                     ["--max_steps", "8", "--image_size", "32"],
                     "final_loss"),
    "imagenet": ("examples/run_imagenet.py",
                 ["--max_steps", "8", "--synthetic", "--image_size", "64",
                  "--arch", "resnet18"], "final_loss"),
}


def run_sweep(args):
    rows = []
    dtypes = args.dtypes.split(",") if args.dtypes else list(DTYPE_MATRIX)
    drivers = (args.drivers.split(",") if args.drivers
               else list(SWEEP_DRIVERS))
    for task in drivers:
        script, extra, key = SWEEP_DRIVERS[task]
        for dtype in dtypes:
            cmd = [sys.executable, os.path.join(REPO, script)] + extra + [
                "--seed", str(args.seed)]
            if dtype != "bf16":
                cmd += ["--quantize_forward", "gemm"] + DTYPE_MATRIX[dtype]
                # error quant needs backprop fusion on for parity with the
                # reference sweep
                cmd += ["--quantize_backprop", "gemm"]
            print("sweep:", task, dtype, flush=True)
            proc = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO)
            metric = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    payload = json.loads(line)
                    metric = payload.get(key)
                    break
                except (json.JSONDecodeError, AttributeError):
                    continue
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-2000:] + "\n")
            rows.append({"task": task, "dtype": dtype, "seed": args.seed,
                         "metric": key,
                         "value": metric,
                         "status": "ok" if proc.returncode == 0 else "fail"})
    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["task", "dtype", "seed", "metric", "value",
                           "status"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} rows -> {args.output_csv}")
    bad = [r for r in rows if r["status"] != "ok"]
    return 1 if bad else 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default=None,
                        help="mnli|qnli|mrpc|sst2|squad|wikitext")
    parser.add_argument("--model", default="mobilebert_tiny")
    parser.add_argument("--model_path", default=None,
                        help="checkpoint dir for the driver")
    parser.add_argument("--squad_json", default=None)
    parser.add_argument("--data_json", default=None,
                        help="local JSONL for the GLUE drivers (offline)")
    parser.add_argument("--output_dir", default=None,
                        help="checkpoint/output dir passed to the driver")
    parser.add_argument("-bs", "--batch_size", type=int, default=None)
    parser.add_argument("-lr", "--learning_rate", type=float, default=None)
    parser.add_argument("-epochs", "--num_train_epochs", type=int,
                        default=None)
    parser.add_argument("--quantized_ops", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--run_job", nargs="?", const="all", default="",
                        help="run the generated command(s) (name or 'all')")
    parser.add_argument("--sweep", action="store_true",
                        help="run the offline dtype ladder sweep -> CSV")
    parser.add_argument("--drivers", default=None,
                        help="comma list of sweep drivers "
                             f"({','.join(SWEEP_DRIVERS)})")
    parser.add_argument("--dtypes", default=None,
                        help="comma list of dtype rungs "
                             f"({','.join(DTYPE_MATRIX)})")
    parser.add_argument("--output_csv", default="ladder_sweep.csv")
    parser.add_argument("--launch", choices=["inline", "local", "render"],
                        default="inline",
                        help="how to execute --run_job commands: inline "
                             "(subprocess.run, default), local (LocalLauncher "
                             "queue with per-job logs), render (write shell "
                             "scripts only — the write_slurm_script analogue)")
    parser.add_argument("--log_dir", default="logs")
    args = parser.parse_args()

    if args.sweep:
        sys.exit(run_sweep(args))

    if not args.task:
        parser.error("--task is required (or use --sweep)")

    commands = build_commands(args)
    selected = {
        name: cmd for name, cmd in commands.items()
        if args.run_job == "all" or name in args.run_job.split(",")
    }
    for name, cmd in commands.items():
        if name not in selected:
            print(f"[{name}]", " ".join(cmd))

    if not selected:
        return
    if args.launch == "inline":
        for name, cmd in selected.items():
            print("Running:", " ".join(cmd), "\n", flush=True)
            subprocess.run(cmd, check=True, cwd=REPO)
    else:
        from quantized_training_tpu.utils.launcher import (
            Job, LocalLauncher, render_tpu_script,
        )
        jobs = [Job(f"{args.model}_{args.task}_{name}", cmd, cwd=REPO)
                for name, cmd in selected.items()]
        if args.launch == "render":
            for job in jobs:
                print("rendered:", render_tpu_script(job, args.log_dir))
        else:
            for r in LocalLauncher(args.log_dir).run(jobs):
                print(f"{r.name}: rc={r.returncode} "
                      f"({r.seconds:.1f}s) log={r.log_path}")


if __name__ == "__main__":
    main()
