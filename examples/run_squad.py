"""Fusion-ladder SQuAD sweep — Table-1 reproduction driver (reference:
examples/question_answering/run_squad.py:18-26,85-120).

Walks the fusion ladder for each dtype by shrinking --quantize_forward from
all five op categories down to gemm alone, invoking squad_eval.py per cell
and collecting F1 into a CSV.
"""

import argparse
import csv
import json
import os
import subprocess
import sys

# The paper's ladder: "No Fusion" ... "+ Residual Fusion"
# (reference run_squad.py:18-26)
FUSION_RUNGS = [
    ("no_fusion", "gemm,activation,layernorm,residual,scaling"),
    ("gemm_attn_scaling", "gemm,activation,layernorm,residual"),
    ("activation_fusion", "gemm,layernorm,residual"),
    ("layernorm_fusion", "gemm,residual"),
    ("residual_fusion", "gemm"),
]

DTYPES = ["posit8_1", "e4m3"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--model_type", default="mobilebert")
    parser.add_argument("--squad_json", required=True)
    parser.add_argument("--output_csv", default="squad_f1.csv")
    parser.add_argument("--dtypes", default=",".join(DTYPES))
    parser.add_argument("--max_examples", type=int, default=None)
    args = parser.parse_args()

    rows = []
    for dtype in args.dtypes.split(","):
        row = {"dtype": dtype}
        for name, ops in FUSION_RUNGS:
            cmd = [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "squad_eval.py"),
                "--model_path", args.model_path,
                "--model_type", args.model_type,
                "--squad_json", args.squad_json,
                "--activation", dtype,
                "--weight", dtype,
                "--quantize_forward", ops,
            ]
            if args.max_examples:
                cmd += ["--max_examples", str(args.max_examples)]
            out = subprocess.run(cmd, capture_output=True, text=True)
            try:
                result = json.loads(out.stdout.strip().splitlines()[-1])
                row[name] = result["f1"]
            except Exception:
                print(out.stdout, out.stderr, file=sys.stderr)
                row[name] = None
            print(f"{dtype} {name}: f1={row[name]}", flush=True)
        rows.append(row)

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["dtype"] + [n for n, _ in FUSION_RUNGS])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {args.output_csv}")


if __name__ == "__main__":
    main()
