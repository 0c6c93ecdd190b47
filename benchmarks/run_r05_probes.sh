#!/bin/bash
# Sequential r05 chip-probe queue (one TPU; runs must not overlap).
# Usage: bash benchmarks/run_r05_probes.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-.}

run() {
  name=$1; shift
  echo "=== $name ===" >&2
  timeout 3600 python "$@" > "$OUT/BENCH_${name}_r05.json" \
      2> "$OUT/err_${name}_r05.log"
  echo "exit $? ($name)" >&2
}

run W2X benchmarks/probe_w2_expand.py
run PREFILL benchmarks/probe_prefill7b.py
run TRAIN benchmarks/train_bench.py
run TRAINDECOMP benchmarks/probe_train_decomp.py
run SPEC benchmarks/speculative_bench.py
