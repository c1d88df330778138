#!/bin/bash
# One-shot round artifact producer for the real TPU.  Runs each stage as
# its own python process, STRICTLY SEQUENTIALLY (the compile relay is
# single-connection: two concurrent jax processes hang each other), with
# logs under artifacts_tpu/.  Usage: tools/run_round_tpu.sh [round]
set -u
cd "$(dirname "$0")/.."
R="${1:-3}"
mkdir -p artifacts_tpu

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "artifacts_tpu/$name.log" 2>&1
  local rc=$?
  echo "    exit=$rc  ($(date +%H:%M:%S))"
  tail -2 "artifacts_tpu/$name.log" | sed 's/^/    /'
  return $rc
}

# quick liveness check first so a dead relay fails fast
run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable; aborting"; exit 1; }

run proto_mxu_swt   3600 python tools/proto_mxu_swt.py
run bench_suite     5400 python tools/bench_suite.py --out "BENCH_SUITE.jsonl"
run verify_tpu      5400 python tools/verify_tpu.py --out "VERIFY_TPU_r0$R.jsonl"
run scaling_batch   1800 python tools/scaling_bench.py --mode batch \
    --out "SCALING_r0$R.jsonl"
run scaling_spatial 1800 python tools/scaling_bench.py --mode spatial \
    --out "SCALING_r0$R.jsonl"
run bench           1200 python bench.py

echo "=== done; artifacts ==="
ls -la BENCH_SUITE.jsonl "VERIFY_TPU_r0$R.jsonl" "SCALING_r0$R.jsonl" 2>/dev/null
tail -1 artifacts_tpu/bench.log
