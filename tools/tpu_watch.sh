#!/bin/bash
# Probe the TPU compile relay every 5 minutes; when it answers, run the
# one-shot round artifact producer (tools/run_round_tpu.sh) exactly once.
# Only ever one jax process at a time (the relay is single-connection).
# Status lines go to artifacts_tpu/watch.log.
set -u
cd "$(dirname "$0")/.."
R="${1:-3}"
mkdir -p artifacts_tpu
LOG=artifacts_tpu/watch.log
echo "watch start $(date +%H:%M:%S)" >> "$LOG"
while true; do
  timeout 180 python -c "import jax; d=jax.devices(); assert d" \
      > /dev/null 2>&1
  if [ $? -eq 0 ]; then
    echo "relay UP $(date +%H:%M:%S); starting round run" >> "$LOG"
    bash tools/run_round_tpu.sh "$R" >> artifacts_tpu/round_run.log 2>&1
    echo "round run finished rc=$? $(date +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  echo "relay down $(date +%H:%M:%S)" >> "$LOG"
  sleep 300
done
