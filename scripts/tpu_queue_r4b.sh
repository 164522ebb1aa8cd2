#!/bin/bash
# Round-4 follow-up TPU queue — runs AFTER tpu_queue_r4.sh (one chip; never
# concurrent). Jobs:
#   1) full bench.py revalidation with the NEW defaults (int8 section =
#      int8max: KV + decode + depth-chain + spatial gemms, measured 589/s
#      when opted in; now the default the driver will hit at end of round)
#   2) family l12-int8 / l12-int8max rows retried with the calibration
#      memory fix in measure_throughput.py (jax.clear_caches() after
#      calibration; the old code OOM'd at bs2048)
# Usage: bash scripts/tpu_queue_r4b.sh [outdir]   # default /tmp/tpu_r4b
set -u
OUT=${1:-/tmp/tpu_r4b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-21600}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -f "$OUT/STOP" ]; then
    echo "skip $name (STOP file)" | tee -a "$OUT/queue.log"; return
  fi
  if [ $(( $(date +%s) - QUEUE_START )) -gt "$DEADLINE" ]; then
    echo "skip $name (past deadline)" | tee -a "$OUT/queue.log"; return
  fi
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

run smoke 90 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.sum(jnp.ones((128, 128)))))"
grep -q "rc=0 smoke" "$OUT/queue.log" || { echo "chip not usable"; exit 1; }

# 1) full default bench (bs50 + phases + int8max section) — exactly what
#    the driver runs at end of round
run bench_default 5400 env BENCH_TOTAL_TIMEOUT_S=5100 python bench.py

# 2) family int8 rows with the calibration memory fix
run family_l12i8m 4200 python scripts/bench_family.py --rows l12-int8max
run family_l12i8 4200 python scripts/bench_family.py --rows l12-int8

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
