#!/bin/bash
# Round-5 int8 family-row repair queue, take 2 (chained AFTER
# tpu_queue_r5d.sh, which was STOPped once its fused-process rows kept
# RESOURCE_EXHAUSTING at every batch — even bs256).
#
# What changed: bench_family.run_row now splits every int8 row into TWO
# processes (measure_throughput scales_out -> scales_in): calibration
# writes a serving-scale artifact and exits; the measurement process loads
# it and compiles only its two programs — the same process shape as the
# bf16 rows, which run to bs2048 on this chip.
#
# Queue design follows r5d: NO outer `timeout` (the inner per-row timeout
# is the only reaper), untimed lease waits between rows, STOP file checked
# between items.
set -u
OUT=${1:-/tmp/tpu_r5e}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-20000}

run() {  # run <name> <cmd...> — NO outer timeout (see header)
  local name=$1; shift
  if [ -f "$OUT/STOP" ]; then
    echo "skip $name (STOP file)" | tee -a "$OUT/queue.log"; return
  fi
  if [ $(( $(date +%s) - QUEUE_START )) -gt "$DEADLINE" ]; then
    echo "skip $name (past deadline)" | tee -a "$OUT/queue.log"; return
  fi
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/queue.log"
  "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? $name ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

# chain: wait for the r5d queue to drain
PREV_PID=$(cat /tmp/tpu_r5d.pid 2>/dev/null || echo "")
echo "waiting for r5d pid=$PREV_PID ($(date -u +%H:%M:%SZ))" \
  | tee -a "$OUT/queue.log"
for _ in $(seq 1 2000); do
  if [ -z "$PREV_PID" ] || ! kill -0 "$PREV_PID" 2>/dev/null; then
    break
  fi
  sleep 30
done
echo "r5d drained ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

export BENCH_LEASE_WAIT=1
export BENCH_ROW_TIMEOUT_S=2400
export BENCH_ROW_LOG_DIR="$OUT/rowlogs"

REPAIR=$(python - <<'EOF'
import json
want = ['l12-int8max', 'l12-int8', 'l12-level3-int8max',
        'l12-cc15m-txt-int8max', 'l24-int8max', 'l42-int8max']
try:
    rows = {r['model']: r for r in json.load(open('PERF.json'))['rows']}
except Exception:
    rows = {}
todo = [m for m in want if m not in rows or 'error' in rows[m]]
print(','.join(todo))
EOF
)
echo "repair rows: ${REPAIR:-none}" | tee -a "$OUT/queue.log"
if [ -n "$REPAIR" ]; then
  IFS=',' read -ra RROWS <<< "$REPAIR"
  for row in "${RROWS[@]}"; do
    run "family_$row" python scripts/bench_family.py --rows "$row"
  done
fi

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
