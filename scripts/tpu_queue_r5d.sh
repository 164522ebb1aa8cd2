#!/bin/bash
# Round-5 int8 family-row repair queue (chained AFTER tpu_queue_r5c.sh,
# which was STOPped when its 1400s row timeout proved too tight for the
# int8 rows — a timed-out row kills its TPU child mid-run and can wedge
# the device lease for the NEXT row).
#
# Design differences from r5c:
#   - BENCH_ROW_TIMEOUT_S=2400 (int8 rows carry extra calibration compiles;
#     the 1024-batch l12-int8max exceeded 1400s without OOMing)
#   - NO outer `timeout` around bench_family: the inner per-row timeout is
#     the only reaper, so a SIGTERM can never orphan or kill a TPU child
#     from outside; the queue deadline is checked BETWEEN items
#   - BENCH_LEASE_WAIT=1: bench_family blocks untimed on a throwaway
#     one-op subprocess before each row, absorbing any lease wedge left
#     by a previous kill
set -u
OUT=${1:-/tmp/tpu_r5d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-16000}

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

# chain: wait for the r5c queue to drain
PREV_PID=$(cat /tmp/tpu_r5c.pid 2>/dev/null || echo "")
echo "waiting for r5c pid=$PREV_PID ($(date -u +%H:%M:%SZ))" \
  | tee -a "$OUT/queue.log"
for _ in $(seq 1 2000); do
  if [ -z "$PREV_PID" ] || ! kill -0 "$PREV_PID" 2>/dev/null; then
    break
  fi
  sleep 30
done
echo "r5c drained ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

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
