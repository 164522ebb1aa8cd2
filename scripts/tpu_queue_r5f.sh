#!/bin/bash
# Round-5 int8 family-row repair queue, take 3 (chained AFTER
# tpu_queue_r5e.sh). r5e's first rows ran before the calibration fixes
# landed: the cal process OOM'd executing the UNCHUNKED 256-sample
# decode-calibration (~8 GB of 256^2 conv activations) — the whole
# calibration pipeline queues unexecuted on this async-dispatch relay
# until the first host fetch, so the OOM surfaced there.
#
# Fixes now on disk: calibrate_int8_decode chunks at 128 with a forced
# fetch per slice; every calibration stage force-executes before the next
# queues (twostage.py, measure_throughput._calibrate_int8).
#
# Queue design identical to r5e: no outer timeouts, untimed lease waits,
# STOP checked between items; repair list recomputed at start.
set -u
OUT=${1:-/tmp/tpu_r5f}
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

# chain: wait for the r5e queue to drain
PREV_PID=$(cat /tmp/tpu_r5e.pid 2>/dev/null || echo "")
echo "waiting for r5e pid=$PREV_PID ($(date -u +%H:%M:%SZ))" \
  | tee -a "$OUT/queue.log"
for _ in $(seq 1 2000); do
  if [ -z "$PREV_PID" ] || ! kill -0 "$PREV_PID" 2>/dev/null; then
    break
  fi
  sleep 30
done
echo "r5e drained ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

export BENCH_LEASE_WAIT=1
# 3600, not 2400: the l24 calibration process (870M params, two full
# sampler compiles) exceeded 2400s and was reaped mid-run (r5e)
export BENCH_ROW_TIMEOUT_S=3600
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

# root-cause artifact: device-memory walk of the calibration sequence at
# the once-failing shape (best-effort; memory_stats may be unavailable)
run diag_mem python scripts/diag_int8_mem.py 256 int8max

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
