#!/bin/bash
# Round-5 continuation queue (chained AFTER tpu_queue_r5h.sh): r5h's
# 45-min deadline only fits the two l12 int8 repairs, so this queue
# recomputes the repair list (rows absent from PERF.json or carrying an
# error field) and drains the rest — level3/txt int8max, then the
# absent l24/l42 int8max rows — followed by the int8max batch-sweep
# probes r5g never got to run (2560/3072 vs the 2048 headline optimum:
# the int8 KV cache halves the dominant HBM resident, so a larger batch
# may now fit). PERF.json merges after every row; the round driver
# commits whatever has landed.
set -u
OUT=${1:-/tmp/tpu_r5i}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-20000}

run() {  # run <name> <cmd...> — NO outer timeout (r5d design)
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

# chain: wait for the r5h queue to drain
PREV_PID=$(cat /tmp/tpu_r5h.pid 2>/dev/null || echo "")
echo "waiting for r5h pid=$PREV_PID ($(date -u +%H:%M:%SZ))" \
  | tee -a "$OUT/queue.log"
for _ in $(seq 1 2000); do
  if [ -z "$PREV_PID" ] || ! kill -0 "$PREV_PID" 2>/dev/null; then
    break
  fi
  sleep 30
done
echo "r5h drained ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

export BENCH_LEASE_WAIT=1
# l12 int8max wall was 636s cal + 998s measure; l24/l42 compile two full
# samplers on bigger models — keep the r5f finding (l24 cal > 2400s)
export BENCH_ROW_TIMEOUT_S=${BENCH_ROW_TIMEOUT_S:-3600}
export BENCH_ROW_LOG_DIR="$OUT/rowlogs"

# lease wait before touching the chip
python -c "import jax, jax.numpy as jnp; \
print('lease ok', float(jnp.sum(jnp.ones((128, 128)))))" \
  > "$OUT/waiter.log" 2>&1
grep -q "lease ok" "$OUT/waiter.log" || {
  echo "waiter failed" | tee -a "$OUT/queue.log"; exit 1; }

REPAIR=$(python - <<'EOF'
import json
want = ['l12-int8', 'l12-level3-int8max', 'l12-cc15m-txt-int8max',
        'l24-int8max', 'l42-int8max']
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

# r5g int8max batch-sweep probes (bs50+phases skipped; int8 section is
# the measurement). Promotion to BENCH_INT8_BATCH default is a manual
# follow-up only if one beats the 2048 headline by >1%.
run sweep_i8_2560 env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 \
    BENCH_INT8_BATCH=2560 BENCH_TOTAL_TIMEOUT_S=3000 \
    BENCH_INIT_TIMEOUT_S=2400 python bench.py
run sweep_i8_3072 env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 \
    BENCH_INT8_BATCH=3072 BENCH_TOTAL_TIMEOUT_S=3000 \
    BENCH_INIT_TIMEOUT_S=2400 python bench.py

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
