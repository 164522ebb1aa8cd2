#!/bin/bash
# Round-5 final repair queue (replaces the never-executed r5f/r5g on this
# boot: /tmp was wiped before their chained waits could start). Same
# design as r5f — no outer timeouts, untimed lease waits between rows,
# STOP-file + deadline checks between items — but priority-ordered so the
# rows the committed table is WRONG about (rc=1 error rows) repair first:
#   1. l12-int8max   (the promoted headline's family row)
#   2. l12-int8
#   3. l12-level3-int8max
#   4. l12-cc15m-txt-int8max
#   5. l24-int8max, l42-int8max (absent rather than wrong; last)
# Each row is its own bench_family invocation so PERF.json merges after
# EVERY row, not only when the whole list drains.
set -u
OUT=${1:-/tmp/tpu_r5h}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-2700}

export BENCH_LEASE_WAIT=1
# below the 45 min queue deadline so a hung row is reaped by bench_family's
# inner subprocess timeout (partial PERF.json still written), never from
# outside (ADVICE r4: reap order must not invert)
export BENCH_ROW_TIMEOUT_S=${BENCH_ROW_TIMEOUT_S:-2400}
export BENCH_ROW_LOG_DIR="$OUT/rowlogs"

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

# lease wait before touching the chip
python -c "import jax, jax.numpy as jnp; \
print('lease ok', float(jnp.sum(jnp.ones((128, 128)))))" \
  > "$OUT/waiter.log" 2>&1
grep -q "lease ok" "$OUT/waiter.log" || {
  echo "waiter failed" | tee -a "$OUT/queue.log"; exit 1; }

for row in l12-int8max l12-int8 l12-level3-int8max \
           l12-cc15m-txt-int8max l24-int8max l42-int8max; do
  run "family_$row" python scripts/bench_family.py --rows "$row"
done

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
