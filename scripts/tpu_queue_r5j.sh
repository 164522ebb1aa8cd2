#!/bin/bash
# Round-5 final-boot repair queue: drain the rc=1 int8 rows that predate
# the two-process PTQ split (l12-int8, l12-level3-int8max,
# l12-cc15m-txt-int8max — their error rows were measured with the fused
# calibrate-then-measure process that RESOURCE_EXHAUSTED the chip at
# every batch; bench_family now calibrates in a separate process, the
# form that repaired l12-int8max). Priority order = VERDICT.md items
# 3/4/5. Tightly deadlined: this boot is the last one and the driver's
# bench.py run must find a free chip, so no row STARTS past the
# deadline and a STOP file skips the rest.
set -u
OUT=${1:-/tmp/tpu_r5j}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-1200}

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

export BENCH_LEASE_WAIT=1
# keep the inner per-process reap below the remaining boot budget: a row
# that would overrun into the driver's bench window is reaped by its own
# subprocess timeout (partial PERF.json merge preserved)
export BENCH_ROW_TIMEOUT_S=${BENCH_ROW_TIMEOUT_S:-1500}
export BENCH_ROW_LOG_DIR="$OUT/rowlogs"

# lease wait before touching the chip: UNTIMED single op in a throwaway
# subprocess (never killed, so it cannot extend a wedge)
python -c "import jax, jax.numpy as jnp; \
print('lease ok', float(jnp.sum(jnp.ones((128, 128)))))" \
  > "$OUT/waiter.log" 2>&1
grep -q "lease ok" "$OUT/waiter.log" || {
  echo "waiter failed" | tee -a "$OUT/queue.log"; exit 1; }
echo "lease ok ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

run family_l12i8 python scripts/bench_family.py --rows l12-int8
run family_l3i8m python scripts/bench_family.py --rows l12-level3-int8max
run family_txti8m python scripts/bench_family.py --rows l12-cc15m-txt-int8max

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
