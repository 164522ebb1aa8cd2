#!/bin/bash
# Round-4d recovery queue. The relay answers HTTP but the device lease is
# wedged (ops hang). Step 1 WAITS for the lease by blocking on a single
# real op with no timeout (a hanging-but-alive client kills nothing, so it
# can't extend the wedge); once it completes, the prioritized queue runs:
#   1) family l12-int8max / l12-int8 rows (replace the OOM error rows in
#      PERF.json, now that the calibration memory fix is in)
#   2) a skip-sections bench.py pass validating the NEW defaults
#      (bf16 batch 1536 + int8max batch 2048) end-to-end
#   3) l24/l42 int8max family rows
# Bounded by QUEUE_DEADLINE_S from launch and a STOP file; item timeouts
# are tight so the driver's end-of-round bench.py never queues behind us.
set -u
OUT=${1:-/tmp/tpu_r4d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-2400}

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
  echo "rc=$? $name ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

# 0) lease waiter: block (untimed) on one tiny op; poll progress via log
echo "waiting for lease ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
python -c "
import time, jax, jax.numpy as jnp
t0 = time.time()
v = float(jnp.sum(jnp.ones((128, 128))))
print('lease ok', v, round(time.time() - t0, 1), flush=True)
" > "$OUT/waiter.log" 2>&1
grep -q "lease ok" "$OUT/waiter.log" || {
  echo "waiter failed" | tee -a "$OUT/queue.log"; exit 1; }
echo "lease recovered ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

# 1) the two error rows in PERF.json, flagship first. BENCH_ROW_TIMEOUT_S
# keeps the row subprocess's inner reap BELOW the queue's shell timeout so
# a hung row is reaped inside bench_family.py (partial PERF.json survives,
# no SIGTERM of a live TPU child).
run family_l12i8m 1500 env BENCH_ROW_TIMEOUT_S=1350 \
    python scripts/bench_family.py --rows l12-int8max
run family_l12i8  1200 env BENCH_ROW_TIMEOUT_S=1080 \
    python scripts/bench_family.py --rows l12-int8

# 2) new-defaults bench validation (bf16 e2e @1536 + int8max @2048).
# BENCH_INIT_TIMEOUT_S below the shell timeout so a re-wedged lease is
# conceded by bench.py's own watchdog (JSON artifact emitted) rather than
# the shell SIGTERM-ing a hanging TPU process.
run bench_defaults 1500 env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 \
    BENCH_TOTAL_TIMEOUT_S=1350 BENCH_INIT_TIMEOUT_S=1200 python bench.py

# 3) extend int8max across the family
run family_l24i8m 1200 env BENCH_ROW_TIMEOUT_S=1080 \
    python scripts/bench_family.py --rows l24-int8max
run family_l42i8m 1200 env BENCH_ROW_TIMEOUT_S=1080 \
    python scripts/bench_family.py --rows l42-int8max

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
