#!/bin/bash
# Round-5 int8max batch sweep (chained AFTER tpu_queue_r5f.sh): the int8
# KV cache halves the dominant HBM resident, so the pipelined int8max
# program may fit ABOVE the measured 2048 optimum now that nothing else
# competes for HBM. Quick bench.py probes at 2560/3072 (bs50+phases
# sections skipped; int8 section is the measurement). If either beats
# the 2048 headline by >1%, promote it as bench.py's BENCH_INT8_BATCH
# default in a follow-up commit and validate with one full bench.py run.
set -u
OUT=${1:-/tmp/tpu_r5g}
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

# chain: wait for the r5f queue to drain
PREV_PID=$(cat /tmp/tpu_r5f.pid 2>/dev/null || echo "")
echo "waiting for r5f pid=$PREV_PID ($(date -u +%H:%M:%SZ))" \
  | tee -a "$OUT/queue.log"
for _ in $(seq 1 2000); do
  if [ -z "$PREV_PID" ] || ! kill -0 "$PREV_PID" 2>/dev/null; then
    break
  fi
  sleep 30
done
echo "r5f drained ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

# lease wait before touching the chip
python -c "import jax, jax.numpy as jnp; \
print('lease ok', float(jnp.sum(jnp.ones((128, 128)))))" \
  > "$OUT/waiter.log" 2>&1
grep -q "lease ok" "$OUT/waiter.log" || {
  echo "waiter failed" | tee -a "$OUT/queue.log"; exit 1; }

run sweep_i8_2560 env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 \
    BENCH_INT8_BATCH=2560 BENCH_TOTAL_TIMEOUT_S=3000 \
    BENCH_INIT_TIMEOUT_S=2400 python bench.py
run sweep_i8_3072 env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 \
    BENCH_INT8_BATCH=3072 BENCH_TOTAL_TIMEOUT_S=3000 \
    BENCH_INIT_TIMEOUT_S=2400 python bench.py

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
