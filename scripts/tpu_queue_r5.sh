#!/bin/bash
# Round-5 measurement queue (serialized, one chip):
#   1) repair PERF.json's l12-int8 / l12-int8max rows (post-OOM-fix batches)
#   2) l12-bs50 bf16 row (reference-protocol batch, apples-to-apples)
#   3) flagship int8max quality evidence: token agreement + per-step logit
#      KL at L12 d=1536 (scripts/int8_agreement.py)
#   4) NEW int8max family rows: 3-level and txt2img
#   5) stage-1 training throughput row (stage1-train)
# Inner timeouts stay BELOW the shell timeouts (BENCH_ROW_TIMEOUT_S) so a
# hung row is reaped inside python and no live TPU child gets SIGTERM'd.
set -u
OUT=${1:-/tmp/tpu_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
mkdir -p docs/measurements/r5

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-10800}

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

# 1) PERF.json repair rows
run family_l12i8m 1500 env BENCH_ROW_TIMEOUT_S=1350 \
    python scripts/bench_family.py --rows l12-int8max
run family_l12i8 1500 env BENCH_ROW_TIMEOUT_S=1350 \
    python scripts/bench_family.py --rows l12-int8

# 2) reference-protocol bs50 row
run family_bs50 1500 env BENCH_ROW_TIMEOUT_S=1350 \
    python scripts/bench_family.py --rows l12-bs50

# 3) flagship int8max quality evidence
run int8_agreement 2700 python scripts/int8_agreement.py --batch 256 \
    --kl-chunk 64 --out docs/measurements/r5/int8_agreement_l12.json

# 4) new int8max capability rows
run family_l3i8m 2100 env BENCH_ROW_TIMEOUT_S=1950 \
    python scripts/bench_family.py --rows l12-level3-int8max
run family_txti8m 2100 env BENCH_ROW_TIMEOUT_S=1950 \
    python scripts/bench_family.py --rows l12-cc15m-txt-int8max

# 5) stage-1 training throughput row (flagship imagenet stage-1, LPIPS on,
#    bf16 — the main_stage1.py production settings)
run stage1_train 1500 python scripts/bench_stage1_step.py \
    --batch 32 --lpips --bf16 --perf-row
grep -q "img/s/chip" "$OUT/stage1_train.log" || \
run stage1_train_b16 1500 python scripts/bench_stage1_step.py \
    --batch 16 --lpips --bf16 --perf-row

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
