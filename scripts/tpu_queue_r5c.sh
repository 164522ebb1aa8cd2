#!/bin/bash
# Round-5 cleanup queue (chained AFTER tpu_queue_r5b.sh):
#   0) wait for the r5b queue to drain (one chip — serialize TPU jobs)
#   1) int8_agreement rerun — r5b ran the pre-fix script (the tight
#      env-flag toggling landed at a596cf2, after the queue started) so
#      the bf16-rounding control fields are missing from the artifact
#   2) repair every PERF.json row that carries an "error" field (the
#      int8 rows RESOURCE_EXHAUSTED; bench_family now halves the batch
#      and retries on OOM) + fill the l24/l42 int8max family rows
#   3) 50k-sample FID/PRDC dress rehearsal if r5b's deadline skipped it
#   4) any level-3 depth-phase ablations r5b's deadline skipped
set -u
OUT=${1:-/tmp/tpu_r5c}
PREV=${2:-/tmp/tpu_r5b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
mkdir -p docs/measurements/r5

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-14000}

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

# 0) chain: wait for the r5b queue to finish (poll its recorded PID; the
#    bash process exits when done — do NOT touch the TPU before then)
echo "waiting for r5b ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
PREV_PID=$(cat /tmp/tpu_r5b.pid 2>/dev/null || echo "")
for _ in $(seq 1 2000); do
  if [ -z "$PREV_PID" ] || ! kill -0 "$PREV_PID" 2>/dev/null; then
    break
  fi
  sleep 30
done
echo "r5b drained ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

# lease waiter: block (untimed) on one tiny op
python -c "
import time, jax, jax.numpy as jnp
t0 = time.time()
v = float(jnp.sum(jnp.ones((128, 128))))
print('lease ok', v, round(time.time() - t0, 1), flush=True)
" > "$OUT/waiter.log" 2>&1
grep -q "lease ok" "$OUT/waiter.log" || {
  echo "waiter failed" | tee -a "$OUT/queue.log"; exit 1; }
echo "lease recovered ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"

# 1) agreement rerun with the bf16-rounding control (only if the control
#    fields are still missing from the committed artifact)
if ! grep -q control_bf16 docs/measurements/r5/int8_agreement_l12.json \
    2>/dev/null; then
  run int8_agreement 3600 python scripts/int8_agreement.py --batch 256 \
      --kl-chunk 64 --out docs/measurements/r5/int8_agreement_l12.json
fi

# 2) repair failing PERF.json rows + fill missing family rows
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
    run "family_$row" 3000 env BENCH_ROW_TIMEOUT_S=1400 \
        BENCH_ROW_LOG_DIR="$OUT/rowlogs" \
        python scripts/bench_family.py --rows "$row"
  done
fi

# 3) 50k FID/PRDC dress rehearsal (reference protocol shape:
#    total-samples/num-classes per class, sampling_hqmodel.py:181-182)
CKPT=$(ls -d /tmp/conv_demo/s2/convergence-tiny/*/ckpt_full 2>/dev/null | tail -1)
if [ ! -f docs/measurements/r5/fid50k_rehearsal.log ] && [ -n "$CKPT" ]; then
  # 50000 samples / 10 classes / bs500 = 100 pickles; don't redo a
  # sampling pass r5b already completed before its deadline cut stats/eval
  NPKL=$(ls /tmp/fid50k/samples_*.pkl 2>/dev/null | wc -l)
  if [ "$NPKL" -lt 100 ]; then
    run fid50k_sample 4800 python sampling_hqmodel.py -r /tmp/fid50k \
        -m "$CKPT" -c configs/tiny/convergence-tiny.yaml \
        --batch-size 500 --num-classes 10 --total-samples 50000 \
        --top-k 64 --temperature 1.0 --dtype bfloat16
  fi
  run fid50k_stats 1800 env JAX_PLATFORMS=cpu python \
      scripts/compute_fid_stats.py -d imagenet \
      --data-root /tmp/conv_demo/data --split train \
      -o /tmp/fid50k_ref_stats.npz --resolution 32 \
      --feature-extractor pixels --save-acts
  run fid50k_eval 2400 env JAX_PLATFORMS=cpu python eval_hqmodel.py \
      -r /tmp/fid50k --feature-extractor pixels \
      --ref-stat-path /tmp/fid50k_ref_stats.npz \
      --ref-feature-path /tmp/fid50k_ref_stats.npz
  cp /tmp/fid50k/fid_prdc.log docs/measurements/r5/fid50k_rehearsal.log \
    2>/dev/null || true
fi

# 4) leftover level-3 depth-phase ablations
for m in base recompute nodepth nophase2 noembed noattn nosample; do
  if [ ! -f "docs/measurements/r5/ablate_ml_$m.log" ]; then
    run "ablate_ml_$m" 900 env AB_MODE=$m python scripts/ablate_ml.py
    cp "$OUT/ablate_ml_$m.log" "docs/measurements/r5/ablate_ml_$m.log" \
      2>/dev/null || true
  fi
done

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
