#!/bin/bash
# Round-5 follow-up queue (run AFTER tpu_queue_r5.sh):
#   1) bench.py full validation of the promoted int8max headline
#   2) l12-int8max / l12-int8 family rows under the SEQUENTIAL phase
#      protocol (the interleaved form OOM'd at bs1536)
#   3) l12-level3 bf16 re-run with the KV-cached depth phases
#   4) level-3 depth-phase ablation set (docs/measurements/r5)
#   5) 50k-sample FID/PRDC dress rehearsal on the trained tiny model
set -u
OUT=${1:-/tmp/tpu_r5b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
mkdir -p docs/measurements/r5

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-12000}

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

# 0) lease waiter: block (untimed) on one tiny op; a hanging-but-alive
#    client kills nothing, so it can't extend a wedge
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

# 1) promoted-headline bench validation (all sections)
run bench_full 4200 env BENCH_TOTAL_TIMEOUT_S=3900 BENCH_INIT_TIMEOUT_S=1800 \
    python bench.py

# 1b) agreement evidence rerun WITH the bf16-rounding control (einsum
#     sampler + scorer at the same seed) that contextualizes the raw
#     fixed-seed agreement numbers on random weights
run int8_agreement2 3000 python scripts/int8_agreement.py --batch 256 \
    --kl-chunk 64 --out docs/measurements/r5/int8_agreement_l12.json

# 2) repaired int8 family rows (sequential phase protocol)
run family_l12i8m 1800 env BENCH_ROW_TIMEOUT_S=1650 \
    python scripts/bench_family.py --rows l12-int8max
run family_l12i8 1800 env BENCH_ROW_TIMEOUT_S=1650 \
    python scripts/bench_family.py --rows l12-int8

# 3) level-3 bf16 re-run (KV-cached depth phases) + the int8max row retry
#    (post small-slice gemm-calibration fix)
run family_l3 1500 env BENCH_ROW_TIMEOUT_S=1350 \
    python scripts/bench_family.py --rows l12-level3
run family_l3i8m 2100 env BENCH_ROW_TIMEOUT_S=1950 \
    python scripts/bench_family.py --rows l12-level3-int8max
run family_txti8m 2100 env BENCH_ROW_TIMEOUT_S=1950 \
    python scripts/bench_family.py --rows l12-cc15m-txt-int8max

# 4) level-3 depth-phase ablations
for m in base recompute nodepth nophase2 noembed noattn nosample; do
  run "ablate_ml_$m" 900 env AB_MODE=$m python scripts/ablate_ml.py
  cp "$OUT/ablate_ml_$m.log" "docs/measurements/r5/ablate_ml_$m.log" \
    2>/dev/null || true
done

# 5) 50k FID/PRDC dress rehearsal (reference protocol shape:
#    total-samples/num-classes per class, sampling_hqmodel.py:181-182)
CKPT=$(ls -d /tmp/conv_demo/s2/convergence-tiny/*/ckpt_full 2>/dev/null | tail -1)
if [ -n "$CKPT" ]; then
  run fid50k_sample 3600 python sampling_hqmodel.py -r /tmp/fid50k \
      -m "$CKPT" -c configs/tiny/convergence-tiny.yaml \
      --batch-size 500 --num-classes 10 --total-samples 50000 \
      --top-k 64 --temperature 1.0 --dtype bfloat16
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
else
  echo "no trained tiny ckpt found; skipping fid50k" | tee -a "$OUT/queue.log"
fi

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
