#!/bin/bash
# Round-4 knob-sweep TPU queue — runs AFTER tpu_queue_r4b.sh (one chip;
# never concurrent). Purpose: squeeze the int8max serving mode further and
# extend PERF.json's int8 coverage across the model family.
#   1) l24 / l42 int8max family rows (PERF.json)
#   2) int8max bench sweeps: segments (2/8 vs default 4), attention batch
#      tile (HQT_ATTN_BLOCK_B=64/16 vs auto 32), ROW_CHUNK=16, and a
#      batch-4096 attempt (bench carries best-so-far through OOM)
# All sweep benches skip the bs50 + phases sections (BENCH_SKIP_*) so each
# run is ~15 min: bf16 e2e (for vs_bf16) + the int8max section.
# Usage: bash scripts/tpu_queue_r4c.sh [outdir]   # default /tmp/tpu_r4c
set -u
OUT=${1:-/tmp/tpu_r4c}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-21600}

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
  echo "rc=$? $name" | tee -a "$OUT/queue.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue.log"
}

run smoke 90 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.sum(jnp.ones((128, 128)))))"
grep -q "rc=0 smoke" "$OUT/queue.log" || { echo "chip not usable"; exit 1; }

# 1) int8max across the family (merged into PERF.json)
run family_l24i8m 4200 python scripts/bench_family.py --rows l24-int8max
run family_l42i8m 4200 python scripts/bench_family.py --rows l42-int8max

# 1b) level-3 re-run: multilevel default flipped back to 1 segment after
#     the segmented scan measured 6.56 vs 6.04 unsegmented (see engine.py)
run family_l3_seg1 4200 python scripts/bench_family.py --rows l12-level3

# 2) int8max knob sweeps (each vs the recorded seg4/auto32/rc8 default)
SWEEP="env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 BENCH_TOTAL_TIMEOUT_S=2700"
run sweep_seg8   3000 $SWEEP BENCH_SEGMENTS=8 python bench.py
run sweep_seg2   3000 $SWEEP BENCH_SEGMENTS=2 python bench.py
run sweep_bb64   3000 $SWEEP HQT_ATTN_BLOCK_B=64 python bench.py
run sweep_bb16   3000 $SWEEP HQT_ATTN_BLOCK_B=16 python bench.py
run sweep_rc16   3000 $SWEEP HQT_ATTN_ROW_CHUNK=16 python bench.py
run sweep_b4096  3000 $SWEEP BENCH_INT8_BATCH=4096 python bench.py

# 3) bf16 batch refinement around the measured 1536 optimum (b1536 gave
#    432.8/s vs 428.1 at 2048 in the r4 queue) + int8max at 1536
BFS="env BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 BENCH_SKIP_INT8=1 BENCH_TOTAL_TIMEOUT_S=2400"
run sweep_bf16_b1024 2700 $BFS BENCH_BATCH=1024 python bench.py
run sweep_bf16_b1792 2700 $BFS BENCH_BATCH=1792 python bench.py
run sweep_int8_b1536 3000 $SWEEP BENCH_INT8_BATCH=1536 python bench.py

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
