#!/bin/bash
# Round-4 TPU measurement queue — run ONE at a time on the single chip
# (concurrent jobs queue on the relay and distort timings; a killed TPU
# process can wedge the device lease). Usage:
#   bash scripts/tpu_queue_r4.sh [outdir]   # default /tmp/tpu_r4
set -u
OUT=${1:-/tmp/tpu_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# global guards: `touch $OUT/STOP` skips every not-yet-started job (use
# before the driver's end-of-round bench so the chip is uncontended), and
# QUEUE_DEADLINE_S (default 8h from queue start) does the same unattended
QUEUE_START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE_S:-28800}

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

# 0) 60s smoke: is the chip usable? (bounded; do NOT proceed into big
#    compiles against a wedged lease)
run smoke 90 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.sum(jnp.ones((128, 128)))))"
grep -q "rc=0 smoke" "$OUT/queue.log" || { echo "chip not usable"; exit 1; }

# 1) the driver-contract bench, full (bf16 + bs50 + phases + int8 section).
# The INTERNAL watchdog (5100s) must fire before the shell timeout: it
# exits cleanly with the best-so-far JSON, where a shell SIGTERM kills a
# live TPU process and can wedge the device lease for the rest of the queue
run bench 5400 env BENCH_TOTAL_TIMEOUT_S=5100 python bench.py

# 2) int8 gemm probe (decides the int8 depth-chain lever); if >=1.3x,
#    bench again with the depth-chain gemms A8W8
run int8_gemm 1800 python scripts/microbench_int8_gemm.py
run bench_s2int8 5400 env BENCH_INT8_STAGE2=1 BENCH_SKIP_BS50=1 \
    BENCH_SKIP_PHASES=1 BENCH_TOTAL_TIMEOUT_S=5100 python bench.py
run bench_maxint8 5400 env BENCH_INT8_STAGE2=1 BENCH_INT8_SPATIAL=1 \
    BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 BENCH_TOTAL_TIMEOUT_S=5100 \
    python bench.py

# 2b) 3-probe bisection A/B for the fused sampler (vs the main bench's
# bf16 value; draws are token-identical, only the pass count changes)
run bench_bisect3 3600 env HQT_SAMPLE_BISECT3=1 BENCH_SKIP_BS50=1 \
    BENCH_SKIP_PHASES=1 BENCH_SKIP_INT8=1 BENCH_TOTAL_TIMEOUT_S=3300 \
    python bench.py

# 3) family table -> PERF.json (l12 first; each row is its own compile)
run family_l12 4200 python scripts/bench_family.py --rows l12
run family_l12i8 4200 python scripts/bench_family.py --rows l12-int8
run family_l12i8m 4200 python scripts/bench_family.py --rows l12-int8max
run family_l24 4200 python scripts/bench_family.py --rows l24
run family_l42 4200 python scripts/bench_family.py --rows l42
run family_l3  4200 python scripts/bench_family.py --rows l12-level3
run family_ffhq 4200 python scripts/bench_family.py --rows l24-ffhq
run family_txt 4200 python scripts/bench_family.py --rows l12-cc15m-txt

# 4) int8-decode static e2e at flagship shapes (VERDICT #2)
run int8_decode 3600 python scripts/measure_int8_decode.py --batch 512

# 5) per-phase ablations + the int8-KV delta (re-derive deltas)
run ablate_int8kv 2400 env AB_KV=int8 python scripts/ablate_ar.py
for mode in base noattn attnwrite nosample nodepth2; do
  run ablate_$mode 2400 env AB_MODE=$mode python scripts/ablate_ar.py
done

# 5b) ROW_CHUNK sweep under int8 KV (half the bytes per chunk shifts the
# DMA-issue vs prefix-skip tradeoff; 8 was tuned for bf16)
run ablate_int8kv_rc16 2400 env AB_KV=int8 HQT_ATTN_ROW_CHUNK=16 \
    python scripts/ablate_ar.py
run ablate_int8kv_rc32 2400 env AB_KV=int8 HQT_ATTN_ROW_CHUNK=32 \
    python scripts/ablate_ar.py

# 6) batch sweeps: bf16 at 1536/3072, and int8 at 3072 (the int8 KV cache
# halves the dominant HBM resident, so larger batches fit than in bf16)
run bench_b1536 3600 env BENCH_BATCH=1536 BENCH_SKIP_BS50=1 \
    BENCH_SKIP_PHASES=1 BENCH_SKIP_INT8=1 BENCH_TOTAL_TIMEOUT_S=3300 \
    python bench.py
run bench_b3072 3600 env BENCH_BATCH=3072 BENCH_SKIP_BS50=1 \
    BENCH_SKIP_PHASES=1 BENCH_SKIP_INT8=1 BENCH_TOTAL_TIMEOUT_S=3300 \
    python bench.py
run bench_int8_b3072 3600 env BENCH_INT8_BATCH=3072 BENCH_INT8_STAGE2=1 \
    BENCH_INT8_SPATIAL=1 BENCH_SKIP_BS50=1 BENCH_SKIP_PHASES=1 \
    BENCH_TOTAL_TIMEOUT_S=3300 python bench.py

echo "queue done ($(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue.log"
