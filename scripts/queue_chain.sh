#!/bin/bash
# Serialize a follow-up TPU queue behind a still-running one: wait for the
# given pid (the relay_watch.sh / queue shell of the previous queue) to
# exit, then launch the next queue. One chip — concurrent TPU jobs queue on
# the relay and distort timings, so chaining is the only safe option.
#   nohup bash scripts/queue_chain.sh <pid> [queue.sh] [outdir] \
#       > /tmp/queue_chain.log 2>&1 & echo $! > /tmp/queue_chain.pid
PREV_PID=${1:?pid of the running queue/watcher to wait for}
QUEUE=${2:-scripts/tpu_queue_r4b.sh}
OUT=${3:-/tmp/tpu_r4b}
cd "$(dirname "$0")/.."
echo "waiting for pid $PREV_PID to exit.."
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
echo "pid $PREV_PID gone ($(date -u +%H:%M:%SZ)) - launching $QUEUE"
bash "$QUEUE" "$OUT"
echo "CHAIN DONE"
