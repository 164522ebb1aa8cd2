#!/bin/bash
# Watch the axon TPU relay (127.0.0.1:8103) and launch the measurement
# queue once it answers twice 120 s apart (the relay can flap while it
# restarts). Nothing inside the container can restart the relay — polling
# is the only option. Run detached:
#   nohup bash scripts/relay_watch.sh [queue.sh] [outdir] \
#       > /tmp/relay_watch.log 2>&1 & echo $! > /tmp/relay_watch.pid
QUEUE=${1:-scripts/tpu_queue_r4.sh}
OUT=${2:-/tmp/tpu_r4}
cd "$(dirname "$0")/.."
while true; do
  code=$(curl --max-time 3 -s -o /dev/null -w "%{http_code}" \
         http://127.0.0.1:8103/remote_compile)
  echo "$(date -u +%H:%M:%S) $code"
  if [ "$code" != "000" ]; then
    echo "UP - waiting 120s for the relay to stabilize"
    sleep 120
    code2=$(curl --max-time 3 -s -o /dev/null -w "%{http_code}" \
            http://127.0.0.1:8103/remote_compile)
    if [ "$code2" != "000" ]; then
      echo "launching $QUEUE -> $OUT"
      bash "$QUEUE" "$OUT"
      echo "QUEUE DONE"
      break
    fi
  fi
  sleep 60
done
