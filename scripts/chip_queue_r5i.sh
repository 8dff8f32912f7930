#!/bin/bash
# Round-5 queue I (chained after r5h): the full streaming composition
# plus a 16-stream pooled scale point.
#
# Launch: nohup bash scripts/chip_queue_r5i.sh &   (waits for r5e DONE)
# Stop:   touch /tmp/chipq.stop
set -u
echo $$ > /tmp/chipq_r5i.pid
L=/tmp/chipq_r5i.log
: > "$L"
cd /root/repo

for i in $(seq 1 600); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5e" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5H DONE" /tmp/chipq_r5h.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5h.pid 2>/dev/null)" 2>/dev/null; then
    echo "=== r5e pid gone without DONE marker; proceeding" >> "$L"
    break
  fi
  sleep 60
done

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
print('probe ok', float(np.asarray(x @ x)[0, 0]))" >> "$L" 2>&1
}

ok=0
for i in $(seq 1 120); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop during tunnel wait" >> "$L"
    exit 0
  fi
  if probe; then ok=1; break; fi
  echo "=== $(date +%H:%M:%S) tunnel probe failed ($i), sleeping 240s" >> "$L"
  sleep 240
done
if [ "$ok" != 1 ]; then
  echo "=== tunnel dead after all probes, aborting queue" >> "$L"
  exit 1
fi

run() {
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop before: $*" >> "$L"
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  timeout 2400 "$@" >> "$L" 2>&1
  echo "--- rc=$?" >> "$L"
}
# final composition: hop ramp (r5g winner) x ctx 25 x LM chunk ramp x
# vocode batching
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 25 --vocode-every 2 \
  --hop-max 100 --lm-chunk-max 150
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 25 --vocode-every 3 \
  --hop-max 100 --lm-chunk-max 200
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 25 --vocode-every 2 \
  --hop-max 200 --lm-chunk-max 200
echo "QUEUE R5I DONE $(date)" >> "$L"
