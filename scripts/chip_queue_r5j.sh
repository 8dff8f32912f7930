#!/bin/bash
# Round-5 queue J (chained after r5i): serving chunk-size sweep on the mega pool
# plus a 16-stream pooled scale point.
#
# Launch: nohup bash scripts/chip_queue_r5j.sh &   (waits for r5e DONE)
# Stop:   touch /tmp/chipq.stop
set -u
echo $$ > /tmp/chipq_r5j.pid
L=/tmp/chipq_r5j.log
: > "$L"
cd /root/repo

for i in $(seq 1 600); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5e" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5I DONE" /tmp/chipq_r5i.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5i.pid 2>/dev/null)" 2>/dev/null; then
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
# serving chunk-size sweep on the mega pool: r5d measured the 0.4B mega
# pool host-bound (device 1.2 ms vs ~15 ms host sync per 32-step chunk) —
# fewer, bigger chunks cut the per-chunk round trips; occupancy pays a
# little (finished slots idle longer before readmission)
run python benchmarks/bench_serving_continuous.py --mega --chunk 64 \
  --requests 96 --overlap --skip-grouped
run python benchmarks/bench_serving_continuous.py --mega --chunk 128 \
  --requests 96 --overlap --skip-grouped
run python benchmarks/bench_serving_continuous.py --hidden 2048 --layers 24 \
  --mega --chunk 64 --requests 96 --overlap --skip-grouped
echo "QUEUE R5J DONE $(date)" >> "$L"
