#!/bin/bash
# Round-5 queue D (chained after r5c): megakernel-backed continuous
# batching pool A/B — the serving-path version of the r5a generate A/B.
# XLA comparator at the SAME 64-slot count, then the mega pool, at 0.4B
# and at the deployed-LM 1.4B width.
#
# Launch: nohup bash scripts/chip_queue_r5d.sh &   (waits for r5c DONE)
# Stop:   touch /tmp/chipq.stop   (checked before every wait/probe/item)
set -u
echo $$ > /tmp/chipq_r5d.pid
L=/tmp/chipq_r5d.log
: > "$L"
cd /root/repo

for i in $(seq 1 360); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5c" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5C DONE" /tmp/chipq_r5c.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5c.pid 2>/dev/null)" 2>/dev/null; then
    echo "=== r5c pid gone without DONE marker; proceeding" >> "$L"
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

# 0.4B-class serving (bench config width): XLA comparator at 64 slots,
# then the mega pool. state-bf16+int8+overlap = best known XLA knobs.
run python benchmarks/bench_serving_continuous.py --slots 64 --chunk 32 \
  --requests 96 --state-bf16 --int8 --overlap --skip-grouped
run python benchmarks/bench_serving_continuous.py --mega --chunk 32 \
  --requests 96 --overlap --skip-grouped
# deployed-LM width 1.4B
run python benchmarks/bench_serving_continuous.py --hidden 2048 --layers 24 \
  --slots 64 --chunk 32 --requests 96 --state-bf16 --int8 --overlap \
  --skip-grouped
run python benchmarks/bench_serving_continuous.py --hidden 2048 --layers 24 \
  --mega --chunk 32 --requests 96 --overlap --skip-grouped
echo "QUEUE R5D DONE $(date)" >> "$L"
