#!/bin/bash
# Round-5 queue K (chained after r5j; runs when the CPU suite is done): jitted cosy mega A/B re-run
# plus a 16-stream pooled scale point.
#
# Launch: nohup bash scripts/chip_queue_r5k.sh &   (waits for r5e DONE)
# Stop:   touch /tmp/chipq.stop
set -u
echo $$ > /tmp/chipq_r5k.pid
L=/tmp/chipq_r5k.log
: > "$L"
cd /root/repo

for i in $(seq 1 600); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5e" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5J DONE" /tmp/chipq_r5j.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5j.pid 2>/dev/null)" 2>/dev/null; then
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
# cosy 1.5B mega A/B re-run with cosy_generate_mega_b64 JITTED (the r5e
# +28% was measured with eager prefill/pack dispatch on the mega side;
# the xla comparator was already jitted) + xy B=64 re-verify
run python benchmarks/bench_generate_mega_ab.py --family cosy \
  --hidden 2048 --layers 24 --variants xla,mega
# 0.4B kernel tile sweep (bench.py ships tile 512; 1024 won at C=2048)
run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 \
  --variants mega --tile-n 256
run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 \
  --variants mega --tile-n 1024
echo "QUEUE R5K DONE $(date)" >> "$L"
