#!/bin/bash
# Round-5 queue E (chained after r5d): megakernel routes for the OTHER two
# LM layouts — Cosy (RAS sampling, deployed 1.5B width) A/B and XY
# (8-channel) B=64 A/B.
#
# Launch: nohup bash scripts/chip_queue_r5e.sh &   (waits for r5d DONE)
# Stop:   touch /tmp/chipq.stop   (checked before every wait/probe/item)
set -u
echo $$ > /tmp/chipq_r5e.pid
L=/tmp/chipq_r5e.log
: > "$L"
cd /root/repo

for i in $(seq 1 480); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5d" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5D DONE" /tmp/chipq_r5d.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5d.pid 2>/dev/null)" 2>/dev/null; then
    echo "=== r5d pid gone without DONE marker; proceeding" >> "$L"
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

# Cosy layout (RAS sampling) at the deployed CosyVoice2 LM width
run python benchmarks/bench_generate_mega_ab.py --family cosy \
  --hidden 2048 --layers 24 --variants xla,mega
# XY 8-channel at B=64: XLA comparator, then mega
run python benchmarks/bench_families_scale.py --only xy --xy-batch 64
run python benchmarks/bench_families_scale.py --only xy --xy-batch 64 --mega
echo "QUEUE R5E DONE $(date)" >> "$L"
