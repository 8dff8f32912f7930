#!/bin/bash
# Round-5 queue F (chained after r5e): streaming vocoder cost decomposition
# (the r5c profile's binders: flow 64.5 ms/hop, hift ~97 ms/call) plus the
# two composed configs the decomposition is expected to favor.
#
# Launch: nohup bash scripts/chip_queue_r5f.sh &   (waits for r5e DONE)
# Stop:   touch /tmp/chipq.stop
set -u
echo $$ > /tmp/chipq_r5f.pid
L=/tmp/chipq_r5f.log
: > "$L"
cd /root/repo

for i in $(seq 1 600); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5e" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5E DONE" /tmp/chipq_r5e.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5e.pid 2>/dev/null)" 2>/dev/null; then
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

# 1. flow/HiFT cost decomposition on the production-size configs
run python scripts/probe_stream_vocoder.py
# 2-3. composed candidates (mega LM + rank-bf16 + aggressive vocoder cuts)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 25 --vocode-every 2
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 50 --vocode-every 3
echo "QUEUE R5F DONE $(date)" >> "$L"
