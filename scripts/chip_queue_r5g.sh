#!/bin/bash
# Round-5 queue G (chained after r5f): hop-ramp re-test under the mega LM
# plus a 16-stream pooled scale point.
#
# Launch: nohup bash scripts/chip_queue_r5g.sh &   (waits for r5e DONE)
# Stop:   touch /tmp/chipq.stop
set -u
echo $$ > /tmp/chipq_r5g.pid
L=/tmp/chipq_r5g.log
: > "$L"
cd /root/repo

for i in $(seq 1 600); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5e" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5F DONE" /tmp/chipq_r5f.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5f.pid 2>/dev/null)" 2>/dev/null; then
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

# 1. hop ramp re-test under the mega LM: the r4e ramp-200 negative was
#    measured when the LM cost 3.26 ms/tok; with the flow FIXED cost now
#    the biggest vocoder term (r5c decomposition), halving flow/hift call
#    counts via hop_max 100 may flip the sign.
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 50 --vocode-every 2 \
  --hop-max 100
# 2. pooled streaming at 16 streams (bf16 pool state; r3 OOMed on fp32)
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
  --int8 --state-bf16 --no-proj-fuse --streams 16 --slots 16 \
  --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
echo "QUEUE R5G DONE $(date)" >> "$L"
