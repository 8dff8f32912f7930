#!/bin/bash
# Round-5 queue H (chained after r5g): tunnel-RTT probe + final composed streaming candidates
# plus a 16-stream pooled scale point.
#
# Launch: nohup bash scripts/chip_queue_r5h.sh &   (waits for r5e DONE)
# Stop:   touch /tmp/chipq.stop
set -u
echo $$ > /tmp/chipq_r5h.pid
L=/tmp/chipq_r5h.log
: > "$L"
cd /root/repo

for i in $(seq 1 600); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5e" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5G DONE" /tmp/chipq_r5g.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5g.pid 2>/dev/null)" 2>/dev/null; then
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
# 1. quantify the per-call tunnel tax (fixed dispatch+sync round trip):
#    median of 20 tiny jitted noop calls
run python -c "
import time, jax, jax.numpy as jnp, numpy as np
f = jax.jit(lambda x: x + 1.0)
np.asarray(f(jnp.float32(0)))
ts = []
for i in range(20):
    t0 = time.perf_counter()
    np.asarray(f(jnp.float32(i)))
    ts.append(time.perf_counter() - t0)
ts.sort()
print({'probe': 'tunnel_rtt_ms', 'p50': round(ts[10]*1e3, 2),
       'min': round(ts[0]*1e3, 2), 'p90': round(ts[18]*1e3, 2)})"
# 2-3. final composed candidates (ctx 25 + vocode batching + LM chunk ramp)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 25 --vocode-every 3 \
  --lm-chunk-max 150
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 25 --vocode-every 4 \
  --lm-chunk-max 150
echo "QUEUE R5H DONE $(date)" >> "$L"
