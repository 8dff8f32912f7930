#!/bin/bash
# Round-5 queue B: bench.py mega-promotion verify, quality gate at the
# deployed 1.4B, B=1 tile sweep, and the streaming re-measures with the
# bf16-state fix (pack_mega_state default, PERF.md r5a root cause).
#
# Launch: rm -f /tmp/chipq.stop && nohup bash scripts/chip_queue_r5b.sh &
# Stop:   touch /tmp/chipq.stop   (checked before every probe and item)
set -u
echo $$ > /tmp/chipq_r5b.pid
L=/tmp/chipq_r5b.log
: > "$L"
cd /root/repo

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

# 1. the driver surface with the megakernel promoted (expect ~29.5k)
run python bench.py
# 2. quality bound at the DEPLOYED 1.4B size (r5a only gated 0.4B)
run python scripts/measure_int8_quality.py --mega --hidden 2048 --layers 24
# 3. B=1 tile sensitivity (tile 1024 won B=64 at 2048: 3.445 vs 3.547)
run python benchmarks/bench_decode_mega.py --hidden 2048 --layers 24 \
  --variants mega --state-bf16 --tile-n 512
# 4. streaming with the bf16-state fix (r5a measured 0.149 on fp32 state)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
# 5. flow-step push toward the <=0.1 north star
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 3 --ctx 50 --vocode-every 2
echo "QUEUE R5B DONE $(date)" >> "$L"
