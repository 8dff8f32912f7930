#!/bin/bash
# Round-5 queue C (chained after r5b): quality-comparator + sampler A/B +
# composed streaming + pooled-TTFA re-measure.
#
#  1. XLA-int8 comparator for the 1.4B quality gate: r5b measured mega
#     teacher-forced agreement 0.9961 at 2048x24; this run bounds how much
#     of that is plain int8-vs-bf16 at this width (mega-specific iff the
#     mega number is materially below this one).
#  2. rank_bf16 sampler A/B at the exact bench.py config (B=64 0.4B).
#  3. Streaming 1.5B mega + rank-bf16 composed, flow-5 and flow-3 — the
#     <=0.1 steady-RTF push (VERDICT r4 #2).
#  4. Pooled streaming 8x1.5B with the SFM/ctx/vocode levers now wired
#     into CosyStreamHub (VERDICT r4 #4: TTFA p50 1243 -> target <=700).
#
# Launch: nohup bash scripts/chip_queue_r5c.sh &   (waits for r5b DONE)
# Stop:   touch /tmp/chipq.stop   (checked before every wait/probe/item)
set -u
echo $$ > /tmp/chipq_r5c.pid
L=/tmp/chipq_r5c.log
: > "$L"
cd /root/repo

# wait for the r5b queue to finish (never two TPU processes)
for i in $(seq 1 240); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop while waiting for r5b" >> "$L"
    exit 0
  fi
  if grep -q "QUEUE R5B DONE" /tmp/chipq_r5b.log 2>/dev/null; then
    break
  fi
  if ! kill -0 "$(cat /tmp/chipq_r5b.pid 2>/dev/null)" 2>/dev/null; then
    echo "=== r5b pid gone without DONE marker; proceeding" >> "$L"
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

# 0. per-stage profile of the composed mega streaming hop: r5b measured
#    0.136 steady where the kernel numbers predict ~0.11 — find the gap
#    (lm dispatch? flow? hift?)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2 --profile
# 1. XLA-int8 quality comparator at the deployed width
run python scripts/measure_int8_quality.py --int8 --state-bf16 \
  --hidden 2048 --layers 24
# 2. bf16 candidate-ranking sampler A/B at the bench.py config
run python benchmarks/bench_generate_mega_ab.py \
  --variants mega,mega_rankbf16
# 3a/3b. composed streaming push (mega LM + rank-bf16 sampler)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --rank-bf16 --sfm --flow-timesteps 3 --ctx 50 --vocode-every 2
# 4. pooled streaming with the vocoder levers (VERDICT r4 #4)
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
  --int8 --state-bf16 --no-proj-fuse --streams 8 --slots 8 \
  --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
echo "QUEUE R5C DONE $(date)" >> "$L"
