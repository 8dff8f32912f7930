#!/bin/bash
# Round-4 fifteenth chip queue: megakernel production-candidate gates.
#   1. full-sampling A/B (spark_generate vs spark_generate_mega_b64) at
#      the bench.py flagship config (0.4B) and at 1.4B
#   2. mega quality bound (decision flips vs the fp XLA comparator)
#   3. streaming 1.5B with the B=1 megakernel LM (target steady RTF <=0.1)
#   4. B=64 shootout with all variants at 0.4B (agreement fractions)
set -u
echo $$ > /tmp/chipq_r4o.pid
L=/tmp/chipq_r4o.log
: > "$L"
for P in /tmp/chipq_r4n.pid; do
  if [ -f "$P" ]; then
    while kill -0 "$(cat "$P")" 2>/dev/null; do sleep 20; done
  fi
done
# NOTE: the stop flag is NOT deleted here (ADVICE r4: deleting it at
# startup defeated the documented stop mechanism). Remove /tmp/chipq.stop
# manually before intentionally launching a queue.
cd /root/repo

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
print('probe ok', float(np.asarray(x @ x)[0, 0]))" >> "$L" 2>&1
}

ok=0
for i in $(seq 1 72); do
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop during tunnel wait" >> "$L"
    exit 0
  fi
  if probe; then ok=1; break; fi
  echo "=== $(date +%H:%M:%S) tunnel probe failed ($i), sleeping 300s" >> "$L"
  sleep 300
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

run python benchmarks/bench_generate_mega_ab.py --hidden 1024 --layers 24
run python scripts/measure_int8_quality.py --mega
run python benchmarks/bench_generate_mega_ab.py --hidden 2048 --layers 24
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 5 --ctx 50
run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 \
  --variants xla_q8,xla_q8_nofuse,mega --tile-n 512
echo "QUEUE R4O DONE $(date)" >> "$L"
