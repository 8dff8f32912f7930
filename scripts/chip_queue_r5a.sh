#!/bin/bash
# Round-5 first chip queue: megakernel v2 (shared-body, O(1)-in-C code)
# re-measurement + the r4o production gates that never ran + driver
# surface refresh. Priority-ordered: the C=2048 cliff test first.
#
# Launch: rm -f /tmp/chipq.stop && nohup bash scripts/chip_queue_r5a.sh &
# Stop:   touch /tmp/chipq.stop   (checked before every probe and item)
set -u
echo $$ > /tmp/chipq_r5a.pid
L=/tmp/chipq_r5a.log
: > "$L"
# NOTE: the stop flag is NOT deleted here (ADVICE r4) — remove it
# manually when intentionally launching.
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

# 1. the cliff test: v2 B=64 at 1.4B vs the XLA comparator
run python benchmarks/bench_decode_mega_b64.py --hidden 2048 --layers 24 \
  --variants xla_q8_nofuse,mega --tile-n 512
# 2. no-regression check at the bench.py flagship size
run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 \
  --variants mega --tile-n 512
# 3. v2 B=1 at the deployed 1.5B (streaming LM hot loop)
run python benchmarks/bench_decode_mega.py --hidden 2048 --layers 24 \
  --variants xla_q8_nofuse,mega --tile-n 1024 --state-bf16
# 4-5. driver verify surfaces
run python bench.py
run python -c "
import __graft_entry__ as ge, jax
fn, args = ge.entry()
print('loss', float(jax.jit(fn)(*args)))"
# 6. mega quality bound (r4o gate)
run python scripts/measure_int8_quality.py --mega
# 7-8. full-sampling A/B (r4o gates)
run python benchmarks/bench_generate_mega_ab.py --hidden 1024 --layers 24
run python benchmarks/bench_generate_mega_ab.py --hidden 2048 --layers 24
# 9-10. streaming with the mega LM at deployed 1.5B (north star)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
  --mega --sfm --flow-timesteps 5 --ctx 50
# 11. tile_n sensitivity at 2048 (cliff diagnosis record)
run python benchmarks/bench_decode_mega_b64.py --hidden 2048 --layers 24 \
  --variants mega --tile-n 1024
echo "QUEUE R5A DONE $(date)" >> "$L"
