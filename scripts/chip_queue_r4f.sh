#!/bin/bash
# Round-4 sixth chip queue: the B=1 LM-step push for streaming RTF<=0.1.
#   * per-op traces at B=1 2048x24 (where does 3.26 ms/tok go vs the
#     1.77 ms int8 roofline — dispatch vs dequant vs layout)
#   * unfused-projection int8 decode (pack_decode_params
#     fuse_projections=False): the fused pair stores projections twice,
#     so B=1 weight-bound decode reads ~35% fewer bytes unfused
#   * pooled-streaming 1.5B retry with the HBM levers (s8 run OOMed)
#   * verify surfaces (entry loss + bench.py) at the tail
# ONE background chain (CLAUDE.md). Log: /tmp/chipq_r4f.log.
set -u
echo $$ > /tmp/chipq_r4f.pid
L=/tmp/chipq_r4f.log
: > "$L"
for P in /tmp/chipq_r4e.pid; do
  if [ -f "$P" ]; then
    while kill -0 "$(cat "$P")" 2>/dev/null; do sleep 20; done
  fi
done
rm -f /tmp/chipq.stop
cd /root/repo
run() {
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop before: $*" >> "$L"
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  timeout 2400 "$@" >> "$L" 2>&1
  echo "--- rc=$?" >> "$L"
}

# 1. locate the B=1 gap per-op (fused vs unfused int8)
run python scripts/profile_decode_b128.py --hidden 2048 --layers 24 --batches 1 --int8
run python scripts/profile_decode_b128.py --hidden 2048 --layers 24 --batches 1 --int8 --no-proj-fuse
# 2. streaming 1.5B with unfused projections, composed with the r4 wins
B="python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5 --ctx 50 --no-proj-fuse"
run $B
run $B --vocode-every 2
run $B --vocode-every 2 --hop-max 200
# 3. unfused+int8 at the weight-bound 1.4B B=64
run python benchmarks/bench_flagship_scale.py --only decode14 --no-proj-fuse --int8
# 4. pooled streaming 1.5B retry (s8 OOM) with the HBM levers
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 --int8 --state-bf16 --no-proj-fuse --streams 8 --slots 8
# 5. verify surfaces (chip): entry loss + driver bench
run python -c "
import __graft_entry__ as ge, jax
fn, args = ge.entry()
print('loss', float(jax.jit(fn)(*args)))"
run python bench.py
echo "QUEUE R4F DONE $(date)" >> "$L"
