#!/bin/bash
# Round-4 fifth chip queue: per-stage-window hop ramp re-runs + the decode
# probes r4c skipped (mid-run script edit moved bash's read offset past
# them — lesson: never edit a running queue script, append a NEW queue).
# ONE background chain (CLAUDE.md). Log: /tmp/chipq_r4e.log.
set -u
echo $$ > /tmp/chipq_r4e.pid
L=/tmp/chipq_r4e.log
: > "$L"
for P in /tmp/chipq_r4d.pid /tmp/chipq_r4c.pid; do
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

B="python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5 --ctx 50"
# 1. ramp with per-stage windows (expect TTFA ~550 restored + steady win)
run $B --hop-max 200
run $B --hop-max 200 --vocode-every 2
# 2. re-run the timed-out vocode-every 4 (no profile wrapper)
run $B --vocode-every 4
# 3. bench.py candidate: int8 composed with bf16 state at 0.4B + quality
run python benchmarks/bench_flagship_scale.py --only decode04 --state-bf16 --int8
run python scripts/measure_int8_quality.py --int8 --state-bf16
# 4. unfused projections at the weight-bound 1.4B
run python benchmarks/bench_flagship_scale.py --only decode14 --no-proj-fuse
run python benchmarks/bench_flagship_scale.py --only decode14 --no-proj-fuse --state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --state-bf16 --int8
# 5. packed Pallas step at 1.4B (P=1024 rows) incl. the new bf16 carry
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv --state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv --state-bf16 --int8
# 6. locate the 1.4B roofline gap per-op
run python scripts/profile_decode_b128.py --hidden 2048 --batches 64
run python scripts/profile_decode_b128.py --hidden 2048 --batches 64 --state-bf16 --int8
echo "QUEUE R4E DONE $(date)" >> "$L"
