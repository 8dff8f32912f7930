#!/bin/bash
# Round-4 ninth chip queue: close the streaming/decode open items after the
# megakernel shootout (r4h) — vocode_every 4 re-run, the int8+nofuse+sbf16
# 1.4B combo, megakernel-LM streaming A/B, and a bench.py confirm.
set -u
echo $$ > /tmp/chipq_r4i.pid
L=/tmp/chipq_r4i.log
: > "$L"
for P in /tmp/chipq_r4h.pid; do
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

S="python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --sfm --flow-timesteps 5 --ctx 50"
# vocode_every 4 (re-run of the r4e tunnel casualty), on the best base
run $S --int8 --no-proj-fuse --vocode-every 4
# 1.4B B=64: compose the r4f unfused win with state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --no-proj-fuse --int8 --state-bf16
# megakernel LM through the streaming hop loop (A/B vs the xla path)
run $S --mega --vocode-every 2
# driver-surface confirm: median-of-5 bench
run python bench.py
echo "QUEUE R4I DONE $(date)" >> "$L"
