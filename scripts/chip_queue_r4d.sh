#!/bin/bash
# Round-4 fourth chip queue: the hop-ramp streaming push (the profile says
# LM 1.46s + HiFT 0.75s + flow 0.57s per 16s of audio, all serial on one
# core — the lever is FEWER flow/vocoder calls, not overlap). ONE
# background chain (CLAUDE.md). Waits for r4c. Log: /tmp/chipq_r4d.log.
set -u
echo $$ > /tmp/chipq_r4d.pid
L=/tmp/chipq_r4d.log
: > "$L"
for P in /tmp/chipq_r4c.pid /tmp/chipq_r4b.pid /tmp/chipq.pid; do
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
# 1. hop ramp alone (50 -> 100 -> 200): fewer flow AND hift calls
run $B --hop-max 200
# 2. ramp + batched vocode (hift fixed costs amortize across ramp stages)
run $B --hop-max 200 --vocode-every 2
# 3. ramp + bigger LM dispatches (9 x ~40 ms tunnel dispatch in profile)
run $B --hop-max 200 --lm-chunk 100
run $B --hop-max 200 --vocode-every 2 --lm-chunk 100 --profile
# 4. deeper ramp cap
run $B --hop-max 400 --lm-chunk 100
echo "QUEUE R4D DONE $(date)" >> "$L"
