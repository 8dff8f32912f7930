#!/bin/bash
# Round-4 second chip queue: the streaming-RTF push at the deployed 1.5B
# (VERDICT r3 #6). ONE background chain, never two TPU processes
# (CLAUDE.md). Self-registers its pid (/tmp/chipq_r4b.pid).
# Halt between steps: touch /tmp/chipq.stop. Log: /tmp/chipq_r4b.log.
set -u
echo $$ > /tmp/chipq_r4b.pid
L=/tmp/chipq_r4b.log
: > "$L"
for P in /tmp/chipq_r4.pid /tmp/chipq_s8.pid /tmp/chipq_s7.pid /tmp/chipq.pid; do
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

# Streaming levers at 1.5B (baseline r4: int8 CFM-10 ctx100 -> RTF 0.213).
# Compose: SFM-5 flow (halves flow cost/hop), smaller ctx window, int4
# weights (B=1 LM decode is weight-bandwidth-bound; int8 gave +71% at B=1).
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5 --ctx 50
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int4 --sfm --flow-timesteps 5 --ctx 50
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int4 --sfm --flow-timesteps 5 --ctx 50 --hop 75
echo "QUEUE R4B DONE $(date)" >> "$L"
