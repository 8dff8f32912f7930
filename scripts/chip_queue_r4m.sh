#!/bin/bash
# Round-4 thirteenth chip queue: B=64 megakernel shootout at the 1.4B and
# 0.4B production points (after the r4l construct probes).
set -u
echo $$ > /tmp/chipq_r4m.pid
L=/tmp/chipq_r4m.log
: > "$L"
for P in /tmp/chipq_r4l.pid; do
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

# XLA reference points first (known-good programs, fast)
run python benchmarks/bench_decode_mega_b64.py --hidden 2048 --layers 24 --variants xla_q8,xla_q8_nofuse
# the megakernel, compile risk isolated per config
run python benchmarks/bench_decode_mega_b64.py --hidden 2048 --layers 24 --variants mega --tile-n 512
run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 --variants mega --tile-n 512
run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 --variants xla_q8,xla_q8_nofuse
echo "QUEUE R4M DONE $(date)" >> "$L"
