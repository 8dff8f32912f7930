#!/bin/bash
# Round-4 tenth chip queue: megakernel shootout re-run after the MXU
# lane<->sublane bridge fix (the broadcast+transpose bridge failed Mosaic
# layout assignment on computed rows with replicated sublane offsets).
set -u
echo $$ > /tmp/chipq_r4j.pid
L=/tmp/chipq_r4j.log
: > "$L"
for P in /tmp/chipq_r4i.pid; do
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

B="python benchmarks/bench_decode_mega.py --hidden 2048 --layers 24"
run $B --variants mega --tile-n 1024
run $B --variants mega --tile-n 2048
run $B --variants mega --tile-n 1024 --state-bf16
echo "QUEUE R4J DONE $(date)" >> "$L"
