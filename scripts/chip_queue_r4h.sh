#!/bin/bash
# Round-4 eighth chip queue: the decode megakernel shootout at deployed
# sizes (VERDICT #8 / the streaming B=1 LM push). Variants split into
# separate processes so a Mosaic crash is attributable per item.
set -u
echo $$ > /tmp/chipq_r4h.pid
L=/tmp/chipq_r4h.log
: > "$L"
for P in /tmp/chipq_r4g.pid; do
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
# XLA reference points (one process: both are known-good programs)
run $B --variants xla_q8,xla_q8_nofuse
# the megakernel: compile risk isolated per tile size
run $B --variants mega --tile-n 1024
run $B --variants mega --tile-n 2048
run $B --variants mega --tile-n 1024 --state-bf16
echo "QUEUE R4H DONE $(date)" >> "$L"
