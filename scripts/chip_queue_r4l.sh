#!/bin/bash
# Round-4 twelfth chip queue: Mosaic construct probes for the B=64
# whole-step decode megakernel (transposed state layout).
set -u
echo $$ > /tmp/chipq_r4l.pid
L=/tmp/chipq_r4l.log
: > "$L"
for P in /tmp/chipq_r4k.pid; do
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

run python scripts/probe_mega_b64.py
echo "QUEUE R4L DONE $(date)" >> "$L"
