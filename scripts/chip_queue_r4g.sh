#!/bin/bash
# Round-4 seventh chip queue: Mosaic probes for the decode megakernel
# (scripts/probe_mega.py — each probe compiles one construct so remote
# compiler crashes are attributable). ONE background chain (CLAUDE.md).
set -u
echo $$ > /tmp/chipq_r4g.pid
L=/tmp/chipq_r4g.log
: > "$L"
for P in /tmp/chipq_r4f.pid; do
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

# one probe per process: a Mosaic SIGSEGV must not take the others down
for P in t128 bcast_t int8_dot switch_acc state_pair dyn_store; do
  run python scripts/probe_mega.py "$P"
done
echo "QUEUE R4G DONE $(date)" >> "$L"
