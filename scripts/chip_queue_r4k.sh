#!/bin/bash
# Round-4 eleventh chip queue: decode-ONLY traces at the 1.4B B=64
# production point — the r4e full-generate traces included the remat-scoped
# prefill ops, so the copy/checkpoint attribution was polluted. These
# numbers decide whether a B=64 whole-step megakernel is worth building.
set -u
echo $$ > /tmp/chipq_r4k.pid
L=/tmp/chipq_r4k.log
: > "$L"
for P in /tmp/chipq_r4j.pid; do
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

P="python scripts/profile_decode_b128.py --hidden 2048 --layers 24 --batches 64 --decode-only"
# the production config (int8 + state-bf16; fused r4e winner) and its
# unfused variant (r4i measures the e2e number for the combo)
run $P --int8 --state-bf16
run $P --int8 --state-bf16 --no-proj-fuse
# bf16 reference point for the copy-band question
run $P
echo "QUEUE R4K DONE $(date)" >> "$L"
