#!/bin/bash
# Chain after chain_queue_pending2.sh: speculative-decode measurements at
# the deployed 1.5B-class LM (B=1, weight-bandwidth-bound — the regime
# spec decode targets). Never two TPU processes.
set -u
L=/tmp/chipq3.log
: > "$L"
while true; do
  if grep -q "QUEUE2 DONE\|STOPPED by\|not starting" /tmp/chipq2.log 2>/dev/null; then
    break
  fi
  sleep 60
done
if ! grep -q "QUEUE2 DONE" /tmp/chipq2.log 2>/dev/null; then
  echo "queue2 did not complete; not starting queue3" >> "$L"
  exit 0
fi
cd /root/repo
run() {
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop before: $*" >> "$L"
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  timeout 3000 "$@" >> "$L" 2>&1
  echo "--- rc=$?" >> "$L"
}
run python benchmarks/bench_spec_decode.py --hidden 2048 --layers 24 --k 8
run python benchmarks/bench_spec_decode.py --hidden 2048 --layers 24 --k 16
run python benchmarks/bench_spec_decode.py --hidden 2048 --layers 24 --k 16 --int4
echo "QUEUE3 DONE $(date)" >> "$L"
