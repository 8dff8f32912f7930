#!/bin/bash
# Wait for chip_queue_pending.sh to finish, then run the carried-over
# fifth-session items (verify surface 1 + fit-loop overlap A/B) that were
# lost when /tmp was wiped. Never two TPU processes.
set -u
L=/tmp/chipq2.log
: > "$L"
while true; do
  if grep -q "QUEUE DONE\|STOPPED by" /tmp/chipq.log 2>/dev/null; then
    break
  fi
  sleep 60
done
if grep -q "STOPPED by" /tmp/chipq.log 2>/dev/null; then
  echo "queue1 was stopped; not starting queue2" >> "$L"
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
# 1. verify surface 1: single-chip flagship forward loss (expect ~9.0)
run python -c "
import __graft_entry__ as ge, jax
fn, args = ge.entry()
print('loss', float(jax.jit(fn)(*args)))"
# 2. fit-loop overlap A/B at 0.4B: host collation overlapped vs fenced
run python benchmarks/bench_fit_loop.py --hidden 1024 --layers 24 --steps 30
run python benchmarks/bench_fit_loop.py --hidden 1024 --layers 24 --steps 30 --sync-every-step
echo "QUEUE2 DONE $(date)" >> "$L"
