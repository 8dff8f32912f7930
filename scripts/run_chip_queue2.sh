#!/bin/bash
# Round-3 fifth-session follow-up queue — chained after run_chip_queue.sh
# by scripts/chain_queue2.sh (never two TPU processes; CLAUDE.md).
set -u
cd /root/repo
L=/tmp/chipq2.log
: > "$L"
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
