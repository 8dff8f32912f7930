#!/bin/bash
# Round-4 chip measurement queue — ONE background chain, never two TPU
# processes (CLAUDE.md). Self-registers its pid (/tmp/chipq_r4.pid) so
# successors can wait on it without trusting the launcher (ADVICE r3 #4).
# Halt between steps: touch /tmp/chipq.stop. Log: /tmp/chipq_r4.log.
set -u
echo $$ > /tmp/chipq_r4.pid
L=/tmp/chipq_r4.log
: > "$L"
# wait for any predecessor queue still holding the chip
for P in /tmp/chipq_s8.pid /tmp/chipq_s7.pid /tmp/chipq.pid; do
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

# 1. driver bench (now median-of-5 w/ spread): warm cache + variance study
run python bench.py
# 2. verify surface 1: flagship forward loss (expect ~9.0)
run python -c "
import __graft_entry__ as ge, jax
fn, args = ge.entry()
print('loss', float(jax.jit(fn)(*args)))"
# 3. re-runs of the s8 items that failed on bench bugs / tunnel death
run python benchmarks/bench_families_scale.py --only s2s
run python benchmarks/bench_families_scale.py --only two_tower
run python benchmarks/bench_flagship_scale.py --only train04 --wkv-spans 8
# 4. streaming at the deployed 1.5B: current levers baseline
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8
echo "QUEUE R4 DONE $(date)" >> "$L"
