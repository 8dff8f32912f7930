#!/bin/bash
# Round-4 fourteenth chip queue: megakernel re-runs after the Mosaic
# gather fix (B=64) and the scratch-round-trip bridges (B=1), plus a
# refresh of the driver verify surfaces (bench.py, entry).
set -u
echo $$ > /tmp/chipq_r4n.pid
L=/tmp/chipq_r4n.log
: > "$L"
for P in /tmp/chipq_r4m.pid; do
  if [ -f "$P" ]; then
    while kill -0 "$(cat "$P")" 2>/dev/null; do sleep 20; done
  fi
done
rm -f /tmp/chipq.stop
cd /root/repo

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
print('probe ok', float(np.asarray(x @ x)[0, 0]))" >> "$L" 2>&1
}

# wait for a live tunnel (max ~6 h) so a dead tunnel doesn't burn the
# per-item timeouts
for i in $(seq 1 72); do
  if probe; then break; fi
  echo "=== $(date +%H:%M:%S) tunnel probe failed ($i), sleeping 300s" >> "$L"
  sleep 300
done

run() {
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop before: $*" >> "$L"
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  timeout 2400 "$@" >> "$L" 2>&1
  echo "--- rc=$?" >> "$L"
}

run python benchmarks/bench_decode_mega_b64.py --hidden 1024 --layers 24 --variants mega --tile-n 512
run python benchmarks/bench_decode_mega_b64.py --hidden 2048 --layers 24 --variants mega --tile-n 512
run python benchmarks/bench_decode_mega.py --hidden 2048 --layers 24 --variants mega --tile-n 1024
run python benchmarks/bench_decode_mega.py --hidden 2048 --layers 24 --variants mega --tile-n 1024 --state-bf16
run python bench.py
run python -c "
import __graft_entry__ as ge, jax
fn, args = ge.entry()
print('loss', float(jax.jit(fn)(*args)))"
echo "QUEUE R4N DONE $(date)" >> "$L"
