#!/bin/bash
# Round-4 third chip queue: verify surfaces + the new streaming hop levers
# (vocode_every batching, lm_prefetch, in-jit key folding — VERDICT r3 #6).
# ONE background chain, never two TPU processes (CLAUDE.md). Self-registers
# its pid (/tmp/chipq_r4c.pid). Halt between steps: touch /tmp/chipq.stop.
# Log: /tmp/chipq_r4c.log.
set -u
echo $$ > /tmp/chipq_r4c.pid
L=/tmp/chipq_r4c.log
: > "$L"
for P in /tmp/chipq_r4b.pid /tmp/chipq_r4.pid /tmp/chipq_s8.pid /tmp/chipq.pid; do
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

# 1. verify surfaces (SKILL.md 1+3): flagship entry loss + driver bench
run python -c "
import __graft_entry__ as ge, jax
fn, args = ge.entry()
print('loss', float(jax.jit(fn)(*args)))"
run python bench.py

# 2. streaming baseline re-run WITH the new hop-loop code (in-jit mask +
#    fold_in, prefetch default-on) — prior best 0.174 at this config
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
    --int8 --sfm --flow-timesteps 5 --ctx 50 --profile
# 3. prefetch A/B (control): same config, prefetch disabled
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
    --int8 --sfm --flow-timesteps 5 --ctx 50 --no-prefetch
# 4. vocoder batching: K hops of mel per HiFT call after the first chunk
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
    --int8 --sfm --flow-timesteps 5 --ctx 50 --vocode-every 2
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
    --int8 --sfm --flow-timesteps 5 --ctx 50 --vocode-every 4 --profile
# 5. bigger hop composed with vocode batching (fewer flow calls too;
#    TTFA grows with hop, steady RTF should drop)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 \
    --int8 --sfm --flow-timesteps 5 --ctx 50 --hop 75 --vocode-every 2
# 5b. bench.py candidate: int8 composed with the bf16 state carry at 0.4B
#     (never measured together; separately +9.8% and +34%) + quality bound
run python benchmarks/bench_flagship_scale.py --only decode04 --state-bf16 --int8
run python scripts/measure_int8_quality.py --int8 --state-bf16
# 5c. fused-projection double-storage question at the weight-bound 1.4B:
#     unfused original 7-matmul path saves ~0.65 GB/step of weight reads
run python benchmarks/bench_flagship_scale.py --only decode14 --no-proj-fuse
run python benchmarks/bench_flagship_scale.py --only decode14 --no-proj-fuse --state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --state-bf16 --int8
# 6. VERDICT #8 probes before any megakernel: does the in-place packed
#    Pallas step win at 1.4B B=64 (P=1024 rows, the regime the round-3
#    0.4B numbers said it loses at small B but wins at pool scale)?
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv --int8
# 6b. the new bf16-carry packed kernel: halves the dominant state HBM
#     term on top of the single-pass update (kernel now composes)
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv --state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --packed-wkv --state-bf16 --int8
# 7. locate the 11.7ms-vs-7.3ms-roofline gap at 1.4B B=64: per-op trace
#    for baseline / packed / state-bf16 variants
run python scripts/profile_decode_b128.py --hidden 2048 --batches 64
run python scripts/profile_decode_b128.py --hidden 2048 --batches 64 --packed-wkv
run python scripts/profile_decode_b128.py --hidden 2048 --batches 64 --state-bf16 --int8
echo "QUEUE R4C DONE $(date)" >> "$L"
