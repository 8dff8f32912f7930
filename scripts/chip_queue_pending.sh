#!/bin/bash
# Round-3 sixth-session chip queue — ONLY the still-unmeasured items
# (everything before item 7 of run_chip_queue.sh already has PERF.md
# numbers). Run as ONE background chain (never two TPU processes).
# The persistent jit cache (/root/repo/.jax_cache) is empty on this
# machine, so step 1 warms the driver-bench programs first — that also
# protects the end-of-round driver bench from a cold-compile timeout.
set -u
cd /root/repo
L=/tmp/chipq.log
: > "$L"
rm -f /tmp/chipq.stop
run() {
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop before: $*" >> "$L"
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  timeout 3000 "$@" >> "$L" 2>&1
  echo "--- rc=$?" >> "$L"
}

# 1. driver bench sanity + warm its programs into the persistent cache
run python bench.py
# 2. 0.19B-class decode completes the deployed-size ladder
run python benchmarks/bench_flagship_scale.py --only decode019
# 3. streaming TTFA/RTF at the deployed 1.5B pairing (int8 decode)
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8
# 4. bf16 decode-state carry at 1.4B (state passes dominate there)
run python benchmarks/bench_flagship_scale.py --only decode14 --state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --state-bf16 --int8
run python benchmarks/bench_flagship_scale.py --only decode04 --state-bf16
run python scripts/measure_int8_quality.py --state-bf16
# 5. overlapped (double-buffered) serving chunks A/B at the 96-slot default
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --packed-wkv --skip-grouped --overlap
# 6. concurrent streaming from the Cosy slot pool at the 1.5B pairing
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 8 --slots 8 --chunk 16
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 16 --slots 16 --chunk 16
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 16 --slots 16 --chunk 16 --overlap
# 7. SFM fast flow decode at deployed shapes (5 ODE steps from t_h vs CFM 10)
run python benchmarks/bench_cosy_rtf.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5
# 8. two-level hierarchical WKV at 0.4B train (spans-shortened serial scan)
run python benchmarks/bench_flagship_scale.py --only train04 --wkv-spans 8
run python benchmarks/bench_flagship_scale.py --only train04 --wkv-spans 16
# 9. remaining families at 0.4B-class
run python benchmarks/bench_families_scale.py --only s2s
run python benchmarks/bench_families_scale.py --only two_tower
# 10. serving 96 slots with the bf16 state carry (XLA step)
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --skip-grouped --state-bf16
# 11. decode 1.4B at B=128 (XLA path; state traffic vs weight amortization)
run python benchmarks/bench_flagship_scale.py --only decode14 --batch 128
# 12. low-value tail: int4 quality probe + Cosy 1.5B int4 RTF
run python scripts/measure_int8_quality.py --int4
run python benchmarks/bench_cosy_rtf.py --hidden 2048 --layers 24 --int4
echo "QUEUE DONE $(date)" >> "$L"
