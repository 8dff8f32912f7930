#!/bin/bash
# Round-3 second-half chip measurement queue — run as ONE background chain
# (never two TPU processes; CLAUDE.md). Each step is individually
# timeout-bounded and appends to /tmp/chipq.log.
set -u
cd /root/repo
L=/tmp/chipq.log
: > "$L"
rm -f /tmp/chipq.stop  # a stale stop file must not no-op a fresh launch
run() {
  # stop file: touch /tmp/chipq.stop to halt the queue between steps
  # (e.g. to free the chip for the driver bench — never two TPU procs)
  if [ -f /tmp/chipq.stop ]; then
    echo "=== STOPPED by /tmp/chipq.stop before: $*" >> "$L"
    exit 0
  fi
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  timeout 3000 "$@" >> "$L" 2>&1
  echo "--- rc=$?" >> "$L"
}

# 1. sanity: driver bench unchanged after per-slot sampling work
run python bench.py
# 2. 1.4B train at B=3 (B=2: 472.8 ms / MFU 37.5; B=4 OOMs)
run python benchmarks/bench_flagship_scale.py --only train14 --batch 3
# 3. int4 decode perf at 0.4B and 1.4B (vs int8 14.2->15.5k / 5.5->6.6k)
run python benchmarks/bench_flagship_scale.py --only decode04 --int4
run python benchmarks/bench_flagship_scale.py --only decode14 --int4
# 4. int4 quality: greedy decision flips at 0.4B (int8 measured 1.0000)
run python scripts/measure_int8_quality.py --int4
# 5. Cosy e2e RTF at deployed 1.5B with int4 (int8 cleared 0.089)
run python benchmarks/bench_cosy_rtf.py --hidden 2048 --layers 24 --int4
# 6. serving A/B at the 96-slot production default after per-slot sampling
#    (re-measure the 5.2k number) and +int8
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --packed-wkv --skip-grouped
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --packed-wkv --skip-grouped --int8
# 7. streaming TTFA/RTF at the deployed 1.5B pairing, int8
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int8
# 7b. streaming at the deployed 1.5B pairing, int4
run python benchmarks/bench_streaming_latency.py --hidden 2048 --layers 24 --int4
# 7c. serving at the deployed 1.4B LM (XLA state: packed loses at 1.4B), int8
run python benchmarks/bench_serving_continuous.py --requests 96 --slots 48 \
    --chunk 32 --skip-grouped --hidden 2048 --layers 24 --int8
# 7d. decode 1.4B at B=128 (XLA path; state traffic vs weight amortization)
run python benchmarks/bench_flagship_scale.py --only decode14 --batch 128
# 7c2. SFM fast flow decode at deployed shapes: 5 ODE steps from t_h vs
#      the CFM 10-step CFG path (flow-stage ms is the comparand)
run python benchmarks/bench_cosy_rtf.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5
# 7d2. bf16 decode-state carry: state passes dominate at 1.4B (the
#      reference's own decode kernel is fp16-state); also +int8 combo
run python benchmarks/bench_flagship_scale.py --only decode14 --state-bf16
run python benchmarks/bench_flagship_scale.py --only decode14 --state-bf16 --int8
run python benchmarks/bench_flagship_scale.py --only decode04 --state-bf16
run python scripts/measure_int8_quality.py --state-bf16
# 7d3. serving 96 slots with the bf16 state carry (XLA step; packed is
#      exclusive) — A/B against the packed 5.2k default
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --skip-grouped --state-bf16
# 7d4. overlapped (double-buffered) chunks at the production default —
#      hides the per-chunk host sync behind device compute
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --packed-wkv --skip-grouped --overlap
# 7e. remaining families at 0.4B-class: s2s + two-tower decode
run python benchmarks/bench_families_scale.py --only s2s
run python benchmarks/bench_families_scale.py --only two_tower
# 8. decode ladder: 0.19B-class (768x24) completes the deployed-size set
run python benchmarks/bench_flagship_scale.py --only decode019
# 9. two-level hierarchical WKV (wkv_spans, XLA path) at 0.4B train —
#    does the spans-shortened serial chunk scan rival the pallas pair?
run python benchmarks/bench_flagship_scale.py --only train04 --wkv-spans 8
run python benchmarks/bench_flagship_scale.py --only train04 --wkv-spans 16
# 10. concurrent streaming from the Cosy slot pool at the deployed 1.5B
#     pairing (vs bench_streaming_latency's single stream, TTFA 344 ms-class)
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 8 --slots 8 --chunk 16
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 16 --slots 16 --chunk 16
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 16 --slots 16 --chunk 16 --overlap
echo "QUEUE DONE $(date)" >> "$L"
