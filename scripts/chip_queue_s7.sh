#!/bin/bash
# Round-3 seventh-session chip queue — ONLY items with no PERF.md number
# yet, value-ordered (spec decode and pooled streaming first). Waits for
# the prior queue process to exit (it stops after its current step via
# /tmp/chipq.stop), then takes over the chip. Never two TPU processes.
set -u
echo $$ > /tmp/chipq_s7.pid  # self-register (ADVICE r3 #4)
L=/tmp/chipq_s7.log
: > "$L"
# Wait for the old queue (pid in /tmp/chipq.pid) to exit.
if [ -f /tmp/chipq.pid ]; then
  while kill -0 "$(cat /tmp/chipq.pid)" 2>/dev/null; do sleep 20; done
fi
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

# 0. bf16-state decision-flip probe: PERF.md cites this as "recorded
#    below" but it never ran; it also gates making decode_state_bf16 the
#    driver-bench default (the reference's own decode kernel is fp16-state)
run python scripts/measure_int8_quality.py --state-bf16
# 1. self-speculative greedy decode at the deployed 1.5B LM (B=1,
#    weight-bandwidth-bound — the regime spec decode targets)
run python benchmarks/bench_spec_decode.py --hidden 2048 --layers 24 --k 8
run python benchmarks/bench_spec_decode.py --hidden 2048 --layers 24 --k 16
# 2. concurrent streaming from the Cosy slot pool at the 1.5B pairing
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 8 --slots 8 --chunk 16
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 16 --slots 16 --chunk 16
# 3. overlapped (double-buffered) serving chunks A/B at the 96-slot default
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --packed-wkv --skip-grouped --overlap
# 4. fit-loop host-collation overlap A/B at 0.4B
run python benchmarks/bench_fit_loop.py --hidden 1024 --layers 24 --steps 30
run python benchmarks/bench_fit_loop.py --hidden 1024 --layers 24 --steps 30 --sync-every-step
# 5. SFM fast flow decode at deployed shapes (5 ODE steps from t_h vs CFM 10)
run python benchmarks/bench_cosy_rtf.py --hidden 2048 --layers 24 --int8 --sfm --flow-timesteps 5
# 6. remaining families at 0.4B-class
run python benchmarks/bench_families_scale.py --only s2s
run python benchmarks/bench_families_scale.py --only two_tower
# 7. two-level hierarchical WKV at 0.4B train
run python benchmarks/bench_flagship_scale.py --only train04 --wkv-spans 8
# 8. serving 96 slots with the bf16 state carry (XLA step)
run python benchmarks/bench_serving_continuous.py --requests 192 --slots 96 \
    --chunk 32 --skip-grouped --state-bf16
# 9. decode 1.4B at B=128 (state traffic vs weight amortization)
run python benchmarks/bench_flagship_scale.py --only decode14 --batch 128
# 10. pooled streaming with overlap
run python benchmarks/bench_pooled_streaming.py --hidden 2048 --layers 24 \
    --int8 --streams 16 --slots 16 --chunk 16 --overlap
echo "QUEUE S7 DONE $(date)" >> "$L"
