"""Benchmark: Spark speech-LM decode throughput on the real chip.

Measures generated-audio-token throughput (the reference's headline runtime
print, model/llm/llm.py:268-269 / cosy_llm.py:270-271) with the flagship
decode loop: batched AR generation, everything on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north-star: 5000 audio tok/s/chip (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()


def main():
    import os

    from rwkvtts_tpu.infer.generate import (
        spark_generate, spark_generate_mega_b64,
    )
    from rwkvtts_tpu.models import spark

    # deployed-scale flagship: 0.4B-class (the reference ships 0.19B-1.5B
    # LMs, Inference.md:19-44; round-2 VERDICT required benching >=0.4B).
    # decode_state_bf16 carries the WKV state bf16 between steps — the
    # reference's own decode kernel carries fp16 state
    # (cuda/rwkv7_state_fwd_fp16.cu), and the chip-level probe measured
    # ZERO decision flips (teacher-forced AND free-running agreement
    # 1.0000 over 256 steps, scripts/measure_int8_quality.py --state-bf16,
    # PERF.md round 3), so this is the production decode config.
    cfg = spark.default_config(
        hidden_size=1024, num_layers=24, decode_state_bf16=True
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    # cast big tables to bf16 for the bandwidth-bound decode
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params
    )
    from rwkvtts_tpu.models import rwkv7

    B, T_prompt, T_new = 64, 128, 256
    k = jax.random.PRNGKey(1)
    tokens = jax.random.randint(k, (B, T_prompt), 0, 4000)
    modality = jnp.full((B, T_prompt), spark.MOD_TEXT, jnp.int32)
    modality = modality.at[:, -1].set(spark.MOD_TAG)
    mask = jnp.ones((B, T_prompt), jnp.int32)

    # Decode path: the whole-step B=64 megakernel (ops/decode_mega_b64.py —
    # one pallas_call per token: int8 weight stream, bf16 state; prefill
    # stays XLA bf16). Gated on chip before promotion (PERF.md r5a):
    # quality bound 1.0 teacher-forced AND free-running agreement over 256
    # steps at this exact config, and the full-sampling A/B measured
    # 29,481 tok/s vs 19,094 for the XLA path (+54%). Set
    # RWKVTTS_BENCH_PATH=xla for the previous fused-XLA decode.
    use_mega = os.environ.get("RWKVTTS_BENCH_PATH", "mega") != "xla"
    if use_mega:
        from rwkvtts_tpu.ops import decode_mega_b64 as dmb

        # tile_n 1024: r5k sweep measured 1.489 ms/step vs 1.567 at 512
        # (tile 1024 also won at C=2048, PERF.md r5a)
        mega = dmb.pack_mega_b64(params, cfg.backbone, tile_n=1024)
        spec = mega.pop("spec")

        def run(key):
            toks, _ = spark_generate_mega_b64(
                params, mega, spec, cfg, tokens, modality, mask, key,
                max_new_tokens=T_new, top_k=50, top_p=0.95, temperature=1.0,
            )
            return toks
    else:
        # fuse the seven per-block input projections into two matmuls
        pk = rwkv7.pack_decode_params(params, cfg.backbone)

        def run(key):
            toks, _ = spark_generate(
                pk, cfg, tokens, modality, mask, key,
                max_new_tokens=T_new, top_k=50, top_p=0.95, temperature=1.0,
            )
            return toks

    # compile + warmup; sync via an explicit host transfer (block_until_ready
    # alone does not reliably fence on the tunneled axon platform)
    import numpy as np
    import sys

    np.asarray(run(jax.random.PRNGKey(2)))
    # Median of N single-pass timings, spread to stderr: round-3 showed the
    # tunnel's per-pass variance can be large (the same program measured
    # 11.3k under chip contention vs 19.0k solo) — the median of
    # independent passes is robust to a slow outlier, and the printed
    # spread makes a contended/degraded run self-diagnosing.
    reps = 5
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    toks_per_s = B * T_new / dt
    baseline = 5000.0
    print(
        f"bench.py passes (s): {['%.3f' % t for t in times]} "
        f"median={dt:.3f} min={min(times):.3f} max={max(times):.3f} "
        f"spread={(max(times) - min(times)) / dt:.1%}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "spark_decode_tokens_per_sec_per_chip",
                "value": round(toks_per_s, 1),
                "unit": "audio_tokens/s/chip",
                "vs_baseline": round(toks_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
