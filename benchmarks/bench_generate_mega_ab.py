"""A/B: bench.py's full-sampling generate vs the B=64 megakernel route.

Times `spark_generate` (the current production/driver path: XLA fused
decode, bf16 state) against `spark_generate_mega_b64` (whole-step
pallas_call per token: int8 weight stream, bf16 state, ops/
decode_mega_b64.py) at the EXACT bench.py flagship config — 0.4B-class
1024x24, B=64, 128-token prompt, 256 new tokens, top-k 50 / top-p 0.95.
Median of N passes each, same key schedule.

Usage: python benchmarks/bench_generate_mega_ab.py [--hidden 2048]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--t-new", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-n", type=int, default=512)
    ap.add_argument("--variants", default="xla,mega")
    ap.add_argument("--family", default="spark", choices=["spark", "cosy"],
                    help="cosy: RAS-sampling Cosy layout (BASELINE config "
                         "#3 lists batched offline for BOTH layouts)")
    args = ap.parse_args()

    from rwkvtts_tpu.infer.generate import (
        cosy_generate, cosy_generate_mega_b64, spark_generate,
        spark_generate_mega_b64,
    )
    from rwkvtts_tpu.models import cosy, rwkv7, spark

    fam = spark if args.family == "spark" else cosy
    cfg = fam.default_config(
        hidden_size=args.hidden, num_layers=args.layers,
        decode_state_bf16=True,
    )
    params = fam.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params
    )

    B, T_prompt, T_new = 64, 128, args.t_new
    k = jax.random.PRNGKey(1)
    tokens = jax.random.randint(k, (B, T_prompt), 0, 4000)
    modality = jnp.full((B, T_prompt), fam.MOD_TEXT, jnp.int32)
    if args.family == "spark":
        modality = modality.at[:, -1].set(spark.MOD_TAG)
    mask = jnp.ones((B, T_prompt), jnp.int32)

    def bench(name, run):
        np.asarray(run(jax.random.PRNGKey(2)))  # compile + warm
        times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(run(jax.random.PRNGKey(3 + i)))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        out = {
            "bench": f"generate_mega_ab_{args.hidden}x{args.layers}"
            + ("_cosy" if args.family == "cosy" else ""),
            "variant": name,
            "tok_per_s_chip": round(B * T_new / dt, 1),
            "median_s": round(dt, 3),
            "spread": round((max(times) - min(times)) / dt, 3),
        }
        print(json.dumps(out), flush=True)

    variants = args.variants.split(",")
    if "xla" in variants:
        pk = rwkv7.pack_decode_params(params, cfg.backbone)

        def run_xla(key):
            if args.family == "cosy":
                toks, _ = cosy_generate(
                    pk, cfg, tokens, modality, mask, key,
                    max_new_tokens=T_new, top_k=25, top_p=0.8,
                )
            else:
                toks, _ = spark_generate(
                    pk, cfg, tokens, modality, mask, key,
                    max_new_tokens=T_new, top_k=50, top_p=0.95,
                    temperature=1.0,
                )
            return toks

        bench("xla", run_xla)
        # free the fused pack + its jitted closure before the mega variant
        # packs its own arrays: at --hidden 2048 both sets resident at once
        # risks RESOURCE_EXHAUSTED on the 16 GB chip (ADVICE r4). The pack
        # SHARES the raw param leaves (it only adds fused copies), so only
        # delete leaves not aliased into `params`.
        del run_xla
        keep = {id(x) for x in jax.tree.leaves(params)}
        for leaf in jax.tree.leaves(pk):
            if id(leaf) not in keep and hasattr(leaf, "delete"):
                leaf.delete()
        del pk

    if "mega" in variants or "mega_rankbf16" in variants:
        from rwkvtts_tpu.ops import decode_mega_b64 as dmb

        mega = dmb.pack_mega_b64(params, cfg.backbone, tile_n=args.tile_n)
        spec = mega.pop("spec")

        def make_run(rank_bf16):
            def run_mega(key):
                if args.family == "cosy":
                    toks, _ = cosy_generate_mega_b64(
                        params, mega, spec, cfg, tokens, modality, mask,
                        key, max_new_tokens=T_new, top_k=25, top_p=0.8,
                        rank_bf16=rank_bf16,
                    )
                else:
                    toks, _ = spark_generate_mega_b64(
                        params, mega, spec, cfg, tokens, modality, mask,
                        key, max_new_tokens=T_new, top_k=50, top_p=0.95,
                        temperature=1.0, rank_bf16=rank_bf16,
                    )
                return toks
            return run_mega

        if "mega" in variants:
            bench("mega", make_run(False))
        if "mega_rankbf16" in variants:
            # bf16 candidate ranking: no full-vocab fp32 convert/divide/
            # TopK per step (ops/sampling.sample rank_bf16)
            bench("mega_rankbf16", make_run(True))


if __name__ == "__main__":
    main()
