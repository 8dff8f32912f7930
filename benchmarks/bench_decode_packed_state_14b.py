"""Decode-step probe at 1.4B: XLA einsum state path vs the packed Pallas
single-pass step kernel (ops/wkv7_step_pallas).

PERF.md round 2: the packed kernel LOST at 103M (launch/DMA overhead >
saved HBM passes). At 1.4B the decode roofline is dominated by ~4 HBM
passes over an 805 MB fp32 state, so the one-pass kernel's economics
change — this measures whether it wins at deployed scale.

Usage: python benchmarks/bench_decode_packed_state_14b.py [--hidden 2048]
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
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()

    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import rwkv7, spark
    from rwkvtts_tpu.ops import wkv7_step_pallas as sp

    cfg = spark.default_config(hidden_size=args.hidden, num_layers=args.layers)
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params
    )
    params = rwkv7.pack_decode_params(params, cfg.backbone)

    B, Tp = args.batch, 128
    k = jax.random.PRNGKey(1)
    tokens = jax.random.randint(k, (B, Tp), 0, 4000)
    modality = jnp.full((B, Tp), spark.MOD_TEXT, jnp.int32)
    modality = modality.at[:, -1].set(spark.MOD_TAG)
    mask = jnp.ones((B, Tp), jnp.int32)

    carry0 = gen.spark_prefill_carry(params, cfg, tokens, modality, mask)

    def timed(carry, label):
        key = jax.random.PRNGKey(3)
        # warm
        c, toks, done = gen.spark_decode_chunk(
            params, cfg, jax.tree.map(jnp.copy, carry), key,
            chunk_len=64, top_k=50, top_p=0.95,
        )
        np.asarray(toks)
        t0 = time.perf_counter()
        c = jax.tree.map(jnp.copy, carry)
        n = 0
        while n < args.steps:
            key, sub = jax.random.split(key)
            c, toks, done = gen.spark_decode_chunk(
                params, cfg, c, sub, chunk_len=64, top_k=50, top_p=0.95,
            )
            n += 64
        np.asarray(toks)
        dt = time.perf_counter() - t0
        tps = B * args.steps / dt
        print(json.dumps({
            "path": label, "tok_per_s": round(tps, 1),
            "ms_per_step": round(dt * 1e3 / args.steps, 3),
        }), flush=True)
        return tps

    timed(carry0, "xla_einsum_state")

    h, state, done, cnt = carry0
    packed_state = tuple(
        {**st, "wkv": sp.pack_state(st["wkv"])} for st in state
    )
    timed((h, packed_state, done, cnt), "pallas_packed_state")


if __name__ == "__main__":
    main()
