"""B=1 decode-step shootout: whole-step megakernel vs the XLA paths.

The streaming RTF<=0.1 push at 1.5B needs the B=1 LM step under ~2.5
ms/tok (PERF.md round 4): measured XLA int8 is 3.26 ms against a 1.77 ms
weight-bandwidth roofline. This bench isolates the LM step (embed ->
backbone -> head -> greedy) in one jitted scan per variant:

  xla_q8         fused-projection int8 (the deployed config)
  xla_q8_nofuse  unfused int8 (fewer HBM bytes; pack fuse_projections=False)
  mega           whole-step megakernel (ops/decode_mega.py, one pallas_call)

Usage: python benchmarks/bench_decode_mega.py --hidden 2048 --layers 24
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tile-n", type=int, default=1024)
    ap.add_argument("--variants", default="xla_q8,xla_q8_nofuse,mega")
    ap.add_argument("--state-bf16", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode megakernel (CPU smoke)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from rwkvtts_tpu.models import rwkv7
    from rwkvtts_tpu.ops import decode_mega as dm

    cfg = rwkv7.RWKV7Config(
        vocab_size=8193, hidden_size=args.hidden, num_layers=args.layers,
        decode_state_bf16=args.state_bf16,
    )
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params
    )
    results = []
    tok_streams = {}

    def time_variant(name, step_fn, pk, st0):
        @jax.jit
        def run(pk, st):
            def body(carry, _):
                tok, st = carry
                x = pk_emb[tok]
                h, st = step_fn(pk, x, st)
                logits = h.astype(jnp.bfloat16) @ pk_head
                tok = jnp.argmax(logits, axis=-1)
                return (tok, st), tok
            (_, st), toks = jax.lax.scan(
                body, (jnp.zeros((1,), jnp.int32), st), None,
                length=args.steps,
            )
            return toks

        pk_emb = params["embedding"].astype(jnp.bfloat16)
        pk_head = params["head"].astype(jnp.bfloat16)
        tok_streams[name] = np.asarray(run(pk, st0))  # compile + first
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(run(pk, st0))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / args.steps
        out = {
            "bench": f"decode_mega_{args.hidden}x{args.layers}",
            "variant": name,
            "ms_per_step": round(ms, 3),
            "tok_per_s": round(1000.0 / ms, 1),
        }
        results.append(out)
        print(json.dumps(out), flush=True)

    variants = args.variants.split(",")
    if "xla_q8" in variants:
        pk = rwkv7.pack_decode_params(params, cfg, quantize_int8=True)
        st = rwkv7.init_model_state(cfg, 1)
        time_variant(
            "xla_q8",
            lambda p, x, s: rwkv7.decode_step(p, cfg, x, s), pk, st,
        )
    if "xla_q8_nofuse" in variants:
        pk = rwkv7.pack_decode_params(
            params, cfg, quantize_int8=True, fuse_projections=False
        )
        st = rwkv7.init_model_state(cfg, 1)
        time_variant(
            "xla_q8_nofuse",
            lambda p, x, s: rwkv7.decode_step(p, cfg, x, s), pk, st,
        )
    if "mega" in variants:
        mega = dm.pack_mega(params, cfg, tile_n=args.tile_n)
        spec = mega.pop("spec")  # static: close over it, jit the arrays
        st = dm.pack_mega_state(
            rwkv7.init_model_state(cfg, 1), cfg,
            state_bf16=args.state_bf16,
        )

        def mega_step(p, x, s):
            return dm.decode_step_mega(
                dict(p, spec=spec), cfg, x, s, interpret=args.interpret
            )

        time_variant("mega", mega_step, mega, st)

    # greedy-token agreement across variants (mega quantizes lora-out
    # matrices the XLA paths keep bf16 — small divergence expected)
    names = list(tok_streams)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = tok_streams[names[i]], tok_streams[names[j]]
            print(json.dumps({
                "agreement": f"{names[i]} vs {names[j]}",
                "frac": round(float((a == b).mean()), 4),
            }), flush=True)

    print("ALL:", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
