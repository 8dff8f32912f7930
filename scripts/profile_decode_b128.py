"""Profile the batched decode step: per-op self-times from a device trace.

Original use: the B=128-regression question at 0.4B (PERF.md round 3).
Round 4 (VERDICT #8): --hidden/--layers/--batch/--packed-wkv/--int8/
--state-bf16 profile the 1.4B B=64 point to locate the gap between the
11.7 ms fused step and the ~5.5-7.3 ms HBM roofline before any megakernel
work — state copies vs weight streaming vs elementwise band vs dispatch.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()


def self_times(trace_dir, top=15):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in ev if e.get("ph") == "X"
           and names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack, self_t = [], collections.Counter()
    for e in ops:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_t[stack[-1][2].split(".")[0]] -= dur / 1e3
        self_t[e["name"].split(".")[0]] += dur / 1e3
        stack.append((ts, dur, e["name"]))
    total = sum(self_t.values())
    print(f"  device total {total:.2f} ms")
    for nm, ms in self_t.most_common(top):
        print(f"  {ms:8.3f} ms {100*ms/total:5.1f}%  {nm}")


def main():
    import argparse

    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import rwkv7, spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--packed-wkv", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--state-bf16", action="store_true")
    ap.add_argument("--no-proj-fuse", action="store_true")
    ap.add_argument("--decode-only", action="store_true",
                    help="trace a post-prefill spark_decode_chunk instead of "
                    "the whole generate: the full-generate trace includes the "
                    "remat-scoped prefill ops ('checkpoint'/'copy' bands), "
                    "which polluted the r4e B=64 attribution")
    args = ap.parse_args()

    cfg = spark.default_config(
        hidden_size=args.hidden, num_layers=args.layers,
        decode_wkv_packed=args.packed_wkv, decode_state_bf16=args.state_bf16,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params
    )
    params = rwkv7.pack_decode_params(
        params, cfg.backbone, quantize_int8=args.int8,
        fuse_projections=not args.no_proj_fuse,
    )

    for B in (int(b) for b in args.batches.split(",")):
        k = jax.random.PRNGKey(1)
        tokens = jax.random.randint(k, (B, 128), 0, 4000)
        modality = jnp.full((B, 128), spark.MOD_TEXT, jnp.int32)
        modality = modality.at[:, -1].set(spark.MOD_TAG)
        mask = jnp.ones((B, 128), jnp.int32)

        if args.decode_only:
            # steady-state chunk: prefill once outside the traced region,
            # then time/trace one donated 64-step decode chunk (the carry
            # from a prior chunk, so EOS masks/counters are warm too)
            def chunk(carry, key):
                carry, toks, _ = gen.spark_decode_chunk(
                    params, cfg, carry, key,
                    chunk_len=64, top_k=50, top_p=0.95,
                )
                return carry, toks

            carry = gen.spark_prefill_carry(params, cfg, tokens, modality, mask)
            carry, t0ks = chunk(carry, jax.random.PRNGKey(2))  # compile+warm
            np.asarray(t0ks)
            t0 = time.perf_counter()
            carry, t1ks = chunk(carry, jax.random.PRNGKey(3))
            np.asarray(t1ks)
            dt = time.perf_counter() - t0
        else:
            def run(key):
                toks, _ = gen.spark_generate(
                    params, cfg, tokens, modality, mask, key,
                    max_new_tokens=64, top_k=50, top_p=0.95,
                )
                return toks

            np.asarray(run(jax.random.PRNGKey(2)))
            t0 = time.perf_counter()
            np.asarray(run(jax.random.PRNGKey(3)))
            dt = time.perf_counter() - t0
        print(f"B={B}: {dt*1e3/64:.2f} ms/step", flush=True)
        out_dir = (
            f"/tmp/dec_trace_h{args.hidden}_b{B}"
            + ("_pk" if args.packed_wkv else "")
            + ("_q8" if args.int8 else "")
            + ("_sb" if args.state_bf16 else "")
            + ("_nf" if args.no_proj_fuse else "")
            + ("_do" if args.decode_only else "")
        )
        jax.profiler.start_trace(out_dir)
        if args.decode_only:
            carry, tks = chunk(carry, jax.random.PRNGKey(4))
            np.asarray(tks)
        else:
            np.asarray(run(jax.random.PRNGKey(4)))
        jax.profiler.stop_trace()
        self_times(out_dir)


if __name__ == "__main__":
    main()
