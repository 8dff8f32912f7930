"""Profile the 0.4B train step on the real chip (VERDICT r2 #2: MFU).

Captures a jax.profiler trace of steady-state steps, then aggregates the
TensorCore op durations from the trace.json.gz by fusion/op family so the
time budget is readable without TensorBoard.

Usage: python scripts/profile_train_0p4b.py [--hidden 1024 --layers 24]
"""
from __future__ import annotations

import argparse
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


def build(hidden, layers, B, T, **cfg_kw):
    from rwkvtts_tpu.models import spark
    from rwkvtts_tpu.parallel import train_step as ts
    from rwkvtts_tpu.train import optimizer as opt_lib

    cfg = spark.default_config(hidden_size=hidden, num_layers=layers, **cfg_kw)
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tx = opt_lib.build_optimizer(params)
    state = ts.init_train_state(params, tx)
    # donate: without it two train-state copies live across the step and
    # the 0.4B saved-inverse config HBM-OOMs; the trace is unaffected
    step = ts.make_train_step(cfg, tx, donate=True)
    k = jax.random.PRNGKey(1)
    batch = {
        "tokens": jax.random.randint(k, (B, T), 0, 4096),
        "modality": jnp.where(
            jnp.arange(T)[None, :] < T // 2, spark.MOD_TEXT, spark.MOD_SEMANTIC
        ) * jnp.ones((B, 1), jnp.int32),
        "labels": jnp.where(
            jnp.arange(T)[None, :] < T // 2, -100,
            jax.random.randint(k, (B, T), 0, 8192),
        ),
        "attention_mask": jnp.ones((B, T), jnp.int32),
    }
    return cfg, state, step, batch


def analyze(trace_dir, top=40):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print("no trace found")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TensorCore-ish threads (XLA ops land on pid/tid with names)
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    agg = collections.Counter()
    indiv = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = names.get((e.get("pid"), e.get("tid")), "")
        if tname != "XLA Ops":  # the TPU device op lane
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        nm = e.get("name", "?")
        # collapse fusion indices: fusion.123 -> fusion
        base = nm.split(".")[0]
        agg[base] += dur
        indiv[nm] += dur
        total += dur
    print(f"-- trace {files[-1]}  device total {total:.1f} ms --")
    for nm, ms in agg.most_common(top):
        print(f"{ms:10.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {nm}")
    print("-- top individual ops --")
    for nm, ms in indiv.most_common(top):
        print(f"{ms:10.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {nm}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--out", default="/tmp/train04_trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--remat-policy", default=None, help="e.g. wkv")
    ap.add_argument("--layer-unroll", action="store_true")
    ap.add_argument("--fuse-prep", action="store_true")
    ap.add_argument("--wkv-mm", default="f32")
    ap.add_argument("--wkv-solve", default="saved")
    ap.add_argument("--production", action="store_true",
                    help="the train/cli.py single-chip TPU defaults")
    args = ap.parse_args()
    if args.analyze_only:
        analyze(args.out)
        return

    kw = dict(
        remat_policy=args.remat_policy, layer_unroll=args.layer_unroll,
        wkv_fuse_prep=args.fuse_prep, wkv_mm=args.wkv_mm,
        wkv_solve=args.wkv_solve,
    )
    if args.production:
        kw.update(remat_policy="wkv", layer_unroll=True, wkv_fuse_prep=True,
                  wkv_mm="bf16", wkv_group=16, wkv_group_bwd=16)
    cfg, state, step, batch = build(
        args.hidden, args.layers, args.batch, args.seqlen, **kw
    )
    rng = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    np.asarray(m["loss"])
    print(f"compile+first {time.perf_counter()-t0:.1f}s")
    for _ in range(2):
        state, m = step(state, batch, rng)
    np.asarray(m["loss"])

    jax.profiler.start_trace(args.out)
    for _ in range(2):
        state, m = step(state, batch, rng)
    np.asarray(m["loss"])
    jax.profiler.stop_trace()
    analyze(args.out)


if __name__ == "__main__":
    main()
