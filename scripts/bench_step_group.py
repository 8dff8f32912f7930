"""Micro-bench: packed WKV step kernel group-size sweep (scripts/).

The kernel's grid is (P // G,): at decode batch 128 (P = 1024) the default
G=8 gives 128 serial grid steps per layer call — the suspected binder
behind packed decode trailing XLA at B=256 (PERF.md round 3). Sweeps G at
the deployed 0.4B head layout.

Usage: python scripts/bench_step_group.py [--batch 128] [--steps 64]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-size", type=int, default=64)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--groups", default="8,16,32,64,128")
    args = ap.parse_args()

    from rwkvtts_tpu.ops import wkv7_step_pallas as sp

    B, H, N = args.batch, args.heads, args.head_size
    P = B * (H // 2)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 7)
    state = jax.random.normal(ks[0], (P, N, 2 * N), jnp.float32)
    vecs = [
        jax.random.normal(kk, (B, H, N), jnp.bfloat16) * 0.1
        for kk in ks[1:7]
    ]
    r, w_raw, kv, v, z, b = vecs

    for g in (int(x) for x in args.groups.split(",")):
        if P % g:
            print(f"G={g}: skipped (P={P} not divisible)")
            continue

        @functools.partial(jax.jit, static_argnames=("group",))
        def run(state, *, group):
            def body(s, _):
                # L layer calls back-to-back models the per-step cost of a
                # depth-L decode (each layer is one pallas_call)
                for _ in range(args.layers):
                    y, s = sp.wkv7_step_packed(
                        s, r, w_raw, kv, v, z, b, group=group
                    )
                return s, y[0, 0, 0]
            s, ys = jax.lax.scan(body, state, None, length=args.steps)
            return ys

        t0 = time.perf_counter()
        np.asarray(run(state, group=g))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(state, group=g))
        dt = time.perf_counter() - t0
        per_step = dt / args.steps * 1e3
        print(
            f"G={g:4d}: {per_step:7.3f} ms/step ({args.layers} layers, "
            f"B={B}; compile+first {c:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
