"""Knob sweep for the 0.4B train step (VERDICT r2 #2 MFU work).

Usage: python scripts/sweep_train_0p4b.py [--variants v1,v2,...]
Variants: base | bf16mm | g16 | g16bf16 | unroll | chunk32
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()

PEAK = 197e12


def run(name, cfg_kw, B=8, T=2048):
    from rwkvtts_tpu.models import spark
    from rwkvtts_tpu.parallel import train_step as ts
    from rwkvtts_tpu.train import optimizer as opt_lib

    cfg = spark.default_config(hidden_size=1024, num_layers=24)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, **cfg_kw)
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    tx = opt_lib.build_optimizer(params)
    state = ts.init_train_state(params, tx)
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
    rng = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    loss0 = float(np.asarray(m["loss"]))
    print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s loss {loss0:.4f}", flush=True)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, m = step(state, batch, rng)
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    mfu = 6 * n_params * B * T / dt / PEAK
    print(
        f"[{name}] step {dt*1e3:.1f} ms  {B*T/dt/1e3:.1f} KT/s  MFU {mfu*100:.1f}%",
        flush=True,
    )


VARIANTS = {
    "base": {},
    "bf16mm": {"wkv_mm": "bf16"},
    "g16": {"wkv_group": 16},
    "g16bf16": {"wkv_group": 16, "wkv_mm": "bf16"},
    "unroll": {"layer_unroll": True},
    "chunk32": {"wkv_chunk": 32},
    "dots": {"remat_policy": "dots"},
    "dotsnb": {"remat_policy": "dots_no_batch"},
    "g16split": {"wkv_group": 16, "wkv_group_bwd": 8},
    "g32split": {"wkv_group": 32, "wkv_group_bwd": 8},
    "wkvpol": {"remat_policy": "wkv"},
    "wkvpol_unroll": {"remat_policy": "wkv", "layer_unroll": True},
    "wkvpol_unroll_g16": {"remat_policy": "wkv", "layer_unroll": True,
                          "wkv_group": 16, "wkv_group_bwd": 8},
    # fused-prep kernel (kk normalize + k_a mix + ln_x + bonus in-kernel)
    "fuse": {"wkv_fuse_prep": True},
    "fuse_wkvpol_unroll": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                           "layer_unroll": True},
    "fuse_g16": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                 "layer_unroll": True, "wkv_group": 16, "wkv_group_bwd": 8},
    "fuse_bf16": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                  "layer_unroll": True, "wkv_mm": "bf16"},
    # saved-inverse backward solve A/B (cfg default is 'saved'; autodiff
    # re-derives the Neumann chain in the bwd kernel — PERF.md round 3)
    "fuse_bf16_autodiff": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                           "layer_unroll": True, "wkv_mm": "bf16",
                           "wkv_solve": "autodiff"},
    "fuse_bf16_saved_g16": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                            "layer_unroll": True, "wkv_mm": "bf16",
                            "wkv_group": 16, "wkv_group_bwd": 16},
    # chunk 128: with the saved-inverse solve the bwd no longer pays the
    # Neumann adjoint, so longer chunks (fewer grid steps + checkpoints)
    # may now win where L128 lost at 103M (PERF.md round 2)
    "fuse_bf16_l128": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                       "layer_unroll": True, "wkv_mm": "bf16",
                       "wkv_chunk": 128},
    "fuse_bf16_saved_g32": {"wkv_fuse_prep": True, "remat_policy": "wkv",
                            "layer_unroll": True, "wkv_mm": "bf16",
                            "wkv_group": 32, "wkv_group_bwd": 32},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,bf16mm,g16,unroll")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=2048)
    args = ap.parse_args()
    for v in args.variants.split(","):
        run(v, VARIANTS[v], B=args.batch, T=args.seqlen)


if __name__ == "__main__":
    main()
