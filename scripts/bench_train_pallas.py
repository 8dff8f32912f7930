"""In-model train-step bench: Pallas WKV vs XLA chunked (103M Spark, 8x2048).

The isolated-op bench is dispatch-dominated over the tunnel; this is the
number that matters (PERF.md round-1: chunked = 436 ms / 37.6 KT/s).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.models import spark
from rwkvtts_tpu.parallel import train_step as ts
from rwkvtts_tpu.train import optimizer as opt_lib
from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()

B, T = 8, 2048


def batch_for(cfg):
    k = jax.random.PRNGKey(1)
    tokens = jax.random.randint(k, (B, T), 0, 4096)
    modality = jnp.where(
        jnp.arange(T)[None, :] < T // 2, spark.MOD_TEXT, spark.MOD_SEMANTIC
    ) * jnp.ones((B, 1), jnp.int32)
    labels = jnp.where(jnp.arange(T)[None, :] < T // 2, -100, tokens % 8193) * jnp.ones(
        (B, 1), jnp.int32
    )
    mask = jnp.ones((B, T), jnp.int32)
    return {
        "tokens": tokens, "modality": modality,
        "labels": labels, "attention_mask": mask,
    }


def measure(name, **cfg_kw):
    cfg = spark.default_config(hidden_size=768, num_layers=12, **cfg_kw)
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tx = opt_lib.build_optimizer(params, total_steps=100)
    state = ts.init_train_state(params, tx)
    step = ts.make_train_step(cfg, tx)
    batch = batch_for(cfg)
    rng = jax.random.PRNGKey(2)
    try:
        state, metrics = step(state, batch, rng)
        loss0 = float(metrics["loss"])  # sync
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, rng)
        lossN = float(metrics["loss"])  # sync
        dt = (time.perf_counter() - t0) / iters
        kts = B * T / dt / 1000
        print(
            f"{name:28s} step {dt*1000:7.1f} ms  {kts:6.1f} KT/s  "
            f"loss {loss0:.4f}->{lossN:.4f}", flush=True,
        )
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    for name, kw in [
        ("pallas_L64_G16_bf16", dict(wkv_impl="pallas", wkv_chunk=64, wkv_group=16, wkv_mm="bf16")),
        ("pallas_L64_G4_bf16", dict(wkv_impl="pallas", wkv_chunk=64, wkv_group=4, wkv_mm="bf16")),
        ("pallas_L128_G4_bf16", dict(wkv_impl="pallas", wkv_chunk=128, wkv_group=4, wkv_mm="bf16")),
        ("pallas_L64_G8_bf16_noremat", dict(wkv_impl="pallas", wkv_chunk=64, wkv_group=8, wkv_mm="bf16", remat=False)),
        ("pallas_L64_G2_bf16", dict(wkv_impl="pallas", wkv_chunk=64, wkv_group=2, wkv_mm="bf16")),
    ]:
        measure(name, **kw)
