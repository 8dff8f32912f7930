"""ASR long-audio prefill benchmark (BASELINE config #4).

Whisper-encoder -> adapter RWKV -> LLM prefill over 30 s of audio, batched.
Prints seconds-of-audio-processed per second per chip.
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from rwkvtts_tpu.models import asr

    cfg = asr.default_config(hidden_size=768, num_layers=12, adapter_layers=6)
    params = asr.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "ndim") and x.ndim >= 2 else x,
        params,
    )

    B = args.batch
    T_mel = int(args.seconds * 100)
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, T_mel, 80)).astype(np.float32)),
        "mel_mask": jnp.ones((B, T_mel), jnp.int32),
        "text_ids": jnp.ones((B, 16), jnp.int32),
        "text_mask": jnp.ones((B, 16), jnp.int32),
        "hints_ids": jnp.ones((B, 4), jnp.int32),
        "hints_mask": jnp.ones((B, 4), jnp.int32),
    }

    run = jax.jit(
        lambda p, b: asr.transcribe(p, cfg, b, max_new_tokens=32)[0],
        static_argnums=(),
    )
    t0 = time.perf_counter()
    np.asarray(run(params, batch))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(params, batch)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / args.iters
    audio_s = B * args.seconds
    print(
        f"prefill+32-step decode: {dt*1e3:.0f} ms for {audio_s:.0f}s audio "
        f"=> {audio_s/dt:.1f} x realtime/chip (RTF {dt/audio_s:.4f})"
    )


if __name__ == "__main__":
    main()
