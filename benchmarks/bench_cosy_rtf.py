"""CosyVoice end-to-end RTF benchmark (BASELINE config #2).

LM speech-token generation -> 10-step CFG flow -> HiFT vocoder. Flow/HiFT
run the deployed shapes (512-conformer + 256-ch causal UNet with 12 mid
blocks; HiFT 24 kHz); --hidden/--layers set the LM (deployed: 2048x24,
the 1.5B LM of CosyVoice2-0.5B-RWKV-7-1.5B, Inference.md:19-44). Random weights — the compute cost is what's
measured. Prints per-stage seconds + end-to-end RTF (target <= 0.1).
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
    ap.add_argument("--tokens", type=int, default=250, help="speech tokens (25 Hz => 10 s)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--hidden", type=int, default=768,
                    help="LM width (deployed: 2048x24 = the 1.5B in CosyVoice2-0.5B-RWKV-7-1.5B)")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--int8", action="store_true",
                    help="int8 decode weights (B=1 decode is weight-bandwidth-bound)")
    ap.add_argument("--int4", action="store_true",
                    help="int4 group-wise decode weights (half of int8 bytes)")
    ap.add_argument("--sfm", action="store_true",
                    help="SFM fast flow decode (ODE starts at t_h; pair "
                         "with a smaller --flow-timesteps)")
    ap.add_argument("--flow-timesteps", type=int, default=None,
                    help="ODE steps for the flow stage (default: config)")
    args = ap.parse_args()

    from rwkvtts_tpu.codecs import conformer, flow as flow_lib, hift as hift_lib
    from rwkvtts_tpu.data import cosy_collator
    from rwkvtts_tpu.data.spark_collator import pad_prompts_left
    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import cosy, rwkv7

    # --- LM stage ---
    lm_cfg = cosy.default_config(hidden_size=args.hidden, num_layers=args.layers)
    lm_params = cosy.init_params(jax.random.PRNGKey(0), lm_cfg)
    lm_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "ndim") and x.ndim >= 2 else x,
        lm_params,
    )
    lm_params = rwkv7.pack_decode_params(
        lm_params, lm_cfg.backbone, quantize_int8=args.int8,
        quantize_int4=args.int4
    )

    text_ids = list(range(1000, 1000 + args.tokens // 5))
    sample = cosy_collator.build_prompt(text_ids, [])
    batch = pad_prompts_left([sample])
    T_new = args.tokens

    def run_lm(key):
        toks, _ = gen.cosy_generate(
            lm_params, lm_cfg,
            jnp.asarray(batch["tokens"]), jnp.asarray(batch["modality"]),
            jnp.asarray(batch["attention_mask"]), key,
            max_new_tokens=T_new, min_new_tokens=T_new,
        )
        return toks

    np.asarray(run_lm(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        toks = run_lm(jax.random.PRNGKey(2 + i))
    np.asarray(toks)
    lm_s = (time.perf_counter() - t0) / args.iters

    # --- flow stage (deployed estimator shape) ---
    fcfg = flow_lib.FlowConfig(sfm=args.sfm)
    fparams = flow_lib.init_params(jax.random.PRNGKey(3), fcfg)
    tokens = jnp.asarray(np.asarray(toks)[:, :T_new] % fcfg.vocab_size)
    tmask = jnp.ones_like(tokens, jnp.float32)
    prompt_mel = jnp.zeros((1, 0, 80))
    nts = args.flow_timesteps

    if args.sfm:
        # SFM fast decode: no CFG double-batch, ODE from t_h
        # (codecs/flow.py::sfm_inference; reference model/flow)
        flow_fn = jax.jit(
            lambda p, t, m, k: flow_lib.sfm_inference(
                p, fcfg, k, t, m, jnp.zeros((1, 192)), n_timesteps=nts)
        )
    else:
        flow_fn = jax.jit(
            lambda p, t, m, k: flow_lib.inference(p, fcfg, k, t, m, prompt_mel, 0,
                                                  jnp.zeros((1, 192)),
                                                  n_timesteps=nts)
        )
    np.asarray(flow_fn(fparams, tokens, tmask, jax.random.PRNGKey(4)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        mel = flow_fn(fparams, tokens, tmask, jax.random.PRNGKey(5 + i))
    np.asarray(mel)
    flow_s = (time.perf_counter() - t0) / args.iters

    # --- vocoder ---
    hcfg = hift_lib.HiFTConfig()
    hparams = hift_lib.init_params(jax.random.PRNGKey(6), hcfg)
    voc_fn = jax.jit(lambda p, m, k: hift_lib.inference(p, hcfg, k, m)[0])
    np.asarray(voc_fn(hparams, mel, jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        wav = voc_fn(hparams, mel, jax.random.PRNGKey(8 + i))
    np.asarray(wav)
    voc_s = (time.perf_counter() - t0) / args.iters

    audio_s = T_new * 2 * 480 / 24000  # mel frames * hop / sr
    total = lm_s + flow_s + voc_s
    print(
        f"llm {lm_s*1e3:.0f} ms | flow {flow_s*1e3:.0f} ms | hift {voc_s*1e3:.0f} ms "
        f"| audio {audio_s:.1f}s | RTF {total/audio_s:.3f}"
    )


if __name__ == "__main__":
    main()
