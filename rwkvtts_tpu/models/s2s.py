"""Speech-to-speech single-FFN RWKV-7 (the reference's RWKV7S2S_SingleFFN).

Parity source: /root/reference/model/llm/rwkv_s2s_single_ffn.py:276-330
  * one shared block stack over a combined vocab
  * two output heads: text (65536) and audio (8192), chosen per call
  * vocab enlargement from a text model handled by the converter
    (utils/enlarge_rwkv_vocab_for_s2s.py equivalent in convert/).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkvtts_tpu.models import rwkv7
from rwkvtts_tpu.ops import loss as loss_ops

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class S2SConfig:
    backbone: rwkv7.RWKV7Config
    text_vocab_size: int = 65536
    audio_vocab_size: int = 8192


def default_config(
    hidden_size=1024, num_layers=24, vocab_size=65536 + 8192,
    text_vocab=65536, audio_vocab=8192, dtype=jnp.bfloat16, **kw,
) -> S2SConfig:
    bb = rwkv7.RWKV7Config(
        vocab_size=vocab_size, hidden_size=hidden_size, num_layers=num_layers,
        dtype=dtype, with_head=False, **kw,
    )
    return S2SConfig(backbone=bb, text_vocab_size=text_vocab, audio_vocab_size=audio_vocab)


def init_params(key, cfg: S2SConfig) -> Params:
    k0, k1, k2 = jax.random.split(key, 3)
    p = rwkv7.init_params(k0, cfg.backbone)
    C = cfg.backbone.hidden_size

    def head(k, v):
        scale = 0.5 * math.sqrt(v / C) if v > C else 0.5
        return jax.nn.initializers.orthogonal(scale=scale)(k, (C, v), jnp.float32)

    p["head"] = head(k1, cfg.text_vocab_size)
    p["audio_head"] = head(k2, cfg.audio_vocab_size)
    return p


def generate(
    params: Params,
    cfg: S2SConfig,
    input_ids: jax.Array,
    key: jax.Array,
    *,
    is_text: bool = True,
    attention_mask: Optional[jax.Array] = None,
    max_new_tokens: int = 256,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    eos_id: int = 0,
):
    """AR decode with the selected head (text or audio). Audio-head draws
    are offset by text_vocab_size on the input side (the enlarged-vocab
    embedding contract). Returns (tokens (B, max_new), lengths)."""
    from rwkvtts_tpu.ops import sampling

    bb = cfg.backbone
    dt = bb.dtype
    h, state = rwkv7.forward(
        params, bb, input_ids=input_ids, attention_mask=attention_mask,
        return_state=True,
    )
    h_last = h[:, -1]
    B = h_last.shape[0]
    w = params["head"] if is_text else params["audio_head"]
    offset = 0 if is_text else cfg.text_vocab_size

    state = rwkv7.pack_decode_state(state, bb)
    lparams = rwkv7.layer_decode_views(params, bb)

    def step(carry, step_key):
        h, st, done = carry
        logits = (h @ w.astype(dt)).astype(jnp.float32)
        if temperature <= 0.0:
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            tok = sampling.sample(
                step_key, logits, temperature=temperature, top_k=top_k, top_p=top_p
            )
        tok = jnp.where(done, eos_id, tok)
        done = done | (tok == eos_id)
        x = lparams["embedding"][tok + offset].astype(dt)
        h2, st2 = rwkv7.decode_step(lparams, bb, x, st)
        return (h2, st2, done), tok

    keys = jax.random.split(key, max_new_tokens)
    (_, _, _), toks = jax.lax.scan(step, (h_last, state, jnp.zeros((B,), bool)), keys)
    toks = toks.T
    lengths = jnp.sum(
        (jnp.cumsum(toks == eos_id, axis=1) == 0).astype(jnp.int32), axis=1
    )
    return toks, lengths


def forward(
    params: Params,
    cfg: S2SConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    is_text: bool = True,
    labels: Optional[jax.Array] = None,
    l2_wrap: float = 1e-4,
):
    """Shared-stack forward; head chosen by `is_text` (static). With labels
    returns (loss, n_valid), else the selected head's logits."""
    h = rwkv7.forward(
        params, cfg.backbone, input_ids=input_ids, attention_mask=attention_mask
    )
    w = params["head"] if is_text else params["audio_head"]
    if labels is not None:
        return loss_ops.fused_linear_cross_entropy(
            h, w, labels, shift=True, l2_wrap=l2_wrap
        )
    return (h @ w.astype(h.dtype)).astype(jnp.float32)
