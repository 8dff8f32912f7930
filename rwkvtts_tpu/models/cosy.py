"""CosyVoice RWKV-7 speech LM (the reference's RWKV7CosyLM / RWKV7LM).

Parity source: /root/reference/model/llm/cosy_llm.py
  * speech vocab 6561 (S3 v2, 3^8) + EOS id 6561 → head size 6562   (:18,:44)
  * llm_embedding rows: sos_eos = 0, task_id = 1                    (:34-39)
  * layout [SOS][text][TASK][speech…]; targets IGNORE over
    [SOS][text], then speech shifted, terminal EOS                  (:98-121)
  * label-smoothing KL loss (lsm_weight, length-normalized)         (:47-52)
  * inference: min/max len = content_len × (0.5 .. 20), EOS
    suppressed below min, RAS rejection sampling                    (:190-246)
  * on EOS: zero token-shift (conv/ffn) states, keep wkv state      (:248-252)

The decode loop itself is jitted in infer/generate.py; this module provides
config/params/forward + the embedding plumbing in the token domain.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rwkvtts_tpu.models import rwkv7
from rwkvtts_tpu.ops import loss as loss_ops

MOD_PAD = 0
MOD_TEXT = 1
MOD_SPECIAL = 2  # llm_embedding rows (SOS_EOS=0, TASK=1)
MOD_SPEECH = 3

SOS_EOS = 0
TASK_ID = 1

END_OF_PROMPT_TEXT_ID = 65531  # instruction/content split marker


@dataclasses.dataclass(frozen=True)
class CosyConfig:
    backbone: rwkv7.RWKV7Config
    text_vocab_size: int = 65536
    speech_token_size: int = 6561  # EOS == speech_token_size
    lsm_weight: float = 0.0
    length_normalized_loss: bool = True
    drop_ratio: float = 0.0

    @property
    def speech_head_size(self) -> int:
        return self.speech_token_size + 1

    @property
    def eos_token_id(self) -> int:
        return self.speech_token_size


def default_config(hidden_size=768, num_layers=12, dtype=jnp.bfloat16, **kw):
    bb = rwkv7.RWKV7Config(
        vocab_size=0,
        hidden_size=hidden_size,
        num_layers=num_layers,
        dtype=dtype,
        with_embedding=False,
        with_head=False,
        **kw,
    )
    return CosyConfig(backbone=bb)


def init_params(key, cfg: CosyConfig) -> Dict[str, Any]:
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    C = cfg.backbone.hidden_size
    p = rwkv7.init_params(k0, cfg.backbone)
    emb = lambda k, v: jax.random.normal(k, (v, C), jnp.float32) * 0.02
    p["text_embedding"] = emb(k1, cfg.text_vocab_size)
    p["llm_embedding"] = emb(k2, 2)
    p["speech_embedding"] = emb(k3, cfg.speech_head_size)
    p["head"] = jax.random.normal(k4, (C, cfg.speech_head_size), jnp.float32) * 0.02
    p["head_bias"] = jnp.zeros((cfg.speech_head_size,))  # reference lm_head has bias (cosy_llm.py:44)
    return p


def embed_layout(params, cfg: CosyConfig, tokens, modality):
    dt = cfg.backbone.dtype
    clip = lambda tbl, n: params[tbl][jnp.clip(tokens, 0, n - 1)].astype(dt)
    text = clip("text_embedding", cfg.text_vocab_size)
    spec = clip("llm_embedding", 2)
    speech = clip("speech_embedding", cfg.speech_head_size)
    m = modality[..., None]
    out = jnp.where(m == MOD_TEXT, text, 0.0)
    out = jnp.where(m == MOD_SPECIAL, spec, out)
    out = jnp.where(m == MOD_SPEECH, speech, out)
    return out


def forward(
    params,
    cfg: CosyConfig,
    tokens,
    modality,
    labels=None,
    attention_mask=None,
    resets=None,
    dropout_rng=None,
):
    """Labels arrive pre-aligned (collator shifts; position t's label is the
    token to predict from position t — matching lm_target[:, 1:] in the
    reference forward, cosy_llm.py:121)."""
    x = embed_layout(params, cfg, tokens, modality)
    if dropout_rng is not None and cfg.drop_ratio > 0:
        keep = jax.random.bernoulli(dropout_rng, 1 - cfg.drop_ratio, x.shape)
        x = jnp.where(keep, x / (1 - cfg.drop_ratio), 0.0).astype(x.dtype)
    h = rwkv7.forward(
        params,
        cfg.backbone,
        inputs_embeds=x,
        attention_mask=attention_mask,
        resets=resets,
    )
    if labels is None:
        return h
    return loss_ops.fused_linear_cross_entropy(
        h,
        params["head"],
        labels,
        bias=params.get("head_bias"),
        shift=False,
        smoothing=cfg.lsm_weight,
        normalize_length=cfg.length_normalized_loss,
    )


def prefill(params, cfg: CosyConfig, tokens, modality, attention_mask=None):
    x = embed_layout(params, cfg, tokens, modality)
    h, st = rwkv7.forward(
        params,
        cfg.backbone,
        inputs_embeds=x,
        attention_mask=attention_mask,
        return_state=True,
    )
    return h[:, -1, :], st


def decode_embed(params, cfg: CosyConfig, token_ids):
    return params["speech_embedding"][token_ids].astype(cfg.backbone.dtype)


def reset_shift_states(state):
    """EOS handling parity (cosy_llm.py:248-252): zero token-shift states,
    keep the wkv recurrent state."""
    return {
        "att_x": jnp.zeros_like(state["att_x"]),
        "wkv": state["wkv"],
        "ffn_x": jnp.zeros_like(state["ffn_x"]),
    }
