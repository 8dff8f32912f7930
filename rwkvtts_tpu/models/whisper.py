"""Whisper audio encoder in JAX (the ASR frontend).

The reference uses HF's torch WhisperEncoder frozen as a feature extractor
(model/llm/rwkv_asr_whisper.py:48-93, rwkv_asr_cuda_whisper.py). Same
architecture here (conv k3 + conv k3 s2, sinusoidal positions, pre-LN
transformer, final LN), channels-last functional JAX, plus an HF
state_dict importer (openai/whisper-* checkpoints).

The transformer layer matches codecs.xy_tokenizer's whisper-style layer
(no k bias) and is shared from there.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.codecs import nn
from rwkvtts_tpu.codecs.xy_tokenizer import _tf_layer_init, _tf_stack, sinusoids

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    d_model: int = 768  # whisper-small; 1280 for large-v3 (n_mels 128)
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 1500


def init_params(key, cfg: WhisperEncoderConfig) -> Params:
    ks = jax.random.split(key, cfg.layers + 3)
    return {
        "conv1": nn.conv1d_init(ks[0], cfg.n_mels, cfg.d_model, 3),
        "conv2": nn.conv1d_init(ks[1], cfg.d_model, cfg.d_model, 3),
        "pos": jnp.asarray(sinusoids(cfg.max_positions, cfg.d_model)),
        "layers": [
            _tf_layer_init(ks[2 + i], cfg.d_model, cfg.heads, cfg.ffn_dim)
            for i in range(cfg.layers)
        ],
        "ln": nn.layer_norm_init(cfg.d_model),
    }


def apply(p: Params, cfg: WhisperEncoderConfig, mel, mask=None) -> jax.Array:
    """mel: (B, T_mel, n_mels) @ 100 Hz -> (B, T_mel//2, d_model) @ 50 Hz.

    mask: (B, T_mel) frame validity; output positions for padded frames are
    zeroed (matching attention-mask semantics of the frozen HF encoder use).
    """
    h = nn.gelu(nn.conv1d(p["conv1"], mel, padding=1))
    h = nn.gelu(nn.conv1d(p["conv2"], h, stride=2, padding=1))
    T = h.shape[1]
    h = h + p["pos"][:T]
    sub = mask[:, ::2][:, :T] if mask is not None else None
    h = _tf_stack(p["layers"], h, cfg.heads, sub)
    h = nn.layer_norm(p["ln"], h, eps=1e-5)
    if sub is not None:
        h = h * sub[:, :, None]
    return h


def from_hf_state_dict(sd, cfg: WhisperEncoderConfig) -> Params:
    """HF WhisperEncoder state_dict ({'encoder.conv1.weight': ...} or with
    'model.encoder.' prefix) -> our params."""
    from rwkvtts_tpu.codecs import torch_import as ti

    def pick_prefix():
        for pref in ("model.encoder.", "encoder.", ""):
            if f"{pref}conv1.weight" in sd:
                return pref
        raise KeyError("whisper encoder conv1.weight not found in state_dict")

    pref = pick_prefix()
    layers = []
    for i in range(cfg.layers):
        b = f"{pref}layers.{i}"
        layers.append(
            {
                "attn_ln": ti.layer_norm_p(sd, f"{b}.self_attn_layer_norm"),
                "q": ti.linear_p(sd, f"{b}.self_attn.q_proj"),
                "k": ti.linear_p(sd, f"{b}.self_attn.k_proj"),
                "v": ti.linear_p(sd, f"{b}.self_attn.v_proj"),
                "out": ti.linear_p(sd, f"{b}.self_attn.out_proj"),
                "final_ln": ti.layer_norm_p(sd, f"{b}.final_layer_norm"),
                "fc1": ti.linear_p(sd, f"{b}.fc1"),
                "fc2": ti.linear_p(sd, f"{b}.fc2"),
            }
        )
    return {
        "conv1": ti.conv1d_p(sd, f"{pref}conv1"),
        "conv2": ti.conv1d_p(sd, f"{pref}conv2"),
        "pos": np.asarray(sd[f"{pref}embed_positions.weight"]),
        "layers": layers,
        "ln": ti.layer_norm_p(sd, f"{pref}layer_norm"),
    }
