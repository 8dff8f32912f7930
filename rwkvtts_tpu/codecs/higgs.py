"""Higgs (boson) audio tokenizer — DAC codec + semantic distillation branch
+ EnCodec-style residual VQ, 50 Hz.

Behavioral parity (/root/reference/third_party/boson_multimodal/):
  * assembly: audio_processing/higgs_audio_tokenizer.py:43-260 — acoustic
    DAC encoder (64ch, strides 8/5/4/2 -> 320x, latent 128) + HuBERT
    semantic teacher (mean of all hidden layers) -> semantic conv encoder
    (768ch) -> concat -> fc_prior -> RVQ(nq=8, 1024) -> fc_post2 -> DAC
    decoder -> wav; fc_post1 -> semantic decoder (training aux)
  * DAC blocks: .../descriptaudiocodec/dac/model/dac.py:24-140
  * semantic conv modules: .../audio_processing/semantic_module.py
  * RVQ: .../quantization/core_vq.py (euclidean, EMA codebooks — inference
    here is plain nearest-code on residuals)

Used offline for token extraction (utils/extract_higgs_tokens.py); the
semantic teacher (HuBERT) is an injected feature function — torch-CPU in
ETL, or any (B, T_wav) -> (B, T50, 768) callable.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.codecs import nn
from rwkvtts_tpu.codecs.bicodec import _residual_unit, _residual_unit_init

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HiggsConfig:
    sample_rate: int = 16000
    d_model: int = 64
    latent_dim: int = 128  # D
    strides: Tuple[int, ...] = (8, 5, 4, 2)  # 320x
    semantic_dim: int = 768  # hubert hidden
    nq: int = 8
    codebook_size: int = 1024
    decoder_channels: int = 1024

    @property
    def quantizer_dim(self) -> int:
        return self.latent_dim + self.semantic_dim  # 896

    @property
    def hop_length(self) -> int:
        h = 1
        for s in self.strides:
            h *= s
        return h

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sample_rate / self.hop_length)  # 50


# ---------------------------------------------------------------------------
# Acoustic DAC encoder / decoder (channels-last)


def _enc_block_init(key, dim, stride):
    ks = jax.random.split(key, 4)
    return {
        "res": [_residual_unit_init(ks[i], dim // 2, d) for i, d in enumerate((1, 3, 9))],
        "snake": nn.snake_init(dim // 2),
        "conv": nn.conv1d_init(ks[3], dim // 2, dim, 2 * stride),
    }


def acoustic_encoder_init(key, cfg: HiggsConfig) -> Params:
    ks = jax.random.split(key, len(cfg.strides) + 2)
    d = cfg.d_model
    p: Params = {"conv_in": nn.conv1d_init(ks[0], 1, d, 7)}
    blocks = []
    for i, s in enumerate(cfg.strides):
        d *= 2
        blocks.append(_enc_block_init(ks[1 + i], d, s))
    p["blocks"] = blocks
    p["snake_out"] = nn.snake_init(d)
    p["conv_out"] = nn.conv1d_init(ks[-1], d, cfg.latent_dim, 3)
    return p


def acoustic_encoder(p: Params, cfg: HiggsConfig, wav) -> jax.Array:
    """wav (B, T) -> latents (B, T//320, latent_dim)."""
    x = nn.conv1d(p["conv_in"], wav[..., None], padding=3)
    for blk, s in zip(p["blocks"], cfg.strides):
        for res, d in zip(blk["res"], (1, 3, 9)):
            x = _residual_unit(res, x, d)
        x = nn.snake(blk["snake"], x)
        x = nn.conv1d(blk["conv"], x, stride=s, padding=math.ceil(s / 2))
    x = nn.snake(p["snake_out"], x)
    return nn.conv1d(p["conv_out"], x, padding=1)


def _dec_block_init(key, in_dim, out_dim, stride):
    ks = jax.random.split(key, 4)
    return {
        "snake": nn.snake_init(in_dim),
        "up": nn.conv_transpose1d_init(ks[0], in_dim, out_dim, 2 * stride),
        "res": [_residual_unit_init(ks[1 + i], out_dim, d) for i, d in enumerate((1, 3, 9))],
    }


def acoustic_decoder_init(key, cfg: HiggsConfig) -> Params:
    n = len(cfg.strides)
    ks = jax.random.split(key, n + 2)
    ch = cfg.decoder_channels
    p: Params = {"conv_in": nn.conv1d_init(ks[0], cfg.latent_dim, ch, 7)}
    blocks = []
    for i, s in enumerate(cfg.strides):
        blocks.append(_dec_block_init(ks[1 + i], ch // 2**i, ch // 2 ** (i + 1), s))
    p["blocks"] = blocks
    out_dim = ch // 2**n
    p["snake_out"] = nn.snake_init(out_dim)
    p["conv_out"] = nn.conv1d_init(ks[-1], out_dim, 1, 7)
    return p


def acoustic_decoder(p: Params, cfg: HiggsConfig, z) -> jax.Array:
    """z (B, T50, latent) -> wav (B, T50*320)."""
    x = nn.conv1d(p["conv_in"], z, padding=3)
    for blk, s in zip(p["blocks"], cfg.strides):
        x = nn.snake(blk["snake"], x)
        x = nn.conv_transpose1d(
            blk["up"], x, stride=s, padding=math.ceil(s / 2), output_padding=s % 2
        )
        for res, d in zip(blk["res"], (1, 3, 9)):
            x = _residual_unit(res, x, d)
    x = nn.snake(p["snake_out"], x)
    # no tanh: the reference's DAC decoder comments out its final Tanh
    # (descriptaudiocodec/dac/model/dac.py:143) and higgs decode applies none
    return nn.conv1d(p["conv_out"], x, padding=3)[..., 0]


# ---------------------------------------------------------------------------
# Semantic conv encoder (EnCodec-style ELU residual units, stride 1)


def _sem_res_unit_init(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": nn.conv1d_init(k1, dim, dim, 3, bias=False),
        "conv2": nn.conv1d_init(k2, dim, dim, 1, bias=False),
    }


def _sem_res_unit(p, x, dilation=1):
    y = nn.conv1d(p["conv1"], jax.nn.elu(x), dilation=dilation)
    y = nn.conv1d(p["conv2"], jax.nn.elu(y), padding=0)
    return x + y


def semantic_encoder_init(key, cfg: HiggsConfig) -> Params:
    ks = jax.random.split(key, 6)
    d = cfg.semantic_dim
    return {
        "conv_in": nn.conv1d_init(ks[0], d, d, 3, bias=False),
        "blocks": [
            {
                "res": [_sem_res_unit_init(ks[1 + 2 * i], d), _sem_res_unit_init(ks[2 + 2 * i], d)],
                "conv": nn.conv1d_init(ks[1 + 2 * i], d, d, 3),
            }
            for i in range(2)
        ],
    }


def semantic_encoder(p: Params, cfg: HiggsConfig, feats) -> jax.Array:
    """hubert feats (B, T50, 768) -> (B, T50, 768)."""
    x = nn.conv1d(p["conv_in"], feats)
    for blk in p["blocks"]:
        for r in blk["res"]:
            x = _sem_res_unit(r, x)
        x = nn.conv1d(blk["conv"], x)
    return x


# ---------------------------------------------------------------------------
# EnCodec-style RVQ (no projections; euclidean nearest)


def rvq_init(key, cfg: HiggsConfig) -> Params:
    ks = jax.random.split(key, cfg.nq)
    return {
        "codebooks": [
            jax.random.normal(ks[i], (cfg.codebook_size, cfg.quantizer_dim))
            for i in range(cfg.nq)
        ]
    }


def rvq_encode(p: Params, z) -> Tuple[jax.Array, jax.Array]:
    """z (B, T, D) -> (quantized, codes (nq, B, T))."""
    residual = z
    out = jnp.zeros_like(z)
    codes = []
    for cb in p["codebooks"]:
        d = (
            jnp.sum(residual**2, -1, keepdims=True)
            - 2 * residual @ cb.T
            + jnp.sum(cb**2, -1)[None, None, :]
        )
        idx = jnp.argmin(d, -1)
        q = cb[idx]
        residual = residual - q
        out = out + q
        codes.append(idx)
    return out, jnp.stack(codes)


def rvq_decode(p: Params, codes) -> jax.Array:
    out = None
    for i in range(codes.shape[0]):
        q = p["codebooks"][i][codes[i]]
        out = q if out is None else out + q
    return out


# ---------------------------------------------------------------------------
# Full tokenizer


def init_params(key, cfg: HiggsConfig) -> Params:
    ks = jax.random.split(key, 7)
    qd = cfg.quantizer_dim
    return {
        "encoder": acoustic_encoder_init(ks[0], cfg),
        "encoder_semantic": semantic_encoder_init(ks[1], cfg),
        "fc_prior": nn.linear_init(ks[2], qd, qd),
        "quantizer": rvq_init(ks[3], cfg),
        "fc_post2": nn.linear_init(ks[4], qd, cfg.latent_dim),
        "fc_post1": nn.linear_init(ks[5], qd, cfg.semantic_dim),
        "decoder_2": acoustic_decoder_init(ks[6], cfg),
    }


def encode(p: Params, cfg: HiggsConfig, wav, semantic_feats) -> jax.Array:
    """wav (B, T); semantic_feats (B, T50, 768) [hubert mean-of-layers,
    step-down to 50 Hz] -> codes (nq, B, T50)."""
    e_a = acoustic_encoder(p["encoder"], cfg, wav)
    e_s = semantic_encoder(p["encoder_semantic"], cfg, semantic_feats)
    T = min(e_a.shape[1], e_s.shape[1])
    e = jnp.concatenate([e_a[:, :T], e_s[:, :T]], axis=-1)
    e = nn.linear(p["fc_prior"], e)
    _, codes = rvq_encode(p["quantizer"], e)
    return codes


def decode(p: Params, cfg: HiggsConfig, codes) -> jax.Array:
    """codes (nq, B, T50) -> wav (B, T50*320)."""
    q = rvq_decode(p["quantizer"], codes)
    z = nn.linear(p["fc_post2"], q)
    return acoustic_decoder(p["decoder_2"], cfg, z)


def hubert_feature_fn(model_dir: str) -> Callable[[np.ndarray], np.ndarray]:
    """Gated torch HuBERT teacher: wav (B,T) -> (B, T50, 768), mean of all
    hidden layers with the reference's 160-sample reflection pad
    (higgs_audio_tokenizer.py:170-180)."""
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_dir).eval()

    def fn(wavs: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(np.asarray(wavs, np.float32))
        x = torch.nn.functional.pad(x, (160, 160))
        with torch.no_grad():
            hs = model(x, output_hidden_states=True).hidden_states
        return torch.stack(hs, 1).mean(1).numpy()

    return fn
