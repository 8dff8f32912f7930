"""Higgs (boson) audio-tokenizer torch-checkpoint importer.

Maps the reference HiggsAudioTokenizer state_dict
(third_party/boson_multimodal/audio_processing/higgs_audio_tokenizer.py:43-140:
dac2 Encoder/Decoder, semantic_module Encoder, EnCodec-style
ResidualVectorQuantizer, fc_prior/fc_post heads) onto the param pytree
consumed by codecs/higgs.py. The HuBERT semantic teacher is an external
HF model (not part of the checkpoint); VQ EMA buffers are dropped.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from rwkvtts_tpu.codecs import torch_import as ti

Params = Dict[str, Any]
SD = Dict[str, np.ndarray]


def _dac_res_unit_p(sd: SD, b: str) -> Params:
    return {
        "snake1": ti.snake_p(sd, f"{b}.block.0"),
        "conv1": ti.conv1d_p(sd, f"{b}.block.1"),
        "snake2": ti.snake_p(sd, f"{b}.block.2"),
        "conv2": ti.conv1d_p(sd, f"{b}.block.3"),
    }


def dac_encoder_p(sd: SD, b: str, n_strides: int) -> Params:
    p: Params = {"conv_in": ti.conv1d_p(sd, f"{b}.block.0"), "blocks": []}
    for i in range(n_strides):
        bb = f"{b}.block.{i + 1}.block"
        p["blocks"].append(
            {
                "res": [_dac_res_unit_p(sd, f"{bb}.{j}") for j in range(3)],
                "snake": ti.snake_p(sd, f"{bb}.3"),
                "conv": ti.conv1d_p(sd, f"{bb}.4"),
            }
        )
    p["snake_out"] = ti.snake_p(sd, f"{b}.block.{n_strides + 1}")
    p["conv_out"] = ti.conv1d_p(sd, f"{b}.block.{n_strides + 2}")
    return p


def dac_decoder_p(sd: SD, b: str, n_strides: int) -> Params:
    p: Params = {"conv_in": ti.conv1d_p(sd, f"{b}.model.0"), "blocks": []}
    for i in range(n_strides):
        bb = f"{b}.model.{i + 1}.block"
        p["blocks"].append(
            {
                "snake": ti.snake_p(sd, f"{bb}.0"),
                "up": ti.conv_transpose1d_p(sd, f"{bb}.1"),
                "res": [_dac_res_unit_p(sd, f"{bb}.{2 + j}") for j in range(3)],
            }
        )
    p["snake_out"] = ti.snake_p(sd, f"{b}.model.{n_strides + 1}")
    p["conv_out"] = ti.conv1d_p(sd, f"{b}.model.{n_strides + 2}")
    return p


def _sem_res_unit_p(sd: SD, b: str) -> Params:
    return {
        "conv1": ti.conv1d_p(sd, f"{b}.conv1.conv"),
        "conv2": ti.conv1d_p(sd, f"{b}.conv2"),
    }


def semantic_encoder_p(sd: SD, b: str, n_blocks: int = 2) -> Params:
    return {
        "conv_in": ti.conv1d_p(sd, f"{b}.conv.conv"),
        "blocks": [
            {
                "res": [
                    _sem_res_unit_p(sd, f"{b}.conv_blocks.{i}.res_units.{j}")
                    for j in range(2)
                ],
                "conv": ti.conv1d_p(sd, f"{b}.conv_blocks.{i}.conv.conv"),
            }
            for i in range(n_blocks)
        ],
    }


def rvq_p(sd: SD, b: str, nq: int) -> Params:
    return {
        "codebooks": [
            np.asarray(sd[f"{b}.vq.layers.{i}._codebook.embed"])
            for i in range(nq)
        ]
    }


def higgs_from_state_dict(sd: SD, cfg) -> Params:
    n = len(cfg.strides)
    return {
        "encoder": dac_encoder_p(sd, "encoder", n),
        "encoder_semantic": semantic_encoder_p(sd, "encoder_semantic"),
        "fc_prior": ti.linear_p(sd, "fc_prior"),
        "quantizer": rvq_p(sd, "quantizer", cfg.nq),
        "fc_post2": ti.linear_p(sd, "fc_post2"),
        "fc_post1": ti.linear_p(sd, "fc_post1"),
        "decoder_2": dac_decoder_p(sd, "decoder_2", n),
    }


def load_higgs(path: str, cfg) -> Params:
    import jax
    import jax.numpy as jnp

    from rwkvtts_tpu.convert.rwkv7_ckpt import load_torch_or_safetensors

    sd = load_torch_or_safetensors(path)
    return jax.tree.map(jnp.asarray, higgs_from_state_dict(sd, cfg))
