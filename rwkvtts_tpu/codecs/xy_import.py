"""XY_Tokenizer torch-checkpoint importer.

Maps the reference XY_Tokenizer state_dict (third_party/XY_Tokenizer/
xy_tokenizer/model.py:13-52 module tree, nn/modules.py layer layouts) onto
the param pytree consumed by codecs/xy_tokenizer.py. Positional embeddings
and VQ EMA statistics (buffers: positional_embedding, inited, cluster_size,
embed_avg) are intentionally dropped — positions are recomputed (whisper
sinusoids) and EMA state is training-only.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from rwkvtts_tpu.codecs import torch_import as ti

Params = Dict[str, Any]
SD = Dict[str, np.ndarray]


def _tf_layer_p(sd: SD, b: str) -> Params:
    """OmniWhisperTransformerLayer (modules.py:163-206)."""
    return {
        "attn_ln": ti.layer_norm_p(sd, f"{b}.self_attn_layer_norm"),
        "q": ti.linear_p(sd, f"{b}.self_attn.q_proj"),
        "k": ti.linear_p(sd, f"{b}.self_attn.k_proj"),
        "v": ti.linear_p(sd, f"{b}.self_attn.v_proj"),
        "out": ti.linear_p(sd, f"{b}.self_attn.out_proj"),
        "final_ln": ti.layer_norm_p(sd, f"{b}.final_layer_norm"),
        "fc1": ti.linear_p(sd, f"{b}.fc1"),
        "fc2": ti.linear_p(sd, f"{b}.fc2"),
    }


def _tf_stack_p(sd: SD, b: str, n: int):
    return [_tf_layer_p(sd, f"{b}.layers.{i}") for i in range(n)]


def audio_encoder_p(sd: SD, b: str, n_layers: int) -> Params:
    return {
        "conv1": ti.conv1d_p(sd, f"{b}.conv1"),
        "conv2": ti.conv1d_p(sd, f"{b}.conv2"),
        "layers": _tf_stack_p(sd, b, n_layers),
        "ln": ti.layer_norm_p(sd, f"{b}.layer_norm"),
    }


def audio_decoder_p(sd: SD, b: str, n_layers: int) -> Params:
    return {
        "layers": _tf_stack_p(sd, b, n_layers),
        "ln": ti.layer_norm_p(sd, f"{b}.layer_norm"),
        "deconv1": ti.conv_transpose1d_p(sd, f"{b}.deconv1"),
        "deconv2": ti.conv_transpose1d_p(sd, f"{b}.deconv2"),
    }


def adapter_p(sd: SD, b: str, n_layers: int) -> Params:
    p: Params = {
        "layers": _tf_stack_p(sd, b, n_layers),
        "ln": ti.layer_norm_p(sd, f"{b}.layer_norm"),
    }
    if f"{b}.proj.weight" in sd:
        p["proj"] = ti.linear_p(sd, f"{b}.proj")
    if f"{b}.out_proj.weight" in sd:
        p["out_proj"] = ti.linear_p(sd, f"{b}.out_proj")
    return p


def down_conv_p(sd: SD, b: str) -> Params:
    return {
        "gate": ti.conv1d_p(sd, f"{b}.gate_proj"),
        "up": ti.conv1d_p(sd, f"{b}.up_proj"),
        "down": ti.linear_p(sd, f"{b}.down_proj"),
        "ln": ti.layer_norm_p(sd, f"{b}.layer_norm"),
    }


def _wnconv1x1_linear(sd: SD, b: str) -> Params:
    """Weight-normed 1x1 conv (quantizer projections) == linear."""
    w = ti._get_w(sd, b)[..., 0].T
    p: Params = {"w": np.ascontiguousarray(w)}
    if f"{b}.bias" in sd:
        p["b"] = np.asarray(sd[f"{b}.bias"])
    return p


def rvq_p(sd: SD, b: str, nq: int) -> Params:
    p: Params = {"quantizers": []}
    if f"{b}.input_proj.weight_v" in sd or f"{b}.input_proj.weight" in sd:
        p["input_proj"] = _wnconv1x1_linear(sd, f"{b}.input_proj")
        p["output_proj"] = _wnconv1x1_linear(sd, f"{b}.output_proj")
    for i in range(nq):
        qb = f"{b}.quantizers.{i}"
        q: Params = {"codebook": np.asarray(sd[f"{qb}.codebook"])}
        if f"{qb}.in_project.weight_v" in sd or f"{qb}.in_project.weight" in sd:
            q["in_project"] = _wnconv1x1_linear(sd, f"{qb}.in_project")
            q["out_project"] = _wnconv1x1_linear(sd, f"{qb}.out_project")
        p["quantizers"].append(q)
    return p


def vocos_p(sd: SD, b: str, n_layers: int) -> Params:
    return {
        "backbone": ti.vocos_backbone_p(sd, f"{b}.backbone", n_layers),
        "head": ti.linear_p(sd, f"{b}.head.out"),
    }


def xy_from_state_dict(sd: SD, cfg) -> Params:
    """Full XY_Tokenizer checkpoint -> params for codecs.xy_tokenizer."""
    return {
        "semantic_encoder": audio_encoder_p(sd, "semantic_encoder", cfg.enc_layers),
        "semantic_adapter": adapter_p(
            sd, "semantic_encoder_adapter", cfg.adapter_layers
        ),
        "acoustic_encoder": audio_encoder_p(sd, "acoustic_encoder", cfg.enc_layers),
        "pre_rvq_adapter": adapter_p(sd, "pre_rvq_adapter", cfg.adapter_layers),
        "downsample": down_conv_p(sd, "downsample"),
        "quantizer": rvq_p(sd, "quantizer", cfg.nq),
        "post_rvq_adapter": adapter_p(sd, "post_rvq_adapter", cfg.adapter_layers),
        "upsample": {"up": ti.conv_transpose1d_p(sd, "upsample.up_conv")},
        "acoustic_decoder": audio_decoder_p(sd, "acoustic_decoder", cfg.dec_layers),
        "vocos": vocos_p(sd, "enhanced_vocos", cfg.vocos_layers),
    }


def load_xy_tokenizer(path: str, cfg) -> Params:
    """XY checkpoint file (.pt/.safetensors) -> jnp param tree."""
    import jax
    import jax.numpy as jnp

    from rwkvtts_tpu.convert.rwkv7_ckpt import load_torch_or_safetensors

    sd = load_torch_or_safetensors(path)
    # checkpoints may carry a 'generator.' prefix from the training wrapper
    if any(k.startswith("generator.") for k in sd):
        sd = {
            k[len("generator."):]: v
            for k, v in sd.items()
            if k.startswith("generator.")
        }
    return jax.tree.map(jnp.asarray, xy_from_state_dict(sd, cfg))
