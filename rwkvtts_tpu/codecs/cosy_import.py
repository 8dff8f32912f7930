"""CosyVoice flow / HiFT torch-checkpoint importers.

Maps the published flow.pt / hift.pt state_dicts (and the first-party SFM
flow checkpoints) onto our functional param trees, completing pretrained
interchange for the Cosy path (BiCodec/whisper/rwkv importers live in
torch_import.py / convert/).

Key layouts consumed (reference, /root/reference):
  * flow: third_party/cosyvoice/flow/flow.py:155-190 (input_embedding,
    spk_embed_affine_layer, encoder.*, encoder_proj, decoder.estimator.*)
  * conformer: transformer/upsample_encoder.py + encoder_layer.py
    (embed.out.{0,1}, pre_lookahead_layer.conv{1,2}, encoders.{i}.self_attn.
    linear_{q,k,v,out,pos} + pos_bias_{u,v}, feed_forward.w_{1,2},
    norm_mha/norm_ff, up_layer.conv, up_embed.out.{0,1}, after_norm)
  * estimator UNet: flow/decoder.py + matcha naming (time_mlp.linear_{1,2},
    {down,mid,up}_blocks.{i}.{0 resnet,1.{j} transformer,2 sampler},
    resnet: block{1,2}.block.{0 conv,2 LN(causal)|1 GN}, mlp.1, res_conv;
    transformer: attn1.to_{q,k,v}, attn1.to_out.0, norm1, norm3,
    ff.net.0.proj, ff.net.2; final_block, final_proj)
  * SFM head: model/flow/sfm_head.py (conv{1,2}, layernorm{1,2}, proj)
  * HiFT: hifigan/generator.py (f0_predictor.condnet.{0,2,4,6,8},
    classifier, m_source.l_linear, conv_pre, ups.{i}, source_downs.{i},
    source_resblocks.{i}, resblocks.{i}, conv_post; Snake alphas)

Weight-norm pairs are folded by torch_import helpers.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from rwkvtts_tpu.codecs import torch_import as ti

Params = Dict[str, Any]
SD = Mapping[str, np.ndarray]


def _subdict(sd: SD, prefix: str) -> Dict[str, np.ndarray]:
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Conformer encoder


def _rel_attn_p(sd: SD, b: str) -> Params:
    return {
        "q": ti.linear_p(sd, f"{b}.self_attn.linear_q"),
        "k": ti.linear_p(sd, f"{b}.self_attn.linear_k"),
        "v": ti.linear_p(sd, f"{b}.self_attn.linear_v"),
        "out": ti.linear_p(sd, f"{b}.self_attn.linear_out"),
        "pos": ti.linear_p(sd, f"{b}.self_attn.linear_pos"),
        "pos_bias_u": np.asarray(sd[f"{b}.self_attn.pos_bias_u"]),
        "pos_bias_v": np.asarray(sd[f"{b}.self_attn.pos_bias_v"]),
    }


def _enc_layer_p(sd: SD, b: str) -> Params:
    return {
        "attn": _rel_attn_p(sd, b),
        "ff_w1": ti.linear_p(sd, f"{b}.feed_forward.w_1"),
        "ff_w2": ti.linear_p(sd, f"{b}.feed_forward.w_2"),
        "norm_mha": ti.layer_norm_p(sd, f"{b}.norm_mha"),
        "norm_ff": ti.layer_norm_p(sd, f"{b}.norm_ff"),
    }


def conformer_from_sd(sd: SD, cfg) -> Params:
    """UpsampleConformerEncoder state_dict (prefix stripped) -> params for
    codecs.conformer."""
    return {
        "embed": {
            "linear": ti.linear_p(sd, "embed.out.0"),
            "ln": ti.layer_norm_p(sd, "embed.out.1"),
        },
        "lookahead": {
            "conv1": ti.conv1d_p(sd, "pre_lookahead_layer.conv1"),
            "conv2": ti.conv1d_p(sd, "pre_lookahead_layer.conv2"),
        },
        "encoders": [
            _enc_layer_p(sd, f"encoders.{i}") for i in range(cfg.num_blocks)
        ],
        "up_conv": ti.conv1d_p(sd, "up_layer.conv"),
        "up_embed": {
            "linear": ti.linear_p(sd, "up_embed.out.0"),
            "ln": ti.layer_norm_p(sd, "up_embed.out.1"),
        },
        "up_encoders": [
            _enc_layer_p(sd, f"up_encoders.{i}") for i in range(cfg.num_up_blocks)
        ],
        "after_norm": ti.layer_norm_p(sd, "after_norm"),
    }


# ---------------------------------------------------------------------------
# Estimator UNet


def _block1d_p(sd: SD, b: str, causal: bool) -> Params:
    if causal:
        return {
            "conv": ti.conv1d_p(sd, f"{b}.block.0"),
            "ln": ti.layer_norm_p(sd, f"{b}.block.2"),
        }
    return {
        "conv": ti.conv1d_p(sd, f"{b}.block.0"),
        "gn": {
            "g": np.asarray(sd[f"{b}.block.1.weight"]),
            "b": np.asarray(sd[f"{b}.block.1.bias"]),
        },
    }


def _resnet_p(sd: SD, b: str, causal: bool) -> Params:
    return {
        "mlp": ti.linear_p(sd, f"{b}.mlp.1"),
        "block1": _block1d_p(sd, f"{b}.block1", causal),
        "block2": _block1d_p(sd, f"{b}.block2", causal),
        "res_conv": ti.conv1d_p(sd, f"{b}.res_conv"),
    }


def _transformer_p(sd: SD, b: str) -> Params:
    return {
        "norm1": ti.layer_norm_p(sd, f"{b}.norm1"),
        "to_q": ti.linear_p(sd, f"{b}.attn1.to_q"),
        "to_k": ti.linear_p(sd, f"{b}.attn1.to_k"),
        "to_v": ti.linear_p(sd, f"{b}.attn1.to_v"),
        "to_out": ti.linear_p(sd, f"{b}.attn1.to_out.0"),
        "norm3": ti.layer_norm_p(sd, f"{b}.norm3"),
        "ff_in": ti.linear_p(sd, f"{b}.ff.net.0.proj"),
        "ff_out": ti.linear_p(sd, f"{b}.ff.net.2"),
    }


def estimator_from_sd(sd: SD, cfg) -> Params:
    """CausalConditionalDecoder state_dict (prefix stripped) -> params for
    codecs.flow.estimator_apply."""
    causal = cfg.causal
    n_levels = len(cfg.channels)
    p: Params = {
        "time_mlp": {
            "lin1": ti.linear_p(sd, "time_mlp.linear_1"),
            "lin2": ti.linear_p(sd, "time_mlp.linear_2"),
        },
        "down": [], "mid": [], "up": [],
    }
    for i in range(n_levels):
        b = f"down_blocks.{i}"
        blk = {
            "resnet": _resnet_p(sd, f"{b}.0", causal),
            "transformers": [
                _transformer_p(sd, f"{b}.1.{j}") for j in range(cfg.n_blocks)
            ],
        }
        if f"{b}.2.conv.weight" in sd:  # real Downsample1D
            blk["downsample"] = ti.conv1d_p(sd, f"{b}.2.conv")
        else:  # (causal) conv at the last level
            blk["downsample"] = ti.conv1d_p(sd, f"{b}.2")
        p["down"].append(blk)
    for i in range(cfg.num_mid_blocks):
        b = f"mid_blocks.{i}"
        p["mid"].append(
            {
                "resnet": _resnet_p(sd, f"{b}.0", causal),
                "transformers": [
                    _transformer_p(sd, f"{b}.1.{j}") for j in range(cfg.n_blocks)
                ],
            }
        )
    for i in range(n_levels):
        b = f"up_blocks.{i}"
        blk = {
            "resnet": _resnet_p(sd, f"{b}.0", causal),
            "transformers": [
                _transformer_p(sd, f"{b}.1.{j}") for j in range(cfg.n_blocks)
            ],
        }
        if f"{b}.2.conv.weight" in sd:  # Upsample1D conv transpose
            blk["upsample"] = ti.conv_transpose1d_p(sd, f"{b}.2.conv")
        else:
            blk["upsample"] = ti.conv1d_p(sd, f"{b}.2")
        p["up"].append(blk)
    p["final_block"] = _block1d_p(sd, "final_block", causal)
    p["final_proj"] = ti.conv1d_p(sd, "final_proj")
    return p


def flow_from_state_dict(sd: SD, cfg) -> Params:
    """Full flow checkpoint -> params for codecs.flow (handles both the
    cosyvoice CausalMaskedDiffWithXvec and the SFM variant)."""
    p: Params = {
        "input_embedding": np.asarray(sd["input_embedding.weight"]),
        "spk_affine": ti.linear_p(sd, "spk_embed_affine_layer"),
        "encoder": conformer_from_sd(_subdict(sd, "encoder."), cfg.encoder),
        "encoder_proj": ti.linear_p(sd, "encoder_proj"),
        "estimator": estimator_from_sd(
            _subdict(sd, "decoder.estimator."), cfg.estimator
        ),
    }
    if cfg.sfm and "sfm_head.conv1.weight" in sd:
        p["sfm_head"] = {
            "conv1": ti.conv1d_p(sd, "sfm_head.conv1"),
            "ln1": ti.layer_norm_p(sd, "sfm_head.layernorm1"),
            "conv2": ti.conv1d_p(sd, "sfm_head.conv2"),
            "ln2": ti.layer_norm_p(sd, "sfm_head.layernorm2"),
            "proj": ti.linear_p(sd, "sfm_head.proj"),
        }
    return p


# ---------------------------------------------------------------------------
# HiFT vocoder


def _hift_resblock_p(sd: SD, b: str, n_dil: int) -> Params:
    return {
        "convs1": [ti.conv1d_p(sd, f"{b}.convs1.{j}") for j in range(n_dil)],
        "convs2": [ti.conv1d_p(sd, f"{b}.convs2.{j}") for j in range(n_dil)],
        "act1": [
            {"alpha": np.asarray(sd[f"{b}.activations1.{j}.alpha"]).reshape(-1)}
            for j in range(n_dil)
        ],
        "act2": [
            {"alpha": np.asarray(sd[f"{b}.activations2.{j}.alpha"]).reshape(-1)}
            for j in range(n_dil)
        ],
    }


def load_flow(path: str, cfg) -> Params:
    """flow.pt / .safetensors -> jnp param tree for codecs.flow."""
    import jax
    import jax.numpy as jnp

    from rwkvtts_tpu.convert.rwkv7_ckpt import load_torch_or_safetensors

    sd = load_torch_or_safetensors(path)
    return jax.tree.map(jnp.asarray, flow_from_state_dict(sd, cfg))


def load_hift(path: str, cfg) -> Params:
    """hift.pt / .safetensors -> jnp param tree for codecs.hift."""
    import jax
    import jax.numpy as jnp

    from rwkvtts_tpu.convert.rwkv7_ckpt import load_torch_or_safetensors

    sd = load_torch_or_safetensors(path)
    return jax.tree.map(jnp.asarray, hift_from_state_dict(sd, cfg))


def hift_from_state_dict(sd: SD, cfg) -> Params:
    """hift.pt state_dict -> params for codecs.hift."""
    n_up = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernel_sizes)
    p: Params = {
        "f0_predictor": {
            "convs": [
                ti.conv1d_p(sd, f"f0_predictor.condnet.{2 * i}") for i in range(5)
            ],
            "classifier": ti.linear_p(sd, "f0_predictor.classifier"),
        },
        "m_source": {"l_linear": ti.linear_p(sd, "m_source.l_linear")},
        "conv_pre": ti.conv1d_p(sd, "conv_pre"),
        "ups": [ti.conv_transpose1d_p(sd, f"ups.{i}") for i in range(n_up)],
        "source_downs": [
            ti.conv1d_p(sd, f"source_downs.{i}") for i in range(n_up)
        ],
        "source_resblocks": [
            _hift_resblock_p(
                sd, f"source_resblocks.{i}",
                len(cfg.source_resblock_dilation_sizes[i]),
            )
            for i in range(n_up)
        ],
        "resblocks": [
            _hift_resblock_p(
                sd, f"resblocks.{i * n_k + j}",
                len(cfg.resblock_dilation_sizes[j]),
            )
            for i in range(n_up)
            for j in range(n_k)
        ],
        "conv_post": ti.conv1d_p(sd, "conv_post"),
    }
    return p
