"""Torch-checkpoint importers for the codec stacks.

Maps the reference's saved state_dicts (safetensors / torch .pt, as plain
{name: numpy array} dicts) onto our functional param pytrees:

  * weight-norm pairs (weight_g, weight_v) are folded to g * v / ||v||
    (the reference folds at load time too, bicodec.py:remove_weight_norm)
  * torch Conv1d   (Cout, Cin/g, K)   -> ours (K, Cin/g, Cout)
  * torch ConvT1d  (Cin, Cout/g, K)   -> ours (K, Cin/g, Cout), k-flipped
  * torch Linear   (out, in)          -> ours (in, out)
  * BatchNorm running stats carried for inference-mode normalization

State-dict key layout follows third_party/sparktts (BiCodec). No reference
code is imported — only the public checkpoint format is consumed.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

Params = Dict[str, Any]
SD = Mapping[str, np.ndarray]


# ---------------------------------------------------------------------------
# Primitive converters


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm folding over dim=0: w = g * v / ||v||_dims!=0."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / np.maximum(norm, 1e-12)).astype(
        np.float32
    )


def _get_w(sd: SD, prefix: str) -> np.ndarray:
    """Fetch a (possibly weight-normed) conv/linear weight."""
    if f"{prefix}.weight_v" in sd:
        return fold_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    if f"{prefix}.parametrizations.weight.original0" in sd:  # torch>=2.1 style
        return fold_weight_norm(
            sd[f"{prefix}.parametrizations.weight.original0"],
            sd[f"{prefix}.parametrizations.weight.original1"],
        )
    return np.asarray(sd[f"{prefix}.weight"])


def conv1d_p(sd: SD, prefix: str) -> Params:
    w = _get_w(sd, prefix)  # (Cout, Cin/g, K)
    p = {"w": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def conv_transpose1d_p(sd: SD, prefix: str, groups: int = 1) -> Params:
    w = _get_w(sd, prefix)  # (Cin, Cout/g, K)
    cin, cout_g, k = w.shape
    cout = cout_g * groups
    cin_g = cin // groups
    wf = np.zeros((k, cin_g, cout), np.float32)
    for ci in range(cin):
        gi = ci // cin_g
        wf[:, ci % cin_g, gi * cout_g : (gi + 1) * cout_g] = (
            w[ci, :, ::-1].transpose(1, 0)
        )
    p = {"w": wf}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def linear_p(sd: SD, prefix: str) -> Params:
    w = _get_w(sd, prefix)
    p = {"w": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def layer_norm_p(sd: SD, prefix: str) -> Params:
    return {"g": np.asarray(sd[f"{prefix}.weight"]), "b": np.asarray(sd[f"{prefix}.bias"])}


def batch_norm_p(sd: SD, prefix: str) -> Params:
    return {
        "g": np.asarray(sd[f"{prefix}.weight"]),
        "b": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def snake_p(sd: SD, prefix: str) -> Params:
    return {"alpha": np.asarray(sd[f"{prefix}.alpha"]).reshape(-1)}


def ada_norm_p(sd: SD, prefix: str) -> Params:
    return {"scale": linear_p(sd, f"{prefix}.scale"), "shift": linear_p(sd, f"{prefix}.shift")}


# ---------------------------------------------------------------------------
# Composite converters (BiCodec)


def _convnext_p(sd: SD, prefix: str, ada: bool) -> Params:
    p = {
        "dwconv": conv1d_p(sd, f"{prefix}.dwconv"),
        "norm": ada_norm_p(sd, f"{prefix}.norm") if ada else layer_norm_p(sd, f"{prefix}.norm"),
        "pw1": linear_p(sd, f"{prefix}.pwconv1"),
        "pw2": linear_p(sd, f"{prefix}.pwconv2"),
    }
    if f"{prefix}.gamma" in sd:
        p["gamma"] = np.asarray(sd[f"{prefix}.gamma"])
    return p


def vocos_backbone_p(sd: SD, prefix: str, num_layers: int, ada: bool = False) -> Params:
    return {
        "embed": conv1d_p(sd, f"{prefix}.embed"),
        "norm": ada_norm_p(sd, f"{prefix}.norm") if ada else layer_norm_p(sd, f"{prefix}.norm"),
        "blocks": [
            _convnext_p(sd, f"{prefix}.convnext.{i}", ada) for i in range(num_layers)
        ],
        "final_ln": layer_norm_p(sd, f"{prefix}.final_layer_norm"),
    }


def sampling_block_p(sd: SD, prefix: str, groups: int, up: bool) -> Params:
    if up:
        if f"{prefix}.de_conv_upsampler.1.weight" in sd:
            return {"deconv": conv_transpose1d_p(sd, f"{prefix}.de_conv_upsampler.1", groups)}
        return {}
    if f"{prefix}.conv_downsampler.1.weight" in sd:
        return {"conv": conv1d_p(sd, f"{prefix}.conv_downsampler.1")}
    return {}


def _vocos_stack_p(sd: SD, prefix: str, cfg, is_encoder: bool) -> Params:
    """Converts the reference Encoder / Decoder(prenet/postnet) modules."""
    p: Params = {"samplers": []}
    for i, r in enumerate(cfg.sample_ratios):
        p["samplers"].append(
            {
                "block": sampling_block_p(
                    sd, f"{prefix}.downsample.{i}.0", cfg.vocos_dim, up=not is_encoder
                ),
                "vocos": vocos_backbone_p(sd, f"{prefix}.downsample.{i}.1", 2),
            }
        )
    if is_encoder:
        p["backbone"] = vocos_backbone_p(sd, f"{prefix}.encoder", cfg.vocos_num_layers)
        p["project"] = linear_p(sd, f"{prefix}.project")
    else:
        p["linear_pre"] = linear_p(sd, f"{prefix}.linear_pre")
        p["backbone"] = vocos_backbone_p(
            sd, f"{prefix}.vocos_backbone", cfg.vocos_num_layers,
            ada=cfg.condition_dim is not None,
        )
        p["linear"] = linear_p(sd, f"{prefix}.linear")
    return p


def _wave_generator_p(sd: SD, cfg) -> Params:
    n = len(cfg.rates)
    p: Params = {
        "conv_in": conv1d_p(sd, "decoder.model.0"),
        "blocks": [],
    }
    for i in range(n):
        base = f"decoder.model.{i + 1}.block"
        p["blocks"].append(
            {
                "snake": snake_p(sd, f"{base}.0"),
                "up": conv_transpose1d_p(sd, f"{base}.1"),
                "res": [
                    {
                        "snake1": snake_p(sd, f"{base}.{2 + j}.block.0"),
                        "conv1": conv1d_p(sd, f"{base}.{2 + j}.block.1"),
                        "snake2": snake_p(sd, f"{base}.{2 + j}.block.2"),
                        "conv2": conv1d_p(sd, f"{base}.{2 + j}.block.3"),
                    }
                    for j in range(3)
                ],
            }
        )
    p["snake_out"] = snake_p(sd, f"decoder.model.{n + 1}")
    p["conv_out"] = conv1d_p(sd, f"decoder.model.{n + 2}")
    return p


def _se_res2block_p(sd: SD, prefix: str, scale: int = 8) -> Params:
    b = f"{prefix}.se_res2block"
    return {
        "in": {"conv": conv1d_p(sd, f"{b}.0.conv"), "bn": batch_norm_p(sd, f"{b}.0.bn")},
        "res2": [
            {"conv": conv1d_p(sd, f"{b}.1.convs.{i}"), "bn": batch_norm_p(sd, f"{b}.1.bns.{i}")}
            for i in range(scale - 1)
        ],
        "out": {"conv": conv1d_p(sd, f"{b}.2.conv"), "bn": batch_norm_p(sd, f"{b}.2.bn")},
        "se1": linear_p(sd, f"{b}.3.linear1"),
        "se2": linear_p(sd, f"{b}.3.linear2"),
    }


def _ecapa_p(sd: SD, prefix: str) -> Params:
    return {
        "layer1": {
            "conv": conv1d_p(sd, f"{prefix}.layer1.conv"),
            "bn": batch_norm_p(sd, f"{prefix}.layer1.bn"),
        },
        "layer2": _se_res2block_p(sd, f"{prefix}.layer2"),
        "layer3": _se_res2block_p(sd, f"{prefix}.layer3"),
        "layer4": _se_res2block_p(sd, f"{prefix}.layer4"),
        "conv": conv1d_p(sd, f"{prefix}.conv"),
        "astp1": conv1d_p(sd, f"{prefix}.pool.linear1"),
        "astp2": conv1d_p(sd, f"{prefix}.pool.linear2"),
        "bn": batch_norm_p(sd, f"{prefix}.bn"),
        "linear": linear_p(sd, f"{prefix}.linear"),
    }


def _perceiver_p(sd: SD, prefix: str, depth: int = 2) -> Params:
    p: Params = {
        "latents": np.asarray(sd[f"{prefix}.latents"]),
        "layers": [],
        "norm": {"g": np.asarray(sd[f"{prefix}.norm.gamma"])},
    }
    if f"{prefix}.proj_context.weight" in sd:
        p["proj_context"] = linear_p(sd, f"{prefix}.proj_context")
    for i in range(depth):
        p["layers"].append(
            {
                "attn": {
                    "to_q": linear_p(sd, f"{prefix}.layers.{i}.0.to_q"),
                    "to_kv": linear_p(sd, f"{prefix}.layers.{i}.0.to_kv"),
                    "to_out": linear_p(sd, f"{prefix}.layers.{i}.0.to_out"),
                },
                # FeedForward = Sequential(Linear, GEGLU, Linear) -> idx 0, 2
                "ff": {
                    "in": linear_p(sd, f"{prefix}.layers.{i}.1.0"),
                    "out": linear_p(sd, f"{prefix}.layers.{i}.1.2"),
                },
            }
        )
    return p


def _speaker_encoder_p(sd: SD, cfg) -> Params:
    p: Params = {
        "ecapa": _ecapa_p(sd, "speaker_encoder.speaker_encoder"),
        "perceiver": _perceiver_p(sd, "speaker_encoder.perceiver_sampler"),
        "fsq": {},
        "project": linear_p(sd, "speaker_encoder.project"),
    }
    if "speaker_encoder.quantizer.project_in.weight" in sd:
        p["fsq"]["project_in"] = linear_p(sd, "speaker_encoder.quantizer.project_in")
        p["fsq"]["project_out"] = linear_p(sd, "speaker_encoder.quantizer.project_out")
    return p


def bicodec_from_state_dict(sd: SD, cfg) -> Params:
    """Full BiCodec state_dict -> params pytree for codecs.bicodec."""
    quant: Params = {"codebook": np.asarray(sd["quantizer.codebook.weight"])}
    if "quantizer.in_project.weight_v" in sd or "quantizer.in_project.weight" in sd:
        # 1x1 WNConv == linear: (Cout, Cin, 1) -> (Cin, Cout)
        w_in = _get_w(sd, "quantizer.in_project")[..., 0].T
        w_out = _get_w(sd, "quantizer.out_project")[..., 0].T
        quant["in_project"] = {"w": np.ascontiguousarray(w_in)}
        quant["out_project"] = {"w": np.ascontiguousarray(w_out)}
        if "quantizer.in_project.bias" in sd:
            quant["in_project"]["b"] = np.asarray(sd["quantizer.in_project.bias"])
            quant["out_project"]["b"] = np.asarray(sd["quantizer.out_project.bias"])
    return {
        "encoder": _vocos_stack_p(sd, "encoder", cfg.encoder, is_encoder=True),
        "quantizer": quant,
        "speaker_encoder": _speaker_encoder_p(sd, cfg.speaker),
        "prenet": _vocos_stack_p(sd, "prenet", cfg.prenet, is_encoder=False),
        "postnet": _vocos_stack_p(sd, "postnet", cfg.postnet, is_encoder=False),
        "decoder": _wave_generator_p(sd, cfg.wave),
    }


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (torch-free)."""
    import json
    import struct

    dtype_map = {
        "F32": np.float32, "F16": np.float16, "BF16": None,
        "I64": np.int64, "I32": np.int32, "U8": np.uint8, "BOOL": np.bool_,
        "F64": np.float64,
    }
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        data = f.read()
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        raw = data[lo:hi]
        if meta["dtype"] == "BF16":
            u16 = np.frombuffer(raw, np.uint16).astype(np.uint32) << 16
            arr = u16.view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype_map[meta["dtype"]])
        out[name] = arr.reshape(meta["shape"]).copy()
    return out
