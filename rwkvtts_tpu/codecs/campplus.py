"""CAM++ speaker-embedding (x-vector) model, native JAX.

The reference runs `campplus.onnx` as a black box (third_party/cosyvoice/
cli/frontend.py:107-116: kaldi fbank 80 -> mean-norm -> 192-dim x-vector).
This implements the published CAM++ architecture (Alibaba speakerlab
D-TDNN, "speech_campplus_sv_zh-cn_16k-common"):

  FCM 2-D front-end (res blocks, freq /8)          -> (B, 320, T)
  TDNN k5 s2                                       -> (B, 128, T/2)
  3 x CAMDenseTDNN blocks (12/24/16 layers, growth 32, dilation 1/2/2,
     context-aware masking) each + transit /2
  stats pooling (mean||std)  -> dense              -> (B, 192)

Weights import from a torch speakerlab state_dict (campplus_from_torch)
or an ONNX export whose initializer names keep the module paths.

All convs are channels-last; BatchNorm runs in inference mode from the
imported running statistics.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.codecs import nn

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CampplusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    m_channels: int = 32
    init_channels: int = 128
    growth_rate: int = 32
    bn_size: int = 4
    block_layers: Tuple[int, ...] = (12, 24, 16)
    block_dilations: Tuple[int, ...] = (1, 2, 2)
    seg_len: int = 100

    @property
    def fcm_out(self) -> int:
        return self.m_channels * (self.feat_dim // 8)  # 320


# ---------------------------------------------------------------------------
# Primitives


def _bn(p, x, eps=1e-5):
    """Inference BatchNorm over the channel (last) axis."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["g"] + p["b"]


def _bn_init(c):
    return {
        "g": jnp.ones((c,)), "b": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _conv2d(p, x, stride=(1, 1), padding=(1, 1)):
    """x: (B, H, W, C) NHWC; weight (kh, kw, cin, cout)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def _conv2d_init(key, cin, cout, k, bias=False):
    w = jax.random.normal(key, (k, k, cin, cout)) * (1.0 / math.sqrt(k * k * cin))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


# ---------------------------------------------------------------------------
# FCM 2-D front end


def _res_block_init(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv2d_init(ks[0], cin, cout, 3),
        "bn1": _bn_init(cout),
        "conv2": _conv2d_init(ks[1], cout, cout, 3),
        "bn2": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["shortcut"] = {
            "conv": {"w": jax.random.normal(ks[2], (1, 1, cin, cout)) * 0.1},
            "bn": _bn_init(cout),
        }
    return p


def _res_block(p, x, stride):
    h = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x, stride=(stride, 1))))
    h = _bn(p["bn2"], _conv2d(p["conv2"], h))
    if "shortcut" in p:
        s = _conv2d(p["shortcut"]["conv"], x, stride=(stride, 1), padding=(0, 0))
        s = _bn(p["shortcut"]["bn"], s)
    else:
        s = x
    return jax.nn.relu(h + s)


def fcm_init(key, cfg: CampplusConfig) -> Params:
    ks = jax.random.split(key, 7)
    m = cfg.m_channels
    return {
        "conv1": _conv2d_init(ks[0], 1, m, 3),
        "bn1": _bn_init(m),
        "layer1": [_res_block_init(ks[1], m, m, 2), _res_block_init(ks[2], m, m, 1)],
        "layer2": [_res_block_init(ks[3], m, m, 2), _res_block_init(ks[4], m, m, 1)],
        "conv2": _conv2d_init(ks[5], m, m, 3),
        "bn2": _bn_init(m),
    }


def fcm_apply(p: Params, cfg: CampplusConfig, feat) -> jax.Array:
    """feat (B, T, F=80) -> (B, T, fcm_out). 2-D grid is (freq, time)."""
    x = feat.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
    x = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x)))
    for blk, s in zip(p["layer1"], (2, 1)):
        x = _res_block(blk, x, s)
    for blk, s in zip(p["layer2"], (2, 1)):
        x = _res_block(blk, x, s)
    x = jax.nn.relu(_bn(p["bn2"], _conv2d(p["conv2"], x, stride=(2, 1))))
    B, Fr, T, C = x.shape
    # torch reshape of (B, C, F', T) -> (B, C*F', T): channel-major stacking
    x = x.transpose(0, 3, 1, 2).reshape(B, C * Fr, T)
    return x.transpose(0, 2, 1)  # (B, T, C*F')


# ---------------------------------------------------------------------------
# D-TDNN body


def _bn_relu(p, x):
    return jax.nn.relu(_bn(p, x))


def _cam_layer_init(key, bn_ch, out_ch, k, reduction=2):
    ks = jax.random.split(key, 3)
    return {
        "local": nn.conv1d_init(ks[0], bn_ch, out_ch, k, bias=False),
        "lin1": nn.conv1d_init(ks[1], bn_ch, bn_ch // reduction, 1),
        "lin2": nn.conv1d_init(ks[2], bn_ch // reduction, out_ch, 1),
    }


def _seg_pool(x, seg_len: int) -> jax.Array:
    """Segment-average pooling with ceil_mode + repeat back (CAMLayer
    seg_pooling, speakerlab DTDNN)."""
    B, T, C = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xs = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    seg = xs.reshape(B, n_seg, seg_len, C)
    # ceil_mode avg_pool divides by the actual (unpadded) element count
    counts = jnp.minimum(
        seg_len, T - jnp.arange(n_seg) * seg_len
    ).astype(x.dtype)[None, :, None]
    seg = seg.sum(axis=2) / counts
    rep = jnp.repeat(seg, seg_len, axis=1)[:, :T]
    return rep


def _cam_layer(p, x, k, dilation, seg_len):
    """x (B, T, bn_ch) -> (B, T, out)."""
    pad = (k - 1) // 2 * dilation
    y = nn.conv1d(p["local"], x, dilation=dilation, padding=pad)
    context = jnp.mean(x, axis=1, keepdims=True) + _seg_pool(x, seg_len)
    context = jax.nn.relu(nn.conv1d(p["lin1"], context, padding=0))
    m = jax.nn.sigmoid(nn.conv1d(p["lin2"], context, padding=0))
    return y * m


def _dense_layer_init(key, cin, bn_ch, out_ch, k):
    k1, k2 = jax.random.split(key)
    return {
        "nl1": _bn_init(cin),
        "lin1": nn.conv1d_init(k1, cin, bn_ch, 1, bias=False),
        "nl2": _bn_init(bn_ch),
        "cam": _cam_layer_init(k2, bn_ch, out_ch, k),
    }


def _dense_layer(p, x, k, dilation, seg_len):
    h = nn.conv1d(p["lin1"], _bn_relu(p["nl1"], x), padding=0)
    return _cam_layer(p["cam"], _bn_relu(p["nl2"], h), k, dilation, seg_len)


def init_params(key, cfg: CampplusConfig) -> Params:
    ks = iter(jax.random.split(key, 8 + sum(cfg.block_layers)))
    p: Params = {"fcm": fcm_init(next(ks), cfg)}
    ch = cfg.fcm_out
    p["tdnn"] = {
        "conv": nn.conv1d_init(next(ks), ch, cfg.init_channels, 5, bias=True),
        "bn": _bn_init(cfg.init_channels),
    }
    ch = cfg.init_channels
    blocks = []
    transits = []
    bn_ch = cfg.bn_size * cfg.growth_rate
    for n_layers in cfg.block_layers:
        layers = []
        for j in range(n_layers):
            layers.append(
                _dense_layer_init(
                    next(ks), ch + j * cfg.growth_rate, bn_ch, cfg.growth_rate, 3
                )
            )
        blocks.append(layers)
        ch += n_layers * cfg.growth_rate
        transits.append(
            {
                "nl": _bn_init(ch),
                "lin": nn.conv1d_init(next(ks), ch, ch // 2, 1, bias=False),
            }
        )
        ch //= 2
    p["blocks"] = blocks
    p["transits"] = transits
    p["out_nl"] = _bn_init(ch)
    p["dense"] = {
        "lin": nn.linear_init(next(ks), ch * 2, cfg.embedding_size, bias=False),
        "bn": _bn_init(cfg.embedding_size),
    }
    return p


def apply(p: Params, cfg: CampplusConfig, feat) -> jax.Array:
    """feat (B, T, 80) mean-normalized kaldi fbank -> x-vector (B, 192)."""
    x = fcm_apply(p["fcm"], cfg, feat)
    x = nn.conv1d(p["tdnn"]["conv"], x, stride=2, padding=4)
    x = _bn_relu(p["tdnn"]["bn"], x)
    for layers, transit, dil in zip(
        p["blocks"], p["transits"], cfg.block_dilations
    ):
        for lyr in layers:
            y = _dense_layer(lyr, x, 3, dil, cfg.seg_len)
            x = jnp.concatenate([x, y], axis=-1)
        x = nn.conv1d(transit["lin"], _bn_relu(transit["nl"], x), padding=0)
    x = _bn_relu(p["out_nl"], x)
    mean = x.mean(axis=1)
    std = jnp.sqrt(jnp.clip(x.var(axis=1), 1e-8))
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = nn.linear(p["dense"]["lin"], stats)
    return _bn(p["dense"]["bn"], emb)


# ---------------------------------------------------------------------------
# Kaldi fbank front end (torchaudio.compliance.kaldi.fbank semantics,
# dither=0: povey window, preemphasis 0.97, DC removal, snip_edges)


def kaldi_fbank(
    wav,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
) -> jax.Array:
    """wav (B, T) in [-1, 1] -> log-mel fbank (B, frames, num_mel_bins)."""
    win = int(sample_rate * frame_length_ms / 1000)  # 400
    hop = int(sample_rate * frame_shift_ms / 1000)  # 160
    n_fft = 1 << (win - 1).bit_length()  # 512
    wav = wav * 32768.0  # kaldi int16 scaling
    B, T = wav.shape
    n_frames = max(0, 1 + (T - win) // hop)  # snip_edges
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
    frames = wav[:, idx]  # (B, F, win)
    frames = frames - frames.mean(axis=-1, keepdims=True)  # remove_dc_offset
    pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * pre
    n = jnp.arange(win)
    povey = (0.5 - 0.5 * jnp.cos(2 * jnp.pi * n / (win - 1))) ** 0.85
    frames = frames * povey
    spec = jnp.fft.rfft(frames, n=n_fft)
    power = jnp.abs(spec) ** 2
    from rwkvtts_tpu.codecs.dsp import mel_filterbank

    fb = jnp.asarray(
        mel_filterbank(
            sample_rate, n_fft, num_mel_bins, 20.0, None,
            norm="none", mel_scale="htk",  # kaldi bins: htk mel, no norm
        )
    )
    mel = jnp.maximum(power @ fb, 1e-10)
    return jnp.log(mel)


def embed_wav(p: Params, cfg: CampplusConfig, wav) -> jax.Array:
    """wav (B, T) 16 kHz -> x-vector (B, 192); fbank is mean-normalized per
    utterance (reference frontend.py:110-114)."""
    feat = kaldi_fbank(wav)
    feat = feat - feat.mean(axis=1, keepdims=True)
    return apply(p, cfg, feat)


# ---------------------------------------------------------------------------
# Weight import


def campplus_from_torch(sd, cfg: CampplusConfig) -> Params:
    """speakerlab CAMPPlus state_dict -> params."""
    from rwkvtts_tpu.codecs import torch_import as ti

    def conv2d_p(b):
        w = np.asarray(sd[f"{b}.weight"])  # (cout, cin, kh, kw)
        p = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
        if f"{b}.bias" in sd:
            p["b"] = np.asarray(sd[f"{b}.bias"])
        return p

    def bn_p(b):
        return {
            "g": np.asarray(sd[f"{b}.weight"]),
            "b": np.asarray(sd[f"{b}.bias"]),
            "mean": np.asarray(sd[f"{b}.running_mean"]),
            "var": np.asarray(sd[f"{b}.running_var"]),
        }

    def res_p(b):
        p = {
            "conv1": conv2d_p(f"{b}.conv1"), "bn1": bn_p(f"{b}.bn1"),
            "conv2": conv2d_p(f"{b}.conv2"), "bn2": bn_p(f"{b}.bn2"),
        }
        if f"{b}.shortcut.0.weight" in sd:
            p["shortcut"] = {
                "conv": conv2d_p(f"{b}.shortcut.0"),
                "bn": bn_p(f"{b}.shortcut.1"),
            }
        return p

    fcm = {
        "conv1": conv2d_p("head.conv1"), "bn1": bn_p("head.bn1"),
        "layer1": [res_p(f"head.layer1.{i}") for i in range(2)],
        "layer2": [res_p(f"head.layer2.{i}") for i in range(2)],
        "conv2": conv2d_p("head.conv2"), "bn2": bn_p("head.bn2"),
    }

    def nl_p(b):  # get_nonlinear('batchnorm-relu'): .batchnorm submodule
        return bn_p(f"{b}.batchnorm")

    def cam_p(b):
        return {
            "local": ti.conv1d_p(sd, f"{b}.linear_local"),
            "lin1": ti.conv1d_p(sd, f"{b}.linear1"),
            "lin2": ti.conv1d_p(sd, f"{b}.linear2"),
        }

    p: Params = {"fcm": fcm}
    p["tdnn"] = {
        "conv": ti.conv1d_p(sd, "xvector.tdnn.linear"),
        "bn": nl_p("xvector.tdnn.nonlinear"),
    }
    blocks, transits = [], []
    for bi, n_layers in enumerate(cfg.block_layers, start=1):
        layers = []
        for j in range(n_layers):
            lb = f"xvector.block{bi}.tdnnd{j + 1}"
            layers.append(
                {
                    "nl1": nl_p(f"{lb}.nonlinear1"),
                    "lin1": ti.conv1d_p(sd, f"{lb}.linear1"),
                    "nl2": nl_p(f"{lb}.nonlinear2"),
                    "cam": cam_p(f"{lb}.cam_layer"),
                }
            )
        blocks.append(layers)
        transits.append(
            {
                "nl": nl_p(f"xvector.transit{bi}.nonlinear"),
                "lin": ti.conv1d_p(sd, f"xvector.transit{bi}.linear"),
            }
        )
    p["blocks"] = blocks
    p["transits"] = transits
    p["out_nl"] = nl_p("xvector.out_nonlinear")
    dense_w = None
    for cand in ("xvector.dense.linear", "xvector.dense"):
        if f"{cand}.weight" in sd:
            w = np.asarray(sd[f"{cand}.weight"])
            dense_w = w[..., 0].T if w.ndim == 3 else w.T
            p["dense"] = {
                "lin": {"w": np.ascontiguousarray(dense_w)},
                "bn": bn_p("xvector.dense.nonlinear.batchnorm"),
            }
            break
    if dense_w is None:
        raise KeyError("campplus dense layer not found")
    return p


def load_campplus_onnx(path: str, cfg: CampplusConfig) -> Params:
    """campplus.onnx -> params (initializer names keep module paths)."""
    from rwkvtts_tpu.utils import onnx_import

    sd = onnx_import.load_onnx_initializers(path)
    return jax.tree.map(jnp.asarray, campplus_from_torch(sd, cfg))
