"""Model surgery: pretrained text RWKV-7 -> speech-model params, and the
flattened-vocab deployment export.

Behavior parity (/root/reference):
  * Spark init-from-text (copy backbone, seed text_embedder from
    model.embeddings, fresh semantic emb/head): model/llm/spark_llm.py:174-201
  * XY init-from-text (copy backbone; ch0 emb/head seeded from the text
    model incl. extended special rows; ch1..7 random):
    model/llm/convert_rwkv7_to_xy.py
  * S2S vocab enlargement (text emb/head copied, audio rows appended):
    utils/enlarge_rwkv_vocab_for_s2s.py
  * flattened single-vocab export for ChatRWKV/WebRWKV/eval —
    emb = [semantic(8193) | tag(3) | global(4096) | text(65536)], head
    zero-padded: data/spark/convert_2_rwkvaudio.py:46-74, id contract at
    eval/eval_tts_base.py:162-168
  * full pretrained Spark/Cosy/XY HF checkpoints -> our param pytrees.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from rwkvtts_tpu.convert import rwkv7_ckpt
from rwkvtts_tpu.models import rwkv7

Params = Dict[str, Any]
SD = Mapping[str, np.ndarray]


def _backbone_keys(p: Params):
    return {k: p[k] for k in ("blocks", "ln0_scale", "ln0_bias", "ln_out_scale", "ln_out_bias")}


# ---------------------------------------------------------------------------
# Full pretrained speech checkpoints -> params


def spark_from_pretrained_sd(sd: SD, cfg) -> Params:
    """RWKV7ForSpeech HF state_dict -> spark params."""
    p = rwkv7_ckpt.fla_to_rwkv7(sd, cfg.backbone)
    p["text_embedder"] = np.asarray(sd["text_embedder.weight"])
    p["global_embedder"] = np.asarray(sd["global_embedder.weight"])
    p["tts_tag_embedder"] = np.asarray(sd["tts_tag_embedder.weight"])
    return p


def cosy_from_pretrained_sd(sd: SD, cfg) -> Params:
    """RWKV7CosyLM HF state_dict -> cosy params."""
    p = rwkv7_ckpt.fla_to_rwkv7(sd, cfg.backbone)
    p["text_embedding"] = np.asarray(sd["text_embedding.weight"])
    p["llm_embedding"] = np.asarray(sd["llm_embedding.weight"])
    p["speech_embedding"] = np.asarray(sd["speech_embedding.weight"])
    p["head"] = np.ascontiguousarray(np.asarray(sd["lm_head.weight"]).T)
    if "lm_head.bias" in sd:
        p["head_bias"] = np.asarray(sd["lm_head.bias"])
    else:
        p["head_bias"] = np.zeros(p["head"].shape[1], np.float32)
    return p


def xy_from_pretrained_sd(sd: SD, cfg) -> Params:
    """RWKV7XYLM HF state_dict -> xy params (embs.{i}.weight / heads.{i})."""
    p = rwkv7_ckpt.fla_to_rwkv7(sd, cfg.backbone)
    embs, heads = {}, {}
    for i in range(cfg.num_channels):
        embs[str(i)] = np.asarray(sd[f"embs.{i}.weight"])
        heads[str(i)] = np.ascontiguousarray(np.asarray(sd[f"heads.{i}.weight"]).T)
    p["embs"] = embs
    p["heads"] = heads
    return p


def asr_from_pretrained_sd(sd: SD, cfg) -> Params:
    """ASR export (convert/export_hf.asr_to_fla layout) -> asr params.
    The whisper tower is loaded separately from HF, the reference's own
    deployment contract (utils/export_rwkv_asr_audio_lm.py:26-44)."""
    p: Params = {
        "adapter": rwkv7_ckpt.fla_to_rwkv7(sd, cfg.adapter, prefix="audio_lm."),
        "llm": rwkv7_ckpt.fla_to_rwkv7(sd, cfg.llm, prefix="llm."),
        "projector": {
            "w": np.ascontiguousarray(np.asarray(sd["projector.weight"]).T),
            "b": np.asarray(sd["projector.bias"]),
        },
    }
    if "projector1.weight" in sd:
        p["projector1"] = {
            "w": np.ascontiguousarray(np.asarray(sd["projector1.weight"]).T),
            "b": np.asarray(sd["projector1.bias"]),
        }
    return p


# ---------------------------------------------------------------------------
# Init-from-text surgery


def spark_from_text(text_sd: SD, spark_params: Params, cfg) -> Params:
    """Seed a fresh Spark model from a pretrained text RWKV-7
    (spark_llm.py:174-201: backbone copied, text_embedder <- embeddings,
    semantic embedding/head/other embedders keep their fresh init)."""
    bb = rwkv7_ckpt.fla_to_rwkv7(text_sd, cfg.backbone)
    out = dict(spark_params)
    out.update(_backbone_keys(bb))
    out["text_embedder"] = np.asarray(text_sd["model.embeddings.weight"])
    return out


def xy_from_text(text_sd: SD, xy_params: Params, cfg, rng: Optional[np.random.Generator] = None) -> Params:
    """convert_rwkv7_to_xy equivalent: backbone copied; ch0 embedding/head
    rows [0, text_vocab) seeded from the text model, extended rows ([SP*],
    [S*], [CTL*]) random-normal; ch1..7 keep fresh init."""
    rng = rng or np.random.default_rng(0)
    bb = rwkv7_ckpt.fla_to_rwkv7(text_sd, cfg.backbone)
    out = dict(xy_params)
    out.update(_backbone_keys(bb))
    text_emb = np.asarray(text_sd["model.embeddings.weight"])
    text_head = np.asarray(text_sd["lm_head.weight"])  # (V, C)
    V_old, C = text_emb.shape
    emb0 = np.array(out["embs"]["0"], np.float32)
    head0 = np.array(out["heads"]["0"], np.float32)  # (C, V_new)
    emb0[:V_old] = text_emb
    std = float(text_emb.std())
    emb0[V_old:] = rng.normal(0, std, emb0[V_old:].shape)
    head0[:, :V_old] = text_head.T
    head0[:, V_old:] = rng.normal(0, float(text_head.std()), head0[:, V_old:].shape)
    out["embs"] = dict(out["embs"], **{"0": emb0})
    out["heads"] = dict(out["heads"], **{"0": head0})
    return out


def s2s_enlarge_vocab(
    text_sd_blinkdl: SD, cfg, rng: Optional[np.random.Generator] = None
) -> Params:
    """utils/enlarge_rwkv_vocab_for_s2s.py equivalent: BlinkDL text ckpt ->
    S2S params with [text | audio] embedding rows (audio rows random at the
    text embedding's std) and separate text/audio heads."""
    rng = rng or np.random.default_rng(0)
    p = rwkv7_ckpt.blinkdl_to_rwkv7(text_sd_blinkdl, cfg.backbone)
    emb = np.asarray(text_sd_blinkdl["emb.weight"])
    V_text, C = emb.shape
    V_audio = cfg.audio_vocab_size
    std = float(emb.std())
    full = np.concatenate([emb, rng.normal(0, std, (V_audio, C)).astype(np.float32)], 0)
    p["embedding"] = full
    p["head"] = np.ascontiguousarray(np.asarray(text_sd_blinkdl["head.weight"]).T)
    p["audio_head"] = rng.normal(0, 1 / np.sqrt(C), (C, V_audio)).astype(np.float32)
    return p


# ---------------------------------------------------------------------------
# Flattened-vocab deployment export (ChatRWKV / WebRWKV / eval engines)

FLAT_SEMANTIC_BASE = 0       # semantic 0..8191, EOS 8192
FLAT_TAG_BASE = 8193         # TAG0/1/2 = 8193/8194/8195
FLAT_GLOBAL_BASE = 8196      # global += 8196
FLAT_TEXT_BASE = 8196 + 4096  # text += 12292


def spark_to_flat(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Spark params -> flattened single-vocab BlinkDL export.

    emb rows: [semantic(8193) | tts_tag(3) | global(4096) | text(65536)];
    head zero-padded to the full vocab (only semantic ids are producible).
    """
    sd = rwkv7_ckpt.rwkv7_to_blinkdl(params, cfg.backbone)
    emb = np.concatenate(
        [
            np.asarray(params["embedding"]),
            np.asarray(params["tts_tag_embedder"]),
            np.asarray(params["global_embedder"]),
            np.asarray(params["text_embedder"]),
        ],
        axis=0,
    ).astype(np.float32)
    head = np.asarray(params["head"]).T.astype(np.float32)  # (V_sem, C)
    pad = np.zeros((emb.shape[0] - head.shape[0], head.shape[1]), np.float32)
    sd["emb.weight"] = emb
    sd["head.weight"] = np.concatenate([head, pad], axis=0)
    return sd


def flat_ids_from_parts(text_ids, global_ids, semantic_ids):
    """Map per-table ids into the flattened vocab (eval_tts_base.py:162-168)."""
    return (
        [i + FLAT_TEXT_BASE for i in text_ids],
        [i + FLAT_GLOBAL_BASE for i in global_ids],
        [i + FLAT_SEMANTIC_BASE for i in semantic_ids],
    )
