"""SFM flow training collation.

Reference parity (train_scripts/train_sfm_flow.py:268-347): each batch needs
{speech_token, speech_token_len, speech_feat (mel), speech_feat_len,
embedding (x-vector)}. The reference extracts mel + campplus + S3 tokens
inline per batch; here rows carry precomputed `speech_token` (+ optionally
`embedding`), and the 24 kHz HiFi-GAN mel is computed host-side from `audio`
when `speech_feat` is absent.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def collate(
    rows: Sequence[Dict[str, Any]],
    *,
    token_mel_ratio: int = 2,
    n_mels: int = 80,
    spk_embed_dim: int = 192,
    pad_tokens_to: Optional[int] = None,
    sample_rate: int = 24000,
) -> Dict[str, np.ndarray]:
    import jax.numpy as jnp

    from rwkvtts_tpu.codecs import dsp

    B = len(rows)
    tok_rows = [np.asarray(r["speech_token"], np.int64) for r in rows]
    Tt = pad_tokens_to or max(len(t) for t in tok_rows)
    tokens = np.zeros((B, Tt), np.int64)
    tmask = np.zeros((B, Tt), np.float32)
    feats = np.zeros((B, Tt * token_mel_ratio, n_mels), np.float32)
    fmask = np.zeros((B, Tt * token_mel_ratio), np.float32)
    emb = np.zeros((B, spk_embed_dim), np.float32)
    for i, r in enumerate(rows):
        t = tok_rows[i][:Tt]
        tokens[i, : len(t)] = t
        tmask[i, : len(t)] = 1
        if "speech_feat" in r:
            f = np.asarray(r["speech_feat"], np.float32)
        else:
            wav = np.asarray(r["audio"], np.float32)
            f = np.asarray(
                dsp.log_mel_hifigan(jnp.asarray(wav[None]), sample_rate=sample_rate)[0]
            )
        n = min(len(t) * token_mel_ratio, f.shape[0])
        feats[i, :n] = f[:n]
        fmask[i, :n] = 1
        if "embedding" in r:
            emb[i] = np.asarray(r["embedding"], np.float32)[:spk_embed_dim]
    return {
        "tokens": tokens,
        "token_mask": tmask,
        "feat": feats,
        "feat_mask": fmask,
        "embedding": emb,
    }
