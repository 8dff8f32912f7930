"""Collators for the S2S single-FFN and two-tower TTS trainers.

Reference parity:
  * S2S (train_rwkv7s2s_single_ffn_asr_jsonl.py, T10): alternating
    text-mode / audio-mode batches over a combined vocab; audio ids are
    offset past the text vocab (utils/enlarge_rwkv_vocab_for_s2s.py).
  * Two-tower (train_rwkv_tts.py, T2): rows {text, global_tokens,
    semantic_tokens}; audio stream = [global | semantic+offset] in the
    12289 joint vocab (model/llm/rwkv_tts.py:205), labels = audio ids.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

IGNORE = -100


def _pad_batch(rows: List[np.ndarray], pad_to: Optional[int], fill=0):
    width = pad_to or max(len(r) for r in rows)
    out = np.full((len(rows), width), fill, np.int64)
    mask = np.zeros((len(rows), width), np.int32)
    for i, r in enumerate(rows):
        r = r[:width]
        out[i, : len(r)] = r
        mask[i, : len(r)] = 1
    return out, mask


def collate_s2s(
    rows: Sequence[Dict[str, Any]],
    tokenizer,
    *,
    text_vocab: int = 65536,
    is_text: bool = True,
    pad_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Text-mode batches train the text head on `text`; audio-mode batches
    train the audio head on `audio_tokens` (ids offset by text_vocab on the
    input side, raw ids as labels)."""
    seqs: List[np.ndarray] = []
    for r in rows:
        if is_text:
            seqs.append(np.asarray(tokenizer.encode(r["text"]), np.int64))
        else:
            a = np.asarray(r["audio_tokens"], np.int64)
            if a.ndim > 1:
                a = a[0]
            seqs.append(a + text_vocab)
    ids, mask = _pad_batch(seqs, pad_to)
    labels = np.where(mask > 0, ids if is_text else ids - text_vocab, IGNORE)
    return {
        "input_ids": ids,
        "attention_mask": mask,
        "labels": labels,
        "_is_text": is_text,
    }


GLOBAL_VOCAB = 4096
SEMANTIC_OFFSET = 4096


def collate_two_tower(
    rows: Sequence[Dict[str, Any]],
    tokenizer,
    *,
    pad_text_to: Optional[int] = None,
    pad_audio_to: Optional[int] = None,
    eos_id: int = 12288,
) -> Dict[str, np.ndarray]:
    text_rows = [np.asarray(tokenizer.encode(r["text"]), np.int64) for r in rows]
    audio_rows = []
    for r in rows:
        g = np.asarray(r["global_tokens"], np.int64)
        s = np.asarray(r["semantic_tokens"], np.int64) + SEMANTIC_OFFSET
        audio_rows.append(np.concatenate([g, s, [eos_id]]))
    text_ids, text_mask = _pad_batch(text_rows, pad_text_to)
    audio_ids, audio_mask = _pad_batch(audio_rows, pad_audio_to)
    labels = np.where(audio_mask > 0, audio_ids, IGNORE)
    return {
        "text_ids": text_ids,
        "text_mask": text_mask,
        "audio_ids": audio_ids,
        "audio_mask": audio_mask,
        "labels": labels,
    }
