"""XY hierarchical time-shift collator.

Contract (reference train_scripts/train_xy_llm.py:90-215 and XY_LM.md):
  * text "[S0]{text}[CTL0]" on channel 0; audio ch0 ids += text_shift (65536)
  * diagonal placement: audio frame t of channel ch lands at step
    T1 + t + ch  (channel ch delayed by ch steps)
  * non-audio cells: ch0 ← text_pad, ch1..7 ← speech_pad
  * labels = next-step shift of input_ids; text region (except its last
    step) ignored; pad cells ignored; per-channel terminal label on the
    closing staircase = text_pad (ch0) / speech_pad (ch1..7)
  * the JSONL (Higgs) variant reads pre-extracted `audio_tokens` instead of
    encoding audio inline (train_xy_llm_jsonl.py:74-105)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IGNORE = -100


def build_sample(
    text_ids: Sequence[int],
    speech_tokens: np.ndarray,  # (num_channels, T2), raw codec ids
    *,
    num_channels: int,
    text_shift_size: int,
    speech_vocab_size: int,
    text_vocab_size: int,
):
    """Returns (input_ids (T,8), labels (T,8)) for one sample."""
    text_ids = np.asarray(text_ids, dtype=np.int64)
    speech = np.asarray(speech_tokens, dtype=np.int64).copy()
    assert speech.shape[0] == num_channels
    speech[0] += text_shift_size

    T1, T2 = len(text_ids), speech.shape[1]
    total = T1 + T2 + num_channels - 1
    speech_pad = speech_vocab_size - 1
    text_pad = text_vocab_size - 1

    ids = np.full((total, num_channels), speech_pad, dtype=np.int64)
    ids[:T1, 0] = text_ids
    ids[T1:, 0] = text_pad
    # diagonal: channel ch delayed by ch steps
    for ch in range(num_channels):
        ids[T1 + ch : T1 + ch + T2, ch] = speech[ch]

    labels = np.full((total, num_channels), IGNORE, dtype=np.int64)
    labels[:-1] = ids[1:]
    if T1 > 1:
        labels[: T1 - 1] = IGNORE
    labels[labels == speech_pad] = IGNORE
    labels[labels == text_pad] = IGNORE
    # terminal staircase: each channel must learn to emit its pad/EOS when
    # its stream ends
    for ch in range(num_channels):
        t = T1 + T2 - 1 + ch
        labels[t, ch] = text_pad if ch == 0 else speech_pad
    return ids, labels


def collate(
    rows,
    tokenizer,
    *,
    num_channels: int = 8,
    text_shift_size: int = 65536,
    speech_vocab_size: int = 1024,
    text_vocab_size: int = 66660,
    pad_to: Optional[int] = None,
    pad_multiple: int = 64,
) -> Dict[str, np.ndarray]:
    """rows: {text, audio_tokens (8, T2) list-of-lists} (the JSONL/Higgs
    format). Text is wrapped as [S0]{text}[CTL0] by the caller-supplied
    tokenizer's added tokens."""
    samples = []
    for r in rows:
        text = f"[S0]{r['text']}[CTL0]"
        text_ids = tokenizer.encode(text)
        ids, labels = build_sample(
            text_ids,
            np.asarray(r["audio_tokens"]),
            num_channels=num_channels,
            text_shift_size=text_shift_size,
            speech_vocab_size=speech_vocab_size,
            text_vocab_size=text_vocab_size,
        )
        samples.append((ids, labels))

    maxlen = max(s[0].shape[0] for s in samples)
    if pad_to is None:
        pad_to = -(-maxlen // pad_multiple) * pad_multiple
    B = len(samples)
    speech_pad = speech_vocab_size - 1
    text_pad = text_vocab_size - 1
    input_ids = np.full((B, pad_to, num_channels), speech_pad, dtype=np.int64)
    input_ids[:, :, 0] = text_pad
    labels = np.full((B, pad_to, num_channels), IGNORE, dtype=np.int64)
    mask = np.zeros((B, pad_to), dtype=np.int32)
    for i, (ids, labs) in enumerate(samples):
        n = ids.shape[0]
        input_ids[i, :n] = ids
        labels[i, :n] = labs
        mask[i, :n] = 1
    return {"input_ids": input_ids, "labels": labels, "attention_mask": mask}


def undo_diagonal(
    frames: np.ndarray, *, text_shift_size: int = 65536, num_channels: int = 8
) -> np.ndarray:
    """Invert the staircase on generated (T, 8) frames → (8, T') codec codes
    (ch0 un-shifted), per XY_LM.md's decode walkthrough."""
    T = frames.shape[0]
    T2 = T - (num_channels - 1)
    out = np.zeros((num_channels, max(T2, 0)), dtype=np.int64)
    for ch in range(num_channels):
        out[ch] = frames[ch : ch + T2, ch]
    out[0] -= text_shift_size
    return out
