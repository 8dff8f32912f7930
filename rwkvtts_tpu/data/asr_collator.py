"""ASR data collation: JSONL rows -> whisper-mel / instruction / hints /
labels batches.

Contract parity (/root/reference):
  * instruction strings + hints + EOS id 0:
      train_scripts/train_rwkv7_asr_jsonl.py:360-366, model/llm/rwkv_asr.py:184
      zh: "User: 把以下音频转写为中文。\\n"
      en: "User: Convert the audios to English.\\n"
      hints: "\\nAssistant:"
  * labels = answer token ids + EOS, -100 elsewhere (handled by the model's
    packed layout)
  * whisper log-mel frontend (frozen encoder input)

Rows: {"audio": wav-path or float list, "text": transcript,
"language": "zh"|"en"}.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from rwkvtts_tpu.utils import audio_io

INSTRUCTIONS = {
    "zh": "User: 把以下音频转写为中文。\n",
    "en": "User: Convert the audios to English.\n",
}
HINTS = "\nAssistant:"
EOS_ID = 0


def _pad_right(rows: List[np.ndarray], width: int, fill=0):
    out = np.full((len(rows), width), fill, dtype=np.int64)
    mask = np.zeros((len(rows), width), dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        mask[i, : len(r)] = 1
    return out, mask


def collate(
    rows: Sequence[Dict[str, Any]],
    tokenizer,
    *,
    sample_rate: int = 16000,
    max_audio_seconds: float = 30.0,
    mel_fn=None,
    pad_text_to: Optional[int] = None,
    pad_labels_to: Optional[int] = None,
    pad_frames_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Returns the batch dict models/asr.forward consumes (whisper variant)."""
    from rwkvtts_tpu.codecs.xy_tokenizer import whisper_log_mel

    mel_fn = mel_fn or (lambda wav: np.asarray(whisper_log_mel(wav)))

    wavs, text_rows, label_rows = [], [], []
    for r in rows:
        a = r["audio"]
        wav = audio_io.load_wav(a, sample_rate) if isinstance(a, str) else np.asarray(a, np.float32)
        wav = wav[: int(max_audio_seconds * sample_rate)]
        wavs.append(wav)
        lang = r.get("language", "zh")
        text_rows.append(np.asarray(tokenizer.encode(INSTRUCTIONS[lang]), np.int64))
        label_rows.append(
            np.asarray(tokenizer.encode(r["text"]) + [EOS_ID], np.int64)
        )

    T_wav = max(len(w) for w in wavs)
    hop = 160
    T_wav = -(-T_wav // hop) * hop
    wav_batch = np.zeros((len(wavs), T_wav), np.float32)
    frame_valid = np.zeros((len(wavs),), np.int64)
    for i, w in enumerate(wavs):
        wav_batch[i, : len(w)] = w
        frame_valid[i] = len(w) // hop
    mel = mel_fn(wav_batch)  # (B, T_mel, n_mels)
    if pad_frames_to is not None and mel.shape[1] < pad_frames_to:
        mel = np.pad(mel, ((0, 0), (0, pad_frames_to - mel.shape[1]), (0, 0)))
    mel_mask = (
        np.arange(mel.shape[1])[None, :] < frame_valid[:, None]
    ).astype(np.int32)

    text_w = pad_text_to or max(len(t) for t in text_rows)
    lab_w = pad_labels_to or max(len(t) for t in label_rows)
    text_ids, text_mask = _pad_right(text_rows, text_w)
    labels, labels_mask = _pad_right(label_rows, lab_w, fill=-100)
    hints = np.asarray(tokenizer.encode(HINTS), np.int64)
    B = len(rows)
    return {
        "mel": np.asarray(mel, np.float32),
        "mel_mask": mel_mask,
        "text_ids": text_ids,
        "text_mask": text_mask,
        "hints_ids": np.tile(hints[None, :], (B, 1)),
        "hints_mask": np.ones((B, len(hints)), np.int32),
        "labels": labels,
        "labels_mask": labels_mask,
    }
