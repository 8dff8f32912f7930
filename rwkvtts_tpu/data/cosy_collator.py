"""CosyVoice prompt-layout collator, token-domain.

Contract (reference data/utils/llm_dataset.py:118-187 + cosy_llm.py:89-121):
  rows: {text, prompt_text, tts_speech_tokens, llm_prompt_speech_token}
  input  [SOS][prompt_text+text][TASK][prompt_speech+speech]
  labels aligned per-position (pre-shifted): IGNORE over [SOS][text…],
         speech[0] at the TASK position, …, terminal EOS (= 6561)
  CFG-style prompt dropout: with prob drop_prompt_audio_rate the whole
  batch drops prompt text+speech (one coin per batch, as the reference).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from rwkvtts_tpu.data.spark_collator import Sample, pack_batch, pad_batch
from rwkvtts_tpu.models.cosy import (
    MOD_SPECIAL,
    MOD_SPEECH,
    MOD_TEXT,
    SOS_EOS,
    TASK_ID,
)

IGNORE = -100


def make_sample(
    text_ids: Sequence[int],
    speech_tokens: Sequence[int],
    eos_id: int,
) -> Sample:
    s = Sample([], [], [])
    n_text = len(text_ids)
    speech = list(speech_tokens)
    # labels aligned with inputs: position t predicts label[t]
    # [SOS] x1, text xN  → IGNORE except the last text position… careful:
    # positions: 0:SOS, 1..n_text:text, n_text+1:TASK, then speech
    # prediction targets: TASK position → speech[0]; speech[i] → speech[i+1];
    # last speech → EOS. Everything before TASK is IGNORE.
    s.extend([SOS_EOS], MOD_SPECIAL, [IGNORE])
    s.extend(list(text_ids), MOD_TEXT, [IGNORE] * n_text)
    s.extend([TASK_ID], MOD_SPECIAL, [speech[0]] if speech else [eos_id])
    if speech:
        s.extend(speech, MOD_SPEECH, speech[1:] + [eos_id])
    return s


def collate(
    rows,
    tokenizer,
    eos_id: int,
    *,
    drop_prompt_audio_rate: float = -0.1,
    rng: Optional[np.random.Generator] = None,
    pad_to=None,
    packed: bool = False,
) -> Dict[str, np.ndarray]:
    rng = rng or np.random.default_rng()
    drop = rng.random() < drop_prompt_audio_rate
    samples: List[Sample] = []
    for r in rows:
        if drop:
            text_ids = tokenizer.encode(r["text"])
            speech = list(r["tts_speech_tokens"])
        else:
            text_ids = tokenizer.encode(r.get("prompt_text", "")) + tokenizer.encode(
                r["text"]
            )
            speech = list(r.get("llm_prompt_speech_token", [])) + list(
                r["tts_speech_tokens"]
            )
        samples.append(make_sample(text_ids, speech, eos_id))
    return pack_batch(samples, pad_to) if packed else pad_batch(samples, pad_to)


def build_prompt(
    text_ids: Sequence[int],
    prompt_speech_tokens: Sequence[int],
) -> Sample:
    """Zero-shot inference prompt [SOS][text][TASK][prompt_speech…]
    (reference cosy_llm.py:217-225); decode continues with speech tokens."""
    s = Sample([], [], [])
    s.extend([SOS_EOS], MOD_SPECIAL, [IGNORE])
    s.extend(list(text_ids), MOD_TEXT, [IGNORE] * len(text_ids))
    s.extend([TASK_ID], MOD_SPECIAL, [IGNORE])
    s.extend(
        list(prompt_speech_tokens),
        MOD_SPEECH,
        [IGNORE] * len(prompt_speech_tokens),
    )
    return s


def content_length(text_ids: Sequence[int], end_of_prompt_id: int = 65531) -> int:
    """Length driving min/max decode bounds; instruction text before
    <|endofprompt|> (id 65531) is excluded (reference cosy_llm.py:201-211)."""
    ids = list(text_ids)
    if end_of_prompt_id in ids:
        idx = ids.index(end_of_prompt_id)
        return len(ids) - (idx + 1)
    return len(ids)
