"""seed-tts-eval harness: synthesis driver + WER computation.

Reference parity (/root/reference/eval/):
  * eval_seed_generate.py — meta.lst rows `ID|prompt_text|prompt_wav|text`,
    zero-shot synthesis per row into <out>/<ID>.wav
  * run_wer.py:31-59 — normalization (strip zh+en punctuation, zh char
    split, en lowercase) and WER = (S+D+I)/N with per-class rates

The ASR backends (whisper-large-v3 en / paraformer zh) are runtime model
downloads in the reference; here `transcribe_fn` is injectable — use
transformers Whisper when weights are available, or our own ASR model.
The WER math itself is self-contained (edit distance, no jiwer dep).
"""
from __future__ import annotations

import dataclasses
import os
import string
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# CJK-adjacent punctuation (zhon.hanzi.punctuation equivalent set)
_ZH_PUNCT = (
    "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､　、〃〈〉"
    "《》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏﹑﹔·！？｡。"
)
PUNCTUATION_ALL = _ZH_PUNCT + string.punctuation


def normalize_text(text: str, lang: str) -> List[str]:
    """run_wer.py:35-51 normalization -> token list."""
    for x in PUNCTUATION_ALL:
        if x == "'":
            continue
        text = text.replace(x, "")
    text = text.replace("  ", " ")
    if lang == "zh":
        return [c for c in text if not c.isspace()]
    if lang == "en":
        return text.lower().split()
    raise NotImplementedError(lang)


def edit_ops(ref: Sequence[str], hyp: Sequence[str]) -> Tuple[int, int, int]:
    """(substitutions, deletions, insertions) via Levenshtein backtrace."""
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = 0 if ref[i - 1] == hyp[j - 1] else 1
            d[i, j] = min(d[i - 1, j - 1] + c, d[i - 1, j] + 1, d[i, j - 1] + 1)
    i, j = n, m
    subs = dele = inse = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]):
            subs += int(ref[i - 1] != hyp[j - 1])
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            dele += 1
            i -= 1
        else:
            inse += 1
            j -= 1
    return subs, dele, inse


@dataclasses.dataclass
class WERResult:
    wer: float
    subs: float
    dele: float
    inse: float
    n_ref: int


def wer(truth: str, hypo: str, lang: str) -> WERResult:
    ref = normalize_text(truth, lang)
    hyp = normalize_text(hypo, lang)
    s, d, i = edit_ops(ref, hyp)
    n = max(len(ref), 1)
    return WERResult((s + d + i) / n, s / n, d / n, i / n, len(ref))


def corpus_wer(pairs: Sequence[Tuple[str, str]], lang: str) -> WERResult:
    """Aggregate WER over (truth, hypo) pairs (token-weighted)."""
    S = D = I = N = 0
    for truth, hypo in pairs:
        ref = normalize_text(truth, lang)
        hyp = normalize_text(hypo, lang)
        s, d, i = edit_ops(ref, hyp)
        S, D, I, N = S + s, D + d, I + i, N + len(ref)
    n = max(N, 1)
    return WERResult((S + D + I) / n, S / n, D / n, I / n, N)


# ---------------------------------------------------------------------------
# meta.lst driver


@dataclasses.dataclass
class MetaRow:
    utt_id: str
    prompt_text: str
    prompt_wav: str
    text: str


def read_meta_lst(path: str) -> List[MetaRow]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("|")
            rows.append(MetaRow(parts[0], parts[1], parts[2], parts[3]))
    return rows


def generate_testset(
    pipeline,
    eval_dir: str,
    lang: str,
    output_dir: str,
    list_file: str = "meta.lst",
    max_rows: Optional[int] = None,
    **synth_kw,
) -> List[Tuple[str, str]]:
    """eval_seed_generate equivalent: synthesize every row into
    <output_dir>/<lang>/<ID>.wav. Returns [(utt_id, wav_path)]."""
    from rwkvtts_tpu.utils import audio_io

    out = os.path.join(output_dir, lang)
    os.makedirs(out, exist_ok=True)
    rows = read_meta_lst(os.path.join(eval_dir, lang, list_file))
    if max_rows:
        rows = rows[:max_rows]
    results = []
    for row in rows:
        prompt_path = os.path.join(eval_dir, lang, row.prompt_wav)
        prompt = audio_io.load_wav(prompt_path, 16000, volume_normalize=True)
        res = pipeline.synthesize(
            row.text, prompt_wav=prompt, prompt_text=row.prompt_text, **synth_kw
        )
        path = os.path.join(out, f"{row.utt_id}.wav")
        audio_io.save_wav(path, res.wav, res.sample_rate)
        results.append((row.utt_id, path))
    return results


def evaluate_wer(
    wav_text_pairs: Sequence[Tuple[str, str]],
    lang: str,
    transcribe_fn: Callable[[str], str],
) -> Dict[str, float]:
    """run_wer equivalent over [(wav_path, truth_text)] with an injected ASR
    backend (whisper-large-v3 en / paraformer zh in the reference)."""
    pairs = [(truth, transcribe_fn(wav)) for wav, truth in wav_text_pairs]
    r = corpus_wer(pairs, lang)
    return {
        "wer": r.wer, "substitutions": r.subs, "deletions": r.dele,
        "insertions": r.inse, "n_ref_tokens": r.n_ref,
    }


def asr_transcribe_fn(
    asr_params,
    asr_cfg,
    tokenizer,
    lang: str = "zh",
    max_new_tokens: int = 128,
) -> Callable[[str], str]:
    """The repo's OWN RWKV-7 ASR model as a transcription backend — the
    default zh backend (the reference protocol names Paraformer for zh,
    run_wer.py:21-28; no Paraformer exists in this image, and the in-repo
    ASR model takes the zh transcription instruction natively,
    asr_collator.INSTRUCTIONS['zh'])."""
    from rwkvtts_tpu.data import asr_collator
    from rwkvtts_tpu.models import asr as asr_model

    def fn(wav_path: str) -> str:
        batch_np = asr_collator.collate(
            [{"audio": wav_path, "text": "", "language": lang}], tokenizer
        )
        import jax.numpy as jnp

        batch = {
            k: jnp.asarray(v) for k, v in batch_np.items()
            if k not in ("labels", "labels_mask")
        }
        toks, lengths = asr_model.transcribe(
            asr_params, asr_cfg, batch, max_new_tokens=max_new_tokens
        )
        n = int(np.asarray(lengths)[0])
        ids = [int(t) for t in np.asarray(toks)[0, :n]]
        return tokenizer.decode(ids)

    return fn


def default_transcribe_fn(lang: str, **backends) -> Callable[[str], str]:
    """Backend selection mirroring run_wer.py:21-28: whisper-large-v3 for
    en (when weights are on disk), the in-repo ASR model for zh.

    backends: whisper_dir=... for en; asr_params/asr_cfg/tokenizer for zh.
    """
    if lang == "en" and backends.get("whisper_dir"):
        return whisper_transcribe_fn(backends["whisper_dir"], "en")
    if backends.get("asr_params") is not None:
        return asr_transcribe_fn(
            backends["asr_params"], backends["asr_cfg"],
            backends["tokenizer"], lang=lang,
        )
    raise ValueError(
        f"no transcription backend for lang={lang!r}: pass whisper_dir "
        "(en) or asr_params/asr_cfg/tokenizer (own-ASR backend)"
    )


def whisper_transcribe_fn(model_dir: str, lang: str = "en") -> Callable[[str], str]:
    """Gated transformers Whisper backend (used when weights are on disk)."""
    import torch
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    from rwkvtts_tpu.utils import audio_io

    processor = WhisperProcessor.from_pretrained(model_dir)
    model = WhisperForConditionalGeneration.from_pretrained(model_dir).eval()

    def fn(wav_path: str) -> str:
        wav = audio_io.load_wav(wav_path, 16000)
        inputs = processor(wav, sampling_rate=16000, return_tensors="pt")
        with torch.no_grad():
            ids = model.generate(inputs.input_features, language=lang)
        return processor.batch_decode(ids, skip_special_tokens=True)[0]

    return fn
