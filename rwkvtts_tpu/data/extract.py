"""Offline token-extraction pipelines: audio corpora -> training JSONL.

Reference parity (C18, /root/reference):
  * BiCodec (Spark) extraction: utils/extract_tar_tokens.py — rows
    {text, global_tokens, semantic_tokens [, age/gender/emotion/pitch/speed]}
  * XY extraction: utils/extract_xy_tokens.py — rows {text, audio_tokens}
  * Higgs extraction: utils/extract_higgs_tokens.py — same row format
  * multi-process, one worker per device/file (run_multiple_process.sh,
    mp.Queue) — here a process pool over shards; each worker owns its own
    jitted codec (TPU work stays batched inside the worker).

Extractors take an iterator of samples ({audio (float32 16k), text, ...})
— from data.webdataset, a directory of wavs, or jsonl rows with paths —
and append JSONL rows.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

log = logging.getLogger("rwkvtts_tpu")


def _batched(it: Iterable, n: int) -> Iterator[List]:
    buf: List = []
    for x in it:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def extract_spark_tokens(
    samples: Iterable[Dict[str, Any]],
    audio_tokenizer,  # codecs.spark_tokenizer.SparkAudioTokenizer
    out_path: str,
    properties_fn: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
) -> int:
    """BiCodec tokenization -> JSONL rows {text, global_tokens,
    semantic_tokens, <properties...>}."""
    n = 0
    with open(out_path, "a") as f:
        for s in samples:
            wav = np.asarray(s["audio"], np.float32)
            glob, sem = audio_tokenizer.tokenize(wav)
            row = {
                "text": s.get("text", ""),
                "global_tokens": glob.reshape(-1).tolist(),
                "semantic_tokens": sem.reshape(-1).tolist(),
            }
            if properties_fn is not None:
                row.update(properties_fn(s))
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    return n


def extract_xy_tokens(
    samples: Iterable[Dict[str, Any]],
    codec_cfg,
    codec_params,
    out_path: str,
    batch_size: int = 8,
    max_seconds: float = 30.0,
    sample_rate: int = 16000,
) -> int:
    """XY_Tokenizer encode -> JSONL rows {text, audio_tokens (nq, T)}."""
    import jax.numpy as jnp

    from rwkvtts_tpu.codecs import xy_tokenizer as xt

    n = 0
    with open(out_path, "a") as f:
        for batch in _batched(samples, batch_size):
            T_max = int(max_seconds * sample_rate)
            wavs = np.zeros((len(batch), T_max), np.float32)
            lens = []
            for i, s in enumerate(batch):
                w = np.asarray(s["audio"], np.float32)[:T_max]
                wavs[i, : len(w)] = w
                lens.append(len(w))
            mel = xt.whisper_log_mel(jnp.asarray(wavs))
            mel_mask = (
                np.arange(mel.shape[1])[None, :]
                < (np.asarray(lens)[:, None] // 160)
            ).astype(np.float32)
            codes = np.asarray(xt.encode(codec_params, codec_cfg, mel, jnp.asarray(mel_mask)))
            for i, s in enumerate(batch):
                T_codes = max(lens[i] // (160 * 8), 1)  # 12.5 Hz
                f.write(
                    json.dumps(
                        {"text": s.get("text", ""), "audio_tokens": codes[:, i, :T_codes].tolist()},
                        ensure_ascii=False,
                    )
                    + "\n"
                )
                n += 1
    return n


def extract_cosy_tokens(
    samples: Iterable[Dict[str, Any]],
    speech_tokenizer_fn: Callable[[np.ndarray], Sequence[int]],
    out_path: str,
    instruction_fn: Optional[Callable[[str], str]] = None,
) -> int:
    """S3 speech-token extraction -> JSONL rows for the Cosy LM trainer:
    {text, tts_speech_tokens, prompt_text, llm_prompt_speech_token}
    (data/utils/llm_dataset.py row format). The S3 tokenizer is injected
    (ONNX in the reference; any wav->ids callable here).

    instruction_fn: optional text augmenter for instruct2 rows — the
    reference's `is_instructed` path (utilitie.py:546-547); use
    data.instructions.make_instruction_fn(lang)."""
    n = 0
    with open(out_path, "a") as f:
        for s in samples:
            tokens = list(map(int, speech_tokenizer_fn(np.asarray(s["audio"], np.float32))))
            text = s.get("text", "")
            if instruction_fn is not None:
                text = instruction_fn(text)
            row = {
                "text": text,
                "tts_speech_tokens": tokens,
                "prompt_text": s.get("prompt_text", ""),
                "llm_prompt_speech_token": s.get("llm_prompt_speech_token", []),
            }
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    return n


def extract_higgs_tokens(
    samples: Iterable[Dict[str, Any]],
    codec_cfg,
    codec_params,
    hubert_fn: Callable[[np.ndarray], np.ndarray],
    out_path: str,
    batch_size: int = 4,
    max_seconds: float = 30.0,
    sample_rate: int = 16000,
) -> int:
    """Higgs tokenization (utils/extract_higgs_tokens.py parity) -> JSONL
    rows {text, audio_tokens (nq, T)}. hubert_fn: (B, T_wav) -> (B, T50, 768)
    semantic teacher (codecs.higgs.hubert_feature_fn for the torch teacher)."""
    import jax.numpy as jnp

    from rwkvtts_tpu.codecs import higgs

    n = 0
    hop = codec_cfg.hop_length
    with open(out_path, "a") as f:
        for batch in _batched(samples, batch_size):
            T_max = int(max_seconds * sample_rate)
            wavs = np.zeros((len(batch), T_max), np.float32)
            lens = []
            for i, s in enumerate(batch):
                w = np.asarray(s["audio"], np.float32)[:T_max]
                wavs[i, : len(w)] = w
                lens.append(len(w))
            feats = np.asarray(hubert_fn(wavs), np.float32)
            codes = np.asarray(
                higgs.encode(codec_params, codec_cfg, jnp.asarray(wavs), jnp.asarray(feats))
            )
            for i, s in enumerate(batch):
                T_codes = max(lens[i] // hop, 1)
                f.write(
                    json.dumps(
                        {"text": s.get("text", ""), "audio_tokens": codes[:, i, :T_codes].tolist()},
                        ensure_ascii=False,
                    )
                    + "\n"
                )
                n += 1
    return n


def run_sharded(
    shard_paths: Sequence[str],
    worker_fn: Callable[[str, str], int],
    out_dir: str,
    num_workers: int = 1,
) -> int:
    """One-worker-per-shard multiprocess driver (run_multiple_process.sh
    equivalent). worker_fn(shard_path, out_path) -> row count; workers are
    separate processes so each owns an independent runtime."""
    os.makedirs(out_dir, exist_ok=True)
    jobs = [
        (p, os.path.join(out_dir, os.path.basename(p) + ".jsonl"))
        for p in shard_paths
    ]
    if num_workers <= 1:
        return sum(worker_fn(p, o) for p, o in jobs)
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(num_workers) as pool:
        counts = pool.starmap(worker_fn, jobs)
    return sum(counts)
