"""TTS serving core: speaker library + batched request worker.

Reference parity (/root/reference/service/):
  * tts_service.py:14-120 — TTS_Service with a worker queue over engines
  * rwkv_tts_service.py:67-178 — /api/rwkv_tts payloads: {text, prompt_text?,
    audio (base64 wav)? , speaker?}, wav response; /api/speakers lists the
    demo prompt library (demos/<speaker>/*.wav)

TPU-first redesign (SURVEY.md §7.12): instead of a thread per engine, one
dispatcher thread groups queued requests that share a speaker/voice into a
single batched decode call — RWKV decode throughput scales with batch on
the MXU, so batching is the serving win.
"""
from __future__ import annotations

import base64
import dataclasses
import io
import os
import queue
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from rwkvtts_tpu.utils import audio_io


@dataclasses.dataclass
class TTSRequest:
    text: str
    speaker: Optional[str] = None
    prompt_text: Optional[str] = None
    prompt_wav: Optional[np.ndarray] = None
    properties: Optional[Dict[str, Any]] = None
    global_tokens: Optional[List[int]] = None  # a designed voice, unsaved
    seed: int = 0
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 0.95


@dataclasses.dataclass
class TTSResponse:
    wav: np.ndarray
    sample_rate: int
    error: Optional[str] = None


class SpeakerLibrary:
    """demos/<speaker>/*.wav prompt library; caches codec tokens per speaker."""

    def __init__(self, demo_dir: Optional[str], codec=None, sample_rate: int = 16000):
        self.demo_dir = demo_dir
        self.codec = codec
        self.sample_rate = sample_rate
        self._cache: Dict[str, Dict[str, Any]] = {}

    def speakers(self) -> List[str]:
        """All voices: demo-dir prompt folders plus registered (designed/
        cached) entries."""
        names = set(self._cache)
        if self.demo_dir and os.path.isdir(self.demo_dir):
            names.update(
                d for d in os.listdir(self.demo_dir)
                if os.path.isdir(os.path.join(self.demo_dir, d))
            )
        return sorted(names)

    def register(self, name: str, global_tokens: Sequence[int], semantic_tokens: Sequence[int] = ()):
        self._cache[name] = {
            "global_tokens": list(global_tokens),
            "semantic_tokens": list(semantic_tokens),
        }

    def get(self, name: str) -> Dict[str, Any]:
        if name in self._cache:
            return self._cache[name]
        if not self.demo_dir:
            raise KeyError(name)
        d = os.path.join(self.demo_dir, name)
        wavs = sorted(
            f for f in os.listdir(d) if f.endswith(".wav")
        )
        if not wavs:
            raise KeyError(name)
        wav = audio_io.load_wav(os.path.join(d, wavs[0]), self.sample_rate, volume_normalize=True)
        if self.codec is None:
            raise RuntimeError("codec required to tokenize speaker prompts")
        glob, sem = self.codec.tokenize(wav)
        entry = {
            "global_tokens": glob.reshape(-1).tolist(),
            "semantic_tokens": sem.reshape(-1).tolist(),
        }
        self._cache[name] = entry
        return entry


class BatchedTTSService:
    """Queue + dispatcher: groups same-voice requests into one batched
    pipeline call. synthesize() is the blocking client API; the HTTP layers
    sit on top."""

    def __init__(
        self,
        pipeline,  # SparkPipeline-compatible: synthesize(list[str], global_tokens=…)
        speakers: Optional[SpeakerLibrary] = None,
        max_batch: int = 8,
        max_wait_ms: float = 30.0,
        max_new_tokens: int = 1024,
    ):
        self.pipeline = pipeline
        self.speakers = speakers or SpeakerLibrary(None)
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.max_new_tokens = max_new_tokens
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client API ---------------------------------------------------------

    def synthesize(self, req: TTSRequest, timeout: float = 300.0) -> TTSResponse:
        done = threading.Event()
        box: Dict[str, Any] = {}
        self._q.put((req, done, box))
        if not done.wait(timeout):
            return TTSResponse(np.zeros(0, np.float32), 16000, error="timeout")
        return box["resp"]

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # -- dispatcher -----------------------------------------------------------

    def _voice_key(self, req: TTSRequest):
        if req.speaker:
            return ("spk", req.speaker)
        if req.global_tokens:
            return ("glob", tuple(req.global_tokens))
        if req.properties:
            return ("props", tuple(sorted(req.properties.items())))
        return ("unique", id(req))

    def stream(self, req: TTSRequest, hop_tokens: int = 50):
        """Streaming synthesis generator: yields float32 wav chunks as the
        LM decodes (incremental-state pipeline, infer/streaming.py). Unlike
        `synthesize` this bypasses the batching queue — a stream occupies
        its request for its whole duration, like the reference's
        thread-per-utterance llm_job (cli/model.py:416)."""
        fn = getattr(self.pipeline, "synthesize_streaming", None)
        if fn is None:
            raise NotImplementedError("pipeline has no streaming path")
        kw: Dict[str, Any] = {
            "seed": req.seed, "hop_tokens": hop_tokens,
            "top_k": req.top_k, "top_p": req.top_p,
        }
        if req.prompt_wav is not None:
            # frontend once, then stream with the extracted condition
            toks, mel, emb = self.pipeline.frontend_zero_shot(req.prompt_wav)
            kw.update(
                prompt_speech_tokens=toks, prompt_mel=mel, spk_embedding=emb,
            )
        yield from fn(req.text, req.prompt_text or "", **kw)

    def design_voice(
        self,
        properties: Dict[str, Any],
        name: Optional[str] = None,
        seed: int = 0,
    ) -> List[int]:
        """Voice designer (the reference desktop GUI's core flow,
        gradio/tts_gui_simple.py:289-370 / tts_using_webrwkv_osx.py):
        SPCT properties -> 32 global speaker tokens; optionally save them
        as a named speaker in the library for reuse."""
        tokens = self.pipeline.design_voice(properties, seed=seed)
        if name:
            self.speakers.register(name, tokens)
        return tokens

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait_ms / 1e3
            key0 = self._voice_key(first[0])
            while len(batch) < self.max_batch and time.perf_counter() < deadline:
                try:
                    item = self._q.get(timeout=max(deadline - time.perf_counter(), 0.001))
                except queue.Empty:
                    break
                if self._voice_key(item[0]) == key0:
                    batch.append(item)
                else:
                    self._q.put(item)  # different voice: next round
                    break
            self._process(batch)

    def _process(self, batch):
        reqs = [b[0] for b in batch]
        try:
            r0 = reqs[0]
            kw: Dict[str, Any] = {
                "max_new_tokens": self.max_new_tokens,
                "seed": r0.seed,
                "temperature": r0.temperature,
                "top_k": r0.top_k,
                "top_p": r0.top_p,
            }
            if r0.speaker:
                entry = self.speakers.get(r0.speaker)
                kw["global_tokens"] = entry["global_tokens"]
            elif r0.global_tokens:
                kw["global_tokens"] = list(r0.global_tokens)
            elif r0.prompt_wav is not None:
                kw["prompt_wav"] = r0.prompt_wav
                kw["prompt_text"] = r0.prompt_text
            elif r0.properties is not None:
                kw["properties"] = r0.properties
            texts = [r.text for r in reqs]
            results = self.pipeline.synthesize(texts, **kw)
            if not isinstance(results, list):
                results = [results]
            for (req, done, box), res in zip(batch, results):
                box["resp"] = TTSResponse(res.wav, res.sample_rate)
                done.set()
        except Exception as e:  # noqa: BLE001 — service must answer
            for req, done, box in batch:
                box["resp"] = TTSResponse(np.zeros(0, np.float32), 16000, error=str(e))
                done.set()


def stream_wav_header(sample_rate: int, channels: int = 1) -> bytes:
    """WAV header with an unknown (maximal) data length — the standard
    streaming-WAV trick: players start decoding immediately and read until
    the connection closes."""
    import struct

    bits = 16
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    return (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                byte_rate, block_align, bits)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )


def pcm16(wav) -> bytes:
    import numpy as _np

    x = _np.clip(_np.asarray(wav, _np.float32), -1.0, 1.0)
    return (x * 32767.0).astype("<i2").tobytes()


def properties_options() -> Dict[str, List[str]]:
    """Dropdown vocabularies for the voice-design UI — exactly the SPCT
    property sets the checkpoints were trained with (data/properties.py;
    reference utils/properties_util.py:1-64)."""
    from rwkvtts_tpu.data import properties as props

    return {
        "age": list(props.AGE_TOKENS),
        "gender": list(props.GENDER_TOKENS),
        "emotion": list(props.EMOTION_TOKENS),
        "pitch": list(props.PITCH_TOKENS),
        "speed": list(props.SPEED_TOKENS),
    }


def decode_audio_b64(b64: str, sample_rate: int = 16000) -> np.ndarray:
    """base64 wav payload -> float32 mono (the service's audio input format,
    rwkv_tts_service.py request contract)."""
    raw = base64.b64decode(b64)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(raw)
        f.flush()
        return audio_io.load_wav(f.name, sample_rate)


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        audio_io.save_wav(f.name, wav, sample_rate)
        f.seek(0)
        return open(f.name, "rb").read()
