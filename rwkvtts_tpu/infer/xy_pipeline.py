"""XY/Higgs TTS pipeline: text -> 8-channel frames -> XY_Tokenizer -> wav.

Reference parity (SURVEY.md §3.5; XY_LM.md:103-178):
  prompt "[S0]{text}[CTL0]" -> RWKV7XYLM generate (diagonal frames, flush
  automaton) -> subtract text shift on ch0, undo the diagonal delay ->
  XY_Tokenizer.decode -> 24 kHz wav.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.data import xy_collator
from rwkvtts_tpu.infer import generate as gen


@dataclasses.dataclass
class XYTTSResult:
    wav: np.ndarray
    sample_rate: int
    codes: np.ndarray  # (nq, T)
    llm_s: float
    codec_s: float


class XYPipeline:
    def __init__(
        self,
        lm_cfg,
        lm_params,
        text_tokenizer,
        codec_cfg=None,   # xy_tokenizer.XYTokenizerConfig | higgs.HiggsConfig
        codec_params=None,
        speaker_id: int = 0,
        sample_rate: int = 24000,
        codec_kind: str = "xy",  # "xy" | "higgs" (which token family the
        # LM was trained on — Higgs rows come from data/extract.py's
        # extract_higgs_tokens; both are 8-channel RVQ for the XY LM)
    ):
        from rwkvtts_tpu.models import rwkv7

        self.cfg = lm_cfg
        self.params = rwkv7.pack_decode_params(lm_params, lm_cfg.backbone)
        self.tok = text_tokenizer
        self.codec_cfg = codec_cfg
        self.codec_params = codec_params
        self.speaker_id = speaker_id
        self.sample_rate = sample_rate
        if codec_kind not in ("xy", "higgs"):
            raise ValueError(f"codec_kind must be 'xy' or 'higgs': {codec_kind}")
        self.codec_kind = codec_kind

    def generate_frames(
        self,
        text: str,
        speaker_id: Optional[int] = None,
        control_id: int = 0,
        max_new_tokens: int = 1024,
        seed: int = 0,
        temperature: float = 1.0,
    ) -> np.ndarray:
        """Returns undiagonalized codec codes (nq, T_audio)."""
        sid = self.speaker_id if speaker_id is None else speaker_id
        prompt = f"[S{sid}]{text}[CTL{control_id}]"
        text_ids = self.tok.encode(prompt)
        nch = self.cfg.num_channels
        T1 = len(text_ids)
        ids = np.full((1, T1, nch), self.cfg.speech_pad_id, np.int32)
        ids[0, :, 0] = text_ids
        mask = np.ones((1, T1), np.int32)

        frames, n_audio = gen.xy_generate(
            self.params,
            self.cfg,
            jnp.asarray(ids),
            jnp.asarray(mask),
            jax.random.PRNGKey(seed),
            max_new_tokens=max_new_tokens,
            temperature=temperature,
        )
        frames = np.asarray(frames)[0]  # (T, 8)
        n = int(np.asarray(n_audio)[0])
        codes = xy_collator.undo_diagonal(
            frames[: n + nch - 1],
            text_shift_size=self.cfg.text_shift_size,
            num_channels=nch,
        )
        return codes

    def synthesize(self, text: str, **kw) -> XYTTSResult:
        t0 = time.perf_counter()
        codes = self.generate_frames(text, **kw)
        t1 = time.perf_counter()
        wav = np.zeros(0, np.float32)
        if self.codec_params is not None and self.codec_kind == "higgs":
            from rwkvtts_tpu.codecs import higgs

            # Higgs-token LM (trained on extract_higgs_tokens rows):
            # 50 Hz DAC-style RVQ decode, 16 kHz out
            wav = np.asarray(
                higgs.decode(
                    self.codec_params, self.codec_cfg,
                    jnp.asarray(codes)[:, None, :],
                )
            )[0]
        elif self.codec_params is not None:
            from rwkvtts_tpu.codecs import xy_tokenizer as xt

            # chunked decode past the codec's 30 s window (reference
            # model.py:195-256 semantics); direct decode otherwise
            if codes.shape[-1] > 30 * self.codec_cfg.frame_rate:
                wav = xt.decode_long(self.codec_params, self.codec_cfg, codes)
            else:
                wav = np.asarray(
                    xt.decode(
                        self.codec_params, self.codec_cfg,
                        jnp.asarray(codes)[:, None, :],
                    )
                )[0]
        t2 = time.perf_counter()
        return XYTTSResult(
            wav=wav, sample_rate=self.sample_rate, codes=codes,
            llm_s=t1 - t0, codec_s=t2 - t1,
        )
