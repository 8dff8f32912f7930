"""Speaker-similarity (SIM) evaluation for seed-tts-eval.

The reference lists SIM as a TODO (reference eval/README.md:14) and never
implemented it; the standard seed-tts-eval protocol scores the cosine
similarity between speaker embeddings of the synthesized utterance and the
reference prompt clip. Here the embedder is pluggable and defaults to the
in-repo native CAM++ x-vector (codecs/campplus.py) — the same model family
(3D-Speaker campplus) the community SIM evals use.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


def cosine_sim(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / denom) if denom > 0 else 0.0


@dataclasses.dataclass
class SIMResult:
    mean: float
    per_utt: List[float]


def evaluate_sim(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    embed_fn: Callable[[np.ndarray], np.ndarray],
) -> SIMResult:
    """pairs: (synth_wav, prompt_wav) float32 @16 kHz; embed_fn: wav ->
    speaker embedding (e.g. the native CAM++, codecs/campplus.embed_wav)."""
    sims = [
        cosine_sim(embed_fn(synth), embed_fn(prompt))
        for synth, prompt in pairs
    ]
    return SIMResult(mean=float(np.mean(sims)) if sims else 0.0, per_utt=sims)


def campplus_embed_fn(params, cfg=None):
    """Build an embed_fn from native CAM++ params (codecs/campplus.py)."""
    import jax.numpy as jnp

    from rwkvtts_tpu.codecs import campplus as cp

    cfg = cfg or cp.CampplusConfig()

    def fn(wav: np.ndarray) -> np.ndarray:
        return np.asarray(cp.embed_wav(params, cfg, jnp.asarray(wav)[None]))[0]

    return fn
