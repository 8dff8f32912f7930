"""Capture S3 / CAM++ IMPORTER-level golden fixtures from synthetic ONNX.

The reference's S3 speech tokenizer and CAM++ x-vector exist only as ONNX
binaries not present in this image (reference third_party/cosyvoice/cli/
frontend.py:95-116), so pipeline goldens against the real weights are not
capturable (scripts/capture_goldens_torch.py documents the same for its
stack). What IS capturable: a synthetic ONNX export in the exact
initializer naming/layout the real exports use, plus the input/output of
the native JAX module fed through the full `s3_from_onnx` /
`load_campplus_onnx` path. CI replays bytes -> parse -> map -> apply and
compares (tests/test_goldens.py) — pinning the protobuf wire parser, the
name/layout mapping, and the module numerics.

Run on CPU: python scripts/capture_onnx_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.codecs import campplus as cp
from rwkvtts_tpu.codecs import s3_tokenizer as s3
from rwkvtts_tpu.utils import onnx_import

from test_s3_campplus import build_campplus_sd, build_s3_sd

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def capture_s3():
    cfg = s3.S3TokenizerConfig(
        n_mels=16, d_model=32, layers=2, heads=2, ffn_dim=64, fsq_dim=8
    )
    sd = build_s3_sd(cfg, np.random.default_rng(11))
    onnx_bytes = onnx_import.write_onnx_initializers(sd)
    path = "/tmp/_s3_golden.onnx"
    with open(path, "wb") as f:
        f.write(onnx_bytes)
    params = s3.s3_from_onnx(path, cfg)
    mel = np.random.default_rng(12).standard_normal(
        (1, 24, cfg.n_mels)).astype(np.float32)
    tokens, _ = s3.encode_mel(params, cfg, jnp.asarray(mel))
    np.savez(
        os.path.join(OUT, "s3_onnx.npz"),
        onnx=np.frombuffer(onnx_bytes, np.uint8),
        mel=mel,
        tokens=np.asarray(tokens),
    )
    print("s3_onnx.npz:", np.asarray(tokens))


def capture_campplus():
    cfg = cp.CampplusConfig(
        feat_dim=16, embedding_size=24, m_channels=4, init_channels=16,
        growth_rate=4, bn_size=2, block_layers=(2, 2), block_dilations=(1, 2),
        seg_len=8,
    )
    sd = build_campplus_sd(cfg, np.random.default_rng(13))
    onnx_bytes = onnx_import.write_onnx_initializers(sd)
    path = "/tmp/_campplus_golden.onnx"
    with open(path, "wb") as f:
        f.write(onnx_bytes)
    params = cp.load_campplus_onnx(path, cfg)
    feat = np.random.default_rng(14).standard_normal(
        (1, 40, cfg.feat_dim)).astype(np.float32)
    emb = cp.apply(params, cfg, jnp.asarray(feat))
    np.savez(
        os.path.join(OUT, "campplus_onnx.npz"),
        onnx=np.frombuffer(onnx_bytes, np.uint8),
        feat=feat,
        emb=np.asarray(emb),
    )
    print("campplus_onnx.npz:", np.asarray(emb)[0, :4])


if __name__ == "__main__":
    capture_s3()
    capture_campplus()
