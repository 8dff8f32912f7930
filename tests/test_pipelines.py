"""End-to-end pipeline tests on tiny random-weight models: the full
text -> tokens -> wav slice runs and produces sane shapes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import bicodec, spark_tokenizer
from rwkvtts_tpu.infer.spark_pipeline import SparkPipeline
from rwkvtts_tpu.infer.xy_pipeline import XYPipeline
from rwkvtts_tpu.models import spark, xy


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text][:16]


@pytest.fixture(scope="module")
def spark_setup():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)

    ccfg = bicodec.BiCodecConfig(
        mel=bicodec.MelParams(n_fft=256, win_length=160, hop_length=80, num_mels=32),
        encoder=bicodec.VocosStackConfig(24, 32, 64, 2, 16, sample_ratios=(1, 1)),
        quantizer_codebook_size=8193,
        quantizer_codebook_dim=8,
        quantizer_input_dim=16,
        prenet=bicodec.VocosStackConfig(16, 32, 64, 2, 16, condition_dim=16, sample_ratios=(1, 1)),
        postnet=bicodec.VocosStackConfig(16, 32, 64, 2, 32),
        wave=bicodec.WaveGeneratorConfig(input_channel=16, channels=32, rates=(4, 2), kernel_sizes=(8, 4)),
        speaker=bicodec.SpeakerEncoderConfig(
            input_dim=32, out_dim=16, latent_dim=16, token_num=4,
            fsq_levels=(4, 4, 4, 4, 4, 4), ecapa_channels=64,
        ),
    )
    cparams = bicodec.init_params(jax.random.PRNGKey(1), ccfg)
    codec = spark_tokenizer.SparkAudioTokenizer(ccfg, cparams, wav2vec2=None)
    return cfg, params, codec


def test_spark_pipeline_with_global_tokens(spark_setup):
    cfg, params, codec = spark_setup
    pipe = SparkPipeline(cfg, params, FakeTok(), codec)
    res = pipe.synthesize(
        "hello", global_tokens=[1, 2, 3, 4], max_new_tokens=12, seed=0
    )
    assert res.semantic_tokens.ndim == 1
    assert res.wav.ndim == 1 and len(res.wav) == len(res.semantic_tokens) * 8
    assert np.isfinite(res.wav).all()
    assert res.tokens_per_s > 0


def test_spark_pipeline_voice_design(spark_setup):
    cfg, params, codec = spark_setup
    pipe = SparkPipeline(cfg, params, FakeTok(), codec)
    glob = pipe.design_voice({"gender": "female"}, seed=1)
    assert len(glob) == 32
    assert all(0 <= g < 4096 for g in glob)


@pytest.fixture(scope="module")
def xy_setup():
    bb = dataclasses.replace(
        xy.default_config(hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
                          wkv_chunk=16, remat=False, dtype=jnp.float32).backbone,
    )
    cfg = xy.XYConfig(
        backbone=bb, text_vocab_size=300, speech_vocab_size=16,
        num_channels=3, text_shift_size=256,
    )
    params = xy.init_params(jax.random.PRNGKey(2), cfg)
    return cfg, params


def test_xy_pipeline_frames(xy_setup):
    cfg, params = xy_setup
    pipe = XYPipeline(cfg, params, FakeTok())
    res = pipe.synthesize("hi", max_new_tokens=10, seed=0)
    nq, T = res.codes.shape
    assert nq == 3
    assert (res.codes[0] >= 0).all() or T == 0  # ch0 un-shifted into codec range
