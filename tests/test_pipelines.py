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


def test_xy_pipeline_full_wav(xy_setup):
    """Full XY slice: text -> frames -> codec decode -> wav."""
    from rwkvtts_tpu.codecs import xy_tokenizer as xt

    cfg, params = xy_setup
    ccfg = xt.XYTokenizerConfig(
        n_mels=16, d_model=32, enc_layers=1, heads=2, ffn_dim=64,
        adapter_layers=1, nq=3, codebook_size=16, codebook_dim=16,
        rvq_dim=16, quantizer_io_dim=32 * 4, dec_layers=1,
        vocos_dim=32, vocos_intermediate_dim=64, vocos_layers=1,
        vocos_n_fft=64, vocos_hop=16,
    )
    cparams = xt.init_params(jax.random.PRNGKey(9), ccfg)
    # LM speech vocab (16) == codec codebook (16) in this fixture
    pipe = XYPipeline(cfg, params, FakeTok(), codec_cfg=ccfg, codec_params=cparams)
    res = pipe.synthesize("hello", max_new_tokens=9, seed=0)
    T = res.codes.shape[1]
    if T > 0:
        # wav length = T * up(4) * dec(2) * vocos hop(16)
        assert res.wav.shape == (T * 4 * 2 * 16,)
        assert np.isfinite(res.wav).all()


def test_xy_pipeline_higgs_codec(xy_setup):
    """Higgs-token LM path (codec_kind='higgs'): the XY LM's frames decode
    through the Higgs DAC-style RVQ codec instead of XY_Tokenizer
    (reference: train_xy_llm_jsonl.py rows from extract_higgs_tokens)."""
    from rwkvtts_tpu.codecs import higgs

    cfg, params = xy_setup
    hcfg = higgs.HiggsConfig(
        d_model=8, latent_dim=16, semantic_dim=16, nq=3,
        codebook_size=16, strides=(2, 2, 2), decoder_channels=16,
    )
    hparams = higgs.init_params(jax.random.PRNGKey(11), hcfg)
    pipe = XYPipeline(
        cfg, params, FakeTok(), codec_cfg=hcfg, codec_params=hparams,
        codec_kind="higgs", sample_rate=16000,
    )
    res = pipe.synthesize("hello higgs", max_new_tokens=9, seed=0)
    T = res.codes.shape[1]
    if T > 0:
        assert res.wav.shape[0] == T * hcfg.hop_length
        assert np.isfinite(res.wav).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        XYPipeline(cfg, params, FakeTok(), codec_kind="nope")
