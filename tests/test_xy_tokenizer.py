"""XY_Tokenizer tests: rate contracts (1280x down / 1920x up), RVQ
round-trip, jit, whisper mel shape."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import xy_tokenizer as xy


@pytest.fixture(scope="module")
def small():
    cfg = xy.XYTokenizerConfig(
        n_mels=16,
        d_model=32,
        enc_layers=2,
        heads=2,
        ffn_dim=64,
        adapter_layers=1,
        nq=3,
        codebook_size=32,
        codebook_dim=16,
        rvq_dim=16,
        quantizer_io_dim=32 * 4,
        dec_layers=2,
        vocos_dim=32,
        vocos_intermediate_dim=64,
        vocos_layers=2,
        vocos_n_fft=64,
        vocos_hop=16,
    )
    return cfg, xy.init_params(jax.random.PRNGKey(0), cfg)


def test_encode_rate(small):
    cfg, params = small
    B, T_mel = 1, 32  # 100 Hz mel frames
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((B, T_mel, 16)).astype(np.float32))
    codes = xy.encode(params, cfg, mel)
    # 100 Hz -> 50 Hz (encoder) -> 12.5 Hz (pool 4): T_mel/8
    assert codes.shape == (3, B, T_mel // 8)
    assert int(codes.max()) < 32 and int(codes.min()) >= 0


def test_decode_rate(small):
    cfg, params = small
    codes = jnp.asarray(np.random.default_rng(1).integers(0, 32, (3, 1, 5)))
    wav = xy.decode(params, cfg, codes)
    # 12.5 Hz -> 50 (up4) -> 100 (decoder x2) -> x hop (vocos)
    assert wav.shape == (1, 5 * 4 * 2 * 16)
    assert np.isfinite(np.asarray(wav)).all()


def test_rvq_roundtrip(small):
    cfg, params = small
    z = jnp.asarray(np.random.default_rng(2).standard_normal((2, 6, cfg.quantizer_io_dim)).astype(np.float32))
    zq, codes = xy.rvq_encode(params["quantizer"], cfg, z)
    zq2 = xy.rvq_decode(params["quantizer"], cfg, codes)
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq2), atol=1e-5)


def test_decode_jit(small):
    cfg, params = small
    f = jax.jit(lambda p, c: xy.decode(p, cfg, c))
    wav = f(params, jnp.zeros((3, 1, 4), jnp.int32))
    assert np.isfinite(np.asarray(wav)).all()


def test_whisper_log_mel_shape_and_range():
    wav = jnp.asarray(np.random.default_rng(3).standard_normal((1, 16000)).astype(np.float32)) * 0.1
    mel = xy.whisper_log_mel(wav)
    assert mel.shape == (1, 100, 80)
    m = np.asarray(mel)
    assert np.isfinite(m).all()
    # whisper normalization bounds: (log_spec+4)/4 with 8-decade clamp
    assert m.max() <= 3.0 and m.min() >= m.max() - 2.0 - 1e-6


def test_long_chunked_encode_decode(small):
    """Chunked long-audio path (reference model.py:131-256): window/overlap
    stepping, correct total lengths, and short inputs equal the direct path."""
    import numpy as np

    from rwkvtts_tpu.codecs import xy_tokenizer as xy

    cfg, params = small
    sr = cfg.input_sample_rate
    spc = 8 * 160  # samples per code at 16 kHz

    # short input: identical to direct encode
    wav = np.sin(np.linspace(0, 50, spc * 10)).astype(np.float32)
    direct = np.asarray(
        xy.encode(
            params, cfg,
            xy.whisper_log_mel(jnp.asarray(wav[None]), n_mels=cfg.n_mels),
        )
    )[:, 0]
    codes_s = xy.encode_long(params, cfg, wav, window_seconds=2.0, overlap_seconds=1.0)
    np.testing.assert_array_equal(codes_s, direct[:, : codes_s.shape[-1]])

    # long input: 5x the window
    wav_long = np.sin(np.linspace(0, 500, spc * 10 * 5)).astype(np.float32)
    win_s = (spc * 10) / sr  # window = 10 codes worth of audio
    codes = xy.encode_long(
        params, cfg, wav_long, window_seconds=win_s, overlap_seconds=win_s / 2
    )
    assert codes.shape == (cfg.nq, 50)

    out = xy.decode_long(
        params, cfg, codes, window_seconds=win_s, overlap_seconds=win_s / 2
    )
    assert out.shape == (50 * 8 * cfg.vocos_hop,)
    assert np.isfinite(out).all()
