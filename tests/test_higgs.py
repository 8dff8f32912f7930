"""Higgs tokenizer tests: 320x rate contract, RVQ round-trip, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import higgs


@pytest.fixture(scope="module")
def small():
    cfg = higgs.HiggsConfig(
        d_model=8, latent_dim=16, strides=(4, 2), semantic_dim=12,
        nq=2, codebook_size=16, decoder_channels=32,
    )
    return cfg, higgs.init_params(jax.random.PRNGKey(0), cfg)


def test_encode_rate(small):
    cfg, params = small
    B, T = 1, 64  # hop = 8
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((B, T)).astype(np.float32))
    feats = jnp.asarray(np.random.default_rng(1).standard_normal((B, 8, 12)).astype(np.float32))
    codes = higgs.encode(params, cfg, wav, feats)
    assert codes.shape == (2, B, 8)
    assert int(codes.max()) < 16


def test_decode_rate(small):
    cfg, params = small
    codes = jnp.asarray(np.random.default_rng(2).integers(0, 16, (2, 1, 5)))
    wav = higgs.decode(params, cfg, codes)
    assert wav.shape == (1, 5 * 8)
    assert np.isfinite(np.asarray(wav)).all()
    # unbounded: the reference DAC decoder's final Tanh is commented out
    # (verified by tests/test_reference_parity.py::test_ref_higgs_*)


def test_rvq_roundtrip(small):
    cfg, params = small
    z = jnp.asarray(np.random.default_rng(3).standard_normal((1, 6, cfg.quantizer_dim)).astype(np.float32))
    q, codes = higgs.rvq_encode(params["quantizer"], z)
    q2 = higgs.rvq_decode(params["quantizer"], codes)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


def test_config_contract():
    cfg = higgs.HiggsConfig()
    assert cfg.hop_length == 320
    assert cfg.frame_rate == 50
    assert cfg.quantizer_dim == 896
