"""Tests for the CosyVoice flow stack (conformer encoder, CFM, estimator)
and the HiFT vocoder — small configs, shape/causality/jit gates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import conformer, dsp, flow, hift


@pytest.fixture(scope="module")
def flow_small():
    cfg = flow.FlowConfig(
        input_size=32,
        output_size=16,
        spk_embed_dim=12,
        vocab_size=50,
        encoder=conformer.UpsampleConformerConfig(
            input_size=32, output_size=32, attention_heads=2,
            linear_units=64, num_blocks=2, num_up_blocks=1,
        ),
        estimator=flow.EstimatorConfig(
            in_channels=16 * 4, out_channels=16, channels=(24,),
            n_blocks=1, num_mid_blocks=2, num_heads=2, attention_head_dim=8,
        ),
        n_timesteps=2,
        sfm=True,
    )
    params = flow.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_conformer_upsamples_2x(flow_small):
    cfg, params = flow_small
    B, T = 2, 10
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 32)).astype(np.float32))
    mask = jnp.ones((B, T))
    h = conformer.apply(params["encoder"], cfg.encoder, x, mask)
    assert h.shape == (B, 2 * T, 32)
    assert np.isfinite(np.asarray(h)).all()


def test_rel_shift_gather_matches_reference_trick():
    """Our direct gather must equal the zero-pad/reshape rel-shift trick."""
    import torch

    B, H, T = 1, 2, 5
    x = torch.randn(B, H, T, 2 * T - 1)

    zero_pad = torch.zeros((B, H, T, 1))
    x_padded = torch.cat([zero_pad, x], dim=-1)
    x_padded = x_padded.view(B, H, 2 * T, T)
    ref = x_padded[:, :, 1:].view(B, H, T, 2 * T - 1)[:, :, :, : T]

    idx = (T - 1) - np.arange(T)[:, None] + np.arange(T)[None, :]
    ours = np.take_along_axis(
        x.numpy(), np.broadcast_to(idx, (B, H, T, T)), axis=-1
    )
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_estimator_causal(flow_small):
    """Causal estimator: changing a late frame must not affect early output."""
    cfg, params = flow_small
    # disable attention mixing across time by making chunk size 1 (strictly
    # causal attention) so only convs could leak
    est_cfg = flow.EstimatorConfig(**{**cfg.estimator.__dict__, "static_chunk_size": 1})
    B, T = 1, 12
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    cond = jnp.zeros((B, T, 16))
    spks = jnp.asarray(rng.standard_normal((B, 16)).astype(np.float32))
    mask = jnp.ones((B, T))
    t = jnp.asarray([0.4])

    y1 = flow.estimator_apply(params["estimator"], est_cfg, x, mask, mu, t, spks, cond)
    x2 = x.at[:, -1].set(100.0)
    y2 = flow.estimator_apply(params["estimator"], est_cfg, x2, mask, mu, t, spks, cond)
    np.testing.assert_allclose(
        np.asarray(y1[:, : T - 1]), np.asarray(y2[:, : T - 1]), atol=1e-4
    )


def test_flow_inference_shapes(flow_small):
    cfg, params = flow_small
    B, Tp, Tt = 1, 3, 8  # prompt tokens + target tokens
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 50, (B, Tp + Tt)))
    mask = jnp.ones((B, Tp + Tt))
    prompt_feat = jnp.zeros((B, Tp * 2, 16))
    spk = jnp.asarray(np.random.default_rng(3).standard_normal((B, 12)).astype(np.float32))
    mel = flow.inference(
        params, cfg, jax.random.PRNGKey(0), tokens, mask, prompt_feat, Tp * 2, spk
    )
    assert mel.shape == (B, Tt * 2, 16)
    assert np.isfinite(np.asarray(mel)).all()


def test_cfm_loss_finite_and_grad(flow_small):
    cfg, params = flow_small
    B, T = 2, 6
    rng = np.random.default_rng(4)
    x1 = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    cond = jnp.zeros((B, T, 16))
    spks = jnp.asarray(rng.standard_normal((B, 16)).astype(np.float32))
    mask = jnp.ones((B, T))

    def lf(ep):
        loss, _ = flow.cfm_loss(
            ep, cfg.estimator, cfg.cfm, jax.random.PRNGKey(1), x1, mask, mu, spks, cond
        )
        return loss

    loss, grads = jax.value_and_grad(lf)(params["estimator"])
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(x**2)), grads, 0.0
    )
    assert gnorm > 0


def test_sfm_loss_and_inference(flow_small):
    cfg, params = flow_small
    B, Tt = 2, 6
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, 50, (B, Tt)))
    tmask = jnp.ones((B, Tt))
    x1 = jnp.asarray(rng.standard_normal((B, Tt * 2, 16)).astype(np.float32))
    fmask = jnp.ones((B, Tt * 2))
    spk = jnp.asarray(rng.standard_normal((B, 12)).astype(np.float32))

    total, metrics = flow.sfm_loss(params, cfg, jax.random.PRNGKey(2), tokens, tmask, x1, fmask, spk)
    assert np.isfinite(float(total))
    assert set(metrics) == {"loss_coarse", "loss_t", "loss_sigma", "loss_cfm", "loss_mu"}

    mel = flow.sfm_inference(params, cfg, jax.random.PRNGKey(3), tokens, tmask, spk)
    assert mel.shape == (B, Tt * 2, 16)


@pytest.fixture(scope="module")
def hift_small():
    cfg = hift.HiFTConfig(
        in_channels=16,
        base_channels=32,
        nb_harmonics=2,
        sampling_rate=24000,
        upsample_rates=(4, 3),
        upsample_kernel_sizes=(8, 7),
        istft_n_fft=16,
        istft_hop_len=4,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(7, 7),
        source_resblock_dilation_sizes=((1, 2), (1, 2)),
        f0_cond_channels=24,
    )
    return cfg, hift.init_params(jax.random.PRNGKey(0), cfg)


def test_hift_inference_shape(hift_small):
    cfg, params = hift_small
    B, T = 1, 20
    mel = jnp.asarray(np.random.default_rng(6).standard_normal((B, T, 16)).astype(np.float32))
    wav, src = hift.inference(params, cfg, jax.random.PRNGKey(1), mel)
    assert wav.shape[0] == B
    # total upsample = 4*3*4 = 48
    assert abs(wav.shape[1] - T * 48) <= 48
    assert np.isfinite(np.asarray(wav)).all()
    assert float(jnp.max(jnp.abs(wav))) <= cfg.audio_limit + 1e-6


def test_hift_jit(hift_small):
    cfg, params = hift_small
    f = jax.jit(lambda p, k, m: hift.inference(p, cfg, k, m)[0])
    mel = jnp.zeros((1, 10, 16))
    wav = f(params, jax.random.PRNGKey(0), mel)
    assert np.isfinite(np.asarray(wav)).all()


def test_log_mel_hifigan_shape():
    x = jnp.asarray(np.random.default_rng(7).standard_normal((1, 24000)).astype(np.float32))
    mel = dsp.log_mel_hifigan(x)
    assert mel.shape == (1, 24000 // 480, 80)
    assert np.isfinite(np.asarray(mel)).all()
