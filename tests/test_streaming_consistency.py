"""Streaming-hop consistency: with the causal estimator (chunked attention)
and positional noise, re-synthesizing a longer token prefix reproduces the
earlier mel prefix exactly — the property the reference's flow_cache exists
to provide (flow_matching.py:57-65)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.codecs import flow


def test_positional_noise_prefix_stable():
    key = jax.random.PRNGKey(0)
    z8 = flow._positional_noise(key, (2, 8, 4))
    z12 = flow._positional_noise(key, (2, 12, 4))
    np.testing.assert_allclose(np.asarray(z8), np.asarray(z12[:, :8]), atol=0)


def test_causal_estimator_mel_prefix_stable():
    cfg_est = flow.EstimatorConfig(
        in_channels=8 * 4, out_channels=8, channels=(16,),
        n_blocks=1, num_mid_blocks=1, num_heads=2, attention_head_dim=8,
        causal=True, static_chunk_size=2,
    )
    cfm = flow.CFMConfig()
    params = flow.estimator_init(jax.random.PRNGKey(0), cfg_est)

    rng = np.random.default_rng(0)
    B, T = 1, 8
    mu_full = jnp.asarray(rng.standard_normal((B, T, 8)).astype(np.float32))
    spks = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    cond = jnp.zeros((B, T, 8))
    key = jax.random.PRNGKey(1)

    def solve(T_cut):
        z = flow._positional_noise(key, (B, T_cut, 8))
        return flow.cfm_solve(
            params, cfg_est, cfm, z, mu_full[:, :T_cut],
            jnp.ones((B, T_cut)), spks, cond[:, :T_cut], n_timesteps=2,
        )

    m_half = solve(4)
    m_full = solve(8)
    np.testing.assert_allclose(
        np.asarray(m_half), np.asarray(m_full[:, :4]), atol=1e-4
    )
