"""Pallas fused WKV7 kernel vs the scan ground truth (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.ops import wkv7 as W
from rwkvtts_tpu.ops import wkv7_pallas as WP
from tests.test_wkv7 import make_inputs


@pytest.mark.parametrize("T", [64, 128, 100])
def test_pallas_matches_scan(T):
    key = jax.random.PRNGKey(0)
    r, w_raw, k, v, z, b, state = make_inputs(key, B=2, T=T, H=2, N=64)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    y, s = WP.wkv7_pallas(r, w_raw, k, v, z, b, state, interpret=True)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_pallas_zero_state():
    key = jax.random.PRNGKey(1)
    r, w_raw, k, v, z, b, _ = make_inputs(key, B=1, T=64, H=1, N=64)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b)
    y, s = WP.wkv7_pallas(r, w_raw, k, v, z, b, interpret=True)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_pallas_resets_fallback():
    key = jax.random.PRNGKey(2)
    r, w_raw, k, v, z, b, state = make_inputs(key, B=1, T=32, H=1, N=8)
    resets = jnp.zeros((1, 32), bool).at[0, 10].set(True)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state, resets)
    y, s = WP.wkv7_pallas(r, w_raw, k, v, z, b, state, resets)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
