"""Fused top-k+top-p sampling: exact support + distribution parity with
the sequential-mask path."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.ops import sampling


def test_fused_matches_sequential_distribution():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 200)).astype(np.float32) * 3)
    x = sampling.apply_temperature(logits, 1.0)
    seq = sampling.top_p_mask(sampling.top_k_mask(x, 20), 0.9)
    p_seq = np.asarray(jax.nn.softmax(seq, -1))

    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draws = np.asarray(
        jax.vmap(lambda k: sampling.sample(k, logits, top_k=20, top_p=0.9))(keys)
    )
    for b in range(4):
        emp = np.bincount(draws[:, b], minlength=200) / 4000
        assert set(np.where(emp > 0)[0]) <= set(np.where(p_seq[b] > 1e-9)[0])
        assert 0.5 * np.abs(emp - p_seq[b]).sum() < 0.08


def test_fused_greedy_limit():
    # top_k=1 must be argmax regardless of top_p
    logits = jnp.asarray([[0.1, 5.0, -2.0, 1.0]])
    tok = sampling.sample(jax.random.PRNGKey(0), logits, top_k=1, top_p=0.5)
    assert int(tok[0]) == 1
