"""Tests for the two-tower TTS model (C10) and S2S single-FFN (C11)."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.models import s2s, tts_two_tower as tt


def _tt_cfg():
    return tt.default_config(
        text_hidden=32, text_layers=1, audio_hidden=32, audio_layers=2,
        dtype=jnp.float32, head_size=8, gate_lora=8, wkv_chunk=4, remat=False,
    )


def test_two_tower_forward_and_grad():
    cfg = _tt_cfg()
    params = tt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 2
    text_ids = jnp.asarray(rng.integers(0, 100, (B, 5)))
    text_mask = jnp.asarray([[0, 1, 1, 1, 1], [1, 1, 1, 1, 1]])
    audio_ids = jnp.asarray(rng.integers(0, tt.AUDIO_VOCAB, (B, 6)))
    audio_mask = jnp.asarray([[0, 0, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]])
    labels = jnp.where(audio_mask > 0, audio_ids, -100)

    def lf(p):
        loss, _ = tt.forward(p, cfg, text_ids, text_mask, audio_ids, audio_mask, labels)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    for tower in ("text_lm", "audio_lm", "projector"):
        g = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads[tower], 0.0
        )
        assert np.isfinite(g) and g > 0, tower


def test_two_tower_generate():
    cfg = _tt_cfg()
    params = tt.init_params(jax.random.PRNGKey(0), cfg)
    text_ids = jnp.ones((1, 4), jnp.int32)
    text_mask = jnp.ones((1, 4), jnp.int32)
    toks, lengths = tt.generate(
        params, cfg, text_ids, text_mask, jax.random.PRNGKey(1), max_new_tokens=8
    )
    assert toks.shape == (1, 8)
    assert int(toks.max()) < tt.AUDIO_VOCAB


def test_s2s_dual_heads():
    cfg = s2s.default_config(
        hidden_size=32, num_layers=2, vocab_size=64, text_vocab=40, audio_vocab=24,
        dtype=jnp.float32, head_size=8, gate_lora=8, wkv_chunk=4, remat=False,
    )
    params = s2s.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 8)))
    text_logits = s2s.forward(params, cfg, ids, is_text=True)
    audio_logits = s2s.forward(params, cfg, ids, is_text=False)
    assert text_logits.shape == (2, 8, 40)
    assert audio_logits.shape == (2, 8, 24)

    labels = jnp.asarray(np.random.default_rng(2).integers(0, 24, (2, 8)))
    loss, n = s2s.forward(params, cfg, ids, is_text=False, labels=labels)
    assert np.isfinite(float(loss))
    # two heads share the trunk: audio-head grads zero for text loss
    def lf(p):
        l, _ = s2s.forward(p, cfg, ids, is_text=True, labels=labels % 40)
        return l
    grads = jax.grad(lf)(params)
    assert float(jnp.sum(jnp.abs(grads["audio_head"]))) == 0.0
    assert float(jnp.sum(jnp.abs(grads["head"]))) > 0.0
