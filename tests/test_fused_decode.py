"""Fused decode projections must match the unfused decode step exactly
(same math, reassociated — fp32 test config keeps tolerance tight)."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.models import rwkv7


def test_fused_decode_matches_unfused():
    cfg = rwkv7.RWKV7Config(
        vocab_size=64, hidden_size=64, num_layers=3, head_size=16,
        gate_lora=16, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    # randomize the zero-initialized lora ins so the fusion is exercised
    k = jax.random.PRNGKey(1)
    att = dict(params["blocks"]["att"])
    for name in ("w1", "a1", "v1", "g1"):
        k, sub = jax.random.split(k)
        att[name] = 0.1 * jax.random.normal(sub, att[name].shape)
    params["blocks"] = dict(params["blocks"], att=att)

    packed = rwkv7.pack_decode_params(params, cfg)
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 64))
    st = rwkv7.init_model_state(cfg, B)
    # prime the state so att_x/ffn_x are non-trivial
    h0, st = rwkv7.decode_step(params, cfg, x, st)
    st_packed = jax.tree.map(jnp.copy, st)

    x2 = jax.random.normal(jax.random.PRNGKey(3), (B, 64))
    h_ref, st_ref = rwkv7.decode_step(params, cfg, x2, st)
    h_fused, st_fused = rwkv7.decode_step(packed, cfg, x2, st_packed)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_fused), atol=2e-5)
    for key in ("att_x", "ffn_x", "wkv"):
        np.testing.assert_allclose(
            np.asarray(st_ref[key]), np.asarray(st_fused[key]), atol=2e-5
        )


def test_int8_decode_close_to_fp():
    cfg = rwkv7.RWKV7Config(
        vocab_size=64, hidden_size=64, num_layers=2, head_size=16,
        gate_lora=16, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(1)
    att = dict(params["blocks"]["att"])
    for name in ("w1", "a1", "v1", "g1", "output"):
        k, sub = jax.random.split(k)
        att[name] = 0.1 * jax.random.normal(sub, att[name].shape)
    params["blocks"] = dict(params["blocks"], att=att)

    fp = rwkv7.pack_decode_params(params, cfg)
    q8 = rwkv7.pack_decode_params(params, cfg, quantize_int8=True)
    assert q8["blocks"]["att"]["fused_a_q8"]["q"].dtype == jnp.int8

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    st1 = rwkv7.init_model_state(cfg, 2)
    st2 = rwkv7.init_model_state(cfg, 2)
    h1, _ = rwkv7.decode_step(fp, cfg, x, st1)
    h2, _ = rwkv7.decode_step(q8, cfg, x, st2)
    # per-channel int8: small relative error on hidden states
    rel = float(jnp.abs(h1 - h2).max() / (jnp.abs(h1).max() + 1e-6))
    assert rel < 0.05, rel


def test_unfused_int8_decode_close_to_fp():
    """fuse_projections=False + int8: the seven projections quantize
    individually (B=1 bandwidth mode) — no fused keys, close to fp."""
    cfg = rwkv7.RWKV7Config(
        vocab_size=64, hidden_size=64, num_layers=2, head_size=16,
        gate_lora=16, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(1)
    att = dict(params["blocks"]["att"])
    for name in ("w1", "a1", "v1", "g1", "output"):
        k, sub = jax.random.split(k)
        att[name] = 0.1 * jax.random.normal(sub, att[name].shape)
    params["blocks"] = dict(params["blocks"], att=att)

    q8 = rwkv7.pack_decode_params(
        params, cfg, quantize_int8=True, fuse_projections=False
    )
    qa = q8["blocks"]["att"]
    assert "fused_a" not in qa and "fused_a_q8" not in qa
    for name in ("receptance", "key", "value", "output"):
        assert qa[f"{name}_q8"]["q"].dtype == jnp.int8
        assert name in qa  # originals stay (prefill consumes them)
    assert q8["blocks"]["ffn"]["key_q8"]["q"].dtype == jnp.int8

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    h1, _ = rwkv7.decode_step(params, cfg, x, rwkv7.init_model_state(cfg, 2))
    h2, _ = rwkv7.decode_step(q8, cfg, x, rwkv7.init_model_state(cfg, 2))
    rel = float(jnp.abs(h1 - h2).max() / (jnp.abs(h1).max() + 1e-6))
    assert rel < 0.05, rel

    # bf16 + unfused is a no-op pack (decode_step reads the originals)
    plain = rwkv7.pack_decode_params(params, cfg, fuse_projections=False)
    h3, _ = rwkv7.decode_step(plain, cfg, x, rwkv7.init_model_state(cfg, 2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h3))

    import pytest

    with pytest.raises(ValueError):
        rwkv7.pack_decode_params(
            params, cfg, quantize_int4=True, fuse_projections=False
        )


def test_pack_shapes():
    cfg = rwkv7.RWKV7Config(
        vocab_size=8, hidden_size=32, num_layers=2, head_size=8,
        gate_lora=8, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    packed = rwkv7.pack_decode_params(params, cfg)
    C = 32
    D = 3 * C + cfg.decay_lora + cfg.a_lora + cfg.v_lora + cfg.gate_lora
    assert packed["blocks"]["att"]["fused_a"].shape == (2, C, D)
    assert packed["blocks"]["att"]["fused_b"].shape == (2, C, D)


def test_spark_early_exit_matches_fixed_scan():
    """Chunked early-exit greedy decode == fixed-length scan output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import spark

    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 100)
    modality = jnp.full((B, T), spark.MOD_TEXT, jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    key = jax.random.PRNGKey(3)
    a, la = gen.spark_generate(
        params, cfg, tokens, modality, mask, key, max_new_tokens=16,
        top_k=1, top_p=1.0,
    )
    b, lb = gen.spark_generate_early_exit(
        params, cfg, tokens, modality, mask, key, max_new_tokens=16,
        chunk_len=4, top_k=1, top_p=1.0,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_int4_quantize_roundtrip_error_bound():
    """Group-wise int4: dequant error per element <= scale/2 where scale is
    that 64-row group's amax/7 — i.e. bounded RELATIVE to the group max."""
    import numpy as np

    from rwkvtts_tpu.models import rwkv7 as M

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 128, 48)).astype(np.float32))
    p = M._quantize_int4(w, group=32)
    assert p["q4"].shape == (2, 64, 48) and p["q4"].dtype == jnp.int8
    assert p["s"].shape == (2, 4, 48)
    deq = np.asarray(M._deq_int4(p, jnp.float32))
    g = np.asarray(w).reshape(2, 4, 32, 48)
    amax = np.abs(g).max(axis=2, keepdims=True)
    # half-step + bf16 scale rounding (scale is bf16: ~0.4% rel, times
    # |q|<=7 -> up to ~3% of scale on top of the half-step)
    bound = (amax / 7.0) / 2.0 + 0.01 * amax
    err = np.abs(np.asarray(w).reshape(2, 4, 32, 48) - deq.reshape(2, 4, 32, 48))
    assert (err <= bound + 1e-6).all(), float((err - bound).max())


def test_int4_group_adapts_to_small_input_dim():
    """A requested group larger than the input dim shrinks to the largest
    divisor instead of asserting (tiny test configs, odd FFN sizes); the
    round trip stays exact at the nibble grid."""
    import numpy as np

    from rwkvtts_tpu.models import rwkv7 as M

    rng = np.random.default_rng(1)
    # I=64 with requested group 64 -> adapted group 32 (needs I % 2g == 0)
    w = jnp.asarray(rng.standard_normal((64, 24)).astype(np.float32))
    p = M._quantize_int4(w, group=64)
    assert p["s"].shape == (2, 24)  # two 32-row groups
    deq = np.asarray(M._deq_int4(p, jnp.float32))
    g = np.asarray(w).reshape(2, 32, 24)
    amax = np.abs(g).max(axis=1, keepdims=True)
    bound = (amax / 7.0) / 2.0 + 0.01 * amax
    err = np.abs(g - deq.reshape(2, 32, 24))
    assert (err <= bound + 1e-6).all()
