"""Fused decode-step kernel: packed-layout parity vs the einsum step
(the batched persistent-state kernel contract, reference
model/llm/cuda/rwkv7_state_fwd_fp16.cu)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.ops import wkv7
from rwkvtts_tpu.ops import wkv7_step_pallas as sp


@pytest.fixture
def inputs():
    rng = np.random.default_rng(0)
    B, H, N = 4, 6, 64
    S = jnp.asarray(rng.standard_normal((B, H, N, N)).astype(np.float32))
    r, w, k, v, z, b = (
        jnp.asarray(rng.standard_normal((B, H, N)).astype(np.float32))
        for _ in range(6)
    )
    return S, r, w - 1.0, k, v, z, b


def test_pack_unpack_roundtrip(inputs):
    S = inputs[0]
    Sp = sp.pack_state(S)
    assert Sp.shape == (4 * 3, 64, 128)
    np.testing.assert_allclose(np.asarray(sp.unpack_state(Sp, 4, 6)), np.asarray(S), atol=0)
    # stacked-layer leading dim
    SL = jnp.stack([S, S + 1])
    np.testing.assert_allclose(
        np.asarray(sp.unpack_state(sp.pack_state(SL), 4, 6)), np.asarray(SL), atol=0
    )


def test_packed_ref_matches_einsum(inputs):
    S, r, w, k, v, z, b = inputs
    y0, S0 = wkv7.wkv7_step(S, r, w, k, v, z, b)
    y1, S1 = sp.wkv7_step_packed_ref(sp.pack_state(S), r, w, k, v, z, b)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sp.unpack_state(S1, 4, 6)), np.asarray(S0), rtol=1e-6, atol=1e-6
    )


def test_kernel_interpret_matches_einsum(inputs):
    S, r, w, k, v, z, b = inputs
    y0, S0 = wkv7.wkv7_step(S, r, w, k, v, z, b)
    y2, S2 = sp.wkv7_step_packed(sp.pack_state(S), r, w, k, v, z, b, interpret=True)
    # fp32 reduction-order differences only (masked lane reduce vs einsum)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sp.unpack_state(S2, 4, 6)), np.asarray(S0), rtol=5e-4, atol=1e-4
    )


def test_dispatch_routes_packed_state(inputs):
    """wkv7_step auto-detects the packed 3-D layout (CPU -> packed ref)."""
    S, r, w, k, v, z, b = inputs
    y0, _ = wkv7.wkv7_step(S, r, w, k, v, z, b)
    y1, S1 = wkv7.wkv7_step(sp.pack_state(S), r, w, k, v, z, b)
    assert S1.ndim == 3
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-5)


def test_pick_group_divides():
    assert sp._pick_group(384, 8) == 8
    assert sp._pick_group(6, 8) == 6
    assert sp._pick_group(7, 8) == 7
    assert sp._pick_group(20, 8) == 5


def test_generate_on_cpu_unaffected():
    """pack_decode_state is a no-op off-TPU: spark_generate still runs."""
    from rwkvtts_tpu.infer.generate import spark_generate
    from rwkvtts_tpu.models import spark

    cfg = spark.default_config(
        hidden_size=128, num_layers=2, head_size=32, gate_lora=32,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 100)
    modality = jnp.full((B, T), spark.MOD_TEXT, jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    toks, lengths = spark_generate(
        params, cfg, tokens, modality, mask, jax.random.PRNGKey(2),
        max_new_tokens=4,
    )
    assert toks.shape == (B, 4)


def test_bf16_carry_parity(inputs):
    """decode_state_bf16 composed with the packed layout: bf16 carry in,
    bf16 carry out, stepped in f32 — kernel (interpret) and ref agree with
    the f32 einsum step to bf16 tolerance."""
    S, r, w, k, v, z, b = inputs
    y0, S0 = wkv7.wkv7_step(S, r, w, k, v, z, b)
    Sp16 = sp.pack_state(S).astype(jnp.bfloat16)
    for fn, kw in (
        (sp.wkv7_step_packed, {"interpret": True}),
        (sp.wkv7_step_packed_ref, {}),
    ):
        y1, S1 = fn(Sp16, r, w, k, v, z, b, **kw)
        assert S1.dtype == jnp.bfloat16
        # y entries are O(100) sums with cancellation; bf16 state rounding
        # leaves a few small-magnitude elements ~0.3 off — tolerance is
        # about rounding noise, the wiring is proven by the dtype asserts
        # and the 99.8% close match
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), rtol=0.1, atol=0.5
        )
        np.testing.assert_allclose(
            np.asarray(sp.unpack_state(S1.astype(jnp.float32), 4, 6)),
            np.asarray(S0), rtol=0.1, atol=0.5,
        )


def test_pack_decode_state_bf16_packed_compose():
    """pack_decode_state with BOTH decode_wkv_packed and decode_state_bf16
    yields bf16 (P, N, 2N) leaves (the exclusivity was lifted)."""
    from rwkvtts_tpu.models import rwkv7

    cfg = rwkv7.RWKV7Config(
        vocab_size=64, hidden_size=128, num_layers=2, head_size=32,
        decode_wkv_packed=True, decode_state_bf16=True,
    )
    B, H, N = 2, cfg.num_heads, cfg.head_size
    state = {
        "att_x": jnp.zeros((cfg.num_layers, B, cfg.hidden_size)),
        "wkv": jnp.ones((cfg.num_layers, B, H, N, N), jnp.float32),
        "ffn_x": jnp.zeros((cfg.num_layers, B, cfg.hidden_size)),
    }
    packed = rwkv7.pack_decode_state(state, cfg)
    assert isinstance(packed, tuple) and len(packed) == cfg.num_layers
    for st in packed:
        assert st["wkv"].shape == (B * (H // 2), N, 2 * N)
        assert st["wkv"].dtype == jnp.bfloat16
    # round-trip back to stacked f32-compatible layout
    un = rwkv7.unpack_decode_state(packed, cfg)
    assert un["wkv"].shape == (cfg.num_layers, B, H, N, N)
