"""Parity tests for the whole-step decode megakernel (ops/decode_mega.py).

Interpret mode on CPU: the kernel math must match models/rwkv7.decode_step
(the production XLA step) through multiple steps, including the v_first
residual, state carry, and token-shift states. Quantization makes the
comparison tolerance-based (same bound style as test_fused_decode's int8
tests); a second check compares against decode_step with the SAME unfused
int8 params, which shares the quantization error and must agree tightly.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.models import rwkv7
from rwkvtts_tpu.ops import decode_mega as dm


def _cfg(**kw):
    kw.setdefault("vocab_size", 32)
    kw.setdefault("hidden_size", 256)
    kw.setdefault("num_layers", 2)
    kw.setdefault("head_size", 64)
    kw.setdefault("gate_lora", 64)
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("wkv_chunk", 4)
    kw.setdefault("remat", False)
    return rwkv7.RWKV7Config(**kw)


def _randomized_params(cfg, seed=0):
    params = rwkv7.init_params(jax.random.PRNGKey(seed), cfg)
    k = jax.random.PRNGKey(seed + 1)
    att = dict(params["blocks"]["att"])
    # randomize zero-initialized matrices so every band is exercised
    for name in ("w1", "a1", "v1", "g1", "output"):
        k, sub = jax.random.split(k)
        att[name] = 0.1 * jax.random.normal(sub, att[name].shape)
    ffn = dict(params["blocks"]["ffn"])
    k, sub = jax.random.split(k)
    ffn["value"] = 0.1 * jax.random.normal(sub, ffn["value"].shape)
    params["blocks"] = dict(params["blocks"], att=att, ffn=ffn)
    return params


def _stack_state(st_tuple_or_dict):
    return st_tuple_or_dict


def test_spec_tiles_cover_stream():
    cfg = _cfg()
    spec = dm.build_spec(cfg, tile_n=256)
    kinds = [t.kind for t in spec.tiles]
    C, TN = spec.C, spec.TN
    assert kinds.count("rkv") == 3 * C // TN
    assert kinds.count("out") == C // TN
    assert kinds.count("ffnk") == 4 * C // TN
    assert kinds.count("ffnv") == 4 * (C // TN)
    assert sum(t.glue_wkv for t in spec.tiles) == 1
    assert sum(t.relu2 for t in spec.tiles) == 1
    assert spec.tiles[-1].last


def test_mega_matches_decode_step_multi_step():
    cfg = _cfg()
    params = _randomized_params(cfg)
    mega = dm.pack_mega(params, cfg, tile_n=256)
    q8 = rwkv7.pack_decode_params(
        params, cfg, quantize_int8=True, fuse_projections=False
    )

    B, C = 1, cfg.hidden_size
    st = rwkv7.init_model_state(cfg, B)
    mst = dm.pack_mega_state(st, cfg)

    key = jax.random.PRNGKey(7)
    step_mega = functools.partial(dm.decode_step_mega, interpret=True)
    for i in range(3):
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (B, C), jnp.float32)
        h_ref, st = rwkv7.decode_step(params, cfg, x, st)
        h_m, mst = step_mega(mega, cfg, x, mst)
        rel = float(
            jnp.abs(h_ref - h_m).max() / (jnp.abs(h_ref).max() + 1e-6)
        )
        assert rel < 0.05, (i, rel)

    # state parity after 3 steps (quantization-bounded)
    unpacked = dm.unpack_mega_state(mst, cfg, dtype=jnp.float32)
    for leaf in ("att_x", "ffn_x", "wkv"):
        a = np.asarray(st[leaf], np.float32).reshape(-1)
        b = np.asarray(unpacked[leaf], np.float32).reshape(-1)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.08, (leaf, rel)


def test_mega_tracks_unfused_int8_step_tightly():
    """Against decode_step with the SAME unfused-int8 weights the only
    differences are accumulation order/precision — much tighter bound."""
    cfg = _cfg()
    params = _randomized_params(cfg, seed=3)
    mega = dm.pack_mega(params, cfg, tile_n=256)
    q8 = rwkv7.pack_decode_params(
        params, cfg, quantize_int8=True, fuse_projections=False
    )

    B, C = 1, cfg.hidden_size
    st = rwkv7.init_model_state(cfg, B)
    mst = dm.pack_mega_state(st, cfg)

    key = jax.random.PRNGKey(11)
    for i in range(2):
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (B, C), jnp.float32)
        h_q8, st = rwkv7.decode_step(q8, cfg, x, st)
        h_m, mst = dm.decode_step_mega(mega, cfg, x, mst, interpret=True)
        rel = float(jnp.abs(h_q8 - h_m).max() / (jnp.abs(h_q8).max() + 1e-6))
        # loras are int8 in mega but fp in decode_step's unfused branch,
        # so not bit-identical; still an order tighter than the fp bound
        assert rel < 0.02, (i, rel)


def test_mega_state_pack_roundtrip():
    cfg = _cfg(num_layers=3)
    st = rwkv7.init_model_state(cfg, 1)
    st = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(x.size % 97), x.shape),
        st,
    )
    mst = dm.pack_mega_state(st, cfg)
    back = dm.unpack_mega_state(mst, cfg, dtype=jnp.float32)
    for leaf in ("att_x", "ffn_x", "wkv"):
        np.testing.assert_allclose(
            np.asarray(st[leaf], np.float32),
            np.asarray(back[leaf], np.float32),
            atol=1e-6,
        )
