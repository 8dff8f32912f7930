"""Parity tests for the B=64 whole-step decode megakernel
(ops/decode_mega_b64.py).

Interpret mode on CPU: the kernel math must match models/rwkv7.decode_step
(the production XLA step) through multiple steps at the fixed 64-row
batch, including the v_first residual, state carry, and token-shift
states. Same bound structure as tests/test_decode_mega.py: a loose bound
vs fp params (covers int8 quantization of projections AND lora-out
matrices) and a tighter bound vs the unfused-int8 XLA step (shared
projection quantization; lora-outs still differ)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.models import rwkv7
from rwkvtts_tpu.ops import decode_mega_b64 as dmb


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
    for name in ("w1", "a1", "v1", "g1", "output"):
        k, sub = jax.random.split(k)
        att[name] = 0.1 * jax.random.normal(sub, att[name].shape)
    ffn = dict(params["blocks"]["ffn"])
    k, sub = jax.random.split(k)
    ffn["value"] = 0.1 * jax.random.normal(sub, ffn["value"].shape)
    params["blocks"] = dict(params["blocks"], att=att, ffn=ffn)
    return params


def test_spec_tiles_cover_stream():
    cfg = _cfg()
    spec = dmb.build_spec_b64(cfg, tile_n=128)
    kinds = [t.kind for t in spec.tiles]
    C, TN, P = spec.C, spec.TN, spec.P
    assert kinds.count("rkv") == 3 * C // TN
    assert kinds.count("glue") == P
    assert kinds.count("prep") == 1
    assert kinds.count("out") == C // TN
    assert kinds.count("ffnk") == 4 * C // TN
    assert kinds.count("ffnv") == 4 * (C // TN)
    assert sum(t.relu2 for t in spec.tiles) == 1
    assert spec.tiles[-1].last
    assert spec.tiles[spec.prep_t].kind == "prep"
    # weight-bearing count matches the packed stream length
    assert spec.TW == len([t for t in spec.tiles
                           if t.kind in ("rkv", "lora", "out", "ffnk", "ffnv")])


def test_state_pack_roundtrip():
    cfg = _cfg()
    st = rwkv7.init_model_state(cfg, dmb.B)
    st = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(0), x.shape), st
    )
    mst = dmb.pack_mega_state_b64(st, cfg)
    assert mst["wkv"].shape == (cfg.num_layers, cfg.hidden_size // 128, 4096, 128)
    back = dmb.unpack_mega_state_b64(mst, cfg, dtype=jnp.float32)
    for leaf in ("att_x", "ffn_x", "wkv"):
        a = np.asarray(st[leaf], np.float32)
        b = np.asarray(back[leaf], np.float32).reshape(a.shape)
        # bf16 round-trip bound
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)


def test_mega_b64_matches_decode_step_multi_step():
    cfg = _cfg()
    params = _randomized_params(cfg)
    mega = dmb.pack_mega_b64(params, cfg, tile_n=128)

    Bn, C = dmb.B, cfg.hidden_size
    st = rwkv7.init_model_state(cfg, Bn)
    mst = dmb.pack_mega_state_b64(st, cfg)

    key = jax.random.PRNGKey(7)
    step_mega = functools.partial(dmb.decode_step_mega_b64, interpret=True)
    for i in range(3):
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (Bn, C), jnp.float32)
        h_ref, st = rwkv7.decode_step(params, cfg, x, st)
        h_m, mst = step_mega(mega, cfg, x, mst)
        rel = float(
            jnp.abs(h_ref - h_m).max() / (jnp.abs(h_ref).max() + 1e-6)
        )
        assert rel < 0.05, (i, rel)

    unpacked = dmb.unpack_mega_state_b64(mst, cfg, dtype=jnp.float32)
    for leaf in ("att_x", "ffn_x", "wkv"):
        a = np.asarray(st[leaf], np.float32)
        b = np.asarray(unpacked[leaf], np.float32).reshape(a.shape)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 0.08, (leaf, rel)


def test_spark_generate_mega_b64_matches_xla_greedy():
    """spark_generate_mega_b64 reproduces the XLA generate's greedy tokens
    end to end (prefill -> packed state -> scan -> EOS bookkeeping). Head
    logits are scaled up so greedy gaps dwarf the int8 noise — this tests
    ROUTING, not the quantization bound (covered above)."""
    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import spark

    cfg = spark.default_config(
        hidden_size=128, num_layers=2, dtype=jnp.float32,
        wkv_chunk=4, remat=False,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    params["head"] = 10.0 * params["head"]

    mega = dmb.pack_mega_b64(params, cfg.backbone, tile_n=128)
    spec = mega.pop("spec")
    q8 = rwkv7.pack_decode_params(
        params, cfg.backbone, quantize_int8=True, fuse_projections=False
    )

    Bn, T = dmb.B, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (Bn, T), 0, 30)
    modality = jnp.full((Bn, T), spark.MOD_TEXT, jnp.int32)
    mask = jnp.ones((Bn, T), jnp.int32)
    key = jax.random.PRNGKey(5)

    toks_x, len_x = gen.spark_generate(
        q8, cfg, tokens, modality, mask, key,
        max_new_tokens=4, top_k=1, top_p=1.0,
    )
    toks_m, len_m = gen.spark_generate_mega_b64(
        params, mega, spec, cfg, tokens, modality, mask, key,
        max_new_tokens=4, top_k=1, top_p=1.0,
    )
    np.testing.assert_array_equal(np.asarray(toks_x), np.asarray(toks_m))
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_m))


def test_mega_b64_tracks_unfused_int8_step():
    cfg = _cfg()
    params = _randomized_params(cfg, seed=3)
    mega = dmb.pack_mega_b64(params, cfg, tile_n=128)
    q8 = rwkv7.pack_decode_params(
        params, cfg, quantize_int8=True, fuse_projections=False
    )

    Bn, C = dmb.B, cfg.hidden_size
    st = rwkv7.init_model_state(cfg, Bn)
    mst = dmb.pack_mega_state_b64(st, cfg)

    key = jax.random.PRNGKey(11)
    for i in range(2):
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (Bn, C), jnp.float32)
        h_q8, st = rwkv7.decode_step(q8, cfg, x, st)
        h_m, mst = dmb.decode_step_mega_b64(mega, cfg, x, mst, interpret=True)
        rel = float(jnp.abs(h_q8 - h_m).max() / (jnp.abs(h_q8).max() + 1e-6))
        assert rel < 0.02, (i, rel)


def test_cosy_generate_mega_b64_matches_xla_greedy():
    """cosy_generate_mega_b64 (RAS sampling + EOS suppression) reproduces
    the XLA cosy generate's greedy tokens end to end — the Cosy layout of
    the batched-offline megakernel route (BASELINE config #3). Head logits
    scaled up so greedy gaps dwarf the int8 noise: tests ROUTING."""
    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import cosy

    cfg = cosy.default_config(
        hidden_size=128, num_layers=2, dtype=jnp.float32,
        wkv_chunk=4, remat=False,
    )
    params = cosy.init_params(jax.random.PRNGKey(0), cfg)
    params["head"] = 10.0 * params["head"]

    mega = dmb.pack_mega_b64(params, cfg.backbone, tile_n=128)
    spec = mega.pop("spec")
    q8 = rwkv7.pack_decode_params(
        params, cfg.backbone, quantize_int8=True, fuse_projections=False
    )

    Bn, T = dmb.B, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (Bn, T), 0, 30)
    modality = jnp.full((Bn, T), cosy.MOD_TEXT, jnp.int32)
    mask = jnp.ones((Bn, T), jnp.int32)
    key = jax.random.PRNGKey(5)

    toks_x, len_x = gen.cosy_generate(
        q8, cfg, tokens, modality, mask, key,
        max_new_tokens=4, top_k=1, top_p=1.0,
    )
    toks_m, len_m = gen.cosy_generate_mega_b64(
        params, mega, spec, cfg, tokens, modality, mask, key,
        max_new_tokens=4, top_k=1, top_p=1.0,
    )
    np.testing.assert_array_equal(np.asarray(toks_x), np.asarray(toks_m))
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_m))


def test_xy_generate_mega_b64_matches_xla():
    """xy_generate's mega route (B=64 whole-step kernel under the
    staggered flush automaton) reproduces the XLA path's frames at
    near-greedy temperature with scaled channel heads — routing test for
    the third model family on the megakernel path."""
    import dataclasses

    from rwkvtts_tpu.infer.generate import xy_generate
    from rwkvtts_tpu.models import xy

    cfg = xy.default_config(
        hidden_size=128, num_layers=2, dtype=jnp.float32,
        remat=False, wkv_chunk=4,
    )
    cfg = dataclasses.replace(
        cfg, text_vocab_size=700, speech_vocab_size=32, text_shift_size=600
    )
    params = xy.init_params(jax.random.PRNGKey(0), cfg)
    params["heads"] = {
        k: 10.0 * v for k, v in params["heads"].items()
    }

    mega = dmb.pack_mega_b64(params, cfg.backbone, tile_n=128)
    spec = mega.pop("spec")
    q8 = rwkv7.pack_decode_params(
        params, cfg.backbone, quantize_int8=True, fuse_projections=False
    )

    Bn, T = dmb.B, 6
    prompt = np.full((Bn, T, 8), cfg.speech_pad_id, dtype=np.int64)
    prompt[:, :, 0] = cfg.text_pad_id
    prompt[:, :3, 0] = [1, 2, 3]
    mask = np.ones((Bn, T), dtype=np.int32)
    key = jax.random.PRNGKey(7)

    frames_x, n_x = xy_generate(
        q8, cfg, jnp.asarray(prompt), jnp.asarray(mask), key,
        max_new_tokens=4, min_new_tokens=1, temperature=0.01,
    )
    frames_m, n_m = xy_generate(
        params, cfg, jnp.asarray(prompt), jnp.asarray(mask), key,
        max_new_tokens=4, min_new_tokens=1, temperature=0.01,
        mega=mega, mega_spec=spec,
    )
    np.testing.assert_array_equal(np.asarray(frames_x), np.asarray(frames_m))
    np.testing.assert_array_equal(np.asarray(n_x), np.asarray(n_m))
