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
    mst = dm.pack_mega_state(st, cfg, state_bf16=False)

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
    mst = dm.pack_mega_state(st, cfg, state_bf16=False)

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


def test_cosy_chunk_mega_matches_xla_greedy():
    """The mega-routed cosy_decode_chunk reproduces the XLA chunk's greedy
    tokens end to end (prefill -> chunks -> EOS bookkeeping). Head logits
    are scaled up so greedy gaps dwarf the int8 noise — the comparison
    tests ROUTING (state carry, embed/head split, RAS plumbing), not the
    quantization error bound (covered above)."""
    from rwkvtts_tpu.infer import generate as gen
    from rwkvtts_tpu.models import cosy

    cfg = cosy.default_config(
        hidden_size=128, num_layers=2, dtype=jnp.float32,
        wkv_chunk=4, remat=False,
    )
    params = cosy.init_params(jax.random.PRNGKey(0), cfg)
    params["head"] = 10.0 * params["head"]

    mega = __import__(
        "rwkvtts_tpu.ops.decode_mega", fromlist=["pack_mega"]
    ).pack_mega(params, cfg.backbone, tile_n=128)
    spec = mega.pop("spec")
    q8 = rwkv7.pack_decode_params(
        params, cfg.backbone, quantize_int8=True, fuse_projections=False
    )

    T = 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, 30)
    modality = jnp.zeros((1, T), jnp.int32)
    mask = jnp.ones((1, T), jnp.int32)

    carry_x = gen.cosy_prefill_carry(q8, cfg, tokens, modality, mask)
    carry_m = gen.cosy_prefill_carry(
        params, cfg, tokens, modality, mask, mega_state=True
    )
    key = jax.random.PRNGKey(5)
    toks_x = toks_m = None
    for i in range(2):
        carry_x, tx, _ = gen.cosy_decode_chunk(
            q8, cfg, carry_x, key, chunk_len=4, top_k=1, top_p=1.0,
        )
        carry_m, tm, _ = gen.cosy_decode_chunk(
            params, cfg, carry_m, key, chunk_len=4, top_k=1, top_p=1.0,
            mega=mega, mega_spec=spec,
        )
        np.testing.assert_array_equal(np.asarray(tx), np.asarray(tm))


def test_streaming_session_with_megakernel():
    """stream_synthesize end to end with decode_megakernel=True: prefill
    builds the mega carry, every LM chunk routes through the kernel, and
    audio chunks come out (tiny flow/HiFT; LM at the kernel-minimum
    hidden 128)."""
    from rwkvtts_tpu.codecs import conformer, flow as flow_lib, hift as hift_lib
    from rwkvtts_tpu.infer import streaming
    from rwkvtts_tpu.infer.cosy_pipeline import CosyPipeline
    from rwkvtts_tpu.models import cosy

    lm_cfg = cosy.default_config(
        hidden_size=128, num_layers=2, dtype=jnp.float32,
        wkv_chunk=16, remat=False,
    )
    lm_params = cosy.init_params(jax.random.PRNGKey(0), lm_cfg)
    fcfg = flow_lib.FlowConfig(
        input_size=24, output_size=16, spk_embed_dim=12, vocab_size=6562,
        encoder=conformer.UpsampleConformerConfig(
            input_size=24, output_size=24, attention_heads=2,
            linear_units=48, num_blocks=1, num_up_blocks=1,
        ),
        estimator=flow_lib.EstimatorConfig(
            in_channels=16 * 4, out_channels=16, channels=(16,),
            n_blocks=1, num_mid_blocks=1, num_heads=2, attention_head_dim=8,
            causal=True, static_chunk_size=2,
        ),
        n_timesteps=2,
    )
    fparams = flow_lib.init_params(jax.random.PRNGKey(1), fcfg)
    hcfg = hift_lib.HiFTConfig(
        in_channels=16, base_channels=32, nb_harmonics=2,
        upsample_rates=(4, 3), upsample_kernel_sizes=(8, 7),
        istft_n_fft=16, istft_hop_len=4,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        source_resblock_kernel_sizes=(7, 7),
        source_resblock_dilation_sizes=((1, 2), (1, 2)),
        f0_cond_channels=16,
    )
    hparams = hift_lib.init_params(jax.random.PRNGKey(2), hcfg)

    class _Tok:
        def encode(self, text):
            return [ord(c) % 200 + 1 for c in text][:8]

    pipe = CosyPipeline(
        lm_cfg, lm_params, _Tok(), flow_cfg=fcfg, flow_params=fparams,
        hift_cfg=hcfg, hift_params=hparams, decode_megakernel=True,
        mega_tile_n=128,
    )
    assert pipe.lm_mega is not None and pipe.lm_mega_spec is not None
    scfg = streaming.StreamConfig(
        token_hop_len=4, ctx_tokens=4, n_timesteps=2, lm_chunk=4,
    )
    chunks = list(
        streaming.stream_synthesize(
            pipe, "hello", stream_cfg=scfg, max_new_tokens=12, seed=1
        )
    )
    assert chunks and sum(len(c) for c in chunks) > 0


def test_mega_state_pack_roundtrip():
    cfg = _cfg(num_layers=3)
    st = rwkv7.init_model_state(cfg, 1)
    st = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(x.size % 97), x.shape),
        st,
    )
    mst = dm.pack_mega_state(st, cfg, state_bf16=False)
    back = dm.unpack_mega_state(mst, cfg, dtype=jnp.float32)
    for leaf in ("att_x", "ffn_x", "wkv"):
        np.testing.assert_allclose(
            np.asarray(st[leaf], np.float32),
            np.asarray(back[leaf], np.float32),
            atol=1e-6,
        )
