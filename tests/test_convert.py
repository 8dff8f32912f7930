"""Converter tests: BlinkDL round-trip, fla import, x_x migration,
speech-model surgery, flattened export."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.convert import rwkv7_ckpt, speech_init
from rwkvtts_tpu.models import rwkv7, spark, xy


def _cfg(vocab=64):
    return rwkv7.RWKV7Config(
        vocab_size=vocab, hidden_size=32, num_layers=2, head_size=8,
        gate_lora=8, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )


def test_blinkdl_roundtrip_exact():
    cfg = _cfg()
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    sd = rwkv7_ckpt.rwkv7_to_blinkdl(params, cfg)
    params2 = rwkv7_ckpt.blinkdl_to_rwkv7(sd, cfg)

    flat1 = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, params))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, params2)))
    # layer-0 v-lora placeholders are zeroed by the importer; skip them at i=0
    for path, v1 in flat1:
        key = jax.tree_util.keystr(path)
        v2 = flat2[path] if path in flat2 else None
        assert v2 is not None, key
        if any(s in key for s in ("'v0'", "'v1'", "'v2'")):
            np.testing.assert_allclose(v1[1:], v2[1:], atol=1e-6, err_msg=key)
        else:
            np.testing.assert_allclose(v1, v2, atol=1e-6, err_msg=key)


def _blinkdl_to_fla_sd(sd):
    """Independent re-derivation of the naming map (utils/convert_rwkv.py
    inverted) to cross-check fla_to_rwkv7."""
    out = {}
    for k, v in sd.items():
        if k == "emb.weight":
            out["model.embeddings.weight"] = v
        elif k == "head.weight":
            out["lm_head.weight"] = v
        elif k == "ln_out.weight":
            out["model.norm.weight"] = v
        elif k == "ln_out.bias":
            out["model.norm.bias"] = v
        elif ".ln0." in k:
            out[k.replace("blocks.0.ln0", "model.layers.0.pre_norm")] = v
        elif ".ln1." in k:
            out[k.replace("blocks.", "model.layers.").replace("ln1", "attn_norm")] = v
        elif ".ln2." in k:
            out[k.replace("blocks.", "model.layers.").replace("ln2", "ffn_norm")] = v
        else:
            nk = k.replace("blocks.", "model.layers.").replace(".att.", ".attn.").replace(".ffn.", ".ffn.")
            for torch_name, ours in [
                ("receptance.weight", "r_proj.weight"),
                ("output.weight", "o_proj.weight"),
            ]:
                nk = nk.replace(torch_name, ours)
            if ".attn." in nk:
                nk = nk.replace("key.weight", "k_proj.weight").replace("value.weight", "v_proj.weight")
            nk = nk.replace("ln_x.weight", "g_norm.weight").replace("ln_x.bias", "g_norm.bias")
            # loras: blinkdl math orientation -> fla Linear orientation
            for s in "wavg":
                if nk.endswith(f".{s}0"):
                    nk = nk[:-3] + f".{s}_lora.lora.2.bias"
                    v = v.reshape(-1)
                elif nk.endswith(f".{s}1"):
                    nk = nk[:-3] + f".{s}_lora.lora.0.weight"
                    v = np.ascontiguousarray(np.asarray(v).T)
                elif nk.endswith(f".{s}2"):
                    nk = nk[:-3] + f".{s}_lora.lora.2.weight"
                    v = np.ascontiguousarray(np.asarray(v).T)
            out[nk] = v
    return out


def test_fla_import_matches_blinkdl_import():
    cfg = _cfg()
    params = rwkv7.init_params(jax.random.PRNGKey(1), cfg)
    sd_b = rwkv7_ckpt.rwkv7_to_blinkdl(params, cfg)
    sd_f = _blinkdl_to_fla_sd(sd_b)
    p_b = rwkv7_ckpt.blinkdl_to_rwkv7(sd_b, cfg)
    p_f = rwkv7_ckpt.fla_to_rwkv7(sd_f, cfg)
    j1 = jax.tree_util.tree_leaves_with_path(p_b)
    j2 = dict(jax.tree_util.tree_leaves_with_path(p_f))
    for path, v1 in j1:
        np.testing.assert_allclose(v1, j2[path], atol=1e-6, err_msg=jax.tree_util.keystr(path))
    # and the imported model must run + match the original forward
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (1, 8)))
    h0 = rwkv7.forward(params, cfg, input_ids=ids)
    h1 = rwkv7.forward(jax.tree.map(jnp.asarray, p_f), cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-4)


def test_x_x_migration():
    x_x = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    sd = {"model.layers.0.attn.x_x": x_x}
    out = rwkv7_ckpt.migrate_x_x(sd)
    assert "model.layers.0.attn.x_x" not in out
    np.testing.assert_allclose(out["model.layers.0.attn.x_r"].reshape(-1), x_x[0])
    np.testing.assert_allclose(out["model.layers.0.attn.x_g"].reshape(-1), x_x[5])


def test_infer_config():
    cfg = _cfg()
    params = rwkv7.init_params(jax.random.PRNGKey(2), cfg)
    sd = rwkv7_ckpt.rwkv7_to_blinkdl(params, cfg)
    kw = rwkv7_ckpt.infer_config_kwargs(sd)
    assert kw == dict(vocab_size=64, hidden_size=32, num_layers=2, head_size=8)


def test_spark_from_text_and_flat_export():
    scfg = spark.SparkTTSConfig(
        backbone=_cfg(vocab=10), text_vocab_size=20, audio_global_vocab_size=8
    )
    sp = spark.init_params(jax.random.PRNGKey(3), scfg)

    # synthesize a "text model" fla sd with matching backbone shape
    tcfg = rwkv7.RWKV7Config(
        vocab_size=20, hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    tparams = rwkv7.init_params(jax.random.PRNGKey(4), tcfg)
    t_sd = _blinkdl_to_fla_sd(rwkv7_ckpt.rwkv7_to_blinkdl(tparams, tcfg))

    out = speech_init.spark_from_text(t_sd, sp, scfg)
    np.testing.assert_allclose(out["text_embedder"], t_sd["model.embeddings.weight"])
    np.testing.assert_allclose(
        np.asarray(out["ln_out_scale"]), np.asarray(tparams["ln_out_scale"])
    )
    # semantic embedding untouched (fresh)
    np.testing.assert_allclose(np.asarray(out["embedding"]), np.asarray(sp["embedding"]))

    flat = speech_init.spark_to_flat(out, scfg)
    V = 10 + 3 + 8 + 20
    assert flat["emb.weight"].shape == (V, 32)
    assert flat["head.weight"].shape == (V, 32)
    np.testing.assert_allclose(flat["head.weight"][10:], 0.0)
    # row order contract: [semantic | tag | global | text]
    np.testing.assert_allclose(flat["emb.weight"][:10], np.asarray(out["embedding"]))
    np.testing.assert_allclose(flat["emb.weight"][10:13], np.asarray(out["tts_tag_embedder"]))
    np.testing.assert_allclose(flat["emb.weight"][13:21], np.asarray(out["global_embedder"]))


def test_xy_from_text():
    xcfg = xy.XYConfig(
        backbone=_cfg(vocab=0).__class__(
            vocab_size=0, hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
            dtype=jnp.float32, wkv_chunk=4, remat=False,
            with_embedding=False, with_head=False,
        ),
        text_vocab_size=30, speech_vocab_size=8, num_channels=3, text_shift_size=20,
    )
    xp = xy.init_params(jax.random.PRNGKey(5), xcfg)

    tcfg = rwkv7.RWKV7Config(
        vocab_size=20, hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    tparams = rwkv7.init_params(jax.random.PRNGKey(6), tcfg)
    t_sd = _blinkdl_to_fla_sd(rwkv7_ckpt.rwkv7_to_blinkdl(tparams, tcfg))

    out = speech_init.xy_from_text(t_sd, xp, xcfg)
    np.testing.assert_allclose(out["embs"]["0"][:20], t_sd["model.embeddings.weight"])
    np.testing.assert_allclose(out["heads"]["0"][:, :20], t_sd["lm_head.weight"].T)
    # extended rows differ from zero / fresh values
    assert np.abs(out["embs"]["0"][20:]).sum() > 0
    # ch1.. untouched
    np.testing.assert_allclose(out["embs"]["1"], np.asarray(xp["embs"]["1"]))
