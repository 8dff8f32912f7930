"""HF-export round-trip: our params -> fla sd -> our params, exact."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.convert import export_hf, rwkv7_ckpt, speech_init
from rwkvtts_tpu.models import rwkv7, spark


def _cfg():
    return rwkv7.RWKV7Config(
        vocab_size=32, hidden_size=32, num_layers=2, head_size=8,
        gate_lora=8, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )


def test_fla_roundtrip():
    cfg = _cfg()
    params = rwkv7.init_params(jax.random.PRNGKey(0), cfg)
    sd = export_hf.rwkv7_to_fla(params, cfg)
    back = rwkv7_ckpt.fla_to_rwkv7(sd, cfg)
    ref = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, params))
    got = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, v in ref:
        key = jax.tree_util.keystr(path)
        if any(s in key for s in ("'v0'", "'v1'", "'v2'")):
            np.testing.assert_allclose(v[1:], got[path][1:], atol=1e-6, err_msg=key)
        else:
            np.testing.assert_allclose(v, got[path], atol=1e-6, err_msg=key)


def test_spark_save_pretrained(tmp_path):
    import pytest

    pytest.importorskip("safetensors")
    scfg = spark.SparkTTSConfig(
        backbone=_cfg(), text_vocab_size=40, audio_global_vocab_size=16
    )
    params = spark.init_params(jax.random.PRNGKey(1), scfg)
    out = export_hf.save_pretrained(params, scfg, str(tmp_path / "m"), kind="spark")

    from rwkvtts_tpu.codecs.torch_import import load_safetensors

    sd = load_safetensors(str(tmp_path / "m" / "model.safetensors"))
    back = speech_init.spark_from_pretrained_sd(sd, scfg)
    np.testing.assert_allclose(
        np.asarray(params["text_embedder"]), back["text_embedder"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]), back["head"], atol=1e-6
    )
    import json
    import os

    cfgj = json.load(open(os.path.join(out, "config.json")))
    assert cfgj["architectures"] == ["RWKV7ForSpeech"]


def test_asr_save_pretrained_roundtrip(tmp_path):
    """ASR export (audio_lm + llm + projectors, whisper tower excluded —
    the reference's own contract, export_rwkv_asr_audio_lm.py:26-44)
    round-trips exactly and the re-imported model transcribes identically."""
    import pytest

    pytest.importorskip("safetensors")
    from rwkvtts_tpu.models import asr, whisper

    llm = rwkv7.RWKV7Config(
        vocab_size=65536, hidden_size=32, num_layers=2, head_size=8,
        gate_lora=8, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    adapter = rwkv7.RWKV7Config(
        vocab_size=8193, hidden_size=16, num_layers=1, head_size=8,
        gate_lora=8, dtype=jnp.float32, wkv_chunk=4, remat=False,
        with_head=False, with_embedding=False,
    )
    wcfg = whisper.WhisperEncoderConfig(
        n_mels=8, d_model=16, heads=2, layers=1, ffn_dim=32,
    )
    cfg = asr.ASRConfig(llm=llm, adapter=adapter, variant="whisper",
                        whisper=wcfg)
    params = asr.init_params(jax.random.PRNGKey(3), cfg)
    out = export_hf.save_pretrained(params, cfg, str(tmp_path / "a"), kind="asr")

    from rwkvtts_tpu.codecs.torch_import import load_safetensors

    sd = load_safetensors(str(tmp_path / "a" / "model.safetensors"))
    back = speech_init.asr_from_pretrained_sd(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(params["projector"]["w"]), back["projector"]["w"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["projector1"]["w"]), back["projector1"]["w"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["llm"]["head"]), back["llm"]["head"], atol=1e-6
    )
    # adapter blocks round-trip (layer-0 v-lora rows are synthesized)
    np.testing.assert_allclose(
        np.asarray(params["adapter"]["blocks"]["att"]["key"]),
        back["adapter"]["blocks"]["att"]["key"], atol=1e-6,
    )
