"""Production serving boot path: checkpoint file -> build_pipeline ->
ContinuousTTSService -> one request, on CPU with a tiny exported model.
Covers what `rwkvtts-serve` does minus the HTTP listener (that layer is
tested in tests/test_serving.py) — including the new decode knobs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.convert import export_hf
from rwkvtts_tpu.models import spark
from rwkvtts_tpu.serving import launch, service as svc


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    pytest.importorskip("safetensors")
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("ckpt")
    out = export_hf.save_pretrained(params, cfg, str(d), kind="spark")
    return f"{out}/model.safetensors"


def test_launcher_boot_and_serve(ckpt, monkeypatch):
    # the tokenizer file download/lookup is heavyweight; serve with a stub
    class Tok:
        def encode(self, t):
            return [ord(c) % 200 + 1 for c in t]

    monkeypatch.setattr(
        "rwkvtts_tpu.utils.tokenizer.get_world_tokenizer",
        lambda n_spct=0: Tok(),
    )
    pipe = launch.build_pipeline(ckpt, packed_wkv=False, state_bf16=True)
    assert pipe.cfg.backbone.decode_state_bf16
    tts = launch.build_service(
        pipe, continuous=True, n_slots=2, chunk=8, max_new_tokens=16,
        warmup=False,
    )
    try:
        resp = tts.synthesize(
            svc.TTSRequest(text="boot", global_tokens=[1] * 32,
                           max_new_tokens=8),
            timeout=600,
        )
        assert resp.error is None
        assert resp.wav is not None
    finally:
        tts.close()


def test_launcher_rejects_bad_combo(ckpt, monkeypatch):
    class Tok:
        def encode(self, t):
            return [1, 2]

    monkeypatch.setattr(
        "rwkvtts_tpu.utils.tokenizer.get_world_tokenizer",
        lambda n_spct=0: Tok(),
    )
    # packed + bf16 state is exclusive: pack_decode_state raises when the
    # service builds its carry
    pipe = launch.build_pipeline(ckpt, packed_wkv=True, state_bf16=True)
    with pytest.raises(ValueError):
        launch.build_service(pipe, continuous=True, n_slots=2, warmup=False)
