"""End-to-end CosyVoice pipeline on tiny random-weight models:
text -> speech tokens -> flow mel -> HiFT wav, plus the streaming hop path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.codecs import conformer, flow as flow_lib, hift as hift_lib
from rwkvtts_tpu.infer.cosy_pipeline import CosyPipeline
from rwkvtts_tpu.models import cosy


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text][:8]


@pytest.fixture(scope="module")
def pipe():
    lm_cfg = cosy.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
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
    return CosyPipeline(
        lm_cfg, lm_params, FakeTok(),
        flow_cfg=fcfg, flow_params=fparams,
        hift_cfg=hcfg, hift_params=hparams,
    )


def test_cosy_synthesize_end_to_end(pipe):
    res = pipe.synthesize("hello there", max_new_tokens=12)
    assert res.speech_tokens.ndim == 1 and len(res.speech_tokens) >= 1
    assert res.wav.ndim == 1 and len(res.wav) > 0
    assert np.isfinite(res.wav).all()
    # wav length = tokens * token_mel_ratio * total_upsample
    expected = len(res.speech_tokens) * 2 * (4 * 3 * 4)
    assert len(res.wav) == expected
    assert res.rtf > 0


def test_cosy_synthesize_sfm_fast_decode(pipe):
    """SFM flow (C22) wired into the pipeline: with cfg.sfm + an sfm_head,
    token2wav routes through sfm_inference (ODE starts at t_h, prompt-mel
    span sliced off — reference model/flow/flow.py:132-180) and keeps the
    CFM path's wav-length contract. token2wav only touches the flow/hift
    stacks, so a bare clone carrying them is enough."""
    import dataclasses

    fcfg = dataclasses.replace(pipe.flow_cfg, sfm=True)
    fparams = flow_lib.init_params(jax.random.PRNGKey(7), fcfg)
    clone = CosyPipeline.__new__(CosyPipeline)
    clone.flow_cfg, clone.flow_params = fcfg, fparams
    clone.hift_cfg, clone.hift_params = pipe.hift_cfg, pipe.hift_params

    toks = np.asarray([3, 5, 7, 2, 4], np.int64)
    prompt_toks = [1, 2]
    prompt_mel = np.zeros((2 * len(prompt_toks), fcfg.output_size), np.float32)
    wav = CosyPipeline.token2wav(
        clone, toks, prompt_tokens=prompt_toks, prompt_mel=prompt_mel,
        n_timesteps=2,
    )
    assert np.isfinite(wav).all()
    # prompt mel sliced off: wav covers only the generated tokens
    assert len(wav) == len(toks) * 2 * (4 * 3 * 4)


def test_cosy_streaming_chunks(pipe):
    chunks = list(pipe.synthesize_streaming("hi you", hop_tokens=4, max_new_tokens=10))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()


def test_cosy_synthesize_long_splits(pipe):
    res = pipe.synthesize_long(
        "first part. second part. third part.", token_max_n=6, max_new_tokens=6
    )
    assert res.wav.size > 0
    assert np.isfinite(res.wav).all()
    assert res.speech_tokens.size >= 2


def test_cross_lingual_drops_lm_prompt(pipe, monkeypatch):
    """Cross-lingual: flow keeps the prompt condition, LM gets none
    (frontend.py:185-193)."""
    seen = {}
    orig = pipe.generate_speech_tokens

    def spy(text, prompt_text="", prompt_speech_tokens=(), **kw):
        seen["prompt_text"] = prompt_text
        seen["lm_tokens"] = list(prompt_speech_tokens)
        return orig(text, prompt_text, prompt_speech_tokens, **kw)

    monkeypatch.setattr(pipe, "generate_speech_tokens", spy)
    res = pipe.synthesize_cross_lingual(
        "bonjour", prompt_speech_tokens=[5, 6, 7],
        prompt_mel=np.zeros((6, 16), np.float32), max_new_tokens=8,
    )
    assert seen["prompt_text"] == "" and seen["lm_tokens"] == []
    assert np.isfinite(res.wav).all() and res.wav.size > 0


def test_instruct_modes(pipe, monkeypatch):
    seen = {}
    orig = pipe.generate_speech_tokens

    def spy(text, prompt_text="", prompt_speech_tokens=(), **kw):
        seen["prompt_text"] = prompt_text
        seen["lm_tokens"] = list(prompt_speech_tokens)
        return orig(text, prompt_text, prompt_speech_tokens, **kw)

    monkeypatch.setattr(pipe, "generate_speech_tokens", spy)
    # no transcript: LM speech prompt dropped
    pipe.synthesize_instruct(
        "hello", "speak slowly", prompt_speech_tokens=[1, 2, 3],
        prompt_mel=np.zeros((6, 16), np.float32), max_new_tokens=8,
    )
    assert seen["prompt_text"] == "speak slowly<|endofprompt|>"
    assert seen["lm_tokens"] == []
    # with transcript: speech prompt kept
    pipe.synthesize_instruct(
        "hello", "speak slowly", prompt_text="hi there",
        prompt_speech_tokens=[1, 2, 3],
        prompt_mel=np.zeros((6, 16), np.float32), max_new_tokens=8,
    )
    assert seen["prompt_text"] == "speak slowly<|endofprompt|>hi there"
    assert seen["lm_tokens"] == [1, 2, 3]


def test_voice_convert_no_lm(pipe):
    pipe.speech_tokenizer_fn = lambda wav: np.arange(6) % 100
    src = np.sin(np.linspace(0, 80, 4000)).astype(np.float32)
    res = pipe.voice_convert(
        src, prompt_speech_tokens=[4, 5],
        prompt_mel=np.zeros((4, 16), np.float32),
    )
    assert list(res.speech_tokens) == list(np.arange(6) % 100)
    assert res.wav.size == 6 * 2 * pipe.hift_cfg.total_upsample
    assert np.isfinite(res.wav).all()
    pipe.speech_tokenizer_fn = None


def test_speed_control_changes_length(pipe):
    res1 = pipe.synthesize("hello", max_new_tokens=8, seed=3)
    res2 = pipe.synthesize("hello", max_new_tokens=8, seed=3, speed=2.0)
    assert abs(res2.wav.size * 2 - res1.wav.size) <= 2 * pipe.hift_cfg.total_upsample


def test_frontend_zero_shot_sample_rates(pipe):
    """16 kHz features for tokenizer/x-vector, output-rate mel, frames ==
    2 x tokens (reference frontend.py:164-174)."""
    seen = {}
    pipe.speech_tokenizer_fn = lambda w: (seen.__setitem__("tok_len", len(w)), np.arange(10))[1]
    pipe.spk_embed_fn = lambda w: (seen.__setitem__("emb_len", len(w)), np.zeros(12, np.float32))[1]
    sr = 16000
    wav = np.sin(np.linspace(0, 100, sr)).astype(np.float32)  # 1 s @ 16k
    tokens, mel, emb = pipe.frontend_zero_shot(wav, prompt_sr=sr)
    # tokenizer/x-vector saw the 16 kHz clip unchanged
    assert seen["tok_len"] == sr and seen["emb_len"] == sr
    # mel computed at the 24 kHz output rate: ~50 frames/s available
    assert mel.shape == (2 * len(tokens), pipe.flow_cfg.output_size)
    assert len(tokens) <= 10
    # a 22.05 kHz prompt gets resampled for the 16 kHz features
    wav22 = np.sin(np.linspace(0, 100, 22050)).astype(np.float32)
    tokens2, mel2, _ = pipe.frontend_zero_shot(wav22, prompt_sr=22050)
    assert seen["tok_len"] == 16000
    assert mel2.shape[0] == 2 * len(tokens2)
    pipe.speech_tokenizer_fn = None
    pipe.spk_embed_fn = None


def test_cosy_voice_library(pipe, tmp_path):
    """spk2info parity: persist a voice condition once, reuse across a
    fresh library instance (infer/voices.py)."""
    from rwkvtts_tpu.infer.voices import CosyVoiceLibrary

    lib = CosyVoiceLibrary(str(tmp_path / "voices"))
    pipe.speech_tokenizer_fn = lambda w: np.arange(8)
    pipe.spk_embed_fn = lambda w: np.ones(12, np.float32)
    wav = np.sin(np.linspace(0, 60, 16000)).astype(np.float32)
    lib.register_from_wav(pipe, "alice", wav, prompt_text="hi")
    pipe.speech_tokenizer_fn = None
    pipe.spk_embed_fn = None

    lib2 = CosyVoiceLibrary(str(tmp_path / "voices"))
    assert lib2.speakers() == ["alice"]
    v = lib2.get("alice")
    assert v["text"] == "hi" and v["tokens"].shape[0] <= 8
    assert v["mel"].shape == (2 * v["tokens"].shape[0], pipe.flow_cfg.output_size)
    res = lib2.synthesize(pipe, "alice", "hello voice", max_new_tokens=8)
    assert res.wav.size > 0 and np.isfinite(res.wav).all()
    with pytest.raises(KeyError):
        lib2.get("bob")

    # multi-clip registration: the embedding is the centroid of the clips'
    # x-vectors (reference convert_embeddings_2_pt.py: KMeans n_clusters=1)
    embs = iter([np.ones(12, np.float32), 3 * np.ones(12, np.float32)])
    pipe.speech_tokenizer_fn = lambda w: np.arange(8)
    pipe.spk_embed_fn = lambda w: next(embs)
    lib2.register_from_wavs(pipe, "carol", [wav, wav], prompt_text="yo")
    pipe.speech_tokenizer_fn = None
    pipe.spk_embed_fn = None
    np.testing.assert_allclose(lib2.get("carol")["emb"], 2 * np.ones(12))
