"""WER math + meta.lst parsing tests for the seed-tts-eval harness."""
import numpy as np
import pytest

from rwkvtts_tpu.eval import seed_tts


def test_normalize_en():
    assert seed_tts.normalize_text("Hello, World!", "en") == ["hello", "world"]
    assert seed_tts.normalize_text("don't stop", "en") == ["don't", "stop"]


def test_normalize_zh():
    assert seed_tts.normalize_text("你好，世界。", "zh") == ["你", "好", "世", "界"]


def test_wer_exact_match():
    r = seed_tts.wer("hello world", "Hello, world!", "en")
    assert r.wer == 0.0


def test_wer_known_ops():
    # ref: a b c ; hyp: a x c d  -> 1 sub + 1 ins over 3 ref tokens
    r = seed_tts.wer("a b c", "a x c d", "en")
    assert abs(r.wer - 2 / 3) < 1e-9
    assert abs(r.subs - 1 / 3) < 1e-9
    assert abs(r.inse - 1 / 3) < 1e-9
    assert r.dele == 0.0


def test_wer_deletion():
    r = seed_tts.wer("a b c d", "a d", "en")
    assert abs(r.dele - 2 / 4) < 1e-9
    assert r.wer == 0.5


def test_corpus_wer_weighted():
    pairs = [("a b", "a b"), ("c d", "x y")]
    r = seed_tts.corpus_wer(pairs, "en")
    assert abs(r.wer - 2 / 4) < 1e-9


def test_meta_lst(tmp_path):
    p = tmp_path / "meta.lst"
    p.write_text("id1|提示文本|prompt-wavs/a.wav|目标文本\n\nid2|p|w.wav|t\n")
    rows = seed_tts.read_meta_lst(str(p))
    assert len(rows) == 2
    assert rows[0].utt_id == "id1"
    assert rows[0].prompt_wav == "prompt-wavs/a.wav"
    assert rows[1].text == "t"


def test_evaluate_wer_with_fake_asr():
    out = seed_tts.evaluate_wer(
        [("w1.wav", "hello world"), ("w2.wav", "good day")],
        "en",
        transcribe_fn=lambda p: {"w1.wav": "hello world", "w2.wav": "good night"}[p],
    )
    assert abs(out["wer"] - 1 / 4) < 1e-9


def test_sim_eval_cosine_and_campplus():
    """SIM eval (the reference's TODO, eval/README.md:14): cosine math +
    the native CAM++ embedder path on tiny configs."""
    import jax

    from rwkvtts_tpu.codecs import campplus as cp
    from rwkvtts_tpu.eval import sim

    assert sim.cosine_sim([1, 0], [1, 0]) == pytest.approx(1.0)
    assert sim.cosine_sim([1, 0], [0, 1]) == pytest.approx(0.0)
    assert sim.cosine_sim([1, 1], [-1, -1]) == pytest.approx(-1.0)
    assert sim.cosine_sim([0, 0], [1, 1]) == 0.0

    cfg = cp.CampplusConfig(
        m_channels=8, init_channels=16, growth_rate=8,
        block_layers=(2, 2, 2), embedding_size=16,
    )
    params = cp.init_params(jax.random.PRNGKey(0), cfg)
    fn = sim.campplus_embed_fn(params, cfg)
    rng = np.random.default_rng(0)
    wav_a = rng.standard_normal(16000).astype(np.float32) * 0.1
    wav_b = rng.standard_normal(16000).astype(np.float32) * 0.1
    res = sim.evaluate_sim([(wav_a, wav_a), (wav_a, wav_b)], fn)
    # same clip => sim 1; different clips => strictly less
    assert res.per_utt[0] == pytest.approx(1.0, abs=1e-4)
    assert res.per_utt[1] < res.per_utt[0]
    assert res.mean == pytest.approx(np.mean(res.per_utt))
