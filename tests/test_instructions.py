"""Instruction-augmentation generators (reference utilitie.py:44-360):
row layouts, <|endofprompt|> placement, span-tag balance, seedability."""
import random
import re

import pytest

from rwkvtts_tpu.data import instructions as I


def test_every_family_places_endofprompt_before_text():
    rng = random.Random(0)
    for kind in I.KINDS:
        for lang in ("zh", "en"):
            out = I.instruction("hello world", kind, lang, rng)
            head, sep, tail = out.partition(I.END_OF_PROMPT)
            assert sep == I.END_OF_PROMPT, out
            assert tail == "hello world"
            assert head and I.END_OF_PROMPT not in head


def test_styles_come_from_the_reference_vocab():
    rng = random.Random(1)
    checks = {
        "emotion": I.EMOTIONS_ZH + I.EMOTIONS_EN,
        "rate": I.SPEAKING_RATES_ZH + I.SPEAKING_RATES_EN,
        "dialect": I.DIALECTS_ZH + I.DIALECTS_EN,
        "role": I.ROLE_PLAYINGS_ZH + I.ROLE_PLAYINGS_EN,
    }
    for kind, vocab in checks.items():
        for lang in ("zh", "en"):
            for _ in range(20):
                head = I.instruction("x", kind, lang, rng).split(
                    I.END_OF_PROMPT
                )[0]
                assert any(s in head for s in vocab), (kind, lang, head)


def test_explicit_style_and_seed_are_deterministic():
    a = I.dialect_instruction("text", "en", random.Random(7), style="Cantonese")
    assert "Cantonese" in a and a.endswith(I.END_OF_PROMPT + "text")
    r1 = I.mixed_instruction("some words here now", "en", random.Random(3))
    r2 = I.mixed_instruction("some words here now", "en", random.Random(3))
    assert r1 == r2


def test_vocal_bursts_insert_one_marker():
    rng = random.Random(2)
    for _ in range(50):
        out = I.add_vocal_bursts("one two three four five", rng)
        n = sum(out.count(b) for b in I.VOCAL_BURSTS)
        assert n == 1, out
        assert re.sub(r"\s*\[(laughter|breath)\]\s*", " ", out).split() == [
            "one", "two", "three", "four", "five",
        ]


@pytest.mark.parametrize(
    "text", ["short", "a few english words in this sentence", "你好吗朋友", "这是一个比较长的中文句子用于测试跨度"]
)
def test_vocal_features_are_balanced_spans(text):
    rng = random.Random(3)
    for _ in range(25):
        out = I.add_vocal_features(text, rng)
        m = re.findall(r"<(/?)(laughter|strong)>", out)
        assert len(m) == 2
        assert m[0][0] == "" and m[1][0] == "/" and m[0][1] == m[1][1], out
        # stripping tags restores the original text
        assert re.sub(r"</?(laughter|strong)>", "", out) == text


def test_mixed_instruction_layout():
    rng = random.Random(4)
    for lang in ("zh", "en"):
        for _ in range(30):
            out = I.mixed_instruction("content words go here", lang, rng)
            assert out.count(I.END_OF_PROMPT) == 1
            tail = out.split(I.END_OF_PROMPT)[1]
            assert "content" in tail or "<" in tail or "[" in tail


def test_extractor_instruction_fn(tmp_path):
    """extract_cosy_tokens applies the augmenter to the row text (the
    reference's is_instructed path)."""
    import json

    import numpy as np

    from rwkvtts_tpu.data import extract

    out = tmp_path / "rows.jsonl"
    samples = [{"audio": np.zeros(160), "text": f"sentence {i}"} for i in range(3)]
    extract.extract_cosy_tokens(
        samples, lambda w: [1, 2, 3], str(out),
        instruction_fn=I.make_instruction_fn("en", seed=0),
    )
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 3
    for i, r in enumerate(rows):
        assert I.END_OF_PROMPT in r["text"]
        assert r["text"].split(I.END_OF_PROMPT)[1].endswith(f"sentence {i}") or (
            f"sentence {i}" in re.sub(r"</?(laughter|strong)>|\[(laughter|breath)\]", "", r["text"])
        )
        assert r["tts_speech_tokens"] == [1, 2, 3]
