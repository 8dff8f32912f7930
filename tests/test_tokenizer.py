"""World-tokenizer round-trip + id-contract tests."""
import pytest

from rwkvtts_tpu.data import properties as props
from rwkvtts_tpu.utils.tokenizer import get_world_tokenizer


@pytest.fixture(scope="module")
def tok():
    return get_world_tokenizer(n_spct=props.NUM_SPCT_TOKENS)


def test_roundtrip_ascii(tok):
    for s in ["Hello, world!", "The quick brown fox.", "a", "  spaces  "]:
        assert tok.decode(tok.encode(s)) == s


def test_roundtrip_chinese_utf8(tok):
    for s in ["你好世界", "把以下音频转写为中文。", "RWKV 语音合成"]:
        assert tok.decode(tok.encode(s)) == s


def test_greedy_longest_match(tok):
    # "Hello" must be a single token if present in the world vocab
    ids = tok.encode("Hello")
    assert len(ids) <= 2  # world vocab has common English words


def test_spct_ids_appended_after_base_vocab(tok):
    # SPCT_i = 65536 + i (reference utils/enlarge_sparkllm_textvocab.py:39-41)
    ids = tok.encode("SPCT_0SPCT_17SPCT_47")
    assert ids == [65536, 65536 + 17, 65536 + 47]


def test_properties_string_tokens(tok):
    s = props.properties_string("youth-adult", "female", "HAPPY", 200.0, 4.2)
    # pitch 200 female youth-adult → medium (191 <= 200 < 211) → SPCT_7
    # speed 4.2 → medium → SPCT_3
    assert s == "SPCT_0SPCT_15SPCT_46SPCT_24SPCT_7SPCT_3"
    ids = tok.encode(s)
    assert ids == [65536 + i for i in (0, 15, 46, 24, 7, 3)]


def test_pitch_buckets():
    assert props.classify_pitch(100, "male", "youth-adult") == "low_pitch"
    assert props.classify_pitch(300, "female", "child") == "high_pitch"
    assert props.classify_pitch(260, "female", "child") == "medium_pitch"
    assert props.classify_pitch(200, "unknown", "x") == "high_pitch"


def test_speed_buckets():
    assert props.classify_speed(3.0) == "very_slow"
    assert props.classify_speed(4.2) == "medium"
    assert props.classify_speed(6.0) == "very_fast"
    # reference's open-interval quirk: exactly 4.0 falls through to very_fast
    assert props.classify_speed(4.0) == "very_fast"


def test_endoftext_id(tok):
    assert tok.decode_bytes([0]) == b"<|endoftext|>"
