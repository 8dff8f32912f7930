"""Native C++ tokenizer: parity with the pure-Python matcher + speedup."""
import time

import numpy as np
import pytest

from rwkvtts_tpu.utils.tokenizer import WorldTokenizer, get_world_tokenizer


@pytest.fixture(scope="module")
def toks():
    t = get_world_tokenizer()
    if t._native is None:
        pytest.skip("no native build (g++ unavailable)")
    # a python-only twin
    py = WorldTokenizer()
    py._native = None
    return t, py


def test_parity_ascii(toks):
    native, py = toks
    for s in ["Hello, world!", "The quick brown fox jumps over the lazy dog.", "a" * 500]:
        assert native.encode(s) == py.encode(s)


def test_parity_multilingual(toks):
    native, py = toks
    for s in ["你好，世界。", "日本語のテキスト", "Привет мир", "🎉 emoji 混合 text"]:
        assert native.encode(s) == py.encode(s)


def test_parity_random_bytes_text(toks):
    native, py = toks
    rng = np.random.default_rng(0)
    for _ in range(20):
        s = "".join(chr(int(c)) for c in rng.integers(32, 0x4000, 64))
        assert native.encode(s) == py.encode(s)


def test_roundtrip(toks):
    native, _ = toks
    s = "Greedy longest-match 分词 round trip ✓"
    assert native.decode(native.encode(s)) == s


def test_native_is_faster(toks):
    native, py = toks
    text = "这是一个用于基准测试的中英文混合 sentence with many words. " * 200

    t0 = time.perf_counter()
    for _ in range(5):
        a = native.encode(text)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        b = py.encode(text)
    t_py = time.perf_counter() - t0
    assert a == b
    # native should win clearly; require 2x to avoid flakiness
    assert t_native * 2 < t_py, (t_native, t_py)
