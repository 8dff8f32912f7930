"""Coverage for the host-side utility modules: jsonl tools, corpus stats,
inline spark collate, s2s vocab enlargement, s2s generation."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.convert import rwkv7_ckpt, speech_init
from rwkvtts_tpu.data import corpus_stats, inline_spark
from rwkvtts_tpu.data.jsonl_tools import filter_fields, join_on
from rwkvtts_tpu.models import rwkv7, s2s


class FakeTok:
    def encode(self, t):
        return [ord(c) % 100 + 1 for c in t]


def test_jsonl_tools():
    rows = [{"a": 1, "b": 2, "c": 3}]
    assert filter_fields(rows, keep=["a", "b"]) == [{"a": 1, "b": 2}]
    assert filter_fields(rows, drop=["c"]) == [{"a": 1, "b": 2}]
    j = join_on(
        [{"utt": "x", "t": 1}],
        [{"utt": "x", "gender": "f"}, {"utt": "y", "gender": "m"}],
        on="utt",
    )
    assert j == [{"utt": "x", "t": 1, "gender": "f"}]


def test_corpus_stats():
    rows = [
        {"text": "abcd", "semantic_tokens": list(range(10))},
        {"text": "", "semantic_tokens": list(range(100))},
    ]
    lengths = corpus_stats.row_lengths(rows, "semantic_tokens")
    assert list(lengths) == [12, 100]
    s = corpus_stats.summarize(lengths)
    assert s["count"] == 2 and s["max"] == 100 and s["total_tokens"] == 112


def test_inline_spark_collate():
    class FakeCodec:
        def tokenize(self, wav):
            return np.ones((1, 1, 4), np.int64), (np.arange(len(wav) // 320) % 50)[None]

    collate = inline_spark.make_inline_spark_collate(
        FakeCodec(), FakeTok(), eos_id=8192, pad_to=64
    )
    b = collate([{"audio": np.zeros(3200, np.float32), "text": "hi"}])
    assert b["tokens"].shape == (1, 64)
    assert (b["labels"] != -100).sum() >= 10


def test_s2s_enlarge_vocab():
    tcfg = rwkv7.RWKV7Config(
        vocab_size=20, hidden_size=32, num_layers=2, head_size=8,
        gate_lora=8, dtype=jnp.float32, wkv_chunk=4, remat=False,
    )
    tparams = rwkv7.init_params(jax.random.PRNGKey(0), tcfg)
    sd = rwkv7_ckpt.rwkv7_to_blinkdl(tparams, tcfg)

    scfg = s2s.default_config(
        hidden_size=32, num_layers=2, vocab_size=20 + 8, text_vocab=20,
        audio_vocab=8, dtype=jnp.float32, head_size=8, gate_lora=8,
        wkv_chunk=4, remat=False,
    )
    p = speech_init.s2s_enlarge_vocab(sd, scfg)
    assert p["embedding"].shape == (28, 32)
    np.testing.assert_allclose(p["embedding"][:20], sd["emb.weight"], atol=1e-6)
    assert p["head"].shape == (32, 20)
    assert p["audio_head"].shape == (32, 8)
    # the enlarged model runs
    out = s2s.forward(
        jax.tree.map(jnp.asarray, p), scfg,
        jnp.asarray([[0, 5, 21, 27]]), is_text=False,
    )
    assert out.shape == (1, 4, 8)


def test_s2s_generate_heads():
    cfg = s2s.default_config(
        hidden_size=32, num_layers=2, vocab_size=64, text_vocab=40,
        audio_vocab=24, dtype=jnp.float32, head_size=8, gate_lora=8,
        wkv_chunk=4, remat=False,
    )
    params = s2s.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((2, 6), jnp.int32)
    toks, _ = s2s.generate(
        params, cfg, ids, jax.random.PRNGKey(1), is_text=False,
        max_new_tokens=5, top_k=5,
    )
    assert toks.shape == (2, 5) and int(toks.max()) < 24
    toks2, _ = s2s.generate(
        params, cfg, ids, jax.random.PRNGKey(1), is_text=True,
        max_new_tokens=5, temperature=0.0,
    )
    assert int(toks2.max()) < 40
