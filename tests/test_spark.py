"""Spark LM head + collator + generation tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.data import spark_collator as C
from rwkvtts_tpu.models import rwkv7, spark


class StubTokenizer:
    """Deterministic stand-in for the world tokenizer (fast tests)."""

    def encode(self, text):
        return [ord(c) % 1000 for c in text][:32]


@pytest.fixture(scope="module")
def setup():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, dtype=jnp.float32, head_size=8,
        gate_lora=16, remat=False, wkv_chunk=16,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def rows(n=2):
    return [
        {
            "text": f"hello world {i}",
            "global_tokens": list(range(5 + i)),
            "semantic_tokens": [7, 8, 9, 10 + i],
            "age": "youth-adult",
            "gender": "female",
            "emotion": "HAPPY",
            "pitch": 200.0,
            "speed": 4.2,
        }
        for i in range(n)
    ]


def test_collate_plain_layout():
    tok = StubTokenizer()
    b = C.collate_plain(rows(2), tok, eos_id=8192)
    B, T = b["tokens"].shape
    assert B == 2 and T % 64 == 0
    # first position is TAG2 (START_TTS)
    assert b["modality"][0, 0] == spark.MOD_TAG
    assert b["tokens"][0, 0] == spark.TAG_START_TTS
    # labels: -100 on prefix, semantic+EOS at the end of the sample
    n_text = len(tok.encode("hello world 0"))
    prefix = 1 + n_text + 1 + 5 + 1
    assert (b["labels"][0, :prefix] == -100).all()
    sem = b["labels"][0, prefix : prefix + 5]
    np.testing.assert_array_equal(sem, [7, 8, 9, 10, 8192])
    # attention mask covers exactly the sample
    assert b["attention_mask"][0].sum() == prefix + 5


def test_collate_properties_two_samples_per_row():
    tok = StubTokenizer()
    b = C.collate_with_properties(rows(2), tok, eos_id=8192)
    assert b["tokens"].shape[0] == 4  # 2 rows × (plain + properties)
    # properties sample labels cover global tokens
    lab = b["labels"][1]
    assert (lab[lab != -100] >= 0).all()


def test_packed_has_resets():
    tok = StubTokenizer()
    b = C.collate_plain(rows(3), tok, eos_id=8192, packed=True)
    assert b["tokens"].shape[0] == 1
    assert b["resets"].sum() == 3


def test_forward_loss_finite(setup):
    cfg, params = setup
    tok = StubTokenizer()
    b = C.collate_plain(rows(2), tok, eos_id=cfg.eos_token_id, pad_to=64)
    loss, n = spark.forward(
        params,
        cfg,
        jnp.asarray(b["tokens"]),
        jnp.asarray(b["modality"]),
        labels=jnp.asarray(b["labels"]),
        attention_mask=jnp.asarray(b["attention_mask"]),
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert int(n) == (b["labels"] != -100).sum()


def test_packed_equals_padded_loss(setup):
    """Packing with resets must give the same mean loss as padded batch."""
    cfg, params = setup
    tok = StubTokenizer()
    rs = rows(2)
    bp = C.collate_plain(rs, tok, eos_id=cfg.eos_token_id, pad_to=96)
    bk = C.collate_plain(rs, tok, eos_id=cfg.eos_token_id, packed=True, pad_to=96)
    args_p = dict(
        labels=jnp.asarray(bp["labels"]),
        attention_mask=jnp.asarray(bp["attention_mask"]),
    )
    loss_p, _ = spark.forward(
        params, cfg, jnp.asarray(bp["tokens"]), jnp.asarray(bp["modality"]), **args_p
    )
    loss_k, _ = spark.forward(
        params,
        cfg,
        jnp.asarray(bk["tokens"]),
        jnp.asarray(bk["modality"]),
        labels=jnp.asarray(bk["labels"]),
        attention_mask=jnp.asarray(bk["attention_mask"]),
        resets=jnp.asarray(bk["resets"]),
    )
    np.testing.assert_allclose(float(loss_k), float(loss_p), rtol=1e-4)


def test_generate_shapes_and_eos(setup):
    cfg, params = setup
    from rwkvtts_tpu.infer.generate import spark_generate

    tok = StubTokenizer()
    prompts = [
        C.build_prompt(tok.encode("hi"), list(range(4))),
        C.build_prompt(tok.encode("longer prompt here"), list(range(4))),
    ]
    pb = C.pad_prompts_left(prompts, pad_to=32)
    toks, lengths = spark_generate(
        params,
        cfg,
        jnp.asarray(pb["tokens"]),
        jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]),
        jax.random.PRNGKey(0),
        max_new_tokens=8,
        top_k=0,
        top_p=1.0,
    )
    assert toks.shape == (2, 8)
    assert (toks >= 0).all() and (toks <= cfg.eos_token_id).all()
    assert lengths.shape == (2,)
