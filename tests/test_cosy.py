"""Cosy LM head + collator + RAS generation tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.data import cosy_collator as C
from rwkvtts_tpu.models import cosy


class StubTokenizer:
    def encode(self, text):
        return [ord(c) % 500 for c in text][:16]


@pytest.fixture(scope="module")
def setup():
    cfg = cosy.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=16,
        dtype=jnp.float32, remat=False, wkv_chunk=16,
    )
    params = cosy.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def rows(n=2):
    return [
        {
            "text": f"hello {i}",
            "prompt_text": "prompt",
            "tts_speech_tokens": [10 + i, 20, 30, 40],
            "llm_prompt_speech_token": [1, 2],
        }
        for i in range(n)
    ]


def test_layout_and_labels():
    tok = StubTokenizer()
    b = C.collate(rows(1), tok, eos_id=6561, drop_prompt_audio_rate=-1.0)
    t, m, lab = b["tokens"][0], b["modality"][0], b["labels"][0]
    # structure: SOS, text..., TASK, speech...
    assert m[0] == cosy.MOD_SPECIAL and t[0] == cosy.SOS_EOS
    n_text = len(tok.encode("prompt")) + len(tok.encode("hello 0"))
    assert m[1 + n_text] == cosy.MOD_SPECIAL and t[1 + n_text] == cosy.TASK_ID
    # label at TASK position is the first speech token (prompt speech [1,2])
    assert lab[1 + n_text] == 1
    # last speech position's label is EOS
    n_speech = 2 + 4
    assert lab[1 + n_text + 1 + n_speech - 1] == 6561
    # labels before TASK all ignored
    assert (lab[: 1 + n_text] == -100).all()


def test_drop_prompt():
    tok = StubTokenizer()
    rng = np.random.default_rng(0)
    b = C.collate(rows(1), tok, eos_id=6561, drop_prompt_audio_rate=2.0, rng=rng)
    n_text = len(tok.encode("hello 0"))
    # dropped prompt → shorter sample: SOS + text + TASK + 4 speech
    assert b["attention_mask"][0].sum() == 1 + n_text + 1 + 4


def test_forward_loss(setup):
    cfg, params = setup
    tok = StubTokenizer()
    b = C.collate(rows(2), tok, eos_id=cfg.eos_token_id, pad_to=48,
                  drop_prompt_audio_rate=-1.0)
    loss, n = cosy.forward(
        params,
        cfg,
        jnp.asarray(b["tokens"]),
        jnp.asarray(b["modality"]),
        labels=jnp.asarray(b["labels"]),
        attention_mask=jnp.asarray(b["attention_mask"]),
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_label_smoothing_changes_loss(setup):
    cfg, params = setup
    import dataclasses

    cfg_s = dataclasses.replace(cfg, lsm_weight=0.1)
    tok = StubTokenizer()
    b = C.collate(rows(1), tok, eos_id=cfg.eos_token_id, pad_to=48,
                  drop_prompt_audio_rate=-1.0)
    args = (
        jnp.asarray(b["tokens"]),
        jnp.asarray(b["modality"]),
    )
    kw = dict(
        labels=jnp.asarray(b["labels"]),
        attention_mask=jnp.asarray(b["attention_mask"]),
    )
    l0, _ = cosy.forward(params, cfg, *args, **kw)
    l1, _ = cosy.forward(params, cfg_s, *args, **kw)
    assert not np.isclose(float(l0), float(l1))


def test_cosy_generate(setup):
    cfg, params = setup
    from rwkvtts_tpu.data.spark_collator import pad_prompts_left
    from rwkvtts_tpu.infer.generate import cosy_generate

    tok = StubTokenizer()
    prompts = [C.build_prompt(tok.encode("hi there"), [5, 6, 7])]
    pb = pad_prompts_left(prompts, pad_to=16)
    toks, lengths = cosy_generate(
        params,
        cfg,
        jnp.asarray(pb["tokens"]),
        jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]),
        jax.random.PRNGKey(0),
        max_new_tokens=8,
        min_new_tokens=2,
    )
    assert toks.shape == (1, 8)
    # min_new_tokens: first two draws cannot be EOS
    assert (toks[0, :2] != cfg.eos_token_id).all()


def test_content_length_endofprompt():
    ids = [3, 4, 65531, 7, 8, 9]
    assert C.content_length(ids) == 3
    assert C.content_length([1, 2, 3]) == 3


def test_reset_shift_states(setup):
    cfg, params = setup
    from rwkvtts_tpu.models import rwkv7

    st = rwkv7.init_model_state(cfg.backbone, 2)
    st = jax.tree.map(lambda x: x + 1.0, st)
    st2 = cosy.reset_shift_states(st)
    assert float(jnp.abs(st2["att_x"]).sum()) == 0
    assert float(jnp.abs(st2["ffn_x"]).sum()) == 0
    assert float(jnp.abs(st2["wkv"]).sum()) > 0
