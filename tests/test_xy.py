"""XY 8-channel model, collator (diagonal shift), and generation tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.data import xy_collator as C
from rwkvtts_tpu.models import xy


class StubTokenizer:
    def encode(self, text):
        return [ord(c) % 300 for c in text][:20]


@pytest.fixture(scope="module")
def setup():
    cfg = xy.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=16,
        dtype=jnp.float32, remat=False, wkv_chunk=16,
    )
    cfg = __import__("dataclasses").replace(
        cfg, text_vocab_size=700, speech_vocab_size=32, text_shift_size=600
    )
    params = xy.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_build_sample_diagonal():
    text_ids = [1, 2, 3]
    speech = np.arange(16).reshape(8, 2)  # (8 ch, T2=2)
    ids, labels = C.build_sample(
        text_ids, speech, num_channels=8, text_shift_size=600,
        speech_vocab_size=32, text_vocab_size=700,
    )
    T1, T2 = 3, 2
    assert ids.shape == (T1 + T2 + 7, 8)
    # ch0 audio at steps T1..T1+T2-1, shifted by 600
    assert ids[T1, 0] == speech[0, 0] + 600
    assert ids[T1 + 1, 0] == speech[0, 1] + 600
    # ch3 delayed by 3
    assert ids[T1 + 3, 3] == speech[3, 0]
    assert ids[T1 + 4, 3] == speech[3, 1]
    # cells before the diagonal are pad
    assert ids[T1, 3] == 31
    # labels: next-step shift; terminal staircase labels
    assert labels[T1 - 1, 0] == ids[T1, 0]  # last text step predicts audio
    assert labels[T1 + T2 - 1, 0] == 699  # ch0 terminal = text pad
    assert labels[T1 + T2 - 1 + 5, 5] == 31  # ch5 terminal = speech pad


def test_undo_diagonal_roundtrip():
    speech = np.random.randint(0, 31, size=(8, 10))
    ids, _ = C.build_sample(
        [5], speech, num_channels=8, text_shift_size=600,
        speech_vocab_size=32, text_vocab_size=700,
    )
    frames = ids[1:]  # strip text
    rec = C.undo_diagonal(frames, text_shift_size=600, num_channels=8)
    np.testing.assert_array_equal(rec, speech)


def test_forward_loss(setup):
    cfg, params = setup
    tok = StubTokenizer()
    rows = [
        {"text": "ab", "audio_tokens": np.random.randint(0, 30, (8, 6)).tolist()},
        {"text": "cdef", "audio_tokens": np.random.randint(0, 30, (8, 4)).tolist()},
    ]
    b = C.collate(
        rows, tok, num_channels=8, text_shift_size=cfg.text_shift_size,
        speech_vocab_size=cfg.speech_vocab_size,
        text_vocab_size=cfg.text_vocab_size, pad_to=32,
    )
    loss, n = xy.forward(
        params,
        cfg,
        jnp.asarray(b["input_ids"]),
        labels=jnp.asarray(b["labels"]),
        attention_mask=jnp.asarray(b["attention_mask"]),
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_xy_generate_flush(setup):
    cfg, params = setup
    from rwkvtts_tpu.infer.generate import xy_generate

    B, T = 1, 6
    prompt = np.full((B, T, 8), cfg.speech_pad_id, dtype=np.int64)
    prompt[:, :, 0] = cfg.text_pad_id
    prompt[0, :3, 0] = [1, 2, 3]
    mask = np.ones((B, T), dtype=np.int32)
    frames, n_audio = xy_generate(
        params,
        cfg,
        jnp.asarray(prompt),
        jnp.asarray(mask),
        jax.random.PRNGKey(0),
        max_new_tokens=16,
        min_new_tokens=2,
    )
    assert frames.shape == (1, 16, 8)
    f = np.asarray(frames[0])
    lo, hi = cfg.text_shift_size, cfg.text_shift_size + cfg.speech_vocab_size
    # ch0 is audio-range or EOS at every step
    assert all((lo <= t < hi) or t == cfg.text_pad_id for t in f[:, 0])
    # min_new_tokens honored
    assert (f[:2, 0] >= lo).all() and (f[:2, 0] < hi).all()
    # after ch0 EOS appears, channels drain in staggered order
    eos_steps = np.where(f[:, 0] == cfg.text_pad_id)[0]
    if len(eos_steps):
        e = eos_steps[0]
        for i in range(1, 8):
            t = e + i
            if t < 16:
                # channel i still emits audio for i more steps then pads
                assert f[t, :i + 1][0] == cfg.text_pad_id
