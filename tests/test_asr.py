"""ASR model tests: pack correctness, loss/grad, decode, whisper encoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.models import asr, rwkv7, whisper


def tiny_cfg(variant):
    return asr.default_config(
        hidden_size=32, num_layers=2, adapter_layers=1, audio_vocab=16,
        variant=variant, dtype=jnp.float32, head_size=8, gate_lora=8, wkv_chunk=4,
        remat=False,
    )


def _mini_whisper(cfg):
    # shrink whisper for tests
    import dataclasses

    w = whisper.WhisperEncoderConfig(n_mels=8, d_model=32, layers=1, heads=2, ffn_dim=64)
    return dataclasses.replace(cfg, whisper=w)


def test_right_align_pack():
    B, C = 2, 4
    e1 = jnp.arange(B * 3 * C, dtype=jnp.float32).reshape(B, 3, C) + 1
    m1 = jnp.asarray([[0, 1, 1], [1, 1, 1]])
    e2 = -(jnp.arange(B * 2 * C, dtype=jnp.float32).reshape(B, 2, C) + 1)
    m2 = jnp.asarray([[1, 1], [0, 1]])
    lab = jnp.asarray([[7, 8], [9, 10]])
    packed, mask, labels = asr._right_align_pack(
        [(e1, m1, None), (e2, m2, lab)], 5
    )
    # sample 0: valid = 2 + 2 = 4 -> positions 1..4
    np.testing.assert_array_equal(np.asarray(mask[0]), [0, 1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(packed[0, 1]), np.asarray(e1[0, 1]))
    np.testing.assert_allclose(np.asarray(packed[0, 3]), np.asarray(e2[0, 0]))
    np.testing.assert_array_equal(np.asarray(labels[0]), [-100, -100, -100, 7, 8])
    # sample 1: valid = 3 + 1 = 4
    np.testing.assert_array_equal(np.asarray(mask[1]), [0, 1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(packed[1, 4]), np.asarray(e2[1, 1]))
    np.testing.assert_array_equal(np.asarray(labels[1]), [-100, -100, -100, -100, 10])
    # padding slots are zero
    np.testing.assert_allclose(np.asarray(packed[0, 0]), np.zeros(C))


def _batch(variant, B=2):
    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.asarray(rng.integers(1, 100, (B, 4))),
        "text_mask": jnp.asarray([[0, 1, 1, 1], [1, 1, 1, 1]]),
        "hints_ids": jnp.asarray(rng.integers(1, 100, (B, 2))),
        "hints_mask": jnp.ones((B, 2), jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 100, (B, 5))),
        "labels_mask": jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]]),
    }
    if variant == "whisper":
        batch["mel"] = jnp.asarray(rng.standard_normal((B, 16, 8)).astype(np.float32))
        batch["mel_mask"] = jnp.ones((B, 16), jnp.int32)
    else:
        batch["audio_ids"] = jnp.asarray(rng.integers(0, 16, (B, 6)))
        batch["audio_mask"] = jnp.asarray([[0, 0, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]])
    return batch


@pytest.mark.parametrize("variant", ["discrete", "whisper"])
def test_asr_forward_loss_grad(variant):
    cfg = tiny_cfg(variant)
    if variant == "whisper":
        cfg = _mini_whisper(cfg)
    params = asr.init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(variant)

    def lf(p):
        loss, n = asr.forward(p, cfg, batch)
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    # frozen whisper must receive zero gradient
    if variant == "whisper":
        wnorm = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["whisper"], 0.0
        )
        assert wnorm == 0.0
    # llm must receive gradient
    lnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["llm"], 0.0
    )
    assert lnorm > 0


def test_asr_transcribe_shapes():
    cfg = tiny_cfg("discrete")
    params = asr.init_params(jax.random.PRNGKey(0), cfg)
    batch = _batch("discrete")
    toks, lengths = asr.transcribe(params, cfg, batch, max_new_tokens=6)
    assert toks.shape == (2, 6)
    assert lengths.shape == (2,)
    assert (np.asarray(lengths) <= 6).all()


def test_whisper_encoder_downsample_and_mask():
    cfg = whisper.WhisperEncoderConfig(n_mels=8, d_model=16, layers=1, heads=2, ffn_dim=32)
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 20, 8)).astype(np.float32))
    mask = jnp.concatenate([jnp.ones((1, 12)), jnp.zeros((1, 8))], axis=1)
    h = whisper.apply(params, cfg, mel, mask)
    assert h.shape == (1, 10, 16)
    # padded outputs zeroed
    np.testing.assert_allclose(np.asarray(h[0, 6:]), 0.0, atol=1e-6)


def test_whisper_hf_import_matches_torch():
    """Build a 1-layer HF-format torch whisper encoder, import, compare."""
    import torch
    import torch.nn as tnn

    d, heads, ffn, n_mels = 16, 2, 32, 8

    class HFLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = tnn.ModuleDict()
            self.self_attn["q_proj"] = tnn.Linear(d, d)
            self.self_attn["k_proj"] = tnn.Linear(d, d, bias=False)
            self.self_attn["v_proj"] = tnn.Linear(d, d)
            self.self_attn["out_proj"] = tnn.Linear(d, d)
            self.self_attn_layer_norm = tnn.LayerNorm(d)
            self.fc1 = tnn.Linear(d, ffn)
            self.fc2 = tnn.Linear(ffn, d)
            self.final_layer_norm = tnn.LayerNorm(d)

        def forward(self, x):
            res = x
            h = self.self_attn_layer_norm(x)
            B, T, _ = h.shape
            dk = d // heads
            q = self.self_attn["q_proj"](h).view(B, T, heads, dk).transpose(1, 2)
            k = self.self_attn["k_proj"](h).view(B, T, heads, dk).transpose(1, 2)
            v = self.self_attn["v_proj"](h).view(B, T, heads, dk).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / dk**0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(B, T, d)
            x = res + self.self_attn["out_proj"](o)
            res = x
            h = self.final_layer_norm(x)
            return res + self.fc2(torch.nn.functional.gelu(self.fc1(h)))

    class HFEnc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv1d(n_mels, d, 3, padding=1)
            self.conv2 = tnn.Conv1d(d, d, 3, stride=2, padding=1)
            self.embed_positions = tnn.Embedding(10, d)
            self.layers = tnn.ModuleList([HFLayer()])
            self.layer_norm = tnn.LayerNorm(d)

        def forward(self, mel):
            h = torch.nn.functional.gelu(self.conv1(mel))
            h = torch.nn.functional.gelu(self.conv2(h)).permute(0, 2, 1)
            h = h + self.embed_positions.weight[: h.shape[1]]
            for l in self.layers:
                h = l(h)
            return self.layer_norm(h)

    torch.manual_seed(0)
    enc = HFEnc().eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in enc.state_dict().items()}
    cfg = whisper.WhisperEncoderConfig(n_mels=n_mels, d_model=d, layers=1, heads=heads, ffn_dim=ffn, max_positions=10)
    params = whisper.from_hf_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)

    mel = torch.randn(1, n_mels, 14)
    with torch.no_grad():
        ref = enc(mel).numpy()
    out = whisper.apply(params, cfg, jnp.asarray(mel.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
