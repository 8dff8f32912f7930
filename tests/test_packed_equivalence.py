"""Varlen packing semantics (SURVEY.md hard part #2): a packed 1-row batch
with segment resets must give the same loss as the padded multi-row batch —
no context leaks across packed samples."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.data import spark_collator
from rwkvtts_tpu.models import spark


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text]


def test_packed_loss_matches_padded():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=8, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    rows = [
        {
            "text": "abc",
            "global_tokens": rng.integers(0, 4096, 3).tolist(),
            "semantic_tokens": rng.integers(0, 100, 7).tolist(),
        },
        {
            "text": "defgh",
            "global_tokens": rng.integers(0, 4096, 3).tolist(),
            "semantic_tokens": rng.integers(0, 100, 11).tolist(),
        },
    ]
    padded = spark_collator.collate_plain(rows, FakeTok(), eos_id=8192, pad_to=40)
    packed = spark_collator.collate_plain(
        rows, FakeTok(), eos_id=8192, pad_to=64, packed=True
    )

    def loss(batch):
        l, n = spark.forward(
            params, cfg,
            jnp.asarray(batch["tokens"]), jnp.asarray(batch["modality"]),
            labels=jnp.asarray(batch["labels"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            resets=jnp.asarray(batch["resets"]) if "resets" in batch else None,
        )
        return float(l), int(n)

    l_pad, n_pad = loss(padded)
    l_pack, n_pack = loss(packed)
    assert n_pad == n_pack
    np.testing.assert_allclose(l_pack, l_pad, rtol=2e-4)

    # leak check: changing sample 1's tokens must not move sample 2's
    # contribution in the packed row. Mask sample 2's labels and compare.
    rows2 = [dict(rows[0], semantic_tokens=[5] * 7), rows[1]]
    packed2 = spark_collator.collate_plain(
        rows2, FakeTok(), eos_id=8192, pad_to=64, packed=True
    )
    # isolate sample-2 loss by ignoring sample-1 labels
    def sample2_loss(batch):
        labels = np.asarray(batch["labels"]).copy()
        resets = np.asarray(batch["resets"])
        second_start = np.flatnonzero(resets[0])[1]
        labels[0, :second_start] = -100
        l, _ = spark.forward(
            params, cfg, jnp.asarray(batch["tokens"]), jnp.asarray(batch["modality"]),
            labels=jnp.asarray(labels),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            resets=jnp.asarray(batch["resets"]),
        )
        return float(l)

    np.testing.assert_allclose(
        sample2_loss(packed), sample2_loss(packed2), rtol=1e-5
    )
