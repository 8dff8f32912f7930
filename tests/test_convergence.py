"""End-to-end learning test: a tiny Spark model memorizes one utterance —
loss -> ~0 and greedy decode reproduces the exact semantic token sequence.

This closes the loop the reference validates by listening to in-training
demo wavs (train_scripts/train_spark.py generate_demo): collator -> model
-> fused CE -> grads -> optimizer -> autoregressive decode, all verified
numerically instead of audibly."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.data import jsonl_dataset, spark_collator
from rwkvtts_tpu.infer import generate as gen
from rwkvtts_tpu.models import spark
from rwkvtts_tpu.parallel import train_step as ts
from rwkvtts_tpu.train import optimizer as opt_lib


class FakeTok:
    def encode(self, text):
        return [ord(c) % 200 + 1 for c in text][:12]


def test_memorize_and_greedy_reproduce():
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(3)
    row = {
        "text": "memorize me",
        "global_tokens": rng.integers(0, 4096, 4).tolist(),
        "semantic_tokens": rng.integers(0, 100, 16).tolist(),
    }
    tok = FakeTok()
    collate = functools.partial(
        spark_collator.collate_plain, tokenizer=tok, eos_id=cfg.eos_token_id,
        pad_to=48,
    )
    batch_np = collate([row, row])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    tx = opt_lib.build_optimizer(
        params, total_steps=300, peak_lr=3e-3, final_lr=3e-4, warmup_steps=10
    )
    state = ts.init_train_state(params, tx)
    step = ts.make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(300):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        if i % 50 == 0 or i == 299:
            losses.append(float(metrics["loss"]))
    assert losses[0] > 2.0  # started untrained
    assert losses[-1] < 0.2, f"did not memorize: losses={losses}"

    # greedy decode from the prompt must reproduce the memorized tokens
    prompt = spark_collator.build_prompt(tok.encode(row["text"]), row["global_tokens"])
    pb = spark_collator.pad_prompts_left([prompt])
    toks, lengths = gen.spark_generate(
        state.params, cfg,
        jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(2),
        max_new_tokens=len(row["semantic_tokens"]) + 4,
        top_k=1, top_p=1.0, temperature=1.0,
    )
    n = int(np.asarray(lengths)[0])
    got = np.asarray(toks)[0, :n].tolist()
    assert got == row["semantic_tokens"], f"decode mismatch: {got}"


def test_memorized_decode_survives_int8(
):
    """Quality bound for the opt-in int8 decode weights (VERDICT r2 weak
    #5): on a trained (memorized) model, int8-packed greedy decode must
    reproduce the exact same token sequence as the fp path."""
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    row = {
        "text": "int8 quality bound",
        "global_tokens": rng.integers(0, 4096, 4).tolist(),
        "semantic_tokens": rng.integers(0, 100, 16).tolist(),
    }
    tok = FakeTok()
    collate = functools.partial(
        spark_collator.collate_plain, tokenizer=tok, eos_id=cfg.eos_token_id,
        pad_to=48,
    )
    batch = {k: jnp.asarray(v) for k, v in collate([row, row]).items()}
    tx = opt_lib.build_optimizer(
        params, total_steps=300, peak_lr=3e-3, final_lr=3e-4, warmup_steps=10
    )
    state = ts.init_train_state(params, tx)
    step = ts.make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, sub)

    from rwkvtts_tpu.models import rwkv7

    prompt = spark_collator.build_prompt(tok.encode(row["text"]), row["global_tokens"])
    pb = spark_collator.pad_prompts_left([prompt])
    args = (
        jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(2),
    )
    kw = dict(max_new_tokens=20, top_k=1, top_p=1.0, temperature=1.0)
    outs = {}
    for name, quant in (("fp", False), ("int8", True)):
        p = rwkv7.pack_decode_params(state.params, cfg.backbone, quantize_int8=quant)
        toks, lengths = gen.spark_generate(p, cfg, *args, **kw)
        n = int(np.asarray(lengths)[0])
        outs[name] = np.asarray(toks)[0, :n].tolist()
    assert outs["fp"] == row["semantic_tokens"]
    assert outs["int8"] == outs["fp"], (
        f"int8 decode diverged from fp on a memorized sequence: {outs}"
    )


def test_memorized_decode_survives_int4():
    """Quality probe for the opt-in int4 group-wise decode weights: on a
    memorized model (huge logit margins) greedy decode must still
    reproduce the trained sequence exactly. The flagship-scale
    decision-flip rate is measured separately on the chip
    (scripts/measure_int8_quality.py --int4)."""
    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    row = {
        "text": "int4 quality bound",
        "global_tokens": rng.integers(0, 4096, 4).tolist(),
        "semantic_tokens": rng.integers(0, 100, 16).tolist(),
    }
    tok = FakeTok()
    collate = functools.partial(
        spark_collator.collate_plain, tokenizer=tok, eos_id=cfg.eos_token_id,
        pad_to=48,
    )
    batch = {k: jnp.asarray(v) for k, v in collate([row, row]).items()}
    tx = opt_lib.build_optimizer(
        params, total_steps=300, peak_lr=3e-3, final_lr=3e-4, warmup_steps=10
    )
    state = ts.init_train_state(params, tx)
    step = ts.make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, sub)

    from rwkvtts_tpu.models import rwkv7

    prompt = spark_collator.build_prompt(tok.encode(row["text"]), row["global_tokens"])
    pb = spark_collator.pad_prompts_left([prompt])
    args = (
        jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(2),
    )
    kw = dict(max_new_tokens=20, top_k=1, top_p=1.0, temperature=1.0)
    outs = {}
    for name, q4 in (("fp", False), ("int4", True)):
        p = rwkv7.pack_decode_params(
            state.params, cfg.backbone, quantize_int4=q4, int4_group=16,
        )
        toks, lengths = gen.spark_generate(p, cfg, *args, **kw)
        n = int(np.asarray(lengths)[0])
        outs[name] = np.asarray(toks)[0, :n].tolist()
    assert outs["fp"] == row["semantic_tokens"]
    assert outs["int4"] == outs["fp"], (
        f"int4 decode diverged from fp on a memorized sequence: {outs}"
    )


def test_memorized_decode_survives_bf16_state():
    """Quality probe for the opt-in bf16 decode-state carry
    (cfg.decode_state_bf16, ≙ the reference's fp16-state decode kernel
    rwkv7_state_fwd_fp16.cu): greedy decode on a memorized model must
    reproduce the trained sequence exactly with the state round-tripping
    through bf16 every step."""
    import dataclasses

    cfg = spark.default_config(
        hidden_size=64, num_layers=2, head_size=16, gate_lora=16,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    row = {
        "text": "bf16 state quality bound",
        "global_tokens": rng.integers(0, 4096, 4).tolist(),
        "semantic_tokens": rng.integers(0, 100, 16).tolist(),
    }
    tok = FakeTok()
    collate = functools.partial(
        spark_collator.collate_plain, tokenizer=tok, eos_id=cfg.eos_token_id,
        pad_to=48,
    )
    batch = {k: jnp.asarray(v) for k, v in collate([row, row]).items()}
    tx = opt_lib.build_optimizer(
        params, total_steps=300, peak_lr=3e-3, final_lr=3e-4, warmup_steps=10
    )
    state = ts.init_train_state(params, tx)
    step = ts.make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, sub)

    prompt = spark_collator.build_prompt(tok.encode(row["text"]), row["global_tokens"])
    pb = spark_collator.pad_prompts_left([prompt])
    args = (
        jnp.asarray(pb["tokens"]), jnp.asarray(pb["modality"]),
        jnp.asarray(pb["attention_mask"]), jax.random.PRNGKey(2),
    )
    kw = dict(max_new_tokens=20, top_k=1, top_p=1.0, temperature=1.0)
    outs = {}
    for name, bf16_state in (("fp", False), ("bf16_state", True)):
        c = dataclasses.replace(
            cfg, backbone=dataclasses.replace(
                cfg.backbone, decode_state_bf16=bf16_state
            ),
        )
        toks, lengths = gen.spark_generate(state.params, c, *args, **kw)
        n = int(np.asarray(lengths)[0])
        outs[name] = np.asarray(toks)[0, :n].tolist()
    assert outs["fp"] == row["semantic_tokens"]
    assert outs["bf16_state"] == outs["fp"], (
        f"bf16-state decode diverged on a memorized sequence: {outs}"
    )
