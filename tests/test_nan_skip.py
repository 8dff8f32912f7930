"""Non-finite containment: a poisoned batch must not corrupt params or
optimizer state; training continues on the next good batch."""
import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.models import spark
from rwkvtts_tpu.parallel import train_step as ts
from rwkvtts_tpu.train import optimizer as opt_lib


def test_nan_batch_skipped():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False, dropout=0.0,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    tx = opt_lib.build_optimizer(params, grad_clip=None)
    state = ts.init_train_state(params, tx)
    step = ts.make_train_step(cfg, tx, donate=False)

    B, T = 2, 32
    good = {
        "tokens": jnp.ones((B, T), jnp.int32),
        "modality": jnp.full((B, T), spark.MOD_SEMANTIC, jnp.int32),
        "labels": jnp.ones((B, T), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
    }

    # poison the loss via a NaN embedding row that the batch indexes
    bad_params = dict(state.params)
    bad_params["embedding"] = state.params["embedding"].at[1].set(jnp.nan)
    bad_state = ts.TrainState(bad_params, state.opt_state, state.step)
    out_state, metrics = step(bad_state, good, jax.random.PRNGKey(1))
    assert int(metrics["skipped"]) == 1
    # params unchanged (beyond the NaN we injected)
    np.testing.assert_allclose(
        np.asarray(out_state.params["head"]), np.asarray(bad_params["head"])
    )
    # optimizer moments untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(out_state.opt_state),
        jax.tree_util.tree_leaves(bad_state.opt_state),
    ):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # step still advanced
    assert int(out_state.step) == int(bad_state.step) + 1

    # a clean batch trains normally (two steps — LR warmup is 0 at step 0)
    out2, m2 = step(state, good, jax.random.PRNGKey(2))
    assert int(m2["skipped"]) == 0
    assert float(m2["grad_norm"]) > 0
    out3, _ = step(out2, good, jax.random.PRNGKey(3))
    diff = float(jnp.abs(out3.params["head"] - state.params["head"]).sum())
    assert diff > 0
