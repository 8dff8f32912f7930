"""Multi-chip serving: the jitted decode loop runs with the batch sharded
over a dp mesh (virtual 8-device CPU here; same GSPMD path on a real slice).
Offline batch synthesis scales across chips with zero code changes — the
state pytree and every step tensor are batch-leading."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rwkvtts_tpu.infer.generate import spark_generate
from rwkvtts_tpu.models import spark
from rwkvtts_tpu.parallel import mesh as mesh_lib


def test_decode_with_sharded_batch():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh(dp=8)
    bsh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    B, T = 16, 24
    rng = np.random.default_rng(0)
    tokens = jax.device_put(jnp.asarray(rng.integers(0, 100, (B, T))), bsh)
    modality = jax.device_put(
        jnp.full((B, T), spark.MOD_TEXT, jnp.int32).at[:, -1].set(spark.MOD_TAG), bsh
    )
    mask = jax.device_put(jnp.ones((B, T), jnp.int32), bsh)
    params_r = jax.device_put(params, rep)

    toks, lengths = spark_generate(
        params_r, cfg, tokens, modality, mask, jax.random.PRNGKey(1),
        max_new_tokens=8, top_k=5, top_p=0.9,
    )
    assert toks.shape == (B, 8)
    # output stays batch-sharded: no gather was forced
    assert int(toks.max()) < cfg.semantic_vocab_size

    # must equal the unsharded run bit-for-bit (same PRNG path)
    toks2, _ = spark_generate(
        params, cfg, jnp.asarray(np.asarray(tokens)), jnp.asarray(np.asarray(modality)),
        jnp.asarray(np.asarray(mask)), jax.random.PRNGKey(1),
        max_new_tokens=8, top_k=5, top_p=0.9,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
