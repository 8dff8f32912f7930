"""Tensor-parallel decode: weight-sharded prefill + AR step on a tp mesh.

The reference has no tensor parallelism at all (SURVEY.md §2.7); here the
existing param rules (parallel/mesh.py _RULES: r/k/v column-parallel,
output/ffn.value row-parallel) let GSPMD run the SAME decode code with the
weights sharded over tp — the multi-chip latency lever for B=1 decode of
the 1.4B deployed LM, where a single chip is weight-bandwidth-bound
(PERF.md round 3: 4.5 ms/step ≈ the 2.9 GB/step roofline; tp=4 splits the
per-chip weight bytes 4x).

TP decode uses the UNPACKED param layout: pack_decode_params' fused
concatenated projections are a single-device dispatch optimization whose
column split points don't align with tp shards; under tp, GSPMD's sharded
matmuls are the optimization instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rwkvtts_tpu.models import rwkv7, spark
from rwkvtts_tpu.parallel import mesh as mesh_lib


def test_tp_sharded_prefill_and_decode_step_match_single_device():
    cfg = spark.default_config(
        hidden_size=32, num_layers=2, head_size=8, gate_lora=8,
        dtype=jnp.float32, wkv_chunk=16, remat=False,
    )
    bb = cfg.backbone
    params = spark.init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, bb.hidden_size)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)

    # single-device reference
    h_ref, st_ref = rwkv7.forward(
        params, bb, inputs_embeds=x, attention_mask=mask, return_state=True,
    )

    mesh = mesh_lib.make_mesh(tp=8)
    p_tp = mesh_lib.shard_params(mesh, params)
    # at least one big matrix must actually be tp-sharded for the test to
    # mean anything
    specs = mesh_lib.param_specs(
        params, axis_sizes=dict(zip(mesh.axis_names, mesh.devices.shape))
    )
    assert any(
        "tp" in str(spec)
        for _, spec in jax.tree_util.tree_leaves_with_path(specs)
    ), "no leaf picked up a tp sharding"

    h_tp, st_tp = rwkv7.forward(
        p_tp, bb, inputs_embeds=jax.device_put(x, NamedSharding(mesh, P())),
        attention_mask=mask, return_state=True,
    )
    np.testing.assert_allclose(
        np.asarray(h_tp, np.float32), np.asarray(h_ref, np.float32),
        rtol=2e-5, atol=2e-5,
    )

    # one AR decode step on the carried state (the B=1-latency path)
    lv_ref = rwkv7.layer_decode_views(params, bb)
    ps_ref = rwkv7.pack_decode_state(st_ref, bb)
    xt = jnp.asarray(rng.standard_normal((B, bb.hidden_size)).astype(np.float32))
    y_ref, _ = rwkv7.decode_step(lv_ref, bb, xt, ps_ref)

    lv_tp = rwkv7.layer_decode_views(p_tp, bb)
    ps_tp = rwkv7.pack_decode_state(st_tp, bb)
    y_tp, _ = rwkv7.decode_step(lv_tp, bb, xt, ps_tp)
    np.testing.assert_allclose(
        np.asarray(y_tp, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-5, atol=2e-5,
    )
