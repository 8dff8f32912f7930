"""pjit train-step factory — the TPU replacement for the reference's
DeepSpeed engine loop (train_..._properties.py:270-284,555-556).

One jitted function: forward (fused CE) → grad → optax update. Gradient
all-reduce, ZeRO-style param gathering, and any tensor-parallel collectives
are all GSPMD-inserted from the shardings in parallel/mesh.py — no explicit
communication code.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rwkvtts_tpu.models import spark as spark_model
from rwkvtts_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(params, tx) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def spark_loss_fn(params, cfg, batch, rng, l2_wrap=0.0):
    loss, n_valid = spark_model.forward(
        params,
        cfg,
        batch["tokens"],
        batch["modality"],
        labels=batch["labels"],
        attention_mask=batch.get("attention_mask"),
        resets=batch.get("resets"),
        dropout_rng=rng,
        l2_wrap=l2_wrap,
    )
    return loss, n_valid


def make_train_step(
    cfg,
    tx: optax.GradientTransformation,
    loss_fn: Callable = spark_loss_fn,
    mesh=None,
    donate: bool = True,
):
    """Returns step(state, batch, rng) -> (state, metrics), jitted with
    sharded in/out when a mesh is given."""

    def step(state: TrainState, batch, rng):
        (loss, n_valid), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, cfg, batch, rng
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": loss,
            "tokens": n_valid,
            "grad_norm": gnorm,
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    bsh = mesh_lib.batch_sharding(mesh)

    # Sharding constraints are applied inside the jitted fn (params arrive
    # already sharded via shard_params; GSPMD propagates the rest).
    def sharded_step(state, batch, rng):
        batch = {
            k: jax.lax.with_sharding_constraint(v, bsh)
            for k, v in batch.items()
        }
        return step(state, batch, rng)

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())
