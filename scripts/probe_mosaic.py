"""Bisect which Pallas construct crashes the Mosaic compiler on this TPU."""
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, L, N = 8, 64, 64


def run(name, kernel, n_out=1, extra_in=0):
    try:
        ins = [jnp.ones((G, 1, L, N), jnp.bfloat16)] * (1 + extra_in)
        out = pl.pallas_call(
            kernel,
            grid=(1, 1),
            in_specs=[
                pl.BlockSpec((G, 1, L, N), lambda gi, ci: (gi, ci, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * (1 + extra_in),
            out_specs=pl.BlockSpec((G, 1, L, N), lambda gi, ci: (gi, ci, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 1, L, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        )(*ins)
        np.asarray(out)
        print(f"OK   {name}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}", flush=True)


def k_baseline(x_ref, o_ref, st):
    o_ref[...] = x_ref[...].astype(jnp.float32) * 2.0


def k_slice_read(x_ref, o_ref, st):
    a = x_ref[0:2, 0]            # (2, L, N)
    o_ref[0:2, 0] = a.astype(jnp.float32)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


def k_reshape_pair(x_ref, o_ref, st):
    a = x_ref[0:2, 0].reshape(2 * L, N)
    o_ref[0:2, 0] = (a * 2.0).reshape(2, L, N).astype(jnp.float32)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


def k_scratch_slice(x_ref, o_ref, st):
    st[0:2] = x_ref[0:2, 0, 0:N, :].astype(jnp.float32)
    s = st[0:2].reshape(2 * N, N)
    o_ref[0:2, 0, 0:N, :] = s.reshape(2, N, N)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


def k_iota_div(x_ref, o_ref, st):
    ri = jax.lax.broadcasted_iota(jnp.int32, (2 * L, 2 * L), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (2 * L, 2 * L), 1)
    m = jnp.where((ri // L) == (ci // L), 1.0, 0.0).astype(jnp.float32)
    a = x_ref[0:2, 0].reshape(2 * L, N).astype(jnp.float32)
    g = jax.lax.dot_general(m, a, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0:2, 0] = g.reshape(2, L, N)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


def k_dotT(x_ref, o_ref, st):
    a = x_ref[0:2, 0].reshape(2 * L, N).astype(jnp.float32)
    m = jax.lax.dot_general(a, a, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (2L, 2L)
    y = jax.lax.dot_general(m, a, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0:2, 0] = y.reshape(2, L, N)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


def k_dotTl(x_ref, o_ref, st):
    a = x_ref[0:2, 0].reshape(2 * L, N).astype(jnp.float32)
    m = jax.lax.dot_general(a, a, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (N, N)
    st[0:2] = jnp.stack([m, m])
    o_ref[...] = x_ref[...].astype(jnp.float32)


def k_concat_lanes(x_ref, o_ref, st):
    a = x_ref[0:2, 0].reshape(2 * L, N).astype(jnp.float32)
    rb0 = jax.lax.broadcasted_iota(jnp.int32, (2 * L, 1), 0) < L
    e = jnp.concatenate([jnp.where(rb0, a, 0.0), jnp.where(rb0, 0.0, a)], axis=1)
    o_ref[0:2, 0] = (e[:, :N] + e[:, N:]).reshape(2, L, N)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


def k_loop_pairs(x_ref, o_ref, st):
    for p in range(G // 2):
        sl = slice(2 * p, 2 * p + 2)
        a = x_ref[sl, 0].reshape(2 * L, N).astype(jnp.float32)
        o_ref[sl, 0] = (a * 2.0).reshape(2, L, N)


def k_rowslice(x_ref, o_ref, st):
    a = x_ref[0:2, 0].reshape(2 * L, N).astype(jnp.float32)
    last0 = a[L - 1 : L, :]
    last1 = a[2 * L - 1 : 2 * L, :]
    e = jnp.concatenate([last0, last1], axis=0)  # (2, N)
    rb0 = jax.lax.broadcasted_iota(jnp.int32, (2 * L, 1), 0) < L
    wl = jnp.where(rb0, e[0:1, :], e[1:2, :])
    o_ref[0:2, 0] = (a * wl).reshape(2, L, N)
    o_ref[2:, 0] = x_ref[2:, 0].astype(jnp.float32)


probes = [
    ("baseline", k_baseline),
    ("slice_read_write", k_slice_read),
    ("reshape_pair_2L", k_reshape_pair),
    ("scratch_slice_reshape", k_scratch_slice),
    ("iota_div_mask_matmul", k_iota_div),
    ("dotT_then_dot", k_dotT),
    ("dotTl_contract_dim0", k_dotTl),
    ("concat_lanes_expand", k_concat_lanes),
    ("python_pair_loop", k_loop_pairs),
    ("row_slice_broadcast", k_rowslice),
]

for name, kern in probes:
    run(name, kern)
