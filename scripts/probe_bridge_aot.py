"""Probe lane->sublane bridge constructions via local chipless AOT.

The megakernels need to turn a COMPUTED (1,128) lane-major row into a
block varying over sublanes. vector.broadcast on such rows fails Mosaic
layout assignment ("Invalid input layout" — r4h/r4i/r4j chip logs, now
reproduced locally in ~1 s via rwkvtts_tpu.utils.aot). This probes
alternatives; run on CPU host, no TPU needed.
"""
import os

os.environ.setdefault(
    "LIBTPU_INIT_ARGS", "--fibers_default_thread_stack_size=8388608"
)
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkvtts_tpu.utils.aot import aot_compile_tpu


def probe(name, body, n_scratch=0):
    def kernel(x_ref, o_ref, *scr):
        # computed row: force it through arithmetic so Mosaic sees a
        # derived value, not a loaded one
        row = jnp.sum(x_ref[...], axis=0, keepdims=True) * 1.5  # (1,128)
        o_ref[...] = body(row, scr)

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)] * n_scratch
            + [pltpu.VMEM((128, 128), jnp.float32)],
        )(x)

    x = jnp.ones((8, 128), jnp.float32)
    try:
        aot_compile_tpu(f, x)
        print(f"OK   {name}", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if l.strip()), "")[:90]
        op = next((l for l in msg if "MLIR operation" in l), None)
        opline = msg[msg.index(op) + 1][:110] if op else ""
        print(f"FAIL {name}: {head} {opline}", flush=True)


eye = lambda: (
    jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
).astype(jnp.float32)


def b_broadcast_t(row, scr):  # current failing path (control)
    vt = jnp.transpose(jnp.broadcast_to(row, (128, 128)), (1, 0))
    return vt[0:64, :]


def b_scratch_broadcast_t(row, scr):  # current "fix" (control, fails remote)
    scr[0][...] = row
    vt = jnp.transpose(jnp.broadcast_to(scr[0][...], (128, 128)), (1, 0))
    return vt[0:64, :]


def b_mul_ones_t(row, scr):  # implicit elementwise broadcast, then transpose
    m = jnp.ones((128, 128), jnp.float32) * row
    return jnp.transpose(m, (1, 0))[0:64, :]


def b_mul_ones_eyedot(row, scr):  # implicit broadcast, MXU transpose
    m = jnp.ones((128, 128), jnp.float32) * row
    t = jax.lax.dot_general(
        eye(), m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return t[0:64, :]


def b_transpose_first(row, scr):  # (1,128)->(128,1) then lane-broadcast
    col = jnp.transpose(row, (1, 0))
    return (col * jnp.ones((128, 128), jnp.float32))[0:64, :]


def b_eyedot_direct(row, scr):  # row @ eye with contraction on lanes
    col = jax.lax.dot_general(
        eye(), row, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (128, 1)
    return (col * jnp.ones((128, 128), jnp.float32))[0:64, :]


def b_scratch_block_reload(row, scr):  # write row into 128x128 scratch rows
    big = scr[-1]
    big[...] = jnp.ones((128, 128), jnp.float32) * row
    return jnp.transpose(big[...], (1, 0))[0:64, :]


def b_repeat(row, scr):
    return pltpu.repeat(jnp.transpose(row, (1, 0)), 128, 1)[0:64, :]


probe("broadcast_t (control)", b_broadcast_t)
probe("scratch_broadcast_t (control)", b_scratch_broadcast_t, n_scratch=1)
probe("mul_ones_t", b_mul_ones_t)
probe("mul_ones_eyedot", b_mul_ones_eyedot)
probe("transpose_first", b_transpose_first)
probe("eyedot_direct", b_eyedot_direct)
probe("scratch_block_reload", b_scratch_block_reload)
probe("repeat", b_repeat)


# --- context probes: the row is a lane-offset slice of a wider computed row
# (the real kernel bridges v_eff[0:1, c0:c0+128]; vpad showed offset 128) ---


def probe_sliced(name, body, c0, n_scratch=0):
    def kernel(x_ref, o_ref, *scr):
        wide = jnp.sum(x_ref[...], axis=0, keepdims=True) * 1.5  # (1,512)
        row = wide[0:1, c0:c0 + 128]
        o_ref[...] = body(row, scr)

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)] * n_scratch
            + [pltpu.VMEM((128, 128), jnp.float32)],
        )(x)

    x = jnp.ones((8, 512), jnp.float32)
    try:
        aot_compile_tpu(f, x)
        print(f"OK   {name} c0={c0}", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if l.strip()), "")[:90]
        op = next((l for l in msg if "MLIR operation" in l), None)
        opline = msg[msg.index(op) + 1][:110] if op else ""
        print(f"FAIL {name} c0={c0}: {head} {opline}", flush=True)


for c0 in (0, 128, 256):
    probe_sliced("sl_broadcast_t", b_broadcast_t, c0)
    probe_sliced("sl_scratch_broadcast_t", b_scratch_broadcast_t, c0, n_scratch=1)
    probe_sliced("sl_mul_ones_t", b_mul_ones_t, c0)
    probe_sliced("sl_transpose_first", b_transpose_first, c0)
    probe_sliced("sl_eyedot_direct", b_eyedot_direct, c0)
