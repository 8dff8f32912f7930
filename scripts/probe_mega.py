"""Mosaic probes for the whole-step decode megakernel (ops/decode_mega.py).

Each probe compiles + runs ONE tiny pallas_call exercising a construct the
megakernel needs, so a remote-compiler crash is attributable. Constructs:
  1. t128        — jnp.transpose of a (128,128) f32 tile in-kernel (the
                   lane<->sublane bridge for the WKV v/y vectors; the known
                   Mosaic crash is lane->sublane RESHAPE, transpose may be
                   fine — this decides the kernel's layout strategy)
  2. bcast_t     — the full v-vector bridge: (1,128) lane slice ->
                   broadcast (128,128) -> transpose -> halves masked into a
                   (64,128) head-pair block
  3. int8_dot    — int8 weight tile load + dequant (convert*scale) fused
                   into a (1,2048)@(2048,1024) MXU matvec
  4. switch_acc  — lax.switch on a program_id-derived index, branches doing
                   static-offset stores into a persistent VMEM scratch
                   accumulator across grid steps
  5. state_pair  — per-head-pair python loop over a (16,64,128) state block
                   with masked-half reductions fed by (1,128) lane slices
                   of a (1,2048) row (the WKV glue at B=1)
  6. dyn_store   — pl.ds dynamic-lane-offset store (fallback if switch_acc
                   fails)
"""
import sys
import traceback

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, TN = 2048, 1024
INTERPRET = False


def run(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"OK   {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}", flush=True)


# -- 1. 128x128 transpose ----------------------------------------------------

def p_t128():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0))

    x = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
    return pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# -- 2. lane->sublane bridge via broadcast+transpose -------------------------

def p_bcast_t():
    def k(v_ref, o_ref):
        v = v_ref[0:1, 128:256]  # (1,128) lane slice of the (1,2048) row
        vt = jnp.transpose(jnp.broadcast_to(v, (128, 128)), (1, 0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        h1 = (lane < 64).astype(jnp.float32)
        o_ref[...] = vt[0:64, :] * h1 + vt[64:128, :] * (1.0 - h1)

    x = jnp.arange(C, dtype=jnp.float32).reshape(1, C)
    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = np.zeros((64, 128), np.float32)
    ref[:, :64] = np.arange(128, 192)[:, None]
    ref[:, 64:] = np.arange(192, 256)[:, None]
    np.testing.assert_allclose(np.asarray(out), ref)
    return out


# -- 3. int8 dequant matvec ---------------------------------------------------

def p_int8_dot():
    def k(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16) * s_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = jnp.ones((1, C), jnp.float32)
    w = jnp.ones((C, TN), jnp.int8)
    s = jnp.full((1, TN), 0.5, jnp.bfloat16)
    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((1, TN), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w, s)
    np.testing.assert_allclose(np.asarray(out), np.full((1, TN), C * 0.5), rtol=1e-2)
    return out


# -- 4. switch + persistent scratch accumulator across grid -------------------

def p_switch_acc():
    def k(x_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        def br(off):
            def _b():
                acc[0:1, off * TN:(off + 1) * TN] += x_ref[...]
            return _b

        jax.lax.switch(t % 4, [br(0), br(1), br(2), br(3)])

        @pl.when(t == 7)
        def _():
            o_ref[...] = acc[...]

    x = jnp.ones((1, TN), jnp.float32)
    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, TN), lambda t: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4 * TN), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4 * TN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 4 * TN), jnp.float32)],
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.full((1, 4 * TN), 2.0))
    return out


# -- 5. per-pair WKV glue on a (16,64,128) block ------------------------------

def p_state_pair():
    N = 64

    def k(s_ref, z_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * N), 1)
        h1 = (lane < N).astype(jnp.float32)
        h2 = 1.0 - h1
        for p in range(16):
            S = s_ref[p]  # (64, 128)
            z = z_ref[0:1, 128 * p:128 * (p + 1)]  # (1, 128)
            Sz = S * z
            sa1 = jnp.sum(Sz * h1, axis=-1, keepdims=True)
            sa2 = jnp.sum(Sz * h2, axis=-1, keepdims=True)
            o_ref[p] = sa1 * h1 + sa2 * h2

    s = jnp.ones((16, N, 2 * N), jnp.float32)
    z = jnp.ones((1, C), jnp.float32)
    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((16, N, 2 * N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, z)
    np.testing.assert_allclose(np.asarray(out), np.full((16, N, 2 * N), 64.0))
    return out


# -- 6. dynamic-lane-offset store (fallback) ----------------------------------

def p_dyn_store():
    def k(x_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[0:1, pl.ds(t * TN, TN)] = x_ref[...] + t.astype(jnp.float32)

    x = jnp.ones((1, TN), jnp.float32)
    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, TN), lambda t: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4 * TN), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4 * TN), jnp.float32),
    )(x)
    ref = np.concatenate([np.full((1, TN), 1.0 + t) for t in range(4)], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)
    return out


PROBES = [
    ("t128", p_t128),
    ("bcast_t", p_bcast_t),
    ("int8_dot", p_int8_dot),
    ("switch_acc", p_switch_acc),
    ("state_pair", p_state_pair),
    ("dyn_store", p_dyn_store),
]

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--interpret"]
    if "--interpret" in sys.argv:
        INTERPRET = True
    only = args[0] if args else None
    for name, fn in PROBES:
        if only and name != only:
            continue
        run(name, fn)
