"""Mosaic construct probes for the B=64 whole-step decode megakernel.

The B=1 megakernel (ops/decode_mega.py) keeps activations as (1, C) lane
rows and the state as (64, 128) head-pair blocks. At B=64 the state path
moves to a TRANSPOSED layout so every WKV-update op is a plain broadcast:

  per head-pair block SB (4096, 128) f32:
    row m = i*64 + j   (i = v-dim, j = k-dim)
    lane q = h*64 + b  (h = head-in-pair, b = batch)
  3D view S3 = SB.reshape(64, 64, 128)  — leading-dim split, no relayout.

  S2[i,j,q] = S3*WD[None] + sa*B3[None] + V3[:,None]*K3[None]
  with sa = sum_j(S3 * Z[None], axis=1, keepdims=True)      # (64,1,128)
  y[i,q]   = sum_j(S2 * R[None], axis=1).reshape(64, 128)   # free merge

  Per-(b,h) row blocks (WD/Z/B3/K/V/R: (64, 128)) come from the lane-major
  matmul outputs (B=64, 128-slice) via ONE MXU eye-dot each:
    T = dot(eye128, X, contract lanes) -> (128, 64) = X^T
    blk = concat([T[0:64], T[64:128]], axis=1)              # (64, 128)
  (the broadcast+transpose bridge is banned: it fails layout assignment on
  computed rows — see the r4h failure + ops/decode_mega.py bridge note).

Probes (each asserts numerics; --interpret for CPU, default real Mosaic):
  1. eyedot_t    — the (64,128)->(64,128) transposed-block construct
  2. state3d     — full single-pair WKV update + y extraction at B=64
  3. lhsT_dot    — output projection with a TRANSPOSED LHS:
                   (C, 64)^T-contraction @ (C, TN) -> (64, TN)
  4. gn_cols     — GroupNorm over sublanes (i) per lane (h,b)
  5. b64_matmul  — int8 dequant matmul at (64, C) @ (C, TN)
  6. store_bf16  — f32 compute -> bf16 (4096,128) state store
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False
B = 64
C = 2048
TN = 512


def _eye128():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)


def _tblk(eye, x):
    """(64 b, 128 c=h*64+j) lane-major slice -> (64 j, 128 q=h*64+b)."""
    t = jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (128 c, 64 b)
    return jnp.concatenate([t[0:64, :], t[64:128, :]], axis=1)


def _tblk_np(x):
    t = np.asarray(x).T  # (128, 64)
    return np.concatenate([t[0:64], t[64:128]], axis=1)


# -- 1. eye-dot transposed block ---------------------------------------------

def p_eyedot_t():
    def k(x_ref, o_ref):
        eye = _eye128()
        # computed row (matmul-derived) to reproduce the replicated-offset
        # layout class that killed the broadcast bridge in r4h
        x = jax.lax.dot_general(
            x_ref[...], eye, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * 2.0
        o_ref[...] = _tblk(eye, x)

    x = jnp.asarray(np.random.RandomState(0).randn(B, 128), jnp.float32)
    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), _tblk_np(x) * 2.0, rtol=1e-5)
    return out


# -- 2. single-pair WKV update at B=64 in the transposed layout ---------------

def p_state3d():
    rs = np.random.RandomState(1)
    S0 = rs.randn(4096, 128).astype(np.float32) * 0.1
    rows = {n: rs.randn(B, 128).astype(np.float32) * 0.5
            for n in ("r", "wd", "z", "bb", "k", "v")}

    def k(s_ref, r_ref, wd_ref, z_ref, bb_ref, k_ref, v_ref, s2_ref, y_ref):
        eye = _eye128()
        R = _tblk(eye, r_ref[...])[None]      # (1, 64, 128)
        WD = _tblk(eye, wd_ref[...])[None]
        Z = _tblk(eye, z_ref[...])[None]
        BB = _tblk(eye, bb_ref[...])[None]
        K = _tblk(eye, k_ref[...])[None]
        V = _tblk(eye, v_ref[...])[:, None, :]  # wait: see below
        S3 = s_ref[...].reshape(64, 64, 128)
        sa = jnp.sum(S3 * Z, axis=1, keepdims=True)        # (64, 1, 128)
        S2 = S3 * WD + sa * BB + V * K
        s2_ref[...] = S2.reshape(4096, 128)
        y_ref[...] = jnp.sum(S2 * R, axis=1).reshape(64, 128)

    # NOTE on V: _tblk gives (64 i, 128 q); broadcasting over j needs
    # (64, 1, 128) — [:, None, :] inserts the middle axis.
    out_s2, out_y = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((4096, 128), jnp.float32),
            jax.ShapeDtypeStruct((64, 128), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )(jnp.asarray(S0), *[jnp.asarray(rows[n]) for n in
                         ("r", "wd", "z", "bb", "k", "v")])

    T = {n: _tblk_np(rows[n]) for n in rows}
    S3 = S0.reshape(64, 64, 128)
    sa = (S3 * T["z"][None]).sum(1, keepdims=True)
    S2 = S3 * T["wd"][None] + sa * T["bb"][None] + T["v"][:, None] * T["k"][None]
    y = (S2 * T["r"][None]).sum(1)
    np.testing.assert_allclose(np.asarray(out_s2), S2.reshape(4096, 128),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_y), y, rtol=2e-4, atol=2e-4)
    return out_y


# -- 3. transposed-LHS output projection --------------------------------------

def p_lhsT_dot():
    rs = np.random.RandomState(2)
    yt = rs.randn(C, B).astype(np.float32) * 0.1
    w = rs.randn(C, TN).astype(np.float32) * 0.05

    def k(y_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            y_ref[...].astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((B, TN), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(yt), jnp.asarray(w))
    ref = yt.astype(np.float32).T @ w
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)
    return out


# -- 4. GroupNorm over sublanes ------------------------------------------------

def p_gn_cols():
    rs = np.random.RandomState(3)
    y = rs.randn(64, 128).astype(np.float32)

    def k(y_ref, o_ref):
        yb = y_ref[...]
        m = jnp.mean(yb, axis=0, keepdims=True)         # (1, 128)
        v = jnp.mean((yb - m) ** 2, axis=0, keepdims=True)
        o_ref[...] = (yb - m) * jax.lax.rsqrt(v + 1e-5)

    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(y))
    m = y.mean(0, keepdims=True)
    ref = (y - m) / np.sqrt(((y - m) ** 2).mean(0, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    return out


# -- 5. int8 dequant matmul at B=64 --------------------------------------------

def p_b64_matmul():
    rs = np.random.RandomState(4)
    x = rs.randn(B, C).astype(np.float32) * 0.1
    w = rs.randint(-127, 128, (C, TN)).astype(np.int8)
    s = np.full((1, TN), 0.01, np.float32)

    def k(x_ref, w_ref, s_ref, o_ref):
        wq = w_ref[...].astype(jnp.bfloat16) * s_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), wq,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((B, TN), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s))
    ref = x.astype(np.float32) @ (w.astype(np.float32) * s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-2, atol=5e-2)
    return out


# -- 6. bf16 state store --------------------------------------------------------

def p_store_bf16():
    rs = np.random.RandomState(5)
    S0 = rs.randn(4096, 128).astype(np.float32)

    def k(s_ref, o_ref):
        o_ref[...] = (s_ref[...].astype(jnp.float32) * 1.5).astype(jnp.bfloat16)

    out = pl.pallas_call(
        k,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((4096, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(S0.astype(jnp.bfloat16)))
    ref = (S0.astype(jnp.bfloat16).astype(np.float32) * 1.5).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out).astype(np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2,
    )
    return out


PROBES = [
    ("eyedot_t", p_eyedot_t),
    ("state3d", p_state3d),
    ("lhsT_dot", p_lhsT_dot),
    ("gn_cols", p_gn_cols),
    ("b64_matmul", p_b64_matmul),
    ("store_bf16", p_store_bf16),
]


def run(name, fn):
    import traceback
    try:
        fn()
        print(f"OK   {name}", flush=True)
    except Exception:
        print(f"FAIL {name}", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--interpret"]
    if "--interpret" in sys.argv:
        INTERPRET = True
        jax.config.update("jax_platforms", "cpu")
    only = args[0] if args else None
    for name, fn in PROBES:
        if only and name != only:
            continue
        run(name, fn)
