"""Fused Pallas TPU kernel for the chunked WKV7 recurrence.

Same math as ops/wkv7.py::wkv7_chunked (see that module's derivation), fused
into one kernel. Layout: grid = (BH/G, T/CHUNK) with the chunk axis
innermost; each grid step processes G (batch·head) slices of one chunk as
*batched* MXU matmuls, and the G fp32 states live in VMEM scratch across the
whole chunk sweep — no HBM round-trips between chunks, no per-op dispatch
between the ~15 matmuls of a chunk.

This is the TPU-native counterpart of the reference CUDA training kernel
(reference model/llm/cuda/wkv7_cuda.cu: one thread-block per (head, batch),
shared-memory staging, fp32 state, CHUNK_LEN=16). Differences by design:
chunk math is dense batched matmuls instead of per-step scalar loops, and
CHUNK defaults to 64 to match MXU tiling.

Used for inference/prefill forward (`impl='pallas'`); training uses the
differentiable chunked formulation (same math, XLA AD + checkpointing).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 64


def _wkv7_kernel(r_ref, w_ref, k_ref, v_ref, z_ref, b_ref, s0_ref,
                 y_ref, sout_ref, state, *, chunk: int, n_chunks: int):
    L = chunk
    f32 = jnp.float32
    G = r_ref.shape[0]
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        state[...] = s0_ref[...]

    r = r_ref[:, 0].astype(f32)
    w_raw = w_ref[:, 0].astype(f32)
    k = k_ref[:, 0].astype(f32)
    v = v_ref[:, 0].astype(f32)
    z = z_ref[:, 0].astype(f32)
    b = b_ref[:, 0].astype(f32)

    r_i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    incl = (c_i <= r_i).astype(f32)
    strict = (c_i < r_i).astype(f32)
    eye = jnp.eye(L, dtype=f32)

    # batched helpers over the leading G dim
    def bdotT(a, bm):  # (G,L,N) x (G,M,N) -> (G,L,M)
        return jax.lax.dot_general(
            a, bm, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )

    def bdot(a, bm):  # (G,L,M) x (G,M,K) -> (G,L,K)
        return jax.lax.dot_general(
            a, bm, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )

    logw = -jnp.exp(w_raw)                      # (G, L, N)
    # inclusive cumsum over the chunk axis as a triangular matmul
    # (cumsum has no Pallas TPU lowering; this also rides the MXU)
    g = jax.lax.dot_general(
        jnp.broadcast_to(incl, (G, L, L)), logw,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    )
    gp = g - logw
    eg = jnp.exp(g)
    qt = r * eg
    zt = z * jnp.exp(gp)
    kt = k * jnp.exp(-g)
    bt = b * jnp.exp(-g)

    A = bdotT(zt, bt) * strict                  # (G, L, L)
    Kz = bdotT(zt, kt) * strict

    # (I - A)^{-1} via Neumann doubling (A nilpotent)
    inv = eye + A
    power = A
    for _ in range(max(0, (L - 1).bit_length() - 1)):
        power = bdot(power, power)
        inv = bdot(inv, eye + power)

    s0 = state[...]                             # (G, Nv, Nk)
    sa_in = bdotT(zt, s0) + bdot(Kz, v)         # (G, L, Nv)
    sa = bdot(inv, sa_in)

    y = bdotT(qt, s0) + bdot(bdotT(qt, bt) * incl, sa) + bdot(
        bdotT(qt, kt) * incl, v
    )
    y_ref[:, 0] = y.astype(y_ref.dtype)

    wL = eg[:, -1:, :]                          # (G, 1, N)
    s_new = s0 * wL + bdot(
        jnp.swapaxes(sa, 1, 2), bt * wL
    ) + bdot(jnp.swapaxes(v, 1, 2), kt * wL)
    state[...] = s_new

    @pl.when(c == n_chunks - 1)
    def _():
        sout_ref[...] = s_new


def wkv7_pallas(
    r: jax.Array,
    w_raw: jax.Array,
    k: jax.Array,
    v: jax.Array,
    z: jax.Array,
    b: jax.Array,
    state: Optional[jax.Array] = None,
    resets: Optional[jax.Array] = None,
    *,
    chunk: int = DEFAULT_CHUNK,
    group: int = 16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Inputs (B, T, H, N); state (B, H, N, N) fp32. Returns (y, state).

    `group` = how many (batch·head) slices share one grid step (bounded by
    VMEM). Segment resets are not supported in the fused kernel (packed
    training uses the differentiable chunked path); passing resets falls
    back.
    """
    if resets is not None:
        from rwkvtts_tpu.ops import wkv7 as ref

        return ref.wkv7_chunked(r, w_raw, k, v, z, b, state, resets, chunk=chunk)

    B, T, H, N = r.shape
    out_dtype = v.dtype
    if state is None:
        state = jnp.zeros((B, H, N, N), jnp.float32)
    pad = (-T) % chunk
    if pad:
        zpad = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        r, k, v, z, b = map(zpad, (r, k, v, z, b))
        # w_raw = -30 → decay ≈ 1 (identity) on padded steps
        w_raw = jnp.pad(w_raw, ((0, 0), (0, pad), (0, 0), (0, 0)),
                        constant_values=-30.0)
    Tp = T + pad
    n_chunks = Tp // chunk
    BH = B * H
    G = min(group, BH)
    while BH % G:
        G -= 1
    n_groups = BH // G

    def to_blocks(x):  # (B, Tp, H, N) -> (BH, n_chunks, L, N)
        x = jnp.moveaxis(x, 2, 1).reshape(BH, n_chunks, chunk, N)
        return x

    rs, ws, ks, vs, zs, bs = map(to_blocks, (r, w_raw, k, v, z, b))
    s0 = state.reshape(BH, N, N)

    chunk_spec = pl.BlockSpec(
        (G, 1, chunk, N), lambda gi, c: (gi, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    state_spec = pl.BlockSpec(
        (G, N, N), lambda gi, c: (gi, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_wkv7_kernel, chunk=chunk, n_chunks=n_chunks)

    y, s_out = pl.pallas_call(
        kernel,
        grid=(n_groups, n_chunks),
        in_specs=[chunk_spec] * 6 + [state_spec],
        out_specs=(chunk_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((BH, n_chunks, chunk, N), out_dtype),
            jax.ShapeDtypeStruct((BH, N, N), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=interpret,
    )(rs, ws, ks, vs, zs, bs, s0)

    y = jnp.moveaxis(y.reshape(B, H, Tp, N), 1, 2)[:, :T]
    return y.astype(out_dtype), s_out.reshape(B, H, N, N)
