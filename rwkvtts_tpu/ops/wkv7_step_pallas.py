"""Fused Pallas TPU kernel for the WKV7 decode step (persistent state).

TPU-native counterpart of the reference's batched inference kernel
(reference model/llm/cuda/rwkv7_state_fwd_fp16.cu: one thread-block per
(batch, head), fp32 state updated in place). The XLA einsum form
(ops/wkv7.py::wkv7_step) is correct but makes ~4 HBM passes over the
(B, H, N, N) fp32 state per step (read for sa, read+write for the update,
read for y) — at decode batch 64 the state is 150 MB, so those passes ARE
the decode step time. This kernel reads the state once and writes it once.

Layout: the state is kept PACKED as (P, N, 2N), P = B*H/2 — two heads'
key dims side by side in the 128-lane axis (N=64). All contractions in the
step math run over the key dim j:

    sa_i = sum_j S[i,j] * z_j
    S'   = S * diag(w)_j + sa_i * b_j + v_i * k_j
    y_i  = sum_j S'[i,j] * r_j

so with keys in lanes every reduction is a masked lane reduction and every
update term is a (sublane-vector x lane-vector) broadcast — pure VPU work
at full 128-lane width, no MXU, no relayouts. Per-half lane masks keep the
two packed heads independent. v and the outputs (which are indexed by the
value dim i) ride as sublane vectors (P, 2N, 1).

Opt-in per config: `cfg.decode_wkv_packed` makes
models/rwkv7.py::pack_decode_state pack each layer's wkv leaf once with
pack_state() below, and every decode loop then carries the (P, N, 2N)
layout across steps (per-step repacking would cost the same passes this
kernel removes). The carry may be bf16 (cfg.decode_state_bf16 composes):
the kernel loads to f32, steps, and stores back in the carry dtype —
halving the state HBM term that dominates 1.4B-class decode. It wins in the ~96-128-row slot-pool regime and loses to
the XLA step at small B (PERF.md round 3: B=64 13.2k vs 14.2k tok/s,
B=128 10.2k vs 9.0k — per-layer pallas_call launch/DMA overhead vs XLA's
state re-materialization copies), hence per-config rather than default.
Single-device only: a GSPMD-sharded carry would gather the state around
the pallas_call (same rule as ops/wkv7.resolve_impl for training).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkvtts_tpu.ops.wkv7 import decay_from_raw

# group sweep at B=64/128 (scripts/bench_step_group.py, PERF.md round 3):
# G=8 -> 32 within 2% (the call is launch-overhead-bound, not grid-bound),
# G=64 VMEM-OOMs (23.9M scoped > 16M). 16 is the safe flat-region choice.
DEFAULT_STEP_GROUP = 16


# ---------------------------------------------------------------------------
# Layout converters (used once per generate call, not per step)


def pack_state(s: jax.Array) -> jax.Array:
    """(..., B, H, N, N) -> (..., B*H//2, N, 2N): adjacent head pairs packed
    along lanes."""
    *lead, B, H, N, _ = s.shape
    s = s.reshape(*lead, B, H // 2, 2, N, N)
    s = jnp.moveaxis(s, -3, -2)  # (..., B, H/2, N, 2, N)
    return s.reshape(*lead, B * (H // 2), N, 2 * N)


def unpack_state(s: jax.Array, B: int, H: int) -> jax.Array:
    """Inverse of pack_state."""
    *lead, P, N, N2 = s.shape
    s = s.reshape(*lead, B, H // 2, N, 2, N)
    s = jnp.moveaxis(s, -2, -3)
    return s.reshape(*lead, B, H, N, N)


def _lanes(x: jax.Array) -> jax.Array:
    """(B, H, N) -> (P, 1, 2N) lane vector, head-pair packed."""
    B, H, N = x.shape
    return x.reshape(B * (H // 2), 1, 2 * N)


def _subs(x: jax.Array) -> jax.Array:
    """(B, H, N) -> (P, 2N, 1) sublane vector, head-pair packed."""
    B, H, N = x.shape
    return x.reshape(B * (H // 2), 2 * N, 1)


# ---------------------------------------------------------------------------
# Kernel


def _step_kernel(s_ref, wd_ref, k_ref, z_ref, b_ref, r_ref, v_ref,
                 os_ref, oy_ref, *, N: int):
    # the carried state may be bf16 (cfg.decode_state_bf16 composed with
    # the packed layout): read it up to f32 once in VMEM, step in f32,
    # store back in the carry dtype — halves the dominant HBM term at
    # 1.4B-class decode (state read+write per step) at zero extra passes
    S = s_ref[...].astype(jnp.float32)  # (G, N, 2N)
    wd = wd_ref[...]  # (G, 1, 2N)
    k = k_ref[...]
    z = z_ref[...]
    b = b_ref[...]
    r = r_ref[...]
    vv = v_ref[...]  # (G, 2N, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * N), 2)
    h1 = (lane < N).astype(S.dtype)
    h2 = 1.0 - h1

    Sz = S * z
    sa1 = jnp.sum(Sz * h1, axis=-1, keepdims=True)  # (G, N, 1)
    sa2 = jnp.sum(Sz * h2, axis=-1, keepdims=True)
    sa = sa1 * h1 + sa2 * h2  # (G, N, 2N): per-half broadcast
    v1 = vv[:, 0:N, :]
    v2 = vv[:, N:, :]
    vb = v1 * h1 + v2 * h2

    S2 = S * wd + sa * b + vb * k
    os_ref[...] = S2.astype(os_ref.dtype)

    Sr = S2 * r
    y1 = jnp.sum(Sr * h1, axis=-1, keepdims=True)
    y2 = jnp.sum(Sr * h2, axis=-1, keepdims=True)
    oy_ref[:, 0:N, :] = y1
    oy_ref[:, N:, :] = y2


def _pick_group(P: int, group: int) -> int:
    g = min(group, P)
    while P % g:
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def wkv7_step_packed(
    state: jax.Array,  # (P, N, 2N) fp32, packed
    r: jax.Array,  # (B, H, N)
    w_raw: jax.Array,
    k: jax.Array,
    v: jax.Array,
    z: jax.Array,
    b: jax.Array,
    *,
    group: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step on the packed state. Returns (y (B,H,N), state')."""
    B, H, N = r.shape
    P = state.shape[0]
    assert P == B * (H // 2) and H % 2 == 0

    f32 = lambda x: x.astype(jnp.float32)
    wd = decay_from_raw(w_raw)
    out_dtype = v.dtype

    G = _pick_group(P, group)
    grid = (P // G,)
    vec = lambda x: _lanes(f32(x))
    spec_s = pl.BlockSpec((G, N, 2 * N), lambda g: (g, 0, 0))
    spec_v = pl.BlockSpec((G, 1, 2 * N), lambda g: (g, 0, 0))
    spec_sub = pl.BlockSpec((G, 2 * N, 1), lambda g: (g, 0, 0))

    s2, y = pl.pallas_call(
        functools.partial(_step_kernel, N=N),
        grid=grid,
        in_specs=[spec_s, spec_v, spec_v, spec_v, spec_v, spec_v, spec_sub],
        out_specs=[spec_s, spec_sub],
        out_shape=[
            # carry dtype preserved: f32 (default) or bf16
            # (decode_state_bf16) — the kernel steps in f32 either way
            jax.ShapeDtypeStruct((P, N, 2 * N), state.dtype),
            jax.ShapeDtypeStruct((P, 2 * N, 1), jnp.float32),
        ],
        # state is updated IN PLACE (operand 0 -> output 0): inside a scan
        # the carried buffer never round-trips through a fresh HBM
        # allocation — the copy band that makes the XLA step regress past
        # B~128 (PERF.md round 3) cannot appear here
        input_output_aliases={0: 0},
        interpret=interpret,
    )(state, vec(wd), vec(k), vec(z), vec(b), vec(r), _subs(f32(v)))

    y = y.reshape(B, H, N).astype(out_dtype)
    return y, s2


def wkv7_step_packed_ref(state, r, w_raw, k, v, z, b):
    """XLA reference of the packed step (same layout contract) — used on
    CPU and as the parity oracle for the kernel."""
    B, H, N = r.shape
    f32 = lambda x: x.astype(jnp.float32)
    out_dtype = v.dtype
    carry_dtype = state.dtype  # bf16 carry preserved (decode_state_bf16)
    wd = decay_from_raw(w_raw)
    S = f32(state).reshape(B, H // 2, N, 2, N)
    S = jnp.moveaxis(S, -2, -3).reshape(B, H, N, N)
    r, k, v, z, b = map(f32, (r, k, v, z, b))
    sa = jnp.einsum("bhij,bhj->bhi", S, z)
    S = S * wd[:, :, None, :] + sa[..., None] * b[:, :, None, :] + v[..., None] * k[:, :, None, :]
    y = jnp.einsum("bhij,bhj->bhi", S, r)
    return y.astype(out_dtype), pack_state(S).astype(carry_dtype)
