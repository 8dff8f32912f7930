"""Fused Pallas TPU kernels for the chunked WKV7 recurrence — fwd AND bwd.

Same chunk math as ops/wkv7.py::wkv7_chunked (see that module's derivation),
fused into one forward kernel and one backward kernel wired through
`jax.custom_vjp`. This is the TPU-native counterpart of the reference CUDA
training kernel pair (reference model/llm/cuda/wkv7_cuda.cu:10-52 forward,
:54-130 backward): like the CUDA kernel, the forward checkpoints the fp32
state at every chunk boundary and the backward re-derives all within-chunk
intermediates from those checkpoints (checkpoint-and-recompute), never
materializing per-step states to HBM.

Design notes (what round 1 got wrong and this rewrite fixes):

* **Head-pair packing.** N=64-wide per-head matmuls use a quarter of the
  128x128 MXU and their G-batched `dot_general`s were serialized by Mosaic
  (125 ms vs 46 ms XLA, PERF.md). Here two (batch, head) slices are packed
  into one (2L, .) problem: the pairwise chunk matrices become (2L, 2L)
  block-diagonal (built with block-diag masks, and block-diagonality is
  closed under the Neumann products), and the state-coupled matmuls use
  lane-expanded (2L, 2N) operands so each op is a full 128-wide MXU tile.
* **State lives in VMEM scratch** (external layout: value-dim rows, key-dim
  lanes) for the whole chunk sweep — no HBM round-trips between chunks, and
  the key-in-lanes orientation keeps the final-state decay a lane-direction
  broadcast (the sublane-direction variant crashes Mosaic on this target).
* **In-chunk cumsum as a triangular matmul** (cumsum has no TPU Pallas
  lowering, and the XLA path's cumsum+exp prep fusion was the single
  hottest op at 24.7 ms — here it rides the MXU).
* **Backward = jax.vjp of the chunk function, traced inside the kernel.**
  The reverse-sweep kernel walks chunks back-to-front (reversed index
  maps), carries dS^T in VMEM scratch, recomputes the chunk forward from
  the checkpointed entry state, and emits all six input gradients plus the
  initial-state gradient. Exactly the CUDA backward's strategy, but the
  within-chunk math is dense MXU matmuls instead of per-step scalar loops.

Segment resets (packed training, the rwkv-fla `cu_seqlens` equivalent) are
supported natively: a per-position segment counter rides along as an f32
side input and shapes the chunk masks, matching wkv7_chunked's semantics.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 64
DEFAULT_GROUP = 8

_PAD_W_RAW = -30.0  # exp(-exp(-30)) ~= 1.0: identity decay on padded steps


def _neumann_steps(L: int) -> int:
    return max(0, (L - 1).bit_length() - 1)




# ---------------------------------------------------------------------------
# The per-pair chunk function (pure jnp; traced inside both kernels, and
# differentiated by jax.vjp inside the backward kernel)
# ---------------------------------------------------------------------------


def _pair_chunk(
    s0p, r, w_raw, k, v, z, b, c2,
    *,
    L: int,
    with_resets: bool,
    mm_dtype,
    inv_in=None,
    return_inv: bool = False,
):
    """One chunk for a packed pair of (batch, head) slices.

    s0p: (2N, N) f32 — entry states stacked [S_h0; S_h1], value-dim rows /
         key-dim lanes (the external layout). Keeping the key dim in LANES
         matters: the final-state decay is then a lane-direction broadcast;
         the transposed layout would need a (2, N) -> (2N, 1) lane->sublane
         relayout, which crashes the Mosaic compiler on this target.
    r..b: (2L, N) — the two slices' chunk inputs stacked along rows.
    c2:   (2, L) f32 — within-chunk inclusive segment counters (all zeros
          when with_resets=False).
    Returns (y (2L, Nv), s_out (2N, Nk)), both f32.
    """
    f32 = jnp.float32
    N = r.shape[-1]
    L2 = 2 * L
    mm = lambda x: x.astype(mm_dtype)

    def dot(a, bm):  # (M,K)@(K,P) f32 accum
        return jax.lax.dot_general(
            mm(a), mm(bm), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def dotT(a, bm):  # (M,K)@(P,K)^T -> (M,P)
        return jax.lax.dot_general(
            mm(a), mm(bm), (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )

    def dotTl(a, bm):  # (K,M)^T@(K,P) -> (M,P)
        return jax.lax.dot_general(
            mm(a), mm(bm), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    r, k, v, z, b = (x.astype(f32) for x in (r, k, v, z, b))
    ew = jnp.exp(w_raw.astype(f32))  # = -log w, in (0, e^-0.5]
    logw = -ew

    ri = jax.lax.broadcasted_iota(jnp.int32, (L2, L2), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L2, L2), 1)
    same_block = (ri // L) == (ci // L)
    rb0 = jax.lax.broadcasted_iota(jnp.int32, (L2, 1), 0) < L  # row in block 0

    if with_resets:
        cprev = jnp.concatenate(
            [jnp.zeros((2, 1), f32), c2[:, :-1]], axis=1
        )
        reset = (c2 != cprev).reshape(L2, 1)
        # zero decay at reset positions (their incoming state is masked away)
        logw = jnp.where(reset, 0.0, logw)
        ew_eff = jnp.where(reset, 0.0, ew)
    else:
        ew_eff = ew

    # in-chunk inclusive cumsum of log-decay as a block-diag triangular
    # matmul (f32 operands: the cumulative sums feed exp and must not round)
    incl_nb = jnp.where((ri >= ci) & same_block, 1.0, 0.0).astype(f32)
    g = jax.lax.dot_general(
        incl_nb, logw, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # (2L, N)

    e_g = jnp.exp(g)
    e_gneg = jnp.exp(-g)
    qt = r * e_g
    zt = z * (e_g * jnp.exp(ew_eff))  # z * exp(g - logw)
    kt = k * e_gneg
    bt = b * e_gneg

    if with_resets:
        cc = c2.reshape(L2, 1)
        same_seg = (cc == cc.reshape(1, L2)) & same_block
        m_strict = jnp.where((ri > ci) & same_seg, 1.0, 0.0).astype(f32)
        m_incl = jnp.where((ri >= ci) & same_seg, 1.0, 0.0).astype(f32)
        mask0 = cc == 0.0
    else:
        m_strict = jnp.where((ri > ci) & same_block, 1.0, 0.0).astype(f32)
        m_incl = incl_nb
        mask0 = None

    # Merged pairwise chunk matrices: A/Kz share left operand zt and QB/QK
    # share qt, so each pair rides one (2L, 4L) matmul instead of two
    # (2L, 2L) ones — the kernel is bound by the COUNT of serial MXU ops
    # (PERF.md round-2 roofline note), not their MACs.
    btkt = jnp.concatenate([bt, kt], axis=0)  # (4L, N)
    AK = dotT(zt, btkt)  # (2L, 4L) = [A_raw | Kz_raw]
    QBK = dotT(qt, btkt) * jnp.concatenate([m_incl, m_incl], axis=1)
    A = AK[:, :L2] * m_strict
    Kz = AK[:, L2:] * m_strict

    z0 = jnp.where(mask0, zt, 0.0) if with_resets else zt
    q0 = jnp.where(mask0, qt, 0.0) if with_resets else qt

    rbN = jax.lax.broadcasted_iota(jnp.int32, (2 * N, 1), 0) < N

    def expand(x, blk):  # (2L, N)/(2N, N) -> (., 2N): block p data in lanes p
        return jnp.concatenate(
            [jnp.where(blk, x, 0.0), jnp.where(blk, 0.0, x)], axis=1
        )

    def collapse(x):  # (2L, 2N) block-structured -> (2L, N)
        return x[:, :N] + x[:, N:]

    s0e = expand(s0p, rbN)  # (2N, 2N): block-diag state

    # dotT(row-expanded, state-expanded) contracts the 2N lane dim; the
    # disjoint lane blocks kill all cross-head terms, and the output comes
    # back lane-expanded -> collapse. z0/q0 ride one stacked matmul.
    zq0e = jnp.concatenate([expand(z0, rb0), expand(q0, rb0)], axis=0)
    ZQ = dotT(zq0e, s0e)  # (4L, 2N)
    sa_in = collapse(ZQ[:L2]) + dot(Kz, v)  # (2L, Nv)

    # (I - A)^{-1} by Neumann doubling; A is per-block nilpotent (A^L = 0)
    # and block-diagonal (closed under these products). The vector-form
    # doubling (applying (I + A^{2^k}) to sa_in directly) has fewer MACs
    # but measured SLOWER in-model (386 vs 354 ms step): it is one long
    # dependent chain, while the matrix form gives the MXU independent
    # work to pipeline. A custom-vjp adjoint solve (u = (I-A)^{-T} dy via
    # reversed doubling powers; dA = u sa^T) also measured SLOWER (887 vs
    # 865 ms step at 0.4B, round 3): the residual powers it carries add
    # VMEM pressure that costs more than the ~13 saved transpose matmuls.
    if inv_in is not None:
        # Saved-inverse solve (backward kernel): the forward stored
        # inv = (I-A)^{-1}, so the solve's adjoint is u = inv^T dsa and
        # dA = u sa^T — two matmuls instead of autodiff through the
        # doubling chain (~30 serial MXU ops, PERF.md round 3). Exact
        # same math: A is per-block nilpotent so the Neumann inverse is
        # the true inverse and u sa^T its true gradient.
        @jax.custom_vjp
        def _solve(A_, sain_, inv_):
            return dot(inv_, sain_)

        def _solve_fwd(A_, sain_, inv_):
            sa_ = dot(inv_, sain_)
            return sa_, (inv_, sa_)

        def _solve_bwd(res_, dsa_):
            inv_, sa_ = res_
            u = dotTl(inv_, dsa_)  # (I-A)^{-T} dsa
            return dotT(u, sa_), u, jnp.zeros_like(inv_)

        _solve.defvjp(_solve_fwd, _solve_bwd)
        inv = inv_in
        sa = _solve(A, sa_in, inv_in)
    else:
        eye = jnp.where(ri == ci, 1.0, 0.0).astype(f32)
        inv = eye + A
        power = A
        for _ in range(_neumann_steps(L)):
            power = dot(power, power)
            inv = dot(inv, eye + power)
        sa = dot(inv, sa_in)

    # y's two chunk-matrix terms share the merged QBK: [QB|QK] @ [sa; v]
    y = collapse(ZQ[L2:]) + dot(QBK, jnp.concatenate([sa, v], axis=0))

    # final state: sources in the chunk's last segment survive, scaled by
    # the remaining decay; the entry state survives iff no reset occurred
    e_g_last = jnp.concatenate(
        [e_g[L - 1 : L, :], e_g[L2 - 1 : L2, :]], axis=0
    )  # (2, N)
    wl = jnp.where(rb0, e_g_last[0:1, :], e_g_last[1:2, :])  # (2L, N)
    wfin = jnp.where(rbN, e_g_last[0:1, :], e_g_last[1:2, :])  # (2N, N)
    if with_resets:
        c_last0 = c2[0:1, L - 1 : L]  # (1, 1)
        c_last1 = c2[1:2, L - 1 : L]
        lastvec = jnp.where(rb0, c_last0, c_last1)  # (2L, 1)
        live = c2.reshape(L2, 1) == lastvec
        k_fin = jnp.where(live, kt, 0.0) * wl
        b_fin = jnp.where(live, bt, 0.0) * wl
        live0 = jnp.where(
            rbN, (c_last0 == 0.0), (c_last1 == 0.0)
        ).astype(f32)
    else:
        k_fin = kt * wl
        b_fin = bt * wl
        live0 = 1.0
    # merged: [expand(sa); expand(v)]^T @ [b_fin; k_fin] — stacking along
    # the contracted (row) dim turns the sum of two products into one op
    s_out = s0p * (wfin * live0) + dotTl(
        jnp.concatenate([expand(sa, rb0), expand(v, rb0)], axis=0),
        jnp.concatenate([b_fin, k_fin], axis=0),
    )
    if return_inv:
        return y, s_out, inv
    return y, s_out


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(
    c_ref, r_ref, w_ref, k_ref, v_ref, z_ref, b_ref, s0_ref,
    y_ref, sfin_ref, sentry_ref, *rest,
    L: int, with_resets: bool, mm_dtype, save_inv: bool,
):
    if save_inv:
        inv_ref, st = rest
    else:
        (st,) = rest
    G = r_ref.shape[0]
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        st[...] = s0_ref[...]

    sentry_ref[:, 0] = st[...]

    for p in range(G // 2):
        sl = slice(2 * p, 2 * p + 2)
        N = r_ref.shape[-1]
        pair = lambda ref: ref[sl, 0].reshape(2 * L, N)
        s0t = st[sl].reshape(2 * N, N)
        c2 = c_ref[sl, 0].reshape(2, L) if with_resets else jnp.zeros((2, L), jnp.float32)
        out = _pair_chunk(
            s0t, pair(r_ref), pair(w_ref), pair(k_ref), pair(v_ref),
            pair(z_ref), pair(b_ref), c2,
            L=L, with_resets=with_resets, mm_dtype=mm_dtype,
            return_inv=save_inv,
        )
        y, s_out_t = out[0], out[1]
        if save_inv:
            inv_ref[p, 0] = out[2]
        y_ref[sl, 0] = y.reshape(2, L, N).astype(y_ref.dtype)
        st[sl] = s_out_t.reshape(2, N, N)

    sfin_ref[...] = st[...]


def _bwd_kernel(
    c_ref, r_ref, w_ref, k_ref, v_ref, z_ref, b_ref, sentry_ref,
    *rest,
    L: int, n_chunks: int, with_resets: bool, mm_dtype, save_inv: bool,
):
    """Reverse chunk sweep: index maps deliver chunk n_chunks-1-i at grid
    step i; dS^T is carried in scratch; each chunk's forward is recomputed
    from the checkpointed entry state and differentiated in place."""
    if save_inv:
        inv_ref, *rest = rest
    else:
        inv_ref = None
    (dy_ref, dsfin_ref,
     dr_ref, dw_ref, dk_ref, dv_ref, dz_ref, db_ref, ds0_ref, dst) = rest
    G = r_ref.shape[0]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dst[...] = dsfin_ref[...]

    for p in range(G // 2):
        sl = slice(2 * p, 2 * p + 2)
        N = r_ref.shape[-1]
        pair = lambda ref: ref[sl, 0].reshape(2 * L, N)
        s0t = sentry_ref[sl, 0].reshape(2 * N, N)
        c2 = c_ref[sl, 0].reshape(2, L) if with_resets else jnp.zeros((2, L), jnp.float32)
        inv_p = inv_ref[p, 0] if save_inv else None

        def f(rr, ww, kk, vv, zz, bb, s0t_):
            return _pair_chunk(
                s0t_, rr, ww, kk, vv, zz, bb, c2,
                L=L, with_resets=with_resets, mm_dtype=mm_dtype,
                inv_in=inv_p,
            )

        args = (pair(r_ref), pair(w_ref), pair(k_ref), pair(v_ref),
                pair(z_ref), pair(b_ref), s0t)
        _, vjp = jax.vjp(f, *args)
        dy = dy_ref[sl, 0].reshape(2 * L, N).astype(jnp.float32)
        ds_out = dst[sl].reshape(2 * N, N)
        dr, dw, dk, dv, dz, db, ds0t = vjp((dy, ds_out))

        wr = lambda ref, val: ref.__setitem__(
            (sl, 0), val.reshape(2, L, N).astype(ref.dtype)
        )
        wr(dr_ref, dr)
        wr(dw_ref, dw)
        wr(dk_ref, dk)
        wr(dv_ref, dv)
        wr(dz_ref, dz)
        wr(db_ref, db)
        dst[sl] = ds0t.reshape(2, N, N)

    ds0_ref[...] = dst[...]


# ---------------------------------------------------------------------------
# Host-side plumbing
# ---------------------------------------------------------------------------


def _auto_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _prep(arrs, state, resets, chunk, group):
    """Common layout work: pad T, flatten (B,H), build segment counters.

    arrs: tuple of (B, T, H, N) chunk inputs; arrs[1] must be w_raw (its
    padding value keeps the decay at identity). Returns a dict of
    kernel-ready arrays plus layout metadata.
    """
    B, T, H, N = arrs[0].shape
    pad = (-T) % chunk
    if pad:
        def zpad(x, i):
            return jnp.pad(
                x, ((0, 0), (0, pad), (0, 0), (0, 0)),
                constant_values=_PAD_W_RAW if i == 1 else 0,
            )

        arrs = tuple(zpad(x, i) for i, x in enumerate(arrs))
    Tp = T + pad
    n_chunks = Tp // chunk
    BH = B * H

    with_resets = resets is not None
    if with_resets:
        ri = resets.astype(jnp.float32)
        if pad:
            ri = jnp.pad(ri, ((0, 0), (0, pad)))
        c = jnp.cumsum(ri.reshape(B, n_chunks, chunk), axis=2)
        c = jnp.broadcast_to(c[:, None], (B, H, n_chunks, chunk)).reshape(
            BH, n_chunks, chunk, 1
        )
    else:
        # trailing singleton keeps the block tiling legal ((L, 1) block on
        # an (..., L, 1) array; a 3-D (G, 1, L) block violates the (8, 128)
        # minor-dims rule)
        c = jnp.zeros((BH, n_chunks, chunk, 1), jnp.float32)

    def to_blocks(x):  # (B, Tp, H, N) -> (BH, n_chunks, L, N)
        return jnp.moveaxis(x, 2, 1).reshape(BH, n_chunks, chunk, N)

    blocks = tuple(map(to_blocks, arrs))
    s0 = state.reshape(BH, N, N)  # (value-dim rows, key-dim lanes)

    G = min(group, BH)
    G -= G % 2
    G = max(G, 2)
    padBH = (-BH) % G
    if padBH:
        zb = lambda x: jnp.pad(
            x, ((0, padBH),) + ((0, 0),) * (x.ndim - 1)
        )
        blocks = tuple(map(zb, blocks))
        c = zb(c)
        s0 = zb(s0)
    return dict(
        blocks=blocks, c=c, s0=s0, B=B, T=T, H=H, N=N, Tp=Tp,
        n_chunks=n_chunks, BH=BH, BHp=BH + padBH, G=G,
        with_resets=with_resets,
    )


def _specs(G, L, N, n_chunks, reverse=False):
    cmap = (lambda gi, ci: (gi, n_chunks - 1 - ci, 0, 0)) if reverse else (
        lambda gi, ci: (gi, ci, 0, 0)
    )
    chunk_spec = pl.BlockSpec((G, 1, L, N), cmap, memory_space=pltpu.VMEM)
    cseg_spec = pl.BlockSpec((G, 1, L, 1), cmap, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec(
        (G, N, N), lambda gi, ci: (gi, 0, 0), memory_space=pltpu.VMEM
    )
    sentry_spec = pl.BlockSpec((G, 1, N, N), cmap, memory_space=pltpu.VMEM)
    # per-PAIR saved (I-A)^{-1} blocks: (2L, 2L) block-diagonal
    inv_spec = pl.BlockSpec((G // 2, 1, 2 * L, 2 * L), cmap,
                            memory_space=pltpu.VMEM)
    return chunk_spec, cseg_spec, state_spec, sentry_spec, inv_spec


def _fwd_call(c, blocks, s0, meta, *, chunk, mm_dtype, interpret,
              save_inv=False):
    G, BHp, n_chunks, N = meta["G"], meta["BHp"], meta["n_chunks"], meta["N"]
    L = chunk
    chunk_spec, cseg_spec, state_spec, sentry_spec, inv_spec = _specs(
        G, L, N, n_chunks
    )
    out_dtype = blocks[2].dtype  # v's dtype
    kernel = functools.partial(
        _fwd_kernel, L=L, with_resets=meta["with_resets"], mm_dtype=mm_dtype,
        save_inv=save_inv,
    )
    out_specs = (chunk_spec, state_spec, sentry_spec)
    out_shape = (
        jax.ShapeDtypeStruct((BHp, n_chunks, L, N), out_dtype),
        jax.ShapeDtypeStruct((BHp, N, N), jnp.float32),
        jax.ShapeDtypeStruct((BHp, n_chunks, N, N), jnp.float32),
    )
    if save_inv:
        out_specs = out_specs + (inv_spec,)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(
                (BHp // 2, n_chunks, 2 * L, 2 * L), jnp.float32
            ),
        )
    outs = pl.pallas_call(
        kernel,
        grid=(BHp // G, n_chunks),
        in_specs=[cseg_spec] + [chunk_spec] * 6 + [state_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=interpret,
    )(c, *blocks, s0)
    if save_inv:
        return outs
    return outs + (None,)


def _bwd_call(c, blocks, s_entry, dy, dsfin, meta, *, chunk, mm_dtype,
              interpret, inv=None):
    G, BHp, n_chunks, N = meta["G"], meta["BHp"], meta["n_chunks"], meta["N"]
    L = chunk
    save_inv = inv is not None
    chunk_spec, cseg_spec, state_spec, sentry_spec, inv_spec = _specs(
        G, L, N, n_chunks, reverse=True
    )
    kernel = functools.partial(
        _bwd_kernel, L=L, n_chunks=n_chunks,
        with_resets=meta["with_resets"], mm_dtype=mm_dtype,
        save_inv=save_inv,
    )
    in_dtypes = [b.dtype for b in blocks]
    in_specs = [cseg_spec] + [chunk_spec] * 6 + [sentry_spec]
    ins = (c,) + tuple(blocks) + (s_entry,)
    if save_inv:
        in_specs += [inv_spec]
        ins += (inv,)
    in_specs += [chunk_spec, state_spec]
    ins += (dy, dsfin)
    outs = pl.pallas_call(
        kernel,
        grid=(BHp // G, n_chunks),
        in_specs=in_specs,
        out_specs=tuple([chunk_spec] * 6 + [state_spec]),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BHp, n_chunks, L, N), dt)
            for dt in in_dtypes
        )
        + (jax.ShapeDtypeStruct((BHp, N, N), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=interpret,
    )(*ins)
    return outs


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _wkv7_pallas_core(
    r, w_raw, k, v, z, b, state, resets,
    chunk, group, mm_name, interpret, has_resets, group_bwd, solve,
):
    # primal (not being differentiated): never store inv — only the vjp
    # forward below needs it
    y, s_fin = _core_fwd(
        r, w_raw, k, v, z, b, state, resets,
        chunk, group, mm_name, interpret, has_resets, group_bwd, "autodiff",
    )[0]
    return y, s_fin


def _core_fwd(
    r, w_raw, k, v, z, b, state, resets,
    chunk, group, mm_name, interpret, has_resets, group_bwd=None,
    solve="saved",
):
    mm_dtype = jnp.bfloat16 if mm_name == "bf16" else jnp.float32
    meta = _prep(
        (r, w_raw, k, v, z, b), state, resets if has_resets else None,
        chunk, group,
    )
    yb, s_fin_t, s_entry, inv = _fwd_call(
        meta["c"], meta["blocks"], meta["s0"], meta,
        chunk=chunk, mm_dtype=mm_dtype, interpret=interpret,
        save_inv=(solve == "saved"),
    )
    # Offer the kernel outputs to jax.checkpoint by name: with the model's
    # remat_policy='wkv' (save_only_these_names) the replay rebuilds the
    # kernel INPUTS (cheap layout + projections) but never re-executes the
    # forward Pallas call — its outputs are saved. Without a surrounding
    # checkpoint these are no-ops.
    from jax.ad_checkpoint import checkpoint_name

    yb = checkpoint_name(yb, "wkv_y")
    s_fin_t = checkpoint_name(s_fin_t, "wkv_s_fin")
    s_entry = checkpoint_name(s_entry, "wkv_s_entry")
    if inv is not None:
        inv = checkpoint_name(inv, "wkv_inv")
    B, T, H, N, BH = meta["B"], meta["T"], meta["H"], meta["N"], meta["BH"]
    y = jnp.moveaxis(
        yb[:BH].reshape(B, H, meta["Tp"], N), 1, 2
    )[:, :T]
    s_fin = s_fin_t[:BH].reshape(B, H, N, N)
    return (y, s_fin), (meta, s_entry, inv)


def _core_fwd_vjp(
    r, w_raw, k, v, z, b, state, resets,
    chunk, group, mm_name, interpret, has_resets, group_bwd, solve,
):
    (y, s_fin), (meta, s_entry, inv) = _core_fwd(
        r, w_raw, k, v, z, b, state, resets,
        chunk, group, mm_name, interpret, has_resets, group_bwd, solve,
    )
    res = (meta["c"], meta["blocks"], s_entry, inv, resets)
    return (y, s_fin), res


def _core_bwd(chunk, group, mm_name, interpret, has_resets, group_bwd, solve,
              res, cts):
    c, blocks, s_entry, inv, resets = res
    dy, dsfin = cts
    mm_dtype = jnp.bfloat16 if mm_name == "bf16" else jnp.float32
    BHp, n_chunks, L, N = blocks[0].shape
    B, T, H, _ = dy.shape
    BH = B * H
    pad = n_chunks * L - T
    dyp = jnp.pad(
        dy, ((0, 0), (0, pad), (0, 0), (0, 0))
    ) if pad else dy
    dyb = jnp.moveaxis(dyp, 2, 1).reshape(BH, n_chunks, L, N)
    if BHp > BH:
        dyb = jnp.pad(dyb, ((0, BHp - BH), (0, 0), (0, 0), (0, 0)))
    dsfin_t = dsfin.reshape(BH, N, N).astype(jnp.float32)
    if BHp > BH:
        dsfin_t = jnp.pad(dsfin_t, ((0, BHp - BH), (0, 0), (0, 0)))

    # BHp was padded for the FORWARD group; the backward may use its own
    # (smaller) group — the bwd kernel carries ~3x the forward's live VMEM
    # (recompute + vjp), so its group OOMs first. Any even G dividing BHp
    # is legal.
    G = min(group_bwd or group, BH)
    G -= G % 2
    G = max(G, 2)
    while BHp % G:
        G -= 2
    meta = dict(G=G, BHp=BHp, n_chunks=n_chunks, N=N, with_resets=has_resets)

    outs = _bwd_call(
        c, blocks, s_entry, dyb.astype(blocks[0].dtype), dsfin_t, meta,
        chunk=L, mm_dtype=mm_dtype, interpret=interpret, inv=inv,
    )
    dblocks, ds0t = outs[:6], outs[6]

    def from_blocks(x):  # (BHp, n_chunks, L, N) -> (B, T, H, N)
        x = x[:BH].reshape(B, H, n_chunks * L, N)
        return jnp.moveaxis(x, 1, 2)[:, :T]

    dr, dw, dk, dv, dz, db = map(from_blocks, dblocks)
    # state is fp32 by contract (ops/wkv7.STATE_DTYPE)
    dstate = ds0t[:BH].reshape(B, H, N, N)
    return dr, dw, dk, dv, dz, db, dstate, jnp.zeros_like(resets)


_wkv7_pallas_core.defvjp(_core_fwd_vjp, _core_bwd)


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
    group: int = DEFAULT_GROUP,
    group_bwd: Optional[int] = None,
    mm_dtype: str = "f32",
    interpret: Optional[bool] = None,
    solve: str = "saved",
) -> Tuple[jax.Array, jax.Array]:
    """Fused WKV7, differentiable. Inputs (B, T, H, N); state (B, H, Nv, Nk)
    fp32. Returns (y, final_state); y in v's dtype.

    mm_dtype: 'f32' (default; fp32 MXU passes, tightest parity with the
    scan reference) or 'bf16' (bf16 operands + fp32 accumulation — the
    reference CUDA kernel's own precision contract, wkv7_cuda.cu:3-8).

    solve: 'saved' (default) stores the per-chunk Neumann inverse from the
    forward so the backward's solve adjoint is two matmuls; 'autodiff'
    recomputes it in the backward and differentiates through the doubling
    chain (~30 extra serial MXU ops per chunk, but no inv HBM traffic).
    """
    B, T, H, N = r.shape
    if state is None:
        state = jnp.zeros((B, H, N, N), jnp.float32)
    if interpret is None:
        interpret = _auto_interpret()
    has_resets = resets is not None
    if resets is None:
        resets = jnp.zeros((B, T), jnp.float32)
    else:
        resets = resets.astype(jnp.float32)
    return _wkv7_pallas_core(
        r, w_raw, k, v, z, b, state, resets,
        chunk, group, mm_dtype, bool(interpret), has_resets, group_bwd,
        solve,
    )


# ---------------------------------------------------------------------------
# Fused-prep variant: the post-projection elementwise band lives IN-kernel
# ---------------------------------------------------------------------------
#
# The time-mix ops between the projections and the WKV call — kk =
# l2_normalize(k*k_k), k_eff = k*(1+(a-1)*k_a), z = -kk, b = kk*a, the ln_x
# GroupNorm on y, and the bonus term (r·k_eff·r_k)·v — are HBM-bound XLA
# fusions bracketing an opaque pallas_call (reference math:
# rwkv_asr_cuda_whisper.py:206-214). Folding them into the kernel removes
# those fusion boundaries: the kernel reads (r, w_raw, k_raw, v, a) and the
# tiny per-head params, and writes the FINAL pre-gate y. Per-head params
# ride as (BH, N) rows (head-tiled over batch); their gradients accumulate
# in the revisited output block across the backward chunk sweep and are
# reduced over batch outside.

_L2_EPS_SQ = 1e-24  # matches ops/norm.l2_normalize (eps=1e-12, clamped pre-sqrt)


def _pair_fused(
    s0p, r, w_raw, kraw, v, a, kkp, kap, rkp, lnwp, lnbp, c2,
    *,
    L: int,
    with_resets: bool,
    mm_dtype,
    ln_eps: float,
    inv_in=None,
    return_inv: bool = False,
):
    """_pair_chunk plus the surrounding elementwise prep/post, fused.

    kraw/a: (2L, N) pre-normalize key and in-context learning rate.
    kkp..lnbp: (2, N) f32 per-head params for the two packed heads.
    Returns (y_final (2L, N) f32, s_out (2N, N) f32).
    """
    f32 = jnp.float32
    N = kraw.shape[-1]
    L2 = 2 * L
    rb0 = jax.lax.broadcasted_iota(jnp.int32, (L2, 1), 0) < L
    sel = lambda p: jnp.where(rb0, p[0:1, :], p[1:2, :])  # (2L, N)

    kraw = kraw.astype(f32)
    a = a.astype(f32)
    kx = kraw * sel(kkp)
    s = jnp.sum(kx * kx, axis=-1, keepdims=True)
    kk = kx / jnp.sqrt(jnp.maximum(s, _L2_EPS_SQ))
    keff = kraw * (1.0 + (a - 1.0) * sel(kap))
    out = _pair_chunk(
        s0p, r, w_raw, keff, v, -kk, kk * a, c2,
        L=L, with_resets=with_resets, mm_dtype=mm_dtype,
        inv_in=inv_in, return_inv=return_inv,
    )
    y, s_out = out[0], out[1]
    # ln_x GroupNorm: per (position, head) stats over the N lanes
    mu = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    yn = yc * jax.lax.rsqrt(var + ln_eps) * sel(lnwp) + sel(lnbp)
    bonus = jnp.sum(
        r.astype(f32) * keff * sel(rkp), axis=-1, keepdims=True
    ) * v.astype(f32)
    if return_inv:
        return yn + bonus, s_out, out[2]
    return yn + bonus, s_out


def _fwd_kernel_fused(
    c_ref, r_ref, w_ref, k_ref, v_ref, a_ref,
    kkp_ref, kap_ref, rkp_ref, lnw_ref, lnb_ref, s0_ref,
    y_ref, sfin_ref, sentry_ref, *rest,
    L: int, with_resets: bool, mm_dtype, ln_eps: float, save_inv: bool,
):
    if save_inv:
        inv_ref, st = rest
    else:
        (st,) = rest
    G = r_ref.shape[0]
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        st[...] = s0_ref[...]

    sentry_ref[:, 0] = st[...]

    for p in range(G // 2):
        sl = slice(2 * p, 2 * p + 2)
        N = r_ref.shape[-1]
        pair = lambda ref: ref[sl, 0].reshape(2 * L, N)
        prm = lambda ref: ref[sl]
        s0t = st[sl].reshape(2 * N, N)
        c2 = c_ref[sl, 0].reshape(2, L) if with_resets else jnp.zeros(
            (2, L), jnp.float32
        )
        out = _pair_fused(
            s0t, pair(r_ref), pair(w_ref), pair(k_ref), pair(v_ref),
            pair(a_ref), prm(kkp_ref), prm(kap_ref), prm(rkp_ref),
            prm(lnw_ref), prm(lnb_ref), c2,
            L=L, with_resets=with_resets, mm_dtype=mm_dtype, ln_eps=ln_eps,
            return_inv=save_inv,
        )
        y, s_out = out[0], out[1]
        if save_inv:
            inv_ref[p, 0] = out[2]
        y_ref[sl, 0] = y.reshape(2, L, N).astype(y_ref.dtype)
        st[sl] = s_out.reshape(2, N, N)

    sfin_ref[...] = st[...]


def _bwd_kernel_fused(
    c_ref, r_ref, w_ref, k_ref, v_ref, a_ref,
    kkp_ref, kap_ref, rkp_ref, lnw_ref, lnb_ref, sentry_ref,
    *rest,
    L: int, n_chunks: int, with_resets: bool, mm_dtype, ln_eps: float,
    save_inv: bool,
):
    """Reverse sweep as _bwd_kernel; per-head param grads accumulate into
    their (G, N) output blocks, which stay VMEM-resident across the chunk
    iterations of a grid row (the output index map ignores the chunk dim)."""
    if save_inv:
        inv_ref, *rest = rest
    else:
        inv_ref = None
    (dy_ref, dsfin_ref,
     dr_ref, dw_ref, dk_ref, dv_ref, da_ref,
     dkkp_ref, dkap_ref, drkp_ref, dlnw_ref, dlnb_ref, ds0_ref, dst) = rest
    G = r_ref.shape[0]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dst[...] = dsfin_ref[...]
        for ref in (dkkp_ref, dkap_ref, drkp_ref, dlnw_ref, dlnb_ref):
            ref[...] = jnp.zeros_like(ref)

    for p in range(G // 2):
        sl = slice(2 * p, 2 * p + 2)
        N = r_ref.shape[-1]
        pair = lambda ref: ref[sl, 0].reshape(2 * L, N)
        prm = lambda ref: ref[sl]
        s0t = sentry_ref[sl, 0].reshape(2 * N, N)
        c2 = c_ref[sl, 0].reshape(2, L) if with_resets else jnp.zeros(
            (2, L), jnp.float32
        )
        inv_p = inv_ref[p, 0] if save_inv else None

        def f(rr, ww, kr, vv, aa, p1, p2, p3, p4, p5, s0t_):
            return _pair_fused(
                s0t_, rr, ww, kr, vv, aa, p1, p2, p3, p4, p5, c2,
                L=L, with_resets=with_resets, mm_dtype=mm_dtype,
                ln_eps=ln_eps, inv_in=inv_p,
            )

        args = (
            pair(r_ref), pair(w_ref), pair(k_ref), pair(v_ref), pair(a_ref),
            prm(kkp_ref), prm(kap_ref), prm(rkp_ref), prm(lnw_ref),
            prm(lnb_ref), s0t,
        )
        _, vjp = jax.vjp(f, *args)
        dy = dy_ref[sl, 0].reshape(2 * L, N).astype(jnp.float32)
        ds_out = dst[sl].reshape(2 * N, N)
        grads = vjp((dy, ds_out))
        dr, dw, dk, dv, da = grads[:5]
        dkkp, dkap, drkp, dlnw, dlnb = grads[5:10]
        ds0t = grads[10]

        wr = lambda ref, val: ref.__setitem__(
            (sl, 0), val.reshape(2, L, N).astype(ref.dtype)
        )
        wr(dr_ref, dr)
        wr(dw_ref, dw)
        wr(dk_ref, dk)
        wr(dv_ref, dv)
        wr(da_ref, da)
        dkkp_ref[sl] += dkkp
        dkap_ref[sl] += dkap
        drkp_ref[sl] += drkp
        dlnw_ref[sl] += dlnw
        dlnb_ref[sl] += dlnb
        dst[sl] = ds0t.reshape(2, N, N)

    ds0_ref[...] = dst[...]


def _fused_fwd_call(c, blocks, prms, s0, meta, *, chunk, mm_dtype, ln_eps,
                    interpret, save_inv=False):
    G, BHp, n_chunks, N = meta["G"], meta["BHp"], meta["n_chunks"], meta["N"]
    L = chunk
    chunk_spec, cseg_spec, state_spec, sentry_spec, inv_spec = _specs(
        G, L, N, n_chunks
    )
    prm_spec = pl.BlockSpec(
        (G, N), lambda gi, ci: (gi, 0), memory_space=pltpu.VMEM
    )
    out_dtype = blocks[3].dtype  # v's dtype
    kernel = functools.partial(
        _fwd_kernel_fused, L=L, with_resets=meta["with_resets"],
        mm_dtype=mm_dtype, ln_eps=ln_eps, save_inv=save_inv,
    )
    out_specs = (chunk_spec, state_spec, sentry_spec)
    out_shape = (
        jax.ShapeDtypeStruct((BHp, n_chunks, L, N), out_dtype),
        jax.ShapeDtypeStruct((BHp, N, N), jnp.float32),
        jax.ShapeDtypeStruct((BHp, n_chunks, N, N), jnp.float32),
    )
    if save_inv:
        out_specs = out_specs + (inv_spec,)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct(
                (BHp // 2, n_chunks, 2 * L, 2 * L), jnp.float32
            ),
        )
    outs = pl.pallas_call(
        kernel,
        grid=(BHp // G, n_chunks),
        in_specs=[cseg_spec] + [chunk_spec] * 5 + [prm_spec] * 5
        + [state_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=interpret,
    )(c, *blocks, *prms, s0)
    if save_inv:
        return outs
    return outs + (None,)


def _fused_bwd_call(c, blocks, prms, s_entry, dy, dsfin, meta, *, chunk,
                    mm_dtype, ln_eps, interpret, inv=None):
    G, BHp, n_chunks, N = meta["G"], meta["BHp"], meta["n_chunks"], meta["N"]
    L = chunk
    save_inv = inv is not None
    chunk_spec, cseg_spec, state_spec, sentry_spec, inv_spec = _specs(
        G, L, N, n_chunks, reverse=True
    )
    prm_spec = pl.BlockSpec(
        (G, N), lambda gi, ci: (gi, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _bwd_kernel_fused, L=L, n_chunks=n_chunks,
        with_resets=meta["with_resets"], mm_dtype=mm_dtype, ln_eps=ln_eps,
        save_inv=save_inv,
    )
    in_dtypes = [b.dtype for b in blocks]
    in_specs = [cseg_spec] + [chunk_spec] * 5 + [prm_spec] * 5 + [sentry_spec]
    ins = (c,) + tuple(blocks) + tuple(prms) + (s_entry,)
    if save_inv:
        in_specs += [inv_spec]
        ins += (inv,)
    in_specs += [chunk_spec, state_spec]
    ins += (dy, dsfin)
    outs = pl.pallas_call(
        kernel,
        grid=(BHp // G, n_chunks),
        in_specs=in_specs,
        out_specs=tuple(
            [chunk_spec] * 5 + [prm_spec] * 5 + [state_spec]
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BHp, n_chunks, L, N), dt)
            for dt in in_dtypes
        )
        + tuple(
            jax.ShapeDtypeStruct((BHp, N), jnp.float32) for _ in range(5)
        )
        + (jax.ShapeDtypeStruct((BHp, N, N), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((G, N, N), jnp.float32)],
        interpret=interpret,
    )(*ins)
    return outs


def _tile_params(p, B, H, N, BHp):
    """(H, N) f32 -> (BHp, N): head rows tiled over batch, zero-padded."""
    t = jnp.broadcast_to(p.astype(jnp.float32)[None], (B, H, N)).reshape(
        B * H, N
    )
    if BHp > B * H:
        t = jnp.pad(t, ((0, BHp - B * H), (0, 0)))
    return t


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18, 19)
)
def _wkv7_fused_core(
    r, w_raw, k_raw, v, a, kkp, kap, rkp, lnw, lnb, state, resets,
    chunk, group, mm_name, interpret, has_resets, group_bwd, ln_eps, solve,
):
    # primal (not being differentiated): never store inv — only the vjp
    # forward below needs it
    return _fused_fwd(
        r, w_raw, k_raw, v, a, kkp, kap, rkp, lnw, lnb, state, resets,
        chunk, group, mm_name, interpret, has_resets, group_bwd, ln_eps,
        "autodiff",
    )[0]


def _fused_fwd(
    r, w_raw, k_raw, v, a, kkp, kap, rkp, lnw, lnb, state, resets,
    chunk, group, mm_name, interpret, has_resets, group_bwd, ln_eps,
    solve="saved",
):
    mm_dtype = jnp.bfloat16 if mm_name == "bf16" else jnp.float32
    meta = _prep(
        (r, w_raw, k_raw, v, a), state, resets if has_resets else None,
        chunk, group,
    )
    B, H, N, BHp = meta["B"], meta["H"], meta["N"], meta["BHp"]
    prms = tuple(
        _tile_params(p, B, H, N, BHp) for p in (kkp, kap, rkp, lnw, lnb)
    )
    yb, s_fin_t, s_entry, inv = _fused_fwd_call(
        meta["c"], meta["blocks"], prms, meta["s0"], meta,
        chunk=chunk, mm_dtype=mm_dtype, ln_eps=ln_eps, interpret=interpret,
        save_inv=(solve == "saved"),
    )
    from jax.ad_checkpoint import checkpoint_name

    yb = checkpoint_name(yb, "wkv_y")
    s_fin_t = checkpoint_name(s_fin_t, "wkv_s_fin")
    s_entry = checkpoint_name(s_entry, "wkv_s_entry")
    if inv is not None:
        inv = checkpoint_name(inv, "wkv_inv")
    T, BH = meta["T"], meta["BH"]
    y = jnp.moveaxis(yb[:BH].reshape(B, H, meta["Tp"], N), 1, 2)[:, :T]
    s_fin = s_fin_t[:BH].reshape(B, H, N, N)
    return (y, s_fin), (meta, prms, s_entry, inv)


def _fused_fwd_vjp(
    r, w_raw, k_raw, v, a, kkp, kap, rkp, lnw, lnb, state, resets,
    chunk, group, mm_name, interpret, has_resets, group_bwd, ln_eps, solve,
):
    (y, s_fin), (meta, prms, s_entry, inv) = _fused_fwd(
        r, w_raw, k_raw, v, a, kkp, kap, rkp, lnw, lnb, state, resets,
        chunk, group, mm_name, interpret, has_resets, group_bwd, ln_eps,
        solve,
    )
    res = (meta["c"], meta["blocks"], prms, s_entry, inv, resets)
    return (y, s_fin), res


def _fused_bwd(
    chunk, group, mm_name, interpret, has_resets, group_bwd, ln_eps, solve,
    res, cts,
):
    c, blocks, prms, s_entry, inv, resets = res
    dy, dsfin = cts
    mm_dtype = jnp.bfloat16 if mm_name == "bf16" else jnp.float32
    BHp, n_chunks, L, N = blocks[0].shape
    B, T, H, _ = dy.shape
    BH = B * H
    pad = n_chunks * L - T
    dyp = jnp.pad(dy, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else dy
    dyb = jnp.moveaxis(dyp, 2, 1).reshape(BH, n_chunks, L, N)
    if BHp > BH:
        dyb = jnp.pad(dyb, ((0, BHp - BH), (0, 0), (0, 0), (0, 0)))
    dsfin_t = dsfin.reshape(BH, N, N).astype(jnp.float32)
    if BHp > BH:
        dsfin_t = jnp.pad(dsfin_t, ((0, BHp - BH), (0, 0), (0, 0)))

    G = min(group_bwd or group, BH)
    G -= G % 2
    G = max(G, 2)
    while BHp % G:
        G -= 2
    meta = dict(G=G, BHp=BHp, n_chunks=n_chunks, N=N, with_resets=has_resets)

    outs = _fused_bwd_call(
        c, blocks, prms, s_entry, dyb.astype(blocks[0].dtype), dsfin_t,
        meta, chunk=L, mm_dtype=mm_dtype, ln_eps=ln_eps, interpret=interpret,
        inv=inv,
    )
    dblocks, dprms, ds0t = outs[:5], outs[5:10], outs[10]

    def from_blocks(x):
        x = x[:BH].reshape(B, H, n_chunks * L, N)
        return jnp.moveaxis(x, 1, 2)[:, :T]

    dr, dw, dk, dv, da = map(from_blocks, dblocks)
    dprm = lambda x: x[:BH].reshape(B, H, N).sum(axis=0)  # (H, N) f32
    dkkp, dkap, drkp, dlnw, dlnb = map(dprm, dprms)
    dstate = ds0t[:BH].reshape(B, H, N, N)
    return (
        dr, dw, dk, dv, da, dkkp, dkap, drkp, dlnw, dlnb, dstate,
        jnp.zeros_like(resets),
    )


_wkv7_fused_core.defvjp(_fused_fwd_vjp, _fused_bwd)


def wkv7_pallas_fused(
    r: jax.Array,
    w_raw: jax.Array,
    k_raw: jax.Array,
    v: jax.Array,
    a: jax.Array,
    k_k: jax.Array,
    k_a: jax.Array,
    r_k: jax.Array,
    ln_w: jax.Array,
    ln_b: jax.Array,
    state: Optional[jax.Array] = None,
    resets: Optional[jax.Array] = None,
    *,
    ln_eps: float,
    chunk: int = DEFAULT_CHUNK,
    group: int = DEFAULT_GROUP,
    group_bwd: Optional[int] = None,
    mm_dtype: str = "f32",
    interpret: Optional[bool] = None,
    solve: str = "saved",
) -> Tuple[jax.Array, jax.Array]:
    """Fused WKV7 including the surrounding time-mix elementwise band.

    Computes, per head: kk = l2_normalize(k_raw*k_k), k_eff =
    k_raw*(1+(a-1)*k_a), the WKV recurrence on (r, w_raw, k_eff, v, -kk,
    kk*a), the ln_x GroupNorm (eps=ln_eps) and the bonus term
    (r·k_eff·r_k)·v — reference rwkv_asr_cuda_whisper.py:206-214 — in one
    kernel pair. r/w_raw/k_raw/v/a: (B, T, H, N); k_k/k_a/r_k/ln_w/ln_b:
    (H, N) f32; state (B, H, N, N) f32. Returns (y_final pre-gate in v's
    dtype, final_state).
    """
    B, T, H, N = r.shape
    if state is None:
        state = jnp.zeros((B, H, N, N), jnp.float32)
    if interpret is None:
        interpret = _auto_interpret()
    has_resets = resets is not None
    if resets is None:
        resets = jnp.zeros((B, T), jnp.float32)
    else:
        resets = resets.astype(jnp.float32)
    return _wkv7_fused_core(
        r, w_raw, k_raw, v, a, k_k, k_a, r_k, ln_w, ln_b, state, resets,
        chunk, group, mm_dtype, bool(interpret), has_resets, group_bwd,
        float(ln_eps), solve,
    )
