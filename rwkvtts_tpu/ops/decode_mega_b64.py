"""Whole-model decode-step megakernel for the B=64 throughput regime.

ONE pallas_call executes the entire RWKV-7 decode step for a 64-row batch
(all layers: projections, loras, WKV update, GroupNorm, bonus, gate,
output projection, squared-ReLU FFN) with activations resident in VMEM
and int8 weights streamed from HBM tile by tile.

Why: the XLA batched decode at the 1.4B B=64 production point measures
7.5 ms/step (int8 + bf16 state) against a ~2.6 ms HBM roofline
(1.3 GB int8 weights + 0.8 GB bf16 state r/w). The gap is per-op dispatch
(~30 HLO ops x 24 layers) and temp materialization; the whole-step kernel
pays one launch and streams every byte exactly once. The TPU analogue of
the reference's persistent-state decode kernels (reference
model/llm/cuda/wkv7s.cu, rwkv7_state_fwd_fp16.cu) generalized to the
full layer and a 64-row batch.

Layout (probes: scripts/probe_mega_b64.py; B=1 sibling: ops/decode_mega.py):
  * grid = (L, T): layers outer; per layer the tile sequence is
    [rkv x 3K][lora][prep][glue x P][out x K][ffnk x 4K][ffnv x 4K],
    K = C/TN, P = C/128 head pairs.
  * lane-major activations (B=64 sublanes, C lanes) everywhere except the
    WKV band. Token-shift mixes are recomputed per tile from (xn, xx) —
    cheaper in VMEM than 7 materialized mix rows.
  * WKV state per head pair rides TRANSPOSED (4096, 128) bf16 blocks:
      row m = i*64 + j   (i = v-dim, j = k-dim)
      lane q = h*64 + b  (h = head-in-pair, b = batch row)
    so the update S2 = S*wd[j] + sa[i]*b[j] + v[i]*k[j] is pure broadcast
    arithmetic on a free (64, 64, 128) view — no lane<->sublane relayouts.
    Per-(b,h) row vectors enter via ONE MXU eye-dot transpose each
    (the broadcast+transpose bridge fails Mosaic layout assignment on
    computed rows; see ops/decode_mega.py bridge note).
  * glue processes the state block in i-chunks of 16 rows: Mosaic
    materializes full vector temps, so whole-block (64,64,128) f32
    intermediates would blow VMEM.
  * weights: int8 (L, Tw, C, TN) stream with per-output-channel scales;
    lora OUT matrices ride a separate int8 (L, 512, C) block (bf16 cost
    4 MB of double-buffered VMEM at C=2048 — the budget does not allow it).
  * B must equal 64 (the lane packing); callers pad smaller batches.

Parity: tests/test_decode_mega_b64.py vs models/rwkv7.decode_step
(reference semantics RWKV_v7_demo.py:166-200 via that path).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkvtts_tpu.ops.decode_mega import (
    _LORA_PAD, _NS, _SM, _ln, _q8_np, _softplus,
)

Params = Dict[str, Any]

B = 64          # fixed batch (lane packing: lane q = h*64 + b)
_I_CHUNK = 16   # glue i-chunk rows (bounds Mosaic temp materialization)

# rows scratch groups (B rows each)
_RG = {"wd": 0, "a": 1, "g": 2, "kk": 3}
# lh scratch groups (B rows each). Order (v, w, a, g) so lora segment
# sidx maps to the adjacent _SM mix rows 6..9 (x_v, x_w, x_a, x_g) —
# the shared lora body computes row = 6 + sidx.
_LH = {"v": 0, "w": 1, "a": 2, "g": 3}
# xs scratch groups: current layer's (xn, xx) pair (ffn phase overwrites)
_XG = {"xn": 0, "xx": 1}


@dataclasses.dataclass(frozen=True)
class B64Tile:
    kind: str          # 'rkv' | 'lora' | 'prep' | 'glue' | 'out' | 'ffnk' | 'ffnv'
    n_off: int = 0
    src: str = ""      # rkv: which mix ('r' | 'k' | 'v')
    pair: int = 0      # glue: head-pair index
    k_off: int = 0     # ffnv K-chunk offset
    segs: Tuple[Tuple[str, int, int], ...] = ()  # lora: (mix, col, lh_group)
    relu2: bool = False
    last: bool = False


@dataclasses.dataclass(frozen=True)
class MegaB64Spec:
    C: int
    L: int
    P: int
    TN: int
    tiles: Tuple[B64Tile, ...]
    d_lora: Tuple[int, int, int, int]
    norm_eps: float
    ln_x_eps: float
    prep_t: int        # grid-t of the prep tile (first non-weight step)
    n_glue: int

    @property
    def T(self) -> int:
        return len(self.tiles)

    @property
    def TW(self) -> int:
        return self.T - 1 - self.n_glue  # weight-bearing tiles


def build_spec_b64(cfg, tile_n: int = 512) -> MegaB64Spec:
    C = cfg.hidden_size
    assert cfg.head_size == 64, "megakernel assumes head_size 64"
    assert C % 128 == 0
    TN = min(tile_n, C)
    assert C % TN == 0 and (4 * C) % TN == 0 and TN % _LORA_PAD == 0
    Dw, Da, Dv, Dg = cfg.decay_lora, cfg.a_lora, cfg.v_lora, cfg.gate_lora
    assert max(Dw, Da, Dv, Dg) <= _LORA_PAD
    P = C // 128

    tiles: List[B64Tile] = []
    for name in ("r", "k", "v"):
        for j in range(C // TN):
            tiles.append(B64Tile(kind="rkv", src=name, n_off=j * TN))
    # segment order == _LH order (v, w, a, g): sidx -> mix row 6 + sidx
    segs_all = [("v", _LH["v"]), ("w", _LH["w"]), ("a", _LH["a"]),
                ("g", _LH["g"])]
    per_tile = TN // _LORA_PAD
    for t0 in range(0, 4, per_tile):
        chunk = segs_all[t0:t0 + per_tile]
        tiles.append(B64Tile(
            kind="lora",
            segs=tuple((mx, i * _LORA_PAD, lg) for i, (mx, lg) in enumerate(chunk)),
        ))
    prep_t = len(tiles)
    tiles.append(B64Tile(kind="prep"))
    for p in range(P):
        tiles.append(B64Tile(kind="glue", pair=p))
    for j in range(C // TN):
        tiles.append(B64Tile(kind="out", n_off=j * TN))
    for j in range(4 * C // TN):
        tiles.append(B64Tile(kind="ffnk", n_off=j * TN))
    first = True
    for kc in range(4):
        for j in range(C // TN):
            tiles.append(B64Tile(
                kind="ffnv", k_off=kc * C, n_off=j * TN, relu2=first,
            ))
            first = False
    tiles[-1] = dataclasses.replace(tiles[-1], last=True)
    return MegaB64Spec(
        C=C, L=cfg.num_layers, P=P, TN=TN, tiles=tuple(tiles),
        d_lora=(Dw, Da, Dv, Dg), norm_eps=cfg.norm_eps,
        ln_x_eps=cfg.ln_x_eps, prep_t=prep_t, n_glue=P,
    )


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def pack_mega_b64(params: Params, cfg, tile_n: int = 512) -> Params:
    """Pack raw (unfused) backbone params into the B=64 megakernel layout.

    Returns {'spec', 'w_stream' (L,TW,C,TN) int8, 's_stream' (L,TW,1,TN)
    bf16, 'lora_q' (L,512,C) int8, 'lo_scales' (L,8,C) f32, 'smalls'
    (L,NS,C) f32, 'ln0_*', 'ln_out_*'}; pop 'spec' before jit.
    """
    spec = build_spec_b64(cfg, tile_n)
    C, L, TN = spec.C, spec.L, spec.TN
    att = jax.tree.map(np.asarray, params["blocks"]["att"])
    ffn = jax.tree.map(np.asarray, params["blocks"]["ffn"])
    blocks = jax.tree.map(np.asarray, params["blocks"])

    w_stream = np.zeros((L, spec.TW, C, TN), np.int8)
    s_stream = np.ones((L, spec.TW, 1, TN), np.float32)
    lora_q = np.zeros((L, 4 * _LORA_PAD, C), np.int8)
    lo_scales = np.zeros((L, 8, C), np.float32)
    smalls = np.zeros((L, _NS, C), np.float32)

    for l in range(L):
        qs = {}
        for name, mat in (
            ("r", att["receptance"][l]), ("k", att["key"][l]),
            ("v", att["value"][l]), ("out", att["output"][l]),
            ("fk", ffn["key"][l]), ("fv", ffn["value"][l]),
        ):
            qs[name] = _q8_np(mat)
        loras_in = {
            _LH["w"]: _q8_np(att["w1"][l]), _LH["a"]: _q8_np(att["a1"][l]),
            _LH["v"]: _q8_np(att["v1"][l]), _LH["g"]: _q8_np(att["g1"][l]),
        }
        wi = 0
        for td in spec.tiles:
            if td.kind == "rkv":
                q, s = qs[td.src]
                w_stream[l, wi] = q[:, td.n_off:td.n_off + TN]
                s_stream[l, wi] = s[:, td.n_off:td.n_off + TN]
            elif td.kind == "lora":
                for (_, col, lg) in td.segs:
                    q, s = loras_in[lg]
                    d = q.shape[1]
                    w_stream[l, wi, :, col:col + d] = q
                    s_stream[l, wi, :, col:col + d] = s
            elif td.kind == "out":
                q, s = qs["out"]
                w_stream[l, wi] = q[:, td.n_off:td.n_off + TN]
                s_stream[l, wi] = s[:, td.n_off:td.n_off + TN]
            elif td.kind == "ffnk":
                q, s = qs["fk"]
                w_stream[l, wi] = q[:, td.n_off:td.n_off + TN]
                s_stream[l, wi] = s[:, td.n_off:td.n_off + TN]
            elif td.kind == "ffnv":
                q, s = qs["fv"]
                w_stream[l, wi] = q[td.k_off:td.k_off + C, td.n_off:td.n_off + TN]
                s_stream[l, wi] = s[:, td.n_off:td.n_off + TN]
            else:  # prep / glue carry no weights
                continue
            wi += 1
        assert wi == spec.TW
        # lora OUT matrices: int8 per-output-channel (the bf16 block costs
        # 4 MB of double-buffered VMEM at C=2048; scales restore parity to
        # the XLA path within the int8 quality bound)
        for gi, mat in ((_LH["w"], att["w2"][l]), (_LH["a"], att["a2"][l]),
                        (_LH["v"], att["v2"][l]), (_LH["g"], att["g2"][l])):
            q, s = _q8_np(mat)
            d = q.shape[0]
            lora_q[l, gi * _LORA_PAD:gi * _LORA_PAD + d] = q
            lo_scales[l, gi] = s.reshape(C)
        for nm, row in _SM.items():
            src = {
                "ln1_s": blocks["ln1_scale"], "ln1_b": blocks["ln1_bias"],
                "ln2_s": blocks["ln2_scale"], "ln2_b": blocks["ln2_bias"],
                "x_r": att["x_r"], "x_w": att["x_w"], "x_k": att["x_k"],
                "x_v": att["x_v"], "x_a": att["x_a"], "x_g": att["x_g"],
                "w0": att["w0"], "a0": att["a0"], "v0": att["v0"],
                "k_k": att["k_k"], "k_a": att["k_a"], "r_k": att["r_k"],
                "ln_x_s": att["ln_x_scale"], "ln_x_b": att["ln_x_bias"],
                "ffn_x_k": ffn["x_k"],
            }[nm]
            smalls[l, row] = np.asarray(src[l], np.float32).reshape(C)

    return {
        "spec": spec,
        "w_stream": jnp.asarray(w_stream),
        "s_stream": jnp.asarray(s_stream.astype(jnp.bfloat16)),
        "lora_q": jnp.asarray(lora_q),
        "lo_scales": jnp.asarray(lo_scales),
        "smalls": jnp.asarray(smalls),
        "ln0_scale": jnp.asarray(np.asarray(params["ln0_scale"], np.float32)),
        "ln0_bias": jnp.asarray(np.asarray(params["ln0_bias"], np.float32)),
        "ln_out_scale": jnp.asarray(np.asarray(params["ln_out_scale"], np.float32)),
        "ln_out_bias": jnp.asarray(np.asarray(params["ln_out_bias"], np.float32)),
    }


def pack_mega_state_b64(state: Params, cfg) -> Params:
    """Stacked decode state (wkv (L,B,H,N,N), shifts (L,B,C)) -> the
    transposed megakernel layout {'att_x' (L,B,C) bf16, 'wkv'
    (L,P,4096,128) bf16 (row i*64+j, lane h*64+b), 'ffn_x'}."""
    L, C = cfg.num_layers, cfg.hidden_size
    H, P = cfg.num_heads, C // 128
    wkv = state["wkv"].reshape(L, B, P, 2, 64, 64)   # (L,b,p,h,i,j)
    wkv = jnp.transpose(wkv, (0, 2, 4, 5, 3, 1))      # (L,p,i,j,h,b)
    wkv = wkv.reshape(L, P, 4096, 128)
    return {
        "att_x": state["att_x"].reshape(L, B, C).astype(jnp.bfloat16),
        "wkv": wkv.astype(jnp.bfloat16),
        "ffn_x": state["ffn_x"].reshape(L, B, C).astype(jnp.bfloat16),
    }


def unpack_mega_state_b64(mstate: Params, cfg, dtype=None) -> Params:
    L, C = cfg.num_layers, cfg.hidden_size
    H, P = cfg.num_heads, C // 128
    dt = dtype or jnp.bfloat16
    wkv = mstate["wkv"].reshape(L, P, 64, 64, 2, B)
    wkv = jnp.transpose(wkv, (0, 5, 1, 4, 2, 3))      # (L,b,p,h,i,j)
    return {
        "att_x": mstate["att_x"].astype(dt),
        "wkv": wkv.reshape(L, B, H, 64, 64),
        "ffn_x": mstate["ffn_x"].astype(dt),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _mega_b64_kernel(
    # inputs
    x_in, ax_in, fx_in, st_in, w_ref, s_ref, lq_ref, ls_ref, sm_ref,
    # outputs
    x_out, ax_out, fx_out, st_out,
    # scratch
    xs, lh, rows, acc_rkv, acc_ffn, x_res, v_first, y_g, tmp_row,
    v_scr, y_pair,
    *, spec: MegaB64Spec,
):
    """Shared-body kernel: ONE code path per tile KIND, parameterized by
    scalar arithmetic on the grid index, so generated code size is O(1)
    in C. The round-4 version unrolled a closure per tile instance (66
    switch branches at C=2048) and its 10.9 MB program fell off the
    instruction-delivery cliff — 64.8 us/grid-step vs 2.15 us at C=1024
    (PERF.md round 5). Dequant also moved to the OUTPUT side:
    (x @ W_q) * s == x @ (W_q * s) for per-output-channel scales, so the
    (C, TN) dequant temp disappears and the MXU consumes int8 directly.
    """
    l = pl.program_id(0)
    t = pl.program_id(1)
    C, TN, P = spec.C, spec.TN, spec.P
    K = C // TN
    mm = jnp.bfloat16

    # static tile-phase boundaries (grid layout: [rkv x 3K][lora x n_lora]
    # [prep][glue x P][out x K][ffnk x 4K][ffnv x 4K])
    t_lora = 3 * K
    t_prep = spec.prep_t
    g0 = t_prep + 1
    o0 = g0 + P
    f0 = o0 + K
    vv0 = f0 + 4 * K
    T_last = vv0 + 4 * K - 1
    per_tile = min(4, TN // _LORA_PAD)  # lora segments per tile

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    h1 = (lane128 < 64).astype(jnp.float32)
    h2 = 1.0 - h1
    eye128 = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)

    def sm(name):  # (1, C) f32
        return sm_ref[0, _SM[name]:_SM[name] + 1, :]

    def tblk(x):
        """(B, 128) lane-major slice (c = h*64+d) -> (64 d, 128 q=h*64+b).

        Involution: applied to a (64 d, 128 q) block it returns the
        (B, 128 c) lane-major form. One 128x128x64 MXU pass."""
        tr = jax.lax.dot_general(
            eye128, x.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, 64)
        return jnp.concatenate([tr[0:64, :], tr[64:128, :]], axis=1)

    def colblk(row):
        """(1, 128) param slice (c = h*64+d) -> (64 d, 128 q) block.

        Mosaic rejects dots/explicit broadcasts on (1,128) operands with
        non-canonical layouts ("Invalid input layout", PERF.md round 4);
        the row round-trips through a one-row scratch so the reload has a
        concrete {0,0} offset, then the probe-validated broadcast+transpose
        runs."""
        tmp_row[...] = row
        vt = jnp.transpose(
            jnp.broadcast_to(tmp_row[...], (128, 128)), (1, 0))
        return vt[0:64, :] * h1 + vt[64:128, :] * h2

    def mix(x_row):  # (1, C) shift coefficient -> (B, C) bf16 mix
        xn = xs[_XG["xn"] * B:(_XG["xn"] + 1) * B, :].astype(jnp.float32)
        xx = xs[_XG["xx"] * B:(_XG["xx"] + 1) * B, :].astype(jnp.float32)
        return (xn + xx * x_row).astype(mm)

    def matmul(lhs):
        """(B, C) bf16 @ int8 tile -> (B, TN) f32, scales on the OUTPUT.

        int8 values are exact in bf16, so x @ W_q (f32 accum) then a
        per-column s multiply is the same quantization scheme with one
        fewer rounding than dequant-then-dot; the (C, TN) dequant temp
        never materializes."""
        r = jax.lax.dot_general(
            lhs, w_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r * s_ref[0, 0].astype(jnp.float32)  # (1, TN) broadcast

    def layer_start():
        x_cur = jnp.where(l == 0, x_in[...], x_res[...])
        x_res[...] = x_cur
        xn = _ln(x_cur, sm("ln1_s"), sm("ln1_b"), spec.norm_eps)
        ax_out[0] = xn.astype(ax_out.dtype)
        xx = ax_in[0].astype(jnp.float32) - xn
        xs[_XG["xn"] * B:(_XG["xn"] + 1) * B, :] = xn.astype(xs.dtype)
        xs[_XG["xx"] * B:(_XG["xx"] + 1) * B, :] = xx.astype(xs.dtype)

    def lo_mm(lg, act):  # (B, 128) @ lora-out group -> (B, C) f32
        q = lq_ref[0, lg * _LORA_PAD:(lg + 1) * _LORA_PAD, :].astype(mm)
        part = jax.lax.dot_general(
            act.astype(mm), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return part * ls_ref[0, lg:lg + 1, :]

    def rkv_body():
        @pl.when(t == 0)
        def _():
            layer_start()
        si = t // K           # 0=r, 1=k, 2=v
        j = t - si * K
        row = 4 + si          # _SM x_r/x_k/x_v adjacency
        x_row = sm_ref[0, pl.ds(row, 1), :]
        part = matmul(mix(x_row))
        off = si * C + j * TN
        acc_rkv[:, pl.ds(pl.multiple_of(off, 128), TN)] = (
            part.astype(acc_rkv.dtype))

    def lora_body():
        # seg sidx (order v,w,a,g == _LH) rides tile lt at column i*128;
        # its token-shift mix row is 6 + sidx (_SM adjacency)
        lt = t - t_lora
        for i in range(per_tile):
            sidx = lt * per_tile + i
            col = i * _LORA_PAD

            @pl.when(sidx < 4)
            def _(sidx=sidx, col=col):
                x_row = sm_ref[0, pl.ds(6 + sidx, 1), :]
                part = jax.lax.dot_general(
                    mix(x_row), w_ref[0, 0, :, col:col + _LORA_PAD],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * s_ref[0, 0, :, col:col + _LORA_PAD].astype(jnp.float32)
                lh[pl.ds(sidx * B, B), :] = part

    def prep_body():
        lhg = lambda g: lh[g * B:(g + 1) * B, :]
        w_vec = sm("w0") + lo_mm(_LH["w"], jnp.tanh(lhg(_LH["w"])))
        w_raw = -_softplus(-w_vec) - 0.5
        rows[_RG["wd"] * B:(_RG["wd"] + 1) * B, :] = (
            jnp.exp(-jnp.exp(w_raw)).astype(rows.dtype))
        a_row = jax.nn.sigmoid(sm("a0") + lo_mm(_LH["a"], lhg(_LH["a"])))
        rows[_RG["a"] * B:(_RG["a"] + 1) * B, :] = a_row.astype(rows.dtype)
        vmix = jax.nn.sigmoid(sm("v0") + lo_mm(_LH["v"], lhg(_LH["v"])))
        v_row = acc_rkv[:, 2 * C:3 * C].astype(jnp.float32)
        is_first = (l == 0)
        v_eff = jnp.where(
            is_first, v_row,
            v_row + (v_first[...].astype(jnp.float32) - v_row) * vmix,
        )
        v_first[...] = jnp.where(
            is_first, v_eff.astype(v_first.dtype), v_first[...])
        acc_rkv[:, 2 * C:3 * C] = v_eff.astype(acc_rkv.dtype)
        rows[_RG["g"] * B:(_RG["g"] + 1) * B, :] = (
            lo_mm(_LH["g"], jax.nn.sigmoid(lhg(_LH["g"]))).astype(rows.dtype))
        k0 = acc_rkv[:, C:2 * C].astype(jnp.float32)
        rows[_RG["kk"] * B:(_RG["kk"] + 1) * B, :] = (
            (k0 * sm("k_k")).astype(rows.dtype))
        acc_rkv[:, C:2 * C] = (
            k0 * (1.0 + (a_row - 1.0) * sm("k_a"))).astype(acc_rkv.dtype)

    def glue_body():
        p = t - g0
        c0 = pl.multiple_of(p * 128, 128)
        r_s = acc_rkv[:, pl.ds(c0, 128)].astype(jnp.float32)
        k_s = acc_rkv[:, pl.ds(C + c0, 128)].astype(jnp.float32)
        v_s = acc_rkv[:, pl.ds(2 * C + c0, 128)].astype(jnp.float32)
        kk_s = rows[_RG["kk"] * B:(_RG["kk"] + 1) * B,
                    pl.ds(c0, 128)].astype(jnp.float32)
        a_s = rows[_RG["a"] * B:(_RG["a"] + 1) * B,
                   pl.ds(c0, 128)].astype(jnp.float32)
        wd_s = rows[_RG["wd"] * B:(_RG["wd"] + 1) * B,
                    pl.ds(c0, 128)].astype(jnp.float32)
        g_s = rows[_RG["g"] * B:(_RG["g"] + 1) * B,
                   pl.ds(c0, 128)].astype(jnp.float32)

        # l2-normalize kk per 64-lane head (torch F.normalize, eps 1e-12)
        sq = kk_s * kk_s
        n1 = jnp.sqrt(jnp.maximum(jnp.sum(sq * h1, -1, keepdims=True), 1e-24))
        n2 = jnp.sqrt(jnp.maximum(jnp.sum(sq * h2, -1, keepdims=True), 1e-24))
        kkn = kk_s * (h1 / n1 + h2 / n2)

        R = tblk(r_s)
        WD = tblk(wd_s)
        Z = tblk(-kkn)
        BB = tblk(kkn * a_s)
        K_ = tblk(k_s)
        G = tblk(g_s)
        v_scr[...] = tblk(v_s)  # per-chunk rows sliced from a REF below

        # state update in i-chunks via a rolled loop (code O(1) in chunks;
        # chunking itself bounds Mosaic temp materialization)
        def ichunk(ic, _):
            r0 = pl.multiple_of(ic * (_I_CHUNK * 64), 8)
            S3 = st_in[0, 0, pl.ds(r0, _I_CHUNK * 64), :].astype(
                jnp.float32).reshape(_I_CHUNK, 64, 128)
            sa = jnp.sum(S3 * Z[None], axis=1, keepdims=True)
            # dynamic row slice must come from a REF: jnp indexing a VALUE
            # with a dynamic start emits a GATHER which Mosaic's
            # cond-branch lowering rejects (r4m)
            v_chunk = jnp.expand_dims(
                v_scr[pl.ds(pl.multiple_of(ic * _I_CHUNK, 8), _I_CHUNK), :], 1)
            S2 = S3 * WD[None] + sa * BB[None] + v_chunk * K_[None]
            st_out[0, 0, pl.ds(r0, _I_CHUNK * 64), :] = (
                S2.reshape(_I_CHUNK * 64, 128).astype(st_out.dtype))
            y_pair[pl.ds(pl.multiple_of(ic * _I_CHUNK, 8), _I_CHUNK), :] = (
                jnp.sum(S2 * R[None], axis=1).reshape(_I_CHUNK, 128))
            return 0

        jax.lax.fori_loop(0, 64 // _I_CHUNK, ichunk, 0, unroll=False)
        y = y_pair[...]  # (64, 128)

        # GroupNorm per (b, h) over the 64 i values (sublane stats)
        m = jnp.mean(y, axis=0, keepdims=True)
        var = jnp.mean((y - m) ** 2, axis=0, keepdims=True)
        gs = colblk(sm_ref[0, _SM["ln_x_s"]:_SM["ln_x_s"] + 1,
                           pl.ds(c0, 128)])
        gb = colblk(sm_ref[0, _SM["ln_x_b"]:_SM["ln_x_b"] + 1,
                           pl.ds(c0, 128)])
        y_n = (y - m) * jax.lax.rsqrt(var + spec.ln_x_eps) * gs + gb

        # bonus: (sum_j r*k_eff*r_k) * v  — all in the transposed layout
        RK = colblk(sm_ref[0, _SM["r_k"]:_SM["r_k"] + 1, pl.ds(c0, 128)])
        s_bh = jnp.sum(R * K_ * RK, axis=0, keepdims=True)  # (1, 128)
        y_fin = (y_n + s_bh * v_scr[...]) * G

        # back to lane-major (tblk is an involution) and store the slice
        y_g[:, pl.ds(c0, 128)] = tblk(y_fin).astype(y_g.dtype)

    def ffn_glue():
        xn2 = _ln(x_res[...].astype(jnp.float32), sm("ln2_s"), sm("ln2_b"),
                  spec.norm_eps)
        fx_out[0] = xn2.astype(fx_out.dtype)
        xx2 = fx_in[0].astype(jnp.float32) - xn2
        xs[_XG["xn"] * B:(_XG["xn"] + 1) * B, :] = xn2.astype(xs.dtype)
        xs[_XG["xx"] * B:(_XG["xx"] + 1) * B, :] = xx2.astype(xs.dtype)

    def out_body():
        j = t - o0
        part = matmul(y_g[...].astype(mm))
        off = pl.multiple_of(j * TN, 128)
        x_res[:, pl.ds(off, TN)] += part

    def ffnk_body():
        @pl.when(t == f0)
        def _():
            ffn_glue()
        j = t - f0
        part = matmul(mix(sm("ffn_x_k")))
        off = pl.multiple_of(j * TN, 128)
        acc_ffn[:, pl.ds(off, TN)] = part.astype(acc_ffn.dtype)

    def ffnv_body():
        @pl.when(t == vv0)
        def _():
            a = acc_ffn[...].astype(jnp.float32)
            acc_ffn[...] = jnp.square(
                jnp.maximum(a, 0.0)).astype(acc_ffn.dtype)
        jj = t - vv0
        kc = jj // K
        j = jj - kc * K
        lhs = acc_ffn[:, pl.ds(pl.multiple_of(kc * C, 128), C)].astype(mm)
        part = matmul(lhs)
        off = pl.multiple_of(j * TN, 128)
        x_res[:, pl.ds(off, TN)] += part

        @pl.when(t == T_last)
        def _():
            x_out[...] = x_res[...]

    kind = ((t >= t_lora).astype(jnp.int32) + (t >= t_prep) + (t >= g0)
            + (t >= o0) + (t >= f0) + (t >= vv0))
    jax.lax.switch(kind, [rkv_body, lora_body, prep_body, glue_body,
                          out_body, ffnk_body, ffnv_body])


def decode_step_mega_b64(
    mega: Params, cfg, x: jax.Array, mstate: Params,
    *, interpret: bool | None = None, spec: MegaB64Spec | None = None,
) -> Tuple[jax.Array, Params]:
    """One B=64 decode step through the megakernel.

    x: (64, C) token embeddings (pre-ln0). Returns (hidden (64, C) post
    ln_out, new mega state). Semantics == models/rwkv7.decode_step with
    unfused int8 params at B=64 (parity: tests/test_decode_mega_b64.py).
    """
    from rwkvtts_tpu.ops.norm import layer_norm

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = spec if spec is not None else mega["spec"]
    C, L, P, TN, T = spec.C, spec.L, spec.P, spec.TN, spec.T
    assert x.shape == (B, C)
    x = layer_norm(
        x.astype(jnp.float32), mega["ln0_scale"], mega["ln0_bias"],
        spec.norm_eps,
    ).astype(jnp.float32)

    carry_dt = mstate["wkv"].dtype
    shift_dt = mstate["att_x"].dtype
    grid = (L, T)
    l_map = lambda l, t: (l, 0, 0)
    p0 = spec.prep_t
    nskip = spec.n_glue + 1

    def w_map(l, t):
        wi = jnp.where(t < p0, t,
                       jnp.where(t < p0 + nskip, p0 - 1, t - nskip))
        return (l, wi, 0, 0)

    def st_map(l, t):
        return (l, jnp.clip(t - (p0 + 1), 0, P - 1), 0, 0)

    x_f, ax, fx, wkv = pl.pallas_call(
        functools.partial(_mega_b64_kernel, spec=spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, C), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4096, 128), st_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, TN), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * _LORA_PAD, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NS, C), l_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, C), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4096, 128), st_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((L, B, C), shift_dt),
            jax.ShapeDtypeStruct((L, B, C), shift_dt),
            jax.ShapeDtypeStruct((L, P, 4096, 128), carry_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * B, C), jnp.bfloat16),       # xs (xn, xx)
            pltpu.VMEM((4 * B, _LORA_PAD), jnp.float32),  # lh
            pltpu.VMEM((4 * B, C), jnp.bfloat16),       # rows (wd, a, g, kk)
            pltpu.VMEM((B, 3 * C), jnp.bfloat16),       # acc_rkv
            pltpu.VMEM((B, 4 * C), jnp.bfloat16),       # acc_ffn
            pltpu.VMEM((B, C), jnp.float32),            # x_res
            pltpu.VMEM((B, C), jnp.bfloat16),           # v_first
            pltpu.VMEM((B, C), jnp.bfloat16),           # y_g
            pltpu.VMEM((1, 128), jnp.float32),          # tmp_row (colblk)
            pltpu.VMEM((64, 128), jnp.float32),         # v_scr (glue V)
            pltpu.VMEM((64, 128), jnp.float32),         # y_pair (glue y)
        ],
        input_output_aliases={1: 1, 2: 2, 3: 3},
        interpret=interpret,
    )(
        x, mstate["att_x"], mstate["ffn_x"], mstate["wkv"],
        mega["w_stream"], mega["s_stream"], mega["lora_q"],
        mega["lo_scales"], mega["smalls"],
    )

    h = layer_norm(x_f, mega["ln_out_scale"], mega["ln_out_bias"], spec.norm_eps)
    new_state = {"att_x": ax, "wkv": wkv, "ffn_x": fx}
    return h, new_state
