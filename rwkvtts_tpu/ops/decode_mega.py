"""Whole-model decode-step megakernel for the B=1 serving regime.

ONE pallas_call executes the entire RWKV-7 decode step (all layers:
projections, loras, WKV state update, GroupNorm, bonus, gate, output
projection, squared-ReLU FFN) with activations resident in VMEM scratch
and int8 weights streamed from HBM tile by tile.

Why: at B=1 the fused XLA decode step is weight-bandwidth-bound in theory
(1.5B int8 ~1.8 ms/step roofline) but measures ~3.26 ms — the gap is
per-op dispatch and dequant materialization spread over ~30 HLO ops x 24
layers, plus per-pallas_call launch cost (~100-200 us on this platform,
PERF.md) that rules out per-layer kernels. One call for the whole depth
pays the launch cost once and lets the Pallas pipeline overlap the next
weight-tile DMA with compute — the decode-step analogue of the reference's
persistent-state CUDA kernels (reference model/llm/cuda/wkv7s.cu,
rwkv7_state_fwd_fp16.cu), which it generalizes by folding the ENTIRE
layer (not just the WKV recurrence) into the resident program.

Design notes (see scripts/probe_mega.py for the construct probes):
  * grid = (L, T): layers outer (sequential), weight tiles inner. The
    residual stream x, v_first, and all per-stage accumulators live in
    VMEM scratch across grid steps.
  * weights ride ONE int8 stream shaped (L, T, C, TN) with per-tile
    per-output-channel scales (L, T, 1, TN); dequant (convert * scale)
    happens in-kernel on the VPU and overlaps the next tile's DMA.
    Quantization scheme == models/rwkv7._quantize_int8 (the measured
    zero-greedy-flip config), applied per original matrix.
  * lora OUT matrices (w2/a2/v2/g2) stay bf16: they are ~0.5% of the
    bytes and their outputs feed softplus/sigmoid decay paths.
  * the WKV band runs per head-pair on (64, 128) blocks with masked-half
    reductions (the ops/wkv7_step_pallas.py layout); lane<->sublane
    bridges use broadcast+transpose (probe: bcast_t).
  * B=1 only (the streaming LM hot loop, reference cosy_llm.py:238-272);
    head_size must be 64.
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# smalls bundle row indices (one (C,) vector per row). x_r/x_k/x_v are
# adjacent so the B=64 kernel's shared rkv body can select the mix row
# as 4 + (tile // K) with a dynamic sublane read.
_SM = {
    "ln1_s": 0, "ln1_b": 1, "ln2_s": 2, "ln2_b": 3,
    "x_r": 4, "x_k": 5, "x_v": 6, "x_w": 7, "x_a": 8, "x_g": 9,
    "w0": 10, "a0": 11, "v0": 12, "k_k": 13, "k_a": 14, "r_k": 15,
    "ln_x_s": 16, "ln_x_b": 17, "ffn_x_k": 18,
}
_NS = 24  # padded row count (multiple of 8 for f32 sublane tiling)

# xs scratch rows: token-shifted inputs. (v, w, a, g) adjacency lets the
# shared lora body compute the source row as 2 + sidx.
_XS = {"r": 0, "k": 1, "v": 2, "w": 3, "a": 4, "g": 5, "ffn": 6}

# lora_h scratch rows — order (v, w, a, g) == lora segment order so
# sidx == the lh row AND xs row - 2
_LH = {"v": 0, "w": 1, "a": 2, "g": 3}
# glue-staged wide rows (scratch sublane per row; sliced per pair as REF
# loads so every 128-lane slice carries the natural {0,0} layout)
_GR = {"wd": 0, "a": 1, "kk": 2, "k": 3, "v": 4, "g": 5}
_LORA_PAD = 128  # every lora dim padded to this (holds up to C=4096)

# lane->sublane bridge construction (probed via utils/aot local compiles;
# "default" fails Mosaic layout assignment on the real v5e pipeline)
_BRIDGE = os.environ.get("RWKVTTS_MEGA_BRIDGE", "default")


@dataclasses.dataclass(frozen=True)
class TileDesc:
    kind: str          # 'rkv' | 'lora' | 'out' | 'ffnk' | 'ffnv'
    n_off: int = 0     # output-column offset (acc_rkv / x_res / acc_ffn)
    src_row: int = 0   # xs row for 'rkv'
    k_off: int = 0     # acc_ffn column offset for 'ffnv' K-chunks
    segs: Tuple[Tuple[int, int, int], ...] = ()  # lora: (xs_row, col, lh_row)
    glue_wkv: bool = False
    glue_ffn: bool = False
    relu2: bool = False
    last: bool = False


@dataclasses.dataclass(frozen=True)
class MegaSpec:
    C: int
    L: int
    P: int              # head pairs = C // 128
    TN: int
    tiles: Tuple[TileDesc, ...]
    d_lora: Tuple[int, int, int, int]   # true Dw, Da, Dv, Dg
    norm_eps: float
    ln_x_eps: float
    mm_dtype: Any

    @property
    def T(self) -> int:
        return len(self.tiles)


def build_spec(cfg, tile_n: int = 1024) -> MegaSpec:
    C = cfg.hidden_size
    assert cfg.head_size == 64, "megakernel assumes head_size 64"
    assert C % 128 == 0
    TN = min(tile_n, C)
    assert C % TN == 0 and (4 * C) % TN == 0
    Dw, Da, Dv, Dg = cfg.decay_lora, cfg.a_lora, cfg.v_lora, cfg.gate_lora
    assert max(Dw, Da, Dv, Dg) <= _LORA_PAD

    tiles: List[TileDesc] = []
    # r/k/v projections
    for si, name in enumerate(("r", "k", "v")):
        for j in range(C // TN):
            tiles.append(TileDesc(
                kind="rkv", src_row=_XS[name], n_off=si * C + j * TN,
            ))
    # lora-in tiles: 4 segments of _LORA_PAD cols packed into ceil tiles
    # (segment order == _LH order: sidx -> xs row 2 + sidx, lh row sidx)
    segs_all = [(_XS["v"], _LH["v"]), (_XS["w"], _LH["w"]),
                (_XS["a"], _LH["a"]), (_XS["g"], _LH["g"])]
    per_tile = max(1, TN // _LORA_PAD)
    for t0 in range(0, 4, per_tile):
        chunk = segs_all[t0:t0 + per_tile]
        tiles.append(TileDesc(
            kind="lora",
            segs=tuple((xs, i * _LORA_PAD, lh) for i, (xs, lh) in enumerate(chunk)),
        ))
    # output projection (first tile carries the WKV glue)
    for j in range(C // TN):
        tiles.append(TileDesc(kind="out", n_off=j * TN, glue_wkv=j == 0))
    # FFN key (first tile carries ln2/token-shift glue)
    for j in range(4 * C // TN):
        tiles.append(TileDesc(kind="ffnk", n_off=j * TN, glue_ffn=j == 0))
    # FFN value: K chunks of height C x N tiles (first applies relu^2)
    first = True
    for kc in range(4):
        for j in range(C // TN):
            tiles.append(TileDesc(
                kind="ffnv", k_off=kc * C, n_off=j * TN, relu2=first,
            ))
            first = False
    tiles[-1] = dataclasses.replace(tiles[-1], last=True)
    return MegaSpec(
        C=C, L=cfg.num_layers, P=C // 128, TN=TN, tiles=tuple(tiles),
        d_lora=(Dw, Da, Dv, Dg), norm_eps=cfg.norm_eps,
        ln_x_eps=cfg.ln_x_eps,
        mm_dtype=jnp.float32 if cfg.dtype == jnp.float32 else jnp.bfloat16,
    )


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def _q8_np(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 (== models/rwkv7._quantize_int8,
    with scales kept f32 here and rounded to bf16 at assembly)."""
    wf = w.astype(np.float32)
    amax = np.max(np.abs(wf), axis=0, keepdims=True)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return q, scale


def pack_mega(params: Params, cfg, tile_n: int = 1024) -> Params:
    """Pack raw (unfused) backbone params into the megakernel layout.

    Accepts either the raw param tree or a pack_decode_params output (the
    originals survive packing). Returns {'spec', 'w_stream' (L,T,C,TN)
    int8, 's_stream' (L,T,1,TN) bf16, 'lora_out' (L,512,C) bf16,
    'smalls' (L,NS,C) f32, 'ln0_*', 'ln_out_*'}; pop 'spec' (static,
    hashable) before passing the arrays through jit.
    """
    spec = build_spec(cfg, tile_n)
    C, L, TN = spec.C, spec.L, spec.TN
    att = jax.tree.map(np.asarray, params["blocks"]["att"])
    ffn = jax.tree.map(np.asarray, params["blocks"]["ffn"])
    blocks = jax.tree.map(np.asarray, params["blocks"])
    Dw, Da, Dv, Dg = spec.d_lora

    w_stream = np.zeros((L, spec.T, C, TN), np.int8)
    s_stream = np.ones((L, spec.T, 1, TN), np.float32)
    lora_out = np.zeros((L, 4 * _LORA_PAD, C), np.float32)
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
        for ti, td in enumerate(spec.tiles):
            if td.kind == "rkv":
                name = {0: "r", 1: "k", 2: "v"}[td.n_off // C]
                j = td.n_off % C
                q, s = qs[name]
                w_stream[l, ti] = q[:, j:j + TN]
                s_stream[l, ti] = s[:, j:j + TN]
            elif td.kind == "lora":
                for (_, col, lh) in td.segs:
                    q, s = loras_in[lh]
                    d = q.shape[1]
                    w_stream[l, ti, :, col:col + d] = q
                    s_stream[l, ti, :, col:col + d] = s
            elif td.kind == "out":
                q, s = qs["out"]
                w_stream[l, ti] = q[:, td.n_off:td.n_off + TN]
                s_stream[l, ti] = s[:, td.n_off:td.n_off + TN]
            elif td.kind == "ffnk":
                q, s = qs["fk"]
                w_stream[l, ti] = q[:, td.n_off:td.n_off + TN]
                s_stream[l, ti] = s[:, td.n_off:td.n_off + TN]
            elif td.kind == "ffnv":
                q, s = qs["fv"]
                w_stream[l, ti] = q[td.k_off:td.k_off + C, td.n_off:td.n_off + TN]
                s_stream[l, ti] = s[:, td.n_off:td.n_off + TN]
        # lora out matrices (zero rows on the padding kill padded-lane noise,
        # including sigmoid(0)=0.5 on the padded gate lanes); groups in
        # _LH order (v, w, a, g)
        for nm, mat in (("w", att["w2"][l]), ("a", att["a2"][l]),
                        ("v", att["v2"][l]), ("g", att["g2"][l])):
            g0 = _LH[nm] * _LORA_PAD
            lora_out[l, g0:g0 + mat.shape[0]] = mat
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
        # scales stored bf16 like _quantize_int8 (dequant dtype parity)
        "s_stream": jnp.asarray(s_stream.astype(jnp.bfloat16)),
        "lora_out": jnp.asarray(lora_out.astype(jnp.bfloat16)),
        "smalls": jnp.asarray(smalls),
        "ln0_scale": jnp.asarray(np.asarray(params["ln0_scale"], np.float32)),
        "ln0_bias": jnp.asarray(np.asarray(params["ln0_bias"], np.float32)),
        "ln_out_scale": jnp.asarray(np.asarray(params["ln_out_scale"], np.float32)),
        "ln_out_bias": jnp.asarray(np.asarray(params["ln_out_bias"], np.float32)),
    }


def pack_mega_state(state, cfg, state_bf16: bool = True) -> Params:
    """Stacked decode state (leaves (L, ...)) -> megakernel layout:
    {'att_x' (L,1,C), 'wkv' (L,P,64,128) head-pair packed, 'ffn_x' (L,1,C)}.
    Accepts the stacked dict form of models/rwkv7.init_model_state at B=1.

    state_bf16=True (default) carries the WKV state bf16 between steps —
    the production config the chip quality gate measured at 1.0 agreement
    (scripts/measure_int8_quality.py --mega: int8 proj + int8 lora-out +
    bf16 state) and the config behind the 2.224 ms/tok B=1 1.5B number
    (PERF.md r5a); the fp32-state kernel ran ~1.6x slower there. The
    reference's own decode kernel carries fp16 state
    (model/llm/cuda/rwkv7_state_fwd_fp16.cu). Pass False for exact-fp32
    parity tests."""
    from rwkvtts_tpu.ops.wkv7_step_pallas import pack_state

    L = cfg.num_layers
    C = cfg.hidden_size
    wkv = state["wkv"]  # (L, 1, H, N, N)
    packed = pack_state(wkv.reshape(L, 1, cfg.num_heads, 64, 64))
    wkv = packed.reshape(L, C // 128, 64, 128)
    if state_bf16:
        wkv = wkv.astype(jnp.bfloat16)
    return {
        # the mega carry keeps shift states f32 (kernel-native; ~L*C*8
        # bytes, negligible vs weights) so the scan carry dtype is stable
        "att_x": state["att_x"].reshape(L, 1, C).astype(jnp.float32),
        "wkv": wkv,
        "ffn_x": state["ffn_x"].reshape(L, 1, C).astype(jnp.float32),
    }


def unpack_mega_state(mstate: Params, cfg, dtype=None) -> Params:
    from rwkvtts_tpu.ops.wkv7_step_pallas import unpack_state

    L, C = cfg.num_layers, cfg.hidden_size
    dt = dtype or jnp.bfloat16
    wkv = unpack_state(
        mstate["wkv"].reshape(L, C // 128, 64, 128), 1, cfg.num_heads
    )
    return {
        "att_x": mstate["att_x"].reshape(L, 1, C).astype(dt),
        "wkv": wkv.reshape(L, 1, cfg.num_heads, 64, 64),
        "ffn_x": mstate["ffn_x"].reshape(L, 1, C).astype(dt),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _softplus(z):
    # stable softplus from exp/log only (log1p may not lower in Mosaic);
    # the log argument is in (1, 2], where log is exact enough in f32
    return jnp.maximum(z, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(z)))


def _ln(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mega_kernel(
    # inputs
    x_in, ax_in, fx_in, st_in, w_ref, s_ref, lo_ref, sm_ref,
    # outputs
    x_out, ax_out, fx_out, st_out,
    # scratch
    xs, lh, acc_rkv, acc_ffn, x_res, v_first, y_g, tmp_row, tmp_col, grows,
    *, spec: MegaSpec,
):
    """Shared-body kernel: one code path per tile KIND (rkv/lora/out/
    ffnk/ffnv), parameterized by scalar arithmetic on the grid index, so
    generated code size is O(1) in C. The round-4 version unrolled a
    closure per tile instance and the resulting multi-MB program fell off
    the instruction-delivery cliff at C=2048 (PERF.md round 5). Dequant
    applies per-output-channel scales on the OUTPUT of an int8-operand
    MXU dot — the (C, TN) dequant temp never materializes.
    """
    l = pl.program_id(0)
    t = pl.program_id(1)
    C, TN, P = spec.C, spec.TN, spec.P
    K = C // TN
    mm = spec.mm_dtype
    sm = lambda name: sm_ref[0, _SM[name]:_SM[name] + 1, :]  # (1, C) f32

    # static tile-phase boundaries (grid layout: [rkv x 3K][lora x n_lora]
    # [out x K][ffnk x 4K][ffnv x 4K]; glue rides the first out tile)
    t_lora = 3 * K
    per_tile = min(4, max(1, TN // _LORA_PAD))
    o0 = t_lora + -(-4 // per_tile)
    f0 = o0 + K
    vv0 = f0 + 4 * K
    T_last = vv0 + 4 * K - 1

    def matvec(xrow):  # (1, C) f32 @ int8 tile -> (1, TN) f32, scale at out
        r = jax.lax.dot_general(
            xrow.astype(mm), w_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return r * s_ref[0, 0].astype(jnp.float32)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    h1 = (lane128 < 64).astype(jnp.float32)
    h2 = 1.0 - h1

    # Lane<->sublane bridges. Mosaic accepts IMPLICIT elementwise
    # broadcasts of computed (1,128) rows (replicated sublane offset,
    # vpad "{*,...}"), but both the explicit vector.broadcast to (128,128)
    # AND a dot_general against a (1,128) operand fail layout assignment
    # on them ("Invalid input layout", r4h + r4i). The probe-validated
    # path (bcast_t) is broadcast+transpose on a LOADED row — so computed
    # rows round-trip through a one-row VMEM scratch first: the reload
    # carries a concrete {0,0} offset.

    eye128 = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)

    def bridge(row):  # (1,128) lanes -> (64,128) varying over sublanes
        tmp_row[...] = row
        r = tmp_row[...]
        if _BRIDGE == "eyedot":
            # MXU lane->sublane: col[a] = row[0,a]; no vector.broadcast of
            # a (1,128) over sublanes anywhere (that op fails layout
            # assignment on the v5e Mosaic pipeline no matter how the row
            # is produced — r4j chip log + local AOT bisect)
            col = jax.lax.dot_general(
                eye128, r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, 1)
            h1_64 = (jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
                     < 64).astype(jnp.float32)
            return col[0:64, :] * h1_64 + col[64:128, :] * (1.0 - h1_64)
        if _BRIDGE == "mul_ones":
            # implicit elementwise broadcast (accepted where the explicit
            # vector.broadcast fails layout assignment), then transpose
            m = jnp.ones((128, 128), jnp.float32) * r
            vt = jnp.transpose(m, (1, 0))
        elif _BRIDGE == "transpose_first":
            col = jnp.transpose(r, (1, 0))  # (128, 1)
            vt = col * jnp.ones((128, 128), jnp.float32)
        else:  # "default"
            vt = jnp.transpose(jnp.broadcast_to(r, (128, 128)), (1, 0))
        return vt[0:64, :] * h1 + vt[64:128, :] * h2

    def layer_start():
        x_cur = jnp.where(l == 0, x_in[...], x_res[...])
        x_res[...] = x_cur
        xn = _ln(x_cur, sm("ln1_s"), sm("ln1_b"), spec.norm_eps)
        ax_out[0] = xn
        xx = ax_in[0].astype(jnp.float32) - xn
        for nm in ("r", "k", "v", "w", "a", "g"):
            xs[_XS[nm]:_XS[nm] + 1, :] = xn + xx * sm(f"x_{nm}")

    def wkv_glue():
        Dw, Da, Dv, Dg = spec.d_lora
        k0_row = acc_rkv[0:1, C:2 * C]
        v_row = acc_rkv[0:1, 2 * C:3 * C]
        lo = lo_ref[0].astype(jnp.float32)  # (512, C)
        w_h = jnp.tanh(lh[_LH["w"]:_LH["w"] + 1, :])
        w_vec = sm("w0") + jax.lax.dot_general(
            w_h.astype(mm), lo[0:_LORA_PAD].astype(mm),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        w_raw = -_softplus(-w_vec) - 0.5
        wd_row = jnp.exp(-jnp.exp(w_raw))
        a_row = jax.nn.sigmoid(sm("a0") + jax.lax.dot_general(
            lh[_LH["a"]:_LH["a"] + 1, :].astype(mm),
            lo[_LORA_PAD:2 * _LORA_PAD].astype(mm),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
        vmix_row = jax.nn.sigmoid(sm("v0") + jax.lax.dot_general(
            lh[_LH["v"]:_LH["v"] + 1, :].astype(mm),
            lo[2 * _LORA_PAD:3 * _LORA_PAD].astype(mm),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
        g_row = jax.lax.dot_general(
            jax.nn.sigmoid(lh[_LH["g"]:_LH["g"] + 1, :]).astype(mm),
            lo[3 * _LORA_PAD:4 * _LORA_PAD].astype(mm),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        is_first = (l == 0)
        v_resid = v_row + (v_first[...] - v_row) * vmix_row
        v_eff = jnp.where(is_first, v_row, v_resid)
        v_first[...] = jnp.where(is_first, v_eff, v_first[...])

        # Stage the wide rows in scratch and slice PER PAIR from the REF.
        # Slicing a materialized (1, C) VALUE at lane offset >=128 gives
        # the slice layout {*,c0}; relayout-insertion cannot push that
        # through the implicit (1,128)->(64,128) broadcasts and dies with
        # "Invalid input layout" (r4h/r4i/r4j; root-caused via the local
        # AOT dumps — post-relayout-insertion-failed.txt). Loads at
        # 128-multiple lane indices get the natural {0,0} layout.
        grows[_GR["wd"]:_GR["wd"] + 1, :] = wd_row
        grows[_GR["a"]:_GR["a"] + 1, :] = a_row
        grows[_GR["kk"]:_GR["kk"] + 1, :] = k0_row * sm("k_k")
        grows[_GR["k"]:_GR["k"] + 1, :] = (
            k0_row * (1.0 + (a_row - 1.0) * sm("k_a")))
        grows[_GR["v"]:_GR["v"] + 1, :] = v_eff
        grows[_GR["g"]:_GR["g"] + 1, :] = g_row

        def pair_body(p, _):
            c0 = pl.multiple_of(p * 128, 128)
            gp = lambda nm: grows[_GR[nm]:_GR[nm] + 1, pl.ds(c0, 128)]
            smp = lambda nm: sm_ref[0, _SM[nm]:_SM[nm] + 1, pl.ds(c0, 128)]
            r_p = acc_rkv[0:1, pl.ds(c0, 128)]
            kk_p = gp("kk")
            k_p = gp("k")
            v_p = gp("v")
            a_p = gp("a")
            wd_p = gp("wd")
            # l2-normalize kk per 64-lane head (torch F.normalize eps 1e-12)
            sq = kk_p * kk_p
            n1 = jnp.sqrt(jnp.maximum(jnp.sum(sq * h1, -1, keepdims=True), 1e-24))
            n2 = jnp.sqrt(jnp.maximum(jnp.sum(sq * h2, -1, keepdims=True), 1e-24))
            kkn = kk_p * (h1 / n1 + h2 / n2)
            z_p = -kkn
            b_p = kkn * a_p

            S = st_in[0, pl.ds(p, 1)].astype(jnp.float32).reshape(64, 128)
            Sz = S * z_p
            sa1 = jnp.sum(Sz * h1, -1, keepdims=True)
            sa2 = jnp.sum(Sz * h2, -1, keepdims=True)
            sa = sa1 * h1 + sa2 * h2
            vb = bridge(v_p)
            S2 = S * wd_p + sa * b_p + vb * k_p
            st_out[0, pl.ds(p, 1)] = S2[None].astype(st_out.dtype)

            Sr = S2 * r_p
            y1 = jnp.sum(Sr * h1, -1, keepdims=True)  # (64, 1)
            y2 = jnp.sum(Sr * h2, -1, keepdims=True)
            ycol = jnp.concatenate([y1, y2], axis=0)  # (128, 1)
            # y_p[0, j] = ycol[j, 0]. NOT transpose(broadcast(col)): a
            # Mosaic canonicalization rewrites that into
            # broadcast(transpose(col)) — a (1,128)->(128,128) sublane
            # vector.broadcast that fails layout assignment (the op never
            # appears in the lowered module; a pass synthesizes it).
            # One MXU pass instead: ycol^T @ eye.
            tmp_col[...] = ycol
            if _BRIDGE == "eyedot":
                y_p = jax.lax.dot_general(
                    tmp_col[...], eye128, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (1, 128)
            else:
                y_p = jnp.transpose(
                    jnp.broadcast_to(tmp_col[...], (128, 128)), (1, 0)
                )[0:1, :]

            # GroupNorm per 64-lane head
            m1 = jnp.sum(y_p * h1, -1, keepdims=True) / 64.0
            m2 = jnp.sum(y_p * h2, -1, keepdims=True) / 64.0
            yc = (y_p - m1) * h1 + (y_p - m2) * h2
            var1 = jnp.sum(yc * yc * h1, -1, keepdims=True) / 64.0
            var2 = jnp.sum(yc * yc * h2, -1, keepdims=True) / 64.0
            inv = jax.lax.rsqrt(var1 + spec.ln_x_eps) * h1 + \
                jax.lax.rsqrt(var2 + spec.ln_x_eps) * h2
            y_n = yc * inv * smp("ln_x_s") + smp("ln_x_b")

            # bonus: (sum_head r*k*r_k) * v
            rkq = r_p * k_p * smp("r_k")
            s1 = jnp.sum(rkq * h1, -1, keepdims=True)
            s2 = jnp.sum(rkq * h2, -1, keepdims=True)
            bonus = (s1 * h1 + s2 * h2) * v_p

            y_g[0:1, pl.ds(c0, 128)] = (y_n + bonus) * gp("g")
            return 0

        jax.lax.fori_loop(0, P, pair_body, 0, unroll=False)

    def ffn_glue():
        xn2 = _ln(x_res[...], sm("ln2_s"), sm("ln2_b"), spec.norm_eps)
        fx_out[0] = xn2
        xx2 = fx_in[0].astype(jnp.float32) - xn2
        xs[_XS["ffn"]:_XS["ffn"] + 1, :] = xn2 + xx2 * sm("ffn_x_k")

    def rkv_body():
        @pl.when(t == 0)
        def _():
            layer_start()
        si = t // K           # 0=r, 1=k, 2=v == xs rows
        j = t - si * K
        part = matvec(xs[pl.ds(si, 1), :])
        off = si * C + j * TN
        acc_rkv[0:1, pl.ds(pl.multiple_of(off, 128), TN)] = part

    def lora_body():
        # seg sidx (order v,w,a,g == _LH) rides tile lt at column i*128;
        # its xs source row is 2 + sidx
        lt = t - t_lora
        for i in range(per_tile):
            sidx = lt * per_tile + i
            col = i * _LORA_PAD

            @pl.when(sidx < 4)
            def _(sidx=sidx, col=col):
                part = jax.lax.dot_general(
                    xs[pl.ds(2 + sidx, 1), :].astype(mm),
                    w_ref[0, 0, :, col:col + _LORA_PAD],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * s_ref[0, 0, :, col:col + _LORA_PAD].astype(jnp.float32)
                lh[pl.ds(sidx, 1), :] = part

    def out_body():
        @pl.when(t == o0)
        def _():
            wkv_glue()
        j = t - o0
        part = matvec(y_g[...])
        x_res[0:1, pl.ds(pl.multiple_of(j * TN, 128), TN)] += part

    def ffnk_body():
        @pl.when(t == f0)
        def _():
            ffn_glue()
        j = t - f0
        part = matvec(xs[_XS["ffn"]:_XS["ffn"] + 1, :])
        acc_ffn[0:1, pl.ds(pl.multiple_of(j * TN, 128), TN)] = part

    def ffnv_body():
        @pl.when(t == vv0)
        def _():
            acc_ffn[...] = jnp.square(jnp.maximum(acc_ffn[...], 0.0))
        jj = t - vv0
        kc = jj // K
        j = jj - kc * K
        lhs = acc_ffn[0:1, pl.ds(pl.multiple_of(kc * C, 128), C)]
        part = matvec(lhs)
        x_res[0:1, pl.ds(pl.multiple_of(j * TN, 128), TN)] += part

        @pl.when(t == T_last)
        def _():
            x_out[...] = x_res[...]

    kind = ((t >= t_lora).astype(jnp.int32) + (t >= o0) + (t >= f0)
            + (t >= vv0))
    jax.lax.switch(kind, [rkv_body, lora_body, out_body, ffnk_body,
                          ffnv_body])


def decode_step_mega(
    mega: Params, cfg, x: jax.Array, mstate: Params,
    *, interpret: bool | None = None, spec: MegaSpec | None = None,
) -> Tuple[jax.Array, Params]:
    """One B=1 decode step through the megakernel.

    x: (1, C) token embedding (pre-ln0). Returns (hidden (1, C) post-ln_out,
    new mega state). Semantics == models/rwkv7.decode_step with unfused
    int8 params at B=1 (parity: tests/test_decode_mega.py).

    `spec` may be passed explicitly (jit callers keep it static and pop it
    from the mega dict); `interpret=None` auto-selects interpret mode off
    TPU (the resolve_impl convention).
    """
    from rwkvtts_tpu.ops.norm import layer_norm

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = spec if spec is not None else mega["spec"]
    C, L, P, TN, T = spec.C, spec.L, spec.P, spec.TN, spec.T
    x = layer_norm(
        x.astype(jnp.float32), mega["ln0_scale"], mega["ln0_bias"],
        spec.norm_eps,
    ).astype(jnp.float32)

    carry_dt = mstate["wkv"].dtype
    grid = (L, T)
    l_map = lambda l, t: (l, 0, 0)

    x_f, ax, fx, wkv = pl.pallas_call(
        functools.partial(_mega_kernel, spec=spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 64, 128), lambda l, t: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, TN), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * _LORA_PAD, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _NS, C), l_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), l_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 64, 128), lambda l, t: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((L, P, 64, 128), carry_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, C), jnp.float32),          # xs
            pltpu.VMEM((8, _LORA_PAD), jnp.float32),  # lora_h
            pltpu.VMEM((1, 3 * C), jnp.float32),      # acc_rkv
            pltpu.VMEM((1, 4 * C), jnp.float32),      # acc_ffn
            pltpu.VMEM((1, C), jnp.float32),          # x_res
            pltpu.VMEM((1, C), jnp.float32),          # v_first
            pltpu.VMEM((1, C), jnp.float32),          # y_g
            pltpu.VMEM((1, 128), jnp.float32),        # tmp_row (bridge)
            pltpu.VMEM((128, 1), jnp.float32),        # tmp_col (y bridge)
            pltpu.VMEM((8, C), jnp.float32),          # grows (glue rows)
        ],
        input_output_aliases={1: 1, 2: 2, 3: 3},
        interpret=interpret,
    )(
        x, mstate["att_x"].astype(jnp.float32),
        mstate["ffn_x"].astype(jnp.float32), mstate["wkv"],
        mega["w_stream"], mega["s_stream"], mega["lora_out"], mega["smalls"],
    )

    h = layer_norm(x_f, mega["ln_out_scale"], mega["ln_out_bias"], spec.norm_eps)
    new_state = {"att_x": ax, "wkv": wkv, "ffn_x": fx}
    return h, new_state
