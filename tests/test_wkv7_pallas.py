"""Pallas WKV7 kernel equivalence: fwd, custom_vjp backward, and resets vs
the scan ground truth (interpret mode on the CPU test mesh; the same kernel
compiles via Mosaic on TPU — see scripts/bench_wkv_pallas_r2.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.ops import wkv7 as W
from rwkvtts_tpu.ops import wkv7_pallas as WP

from test_wkv7 import make_inputs


@pytest.mark.parametrize("chunk,T,group", [(16, 48, 4), (16, 37, 2), (32, 64, 6)])
def test_pallas_fwd_matches_scan(chunk, T, group):
    key = jax.random.PRNGKey(0)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=T)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    y, s = WP.wkv7_pallas(r, w_raw, k, v, z, b, state, chunk=chunk, group=group)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_pallas_gradients_match_scan():
    """The Pallas backward kernel (chunk checkpoint-and-recompute, the CUDA
    wkv7_cuda.cu:54-130 strategy) must agree with AD through the scan."""
    key = jax.random.PRNGKey(4)
    r, w_raw, k, v, z, b, state = make_inputs(key, B=1, T=32, H=2, N=8)

    def loss_fn(impl):
        def f(args):
            y, s = impl(*args)
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    args = (r, w_raw, k, v, z, b, state)
    g_ref = jax.grad(loss_fn(W.wkv7_scan))(args)
    g_pal = jax.grad(
        loss_fn(lambda *a: WP.wkv7_pallas(*a, chunk=16, group=2))
    )(args)
    for gr, gc, name in zip(g_ref, g_pal, "r w k v z b state".split()):
        np.testing.assert_allclose(
            gc, gr, rtol=5e-3, atol=5e-4, err_msg=f"pallas grad mismatch: {name}"
        )


def test_pallas_segment_resets_fwd_and_grad():
    key = jax.random.PRNGKey(2)
    B, T = 2, 40
    r, w_raw, k, v, z, b, state = make_inputs(key, B=B, T=T)
    resets = np.zeros((B, T), dtype=bool)
    resets[0, 13] = True
    resets[0, 29] = True
    resets[1, 5] = True
    resets = jnp.asarray(resets)

    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state, resets)
    y, s = WP.wkv7_pallas(r, w_raw, k, v, z, b, state, resets, chunk=16, group=6)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)

    def lf(impl):
        def f(args):
            y, s = impl(*args, resets)
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    args = (r, w_raw, k, v, z, b, state)
    g_ref = jax.grad(lf(W.wkv7_scan))(args)
    g_pal = jax.grad(
        lf(lambda *a: WP.wkv7_pallas(*a, chunk=16, group=4))
    )(args)
    for gr, gc, name in zip(g_ref, g_pal, "r w k v z b state".split()):
        np.testing.assert_allclose(
            gc, gr, rtol=5e-3, atol=5e-4, err_msg=f"resets grad mismatch: {name}"
        )


def test_pallas_bf16_io():
    key = jax.random.PRNGKey(5)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=32)
    cast = lambda x: x.astype(jnp.bfloat16)
    y, s = WP.wkv7_pallas(
        cast(r), cast(w_raw), cast(k), cast(v), cast(z), cast(b), state,
        chunk=16, group=6,
    )
    assert y.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32
    y_ref, _ = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    np.testing.assert_allclose(
        y.astype(jnp.float32), y_ref, rtol=0.1, atol=0.1
    )


def test_pallas_bf16_mm_tolerance():
    """bf16 matmul operands (the reference CUDA kernel's own precision
    contract) stay within bf16-grade tolerance of the fp32 scan."""
    key = jax.random.PRNGKey(6)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=32)
    y, s = WP.wkv7_pallas(
        r, w_raw, k, v, z, b, state, chunk=16, group=6, mm_dtype="bf16"
    )
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    np.testing.assert_allclose(y, y_ref, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(s, s_ref, rtol=0.05, atol=0.05)


def test_pallas_dispatch():
    key = jax.random.PRNGKey(7)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=32)
    y_ref, _ = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    y, _ = W.wkv7(r, w_raw, k, v, z, b, state, impl="pallas", chunk=16)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_pallas_under_shard_map():
    """Multi-chip contract: the kernel runs per-shard under shard_map over
    the dp axis (a Pallas call is a per-device program; GSPMD cannot split
    it, so sharded training wraps it this way — batch dim is dp-sharded)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("dp",))
    key = jax.random.PRNGKey(9)
    r, w_raw, k, v, z, b, state = make_inputs(key, B=4, T=32, H=2, N=8)

    def local_fn(r, w, k, v, z, b, s):
        return WP.wkv7_pallas(r, w, k, v, z, b, s, chunk=16, group=2)

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("dp"),) * 6 + (P("dp"),),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    y, s = jax.jit(sharded)(r, w_raw, k, v, z, b, state)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Fused-prep kernel (wkv7_pallas_fused): elementwise band folded in-kernel
# ---------------------------------------------------------------------------

_LN_EPS = 64e-5


def make_fused_inputs(key, B=2, T=48, H=3, N=8):
    ks = jax.random.split(key, 11)
    shp = (B, T, H, N)
    r = jax.random.normal(ks[0], shp) * 0.4
    w_raw = -0.5 - jax.nn.softplus(jax.random.normal(ks[1], shp))
    k_raw = jax.random.normal(ks[2], shp) * 0.4
    v = jax.random.normal(ks[3], shp) * 0.4
    a = jax.nn.sigmoid(jax.random.normal(ks[4], shp))
    k_k = 0.7 + 0.1 * jax.random.normal(ks[5], (H, N))
    k_a = 1.0 + 0.05 * jax.random.normal(ks[6], (H, N))
    r_k = -0.04 + 0.1 * jax.random.normal(ks[7], (H, N))
    ln_w = 1.0 + 0.1 * jax.random.normal(ks[8], (H, N))
    ln_b = 0.05 * jax.random.normal(ks[9], (H, N))
    state = jax.random.normal(ks[10], (B, H, N, N), jnp.float32) * 0.3
    return (r, w_raw, k_raw, v, a, k_k, k_a, r_k, ln_w, ln_b, state)


def fused_ref(r, w_raw, k_raw, v, a, k_k, k_a, r_k, ln_w, ln_b, state,
              resets=None):
    """Composed reference: the exact model math the fused kernel replaces
    (models/rwkv7.py block_forward composed branch, all-f32)."""
    kx = k_raw * k_k[None, None]
    s = (kx * kx).sum(-1, keepdims=True)
    kk = kx / jnp.sqrt(jnp.maximum(s, 1e-24))
    keff = k_raw * (1.0 + (a - 1.0) * k_a[None, None])
    y, sf = W.wkv7_scan(r, w_raw, keff, v, -kk, kk * a, state, resets)
    yf = y.astype(jnp.float32)
    mu = yf.mean(-1, keepdims=True)
    var = ((yf - mu) ** 2).mean(-1, keepdims=True)
    yn = (yf - mu) / jnp.sqrt(var + _LN_EPS) * ln_w[None, None] + ln_b[None, None]
    bonus = (r * keff * r_k[None, None]).sum(-1, keepdims=True) * v
    return yn + bonus, sf


@pytest.mark.parametrize("T", [48, 37])
def test_fused_fwd_matches_composed(T):
    args = make_fused_inputs(jax.random.PRNGKey(0), T=T)
    y_ref, s_ref = fused_ref(*args)
    y, s = WP.wkv7_pallas_fused(*args, ln_eps=_LN_EPS, chunk=16, group=4)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_fused_gradients_match_composed():
    args = make_fused_inputs(jax.random.PRNGKey(1), B=1, T=32, H=2, N=8)

    def loss_fn(impl):
        def f(args):
            y, s = impl(*args)
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    g_ref = jax.grad(loss_fn(fused_ref))(args)
    g_pal = jax.grad(
        loss_fn(
            lambda *a: WP.wkv7_pallas_fused(
                *a, ln_eps=_LN_EPS, chunk=16, group=2
            )
        )
    )(args)
    names = "r w k_raw v a k_k k_a r_k ln_w ln_b state".split()
    for gr, gc, name in zip(g_ref, g_pal, names):
        np.testing.assert_allclose(
            gc, gr, rtol=5e-3, atol=1e-3, err_msg=f"fused grad mismatch: {name}"
        )


def test_fused_resets_fwd_and_grad():
    B, T = 2, 40
    args = make_fused_inputs(jax.random.PRNGKey(2), B=B, T=T)
    resets = np.zeros((B, T), dtype=bool)
    resets[0, 13] = True
    resets[1, 5] = True
    resets = jnp.asarray(resets)

    y_ref, s_ref = fused_ref(*args, resets=resets)
    y, s = WP.wkv7_pallas_fused(
        *args, resets=resets, ln_eps=_LN_EPS, chunk=16, group=6
    )
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)

    def lf(impl):
        def f(args):
            y, s = impl(*args)
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    g_ref = jax.grad(lf(lambda *a: fused_ref(*a, resets=resets)))(args)
    g_pal = jax.grad(
        lf(
            lambda *a: WP.wkv7_pallas_fused(
                *a, resets=resets, ln_eps=_LN_EPS, chunk=16, group=4
            )
        )
    )(args)
    names = "r w k_raw v a k_k k_a r_k ln_w ln_b state".split()
    for gr, gc, name in zip(g_ref, g_pal, names):
        np.testing.assert_allclose(
            gc, gr, rtol=5e-3, atol=1e-3,
            err_msg=f"fused resets grad mismatch: {name}"
        )


def test_fused_bf16_io():
    args = make_fused_inputs(jax.random.PRNGKey(3), T=32)
    r, w_raw, k_raw, v, a = (x.astype(jnp.bfloat16) for x in args[:5])
    y, s = WP.wkv7_pallas_fused(
        r, w_raw, k_raw, v, a, *args[5:], ln_eps=_LN_EPS, chunk=16, group=6
    )
    assert y.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32
    y_ref, _ = fused_ref(*args)
    np.testing.assert_allclose(
        y.astype(jnp.float32), y_ref, rtol=0.1, atol=0.1
    )


def test_saved_solve_matches_autodiff():
    """solve='saved' (forward stores (I-A)^{-1}; backward adjoint is
    u = inv^T dsa, dA = u sa^T) must match solve='autodiff' (vjp through
    the Neumann doubling chain) to float-association noise — values
    exactly, grads to ~1e-5. Covers both kernel families, with resets."""
    key = jax.random.PRNGKey(11)
    args = make_inputs(key, B=2, T=48, H=4, N=16)
    resets = (
        jax.random.uniform(jax.random.PRNGKey(12), (2, 48)) < 0.06
    ).astype(jnp.float32)

    def lf(solve):
        def f(a):
            y, s = WP.wkv7_pallas(
                *a, resets=resets, chunk=16, group=4, solve=solve
            )
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    la, ga = jax.value_and_grad(lf("autodiff"))(args)
    ls, gs = jax.value_and_grad(lf("saved"))(args)
    np.testing.assert_allclose(float(ls), float(la), rtol=1e-6)
    for a_, s_ in zip(ga, gs):
        np.testing.assert_allclose(
            np.asarray(s_), np.asarray(a_), rtol=5e-4, atol=5e-5
        )

    fargs = make_fused_inputs(jax.random.PRNGKey(13), T=48)

    def lff(solve):
        def f(a):
            y, s = WP.wkv7_pallas_fused(
                *a, resets=resets, ln_eps=_LN_EPS, chunk=16, group=4,
                solve=solve,
            )
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    la, ga = jax.value_and_grad(lff("autodiff"))(fargs)
    ls, gs = jax.value_and_grad(lff("saved"))(fargs)
    np.testing.assert_allclose(float(ls), float(la), rtol=1e-6)
    for a_, s_ in zip(ga, gs):
        np.testing.assert_allclose(
            np.asarray(s_), np.asarray(a_), rtol=5e-4, atol=5e-5
        )
