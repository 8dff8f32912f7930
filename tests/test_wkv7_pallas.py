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
