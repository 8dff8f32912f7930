"""Two-level / sequence-parallel chunked WKV7 (wkv7_chunked_sp): exact
parity with the single-level scan across spans, resets, entry states,
padding, and gradients — and through a T-sharded mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkvtts_tpu.ops import wkv7 as W
from tests.test_wkv7 import make_inputs


@pytest.mark.parametrize("spans", [1, 2, 4])
@pytest.mark.parametrize("T", [64, 48, 37])
def test_sp_matches_scan(spans, T):
    key = jax.random.PRNGKey(0)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=T)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state)
    y, s = W.wkv7_chunked_sp(
        r, w_raw, k, v, z, b, state, chunk=16, spans=spans
    )
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_sp_resets_across_span_boundaries():
    """Resets anywhere — inside spans AND at span boundaries — compose
    exactly (the affine maps are reset-aware by construction)."""
    key = jax.random.PRNGKey(2)
    B, T = 2, 64
    r, w_raw, k, v, z, b, state = make_inputs(key, B=B, T=T)
    resets = np.zeros((B, T), dtype=bool)
    resets[0, 13] = True
    resets[0, 32] = True  # exactly at a span boundary (spans=4, Ts=16)
    resets[1, 50] = True
    resets = jnp.asarray(resets)
    y_ref, s_ref = W.wkv7_scan(r, w_raw, k, v, z, b, state, resets)
    y, s = W.wkv7_chunked_sp(
        r, w_raw, k, v, z, b, state, resets, chunk=8, spans=4
    )
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_sp_gradients_match_scan():
    key = jax.random.PRNGKey(4)
    r, w_raw, k, v, z, b, state = make_inputs(key, B=1, T=32, H=2, N=8)

    def loss_fn(impl):
        def f(args):
            y, s = impl(*args)
            return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

        return f

    args = (r, w_raw, k, v, z, b, state)
    g_ref = jax.grad(loss_fn(W.wkv7_scan))(args)
    g_sp = jax.grad(
        loss_fn(lambda *a: W.wkv7_chunked_sp(*a, chunk=8, spans=4))
    )(args)
    for gr, gc, name in zip(g_ref, g_sp, "r w k v z b state".split()):
        np.testing.assert_allclose(
            gc, gr, rtol=5e-3, atol=5e-4, err_msg=f"grad mismatch: {name}"
        )


def test_sp_dispatch_via_wkv7():
    key = jax.random.PRNGKey(5)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=48)
    y_ref, s_ref = W.wkv7(r, w_raw, k, v, z, b, state, impl="chunked")
    y, s = W.wkv7(r, w_raw, k, v, z, b, state, impl="chunked", spans=3)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s, s_ref, rtol=2e-4, atol=2e-4)


def test_sp_bf16_io():
    key = jax.random.PRNGKey(6)
    r, w_raw, k, v, z, b, state = make_inputs(key, T=64)
    cast = lambda x: x.astype(jnp.bfloat16)
    y, s = W.wkv7_chunked_sp(
        cast(r), cast(w_raw), cast(k), cast(v), cast(z), cast(b), state,
        chunk=16, spans=4,
    )
    assert y.dtype == jnp.bfloat16
    assert s.dtype == jnp.float32


def test_sp_sharded_over_mesh_matches_unsharded():
    """T sharded over a mesh axis in `spans` pieces: the op's value (and
    grads) must be independent of the sharding — context parallelism for
    the linear-state recurrence."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("dp", "sp"))
    key = jax.random.PRNGKey(7)
    r, w_raw, k, v, z, b, state = make_inputs(key, B=2, T=64)

    def loss(args):
        y, s = W.wkv7_chunked_sp(*args, chunk=8, spans=4)
        return (y.astype(jnp.float32) ** 2).sum() + (s**2).sum() * 0.1

    args = (r, w_raw, k, v, z, b, state)
    ref_l, ref_g = jax.jit(jax.value_and_grad(loss))(args)

    xsh = NamedSharding(mesh, P("dp", "sp"))  # (B,T,H,N): T over sp
    ssh = NamedSharding(mesh, P("dp"))  # (B,H,N,N): replicated over sp
    sharded = (
        tuple(jax.device_put(a, xsh) for a in args[:6])
        + (jax.device_put(state, ssh),)
    )
    sp_l, sp_g = jax.jit(jax.value_and_grad(loss))(sharded)
    np.testing.assert_allclose(float(sp_l), float(ref_l), rtol=1e-5)
    for gr, gc, name in zip(ref_g, sp_g, "r w k v z b state".split()):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gr), rtol=5e-3, atol=5e-4,
            err_msg=f"sharded grad mismatch: {name}",
        )
