"""Round-2 Pallas WKV benchmark: isolated layer fwd / fwd+bwd vs XLA chunked.

Run on the TPU (axon default platform). Times include explicit host-sync
(np.asarray) because block_until_ready does not fence on the tunnel.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rwkvtts_tpu.ops import wkv7 as W
from rwkvtts_tpu.ops import wkv7_pallas as WP
from rwkvtts_tpu.utils import jit_cache

jit_cache.enable()

B, T, H, N = 8, 2048, 12, 64


def make_inputs(key, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 7)
    shp = (B, T, H, N)
    r = (jax.random.normal(ks[0], shp) * 0.4).astype(dtype)
    w_raw = (-0.5 - jax.nn.softplus(jax.random.normal(ks[1], shp))).astype(dtype)
    k = (jax.random.normal(ks[2], shp) * 0.4).astype(dtype)
    v = (jax.random.normal(ks[3], shp) * 0.4).astype(dtype)
    kk = jax.random.normal(ks[4], shp)
    kk = kk / (jnp.linalg.norm(kk, axis=-1, keepdims=True) + 1e-12)
    a = jax.nn.sigmoid(jax.random.normal(ks[5], shp))
    z = (-kk).astype(dtype)
    b = (kk * a).astype(dtype)
    return r, w_raw, k, v, z, b


def timeit(fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync after compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    key = jax.random.PRNGKey(0)
    args = make_inputs(key)

    def fwd_fn(impl_kwargs, pallas=True):
        if pallas:
            f = lambda *a: WP.wkv7_pallas(*a, **impl_kwargs)[0]
        else:
            f = lambda *a: W.wkv7_chunked(*a, **impl_kwargs)[0]
        return jax.jit(f)

    def bwd_fn(impl_kwargs, pallas=True):
        if pallas:
            f = lambda *a: (WP.wkv7_pallas(*a, **impl_kwargs)[0].astype(jnp.float32) ** 2).sum()
        else:
            f = lambda *a: (W.wkv7_chunked(*a, **impl_kwargs)[0].astype(jnp.float32) ** 2).sum()
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4, 5)))

    rows = []
    variants = [
        ("xla_chunk32", dict(chunk=32), False),
        ("pallas_L64_G8_f32", dict(chunk=64, group=8, mm_dtype="f32"), True),
        ("pallas_L64_G8_bf16", dict(chunk=64, group=8, mm_dtype="bf16"), True),
        ("pallas_L64_G16_bf16", dict(chunk=64, group=16, mm_dtype="bf16"), True),
        ("pallas_L32_G16_bf16", dict(chunk=32, group=16, mm_dtype="bf16"), True),
        ("pallas_L128_G8_bf16", dict(chunk=128, group=8, mm_dtype="bf16"), True),
    ]
    for name, kw, is_pallas in variants:
        try:
            t_f = timeit(fwd_fn(kw, is_pallas), args)
        except Exception as e:
            print(f"{name}: fwd FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        try:
            t_b = timeit(bwd_fn(kw, is_pallas), args, iters=4)
        except Exception as e:
            t_b = float("nan")
            print(f"{name}: bwd FAILED: {type(e).__name__}: {str(e)[:200]}")
        rows.append((name, t_f, t_b))
        print(f"{name:26s} fwd {t_f:8.2f} ms   fwd+bwd {t_b:8.2f} ms", flush=True)

    # numerics check on TPU (vs fp32 scan on small slice)
    small = tuple(a[:1, :256] for a in args)
    y_ref, _ = W.wkv7_scan(*[s.astype(jnp.float32) for s in small])
    for name, kw, is_pallas in variants:
        if not is_pallas:
            continue
        try:
            y, _ = WP.wkv7_pallas(*small, **kw)
            err = float(jnp.abs(y.astype(jnp.float32) - y_ref).max())
            print(f"{name:26s} max|err| vs scan: {err:.3e}")
        except Exception as e:
            print(f"{name}: check FAILED: {str(e)[:150]}")


if __name__ == "__main__":
    main()
