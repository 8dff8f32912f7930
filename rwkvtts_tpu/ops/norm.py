"""Normalization primitives (XLA fuses these into neighbours; no kernel needed)."""
from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 statistics, output in input dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm(x, scale, bias, num_groups: int, eps: float):
    """GroupNorm over the last axis split into `num_groups` groups.

    Matches the reference time-mix ln_x (GroupNorm(H, C, eps=64e-5), see
    reference rwkv_asr_cuda_whisper.py:168). x: (..., C).
    """
    orig_shape = x.shape
    C = orig_shape[-1]
    g = C // num_groups
    xf = x.astype(jnp.float32).reshape(orig_shape[:-1] + (num_groups, g))
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out.reshape(orig_shape)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    """Torch-style F.normalize(p=2): x / max(||x||, eps)."""
    xf = x.astype(jnp.float32)
    s = (xf * xf).sum(axis=axis, keepdims=True)
    # max(s, eps^2) BEFORE the sqrt: grad(sqrt) at 0 is inf, and even with a
    # clamped forward the inf leaks as NaN through 0*inf on fully-masked
    # (exactly zero) positions. Clamping s keeps both passes finite.
    n = jnp.sqrt(jnp.maximum(s, eps * eps))
    return (xf / n).astype(x.dtype)
