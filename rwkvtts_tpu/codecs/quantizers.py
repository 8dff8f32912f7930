"""Vector quantizers for the codec stacks: factorized VQ, FSQ, residual FSQ.

Channels-last, functional. Behavioral parity sources (reference):
  * FactorizedVectorQuantize: third_party/sparktts/modules/vq/factorized_vector_quantize.py
  * FSQ:                      third_party/sparktts/modules/fsq/finite_scalar_quantization.py
  * ResidualFSQ:              third_party/sparktts/modules/fsq/residual_fsq.py

The token id spaces are hard contracts with the speech LMs:
  * Spark semantic: FactorizedVQ, codebook_size 8192
  * Spark global:   ResidualFSQ levels [4]*6 -> 4096 ids, 32 tokens/utt
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from rwkvtts_tpu.codecs import nn

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Factorized VQ (Spark semantic tokens)


def factorized_vq_init(key, input_dim, codebook_size, codebook_dim):
    ks = jax.random.split(key, 3)
    p: Params = {
        "codebook": jax.random.normal(ks[0], (codebook_size, codebook_dim))
    }
    if input_dim != codebook_dim:
        # 1x1 convs in the reference == plain linears channels-last
        p["in_project"] = nn.linear_init(ks[1], input_dim, codebook_dim)
        p["out_project"] = nn.linear_init(ks[2], codebook_dim, input_dim)
    return p


def _fvq_nearest(p: Params, z_e):
    """z_e: (B, T, D_code) -> indices (B, T) by cosine distance (both sides
    L2-normalized, as in decode_latents)."""
    enc = z_e * jax.lax.rsqrt(jnp.sum(z_e * z_e, -1, keepdims=True) + 1e-24)
    cb = p["codebook"]
    cb = cb * jax.lax.rsqrt(jnp.sum(cb * cb, -1, keepdims=True) + 1e-24)
    # squared euclidean on normalized vectors == 2 - 2 cos; argmin == argmax dot
    return jnp.argmax(enc @ cb.T, axis=-1)


def factorized_vq_tokenize(p: Params, z) -> jax.Array:
    """z: (B, T, input_dim) -> semantic token ids (B, T)."""
    z_e = nn.linear(p["in_project"], z) if "in_project" in p else z
    return _fvq_nearest(p, z_e)


def factorized_vq_detokenize(p: Params, indices) -> jax.Array:
    """indices: (B, T) -> z_q (B, T, input_dim)."""
    z_q = p["codebook"][indices]
    return nn.linear(p["out_project"], z_q) if "out_project" in p else z_q


def factorized_vq_forward(
    p: Params, z, commitment: float = 0.25, codebook_loss_weight: float = 1.0
) -> Dict[str, jax.Array]:
    """Training forward: straight-through z_q + commit/codebook losses.
    z: (B, T, input_dim)."""
    z_e = nn.linear(p["in_project"], z) if "in_project" in p else z
    idx = _fvq_nearest(p, z_e)
    z_q_raw = p["codebook"][idx]

    commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q_raw)) ** 2) * commitment
    codebook = (
        jnp.mean((z_q_raw - jax.lax.stop_gradient(z_e)) ** 2) * codebook_loss_weight
    )
    z_q = z_e + jax.lax.stop_gradient(z_q_raw - z_e)
    z_q = nn.linear(p["out_project"], z_q) if "out_project" in p else z_q

    onehot_counts = jnp.zeros((p["codebook"].shape[0],)).at[idx.reshape(-1)].add(1.0)
    probs = onehot_counts / idx.size
    perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
    return {
        "z_q": z_q,
        "indices": idx,
        "vq_loss": commit + codebook,
        "perplexity": perplexity,
        "active_num": jnp.sum(onehot_counts > 0).astype(jnp.float32),
    }


# ---------------------------------------------------------------------------
# FSQ (finite scalar quantization)


def fsq_basis(levels: Sequence[int]) -> jnp.ndarray:
    b = [1]
    for l in levels[:-1]:
        b.append(b[-1] * l)
    return jnp.asarray(b, jnp.int32)


def fsq_bound(z, levels: Sequence[int], eps: float = 1e-3):
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1) * (1 + eps) / 2
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z, levels: Sequence[int]):
    """Round-to-level with straight-through grad; output normalized to
    roughly [-1, 1] (divided by half_width)."""
    bounded = fsq_bound(z, levels)
    q = jnp.round(bounded)
    q = bounded + jax.lax.stop_gradient(q - bounded)
    half_width = jnp.asarray(levels, jnp.float32) // 2
    return q / half_width


def fsq_codes_to_indices(codes, levels: Sequence[int]):
    half_width = jnp.asarray(levels, jnp.float32) // 2
    zhat = codes * half_width + half_width
    return jnp.sum(zhat * fsq_basis(levels), axis=-1).astype(jnp.int32)


def fsq_indices_to_codes(indices, levels: Sequence[int]):
    lv = jnp.asarray(levels, jnp.int32)
    level_idx = (indices[..., None] // fsq_basis(levels)) % lv
    half_width = lv // 2
    return (level_idx - half_width) / half_width.astype(jnp.float32)


def fsq_forward(z, levels: Sequence[int]) -> Tuple[jax.Array, jax.Array]:
    """z: (..., len(levels)) -> (codes, indices). No projections (the Spark
    ResidualFSQ owns the in/out projections)."""
    codes = fsq_quantize(z.astype(jnp.float32), levels)
    idx = fsq_codes_to_indices(codes, levels)
    return codes.astype(z.dtype), idx


# ---------------------------------------------------------------------------
# Residual FSQ (Spark global/speaker tokens)


def residual_fsq_init(key, dim, levels: Sequence[int], num_quantizers: int = 1):
    codebook_dim = len(levels)
    p: Params = {}
    if codebook_dim != dim:
        k1, k2 = jax.random.split(key)
        p["project_in"] = nn.linear_init(k1, dim, codebook_dim)
        p["project_out"] = nn.linear_init(k2, codebook_dim, dim)
    return p


def residual_fsq_scales(levels: Sequence[int], num_quantizers: int):
    lv = jnp.asarray(levels, jnp.float32)
    return jnp.stack([(lv - 1) ** -i for i in range(num_quantizers)])


def residual_fsq_forward(
    p: Params, x, levels: Sequence[int], num_quantizers: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, N, dim) -> (quantized (B, N, dim), indices (B, N, Q))."""
    scales = residual_fsq_scales(levels, num_quantizers)
    h = nn.linear(p["project_in"], x) if "project_in" in p else x
    residual = h
    out = jnp.zeros_like(h)
    all_idx = []
    for qi in range(num_quantizers):
        codes, idx = fsq_forward(residual / scales[qi], levels)
        quantized = codes * scales[qi]
        residual = residual - jax.lax.stop_gradient(quantized)
        out = out + quantized
        all_idx.append(idx)
    out = nn.linear(p["project_out"], out) if "project_out" in p else out
    return out, jnp.stack(all_idx, axis=-1)


def residual_fsq_output_from_indices(
    p: Params, indices, levels: Sequence[int], num_quantizers: int = 1
) -> jax.Array:
    """indices: (B, N, Q) -> (B, N, dim)."""
    scales = residual_fsq_scales(levels, num_quantizers)
    codes = fsq_indices_to_codes(indices, levels)  # (B, N, Q, D)
    summed = jnp.sum(codes * scales[None, None, :, :], axis=2)  # scales: (Q, D)
    return nn.linear(p["project_out"], summed) if "project_out" in p else summed
