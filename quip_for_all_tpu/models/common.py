"""Shared pieces of the model families (models/*.py)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def update_kv_cache(kv_cache: Optional[Tuple[jax.Array, jax.Array]],
                    k: jax.Array, v: jax.Array, cache_position):
    """Write the new k/v (B, S, KV, hd) into the static cache at
    cache_position. A scalar position writes all batch rows at one offset
    (single-sequence decode); a (B,) vector writes per-slot positions
    (continuous batching). Returns (k, v, new_cache) where k/v are the
    full cache when caching, or the inputs unchanged when kv_cache is
    None."""
    if kv_cache is None:
        return k, v, None
    ck, cv = kv_cache
    cp = jnp.asarray(cache_position)
    if cp.ndim == 0:
        ck = jax.lax.dynamic_update_slice_in_dim(
            ck, k.astype(ck.dtype), cp, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(
            cv, v.astype(cv.dtype), cp, axis=1)
    else:
        upd = jax.vmap(
            lambda c, kk, p: jax.lax.dynamic_update_slice_in_dim(
                c, kk, p, axis=0))
        ck = upd(ck, k.astype(ck.dtype), cp)
        cv = upd(cv, v.astype(cv.dtype), cp)
    return ck, cv, (ck, cv)


def sdpa_cache_layout(q: jax.Array, k: jax.Array, v: jax.Array,
                      attn_mask: jax.Array, out_dtype,
                      attn_window: Optional[int] = None) -> jax.Array:
    """Attention with k/v kept in cache layout (B, T, H, hd) throughout —
    the dots batch over the head axis in place (rhs batch dim 2) so the
    multi-MB cache prefix is never transposed/copied. q: (B, S, H, hd);
    returns (B, S, H*hd).

    attn_window (static): the caller guarantees every query position is
    < attn_window, so only that cache prefix is read — a full static
    cache otherwise costs the whole cache_len read every decode token.

    GQA (k/v have KV < H heads, KV | H): the query heads are GROUPED over
    their kv head and the dots batch over the KV axis directly — never
    jnp.repeat the cache (a repeat materializes an H/KV× copy of the
    multi-MB window every decode step). Query head h uses kv head
    h // (H//KV), the HF grouping."""
    import numpy as np
    if attn_window is not None and attn_window < k.shape[1]:
        k = k[:, :attn_window]
        v = v[:, :attn_window]
        attn_mask = attn_mask[..., :attn_window]
    B, S, H, hd = q.shape
    KV = k.shape[2]
    T = k.shape[1]
    if KV == H:
        qt = q.transpose(0, 2, 1, 3)               # (B, H, S, hd)
        scores = jax.lax.dot_general(
            qt, k, (((3,), (3,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32) / np.sqrt(hd)
        scores = scores + attn_mask                # (B, H, S, T)
        probs = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32).astype(out_dtype)
        return ctx.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
    rep = H // KV
    qg = (q.reshape(B, S, KV, rep, hd).transpose(0, 2, 3, 1, 4)
          .reshape(B, KV, rep * S, hd))
    scores = jax.lax.dot_general(
        qg, k, (((3,), (3,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32) / np.sqrt(hd)
    scores = scores.reshape(B, KV, rep, S, T) + attn_mask[:, :, None]
    probs = (jax.nn.softmax(scores, axis=-1).astype(out_dtype)
             .reshape(B, KV, rep * S, T))
    ctx = jax.lax.dot_general(
        probs, v, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32).astype(out_dtype)
    return (ctx.reshape(B, KV, rep, S, hd).transpose(0, 3, 1, 2, 4)
            .reshape(B, S, H * hd))
