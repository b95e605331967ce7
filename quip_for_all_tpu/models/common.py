"""Shared pieces of the model families (models/*.py)."""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKVCache:
    """int8 KV cache slab: per-(slot, position, head) absmax scaling.

    Halves attention's HBM reads vs bf16 (the decode-time cost that
    grows with context) and halves cache memory — the "int4/int8 KV
    outruns fp16" result (PAPERS.md). Dequantization happens AFTER the
    attention-window slice, so only the attended prefix is ever
    converted. The reference has no KV-cache quantization (HF
    StaticCache is fp16, example_generate.py:66)."""
    data: jax.Array          # (B, S, KV, hd) int8
    scale: jax.Array         # (B, S, KV, 1) f32


def kv_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, S, KV, hd) float -> (int8 codes, f32 scale)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def kv_materialize(kv, dtype) -> jax.Array:
    """QuantKVCache | Array -> dense Array in ``dtype``."""
    if isinstance(kv, QuantKVCache):
        return (kv.data.astype(jnp.float32) * kv.scale).astype(dtype)
    return kv.astype(dtype) if kv.dtype != dtype else kv


def kv_window(kv, W: int):
    """Static prefix slice [:, :W] on either cache representation."""
    if isinstance(kv, QuantKVCache):
        if W >= kv.data.shape[1]:
            return kv
        return QuantKVCache(kv.data[:, :W], kv.scale[:, :W])
    return kv[:, :W] if W < kv.shape[1] else kv


def kv_dyn_slice(kv, start, size: int):
    """dynamic_slice_in_dim on the time axis, both representations."""
    if isinstance(kv, QuantKVCache):
        return QuantKVCache(
            jax.lax.dynamic_slice_in_dim(kv.data, start, size, axis=1),
            jax.lax.dynamic_slice_in_dim(kv.scale, start, size, axis=1))
    return jax.lax.dynamic_slice_in_dim(kv, start, size, axis=1)


def kv_len(kv) -> int:
    return (kv.data if isinstance(kv, QuantKVCache) else kv).shape[1]


def _write_slab(c: jax.Array, x: jax.Array, cp) -> jax.Array:
    if cp.ndim == 0:
        return jax.lax.dynamic_update_slice_in_dim(
            c, x.astype(c.dtype), cp, axis=1)
    return jax.vmap(
        lambda ci, xi, p: jax.lax.dynamic_update_slice_in_dim(
            ci, xi.astype(ci.dtype), p, axis=0))(c, x, cp)


def write_kv(cache, x: jax.Array, cp):
    """Write new (B, S, KV, hd) float k-or-v into either cache kind."""
    if isinstance(cache, QuantKVCache):
        q, s = kv_quantize(x)
        return QuantKVCache(_write_slab(cache.data, q, cp),
                            _write_slab(cache.scale, s, cp))
    return _write_slab(cache, x, cp)


def update_kv_cache(kv_cache, k: jax.Array, v: jax.Array, cache_position):
    """Write the new k/v (B, S, KV, hd) into the static cache at
    cache_position. A scalar position writes all batch rows at one offset
    (single-sequence decode); a (B,) vector writes per-slot positions
    (continuous batching). Returns (k, v, new_cache) where k/v are the
    full cache (possibly QuantKVCache) when caching, or the inputs
    unchanged when kv_cache is None."""
    if kv_cache is None:
        return k, v, None
    ck, cv = kv_cache
    cp = jnp.asarray(cache_position)
    ck = write_kv(ck, k, cp)
    cv = write_kv(cv, v, cp)
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
    if attn_window is not None and attn_window < kv_len(k):
        k = kv_window(k, attn_window)
        v = kv_window(v, attn_window)
        attn_mask = attn_mask[..., :attn_window]
    # int8 caches dequantize here — after the window slice, so only the
    # attended prefix is converted/read
    k = kv_materialize(k, q.dtype)
    v = kv_materialize(v, q.dtype)
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
