"""Functional GPT-NeoX family decoder (Pythia / GPT-NeoX-20B), pure JAX.

Third architecture family. The reference covers it via name patterns
(``/root/reference/constants.py:20`` "gpt_neox.layers",
``ATTN_QKV_PATTERNS`` "attention.query_key_value",
``FC1_PATTERN`` "mlp.dense_h_to_4h"). Family-specific behavior handled
natively here:
  - fused query_key_value projection with HF's PER-HEAD interleaved layout:
    the (3*D, D) weight's output rows are ordered (head, {q,k,v}, head_dim),
    so the projection output reshapes to (B, S, H, 3, hd);
  - partial rotary embeddings: only the first rotary_pct * head_dim dims
    rotate (Pythia uses 0.25), the rest pass through;
  - parallel residual (use_parallel_residual=True):
    x = x + attn(ln1(x)) + mlp(ln2(x));
  - LayerNorm with bias, untied embed_out head.

Same API surface as models/llama.py so the quantizer, generate loop and
serving engine work unchanged through models.registry.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .gpt2 import layer_norm
from .llama import causal_mask, cache_mask, linear_apply
from .common import sdpa_cache_layout, update_kv_cache

Params = Dict[str, Any]


def rotary_dims(cfg: ModelConfig) -> int:
    d = int(cfg.head_dim * cfg.rotary_pct)
    return d - d % 2


def rope_tables(cfg: ModelConfig, positions: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables over the rotary sub-dimension (half-split layout,
    matching HF GPTNeoXRotaryEmbedding)."""
    d = rotary_dims(cfg)
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2,
                                                   dtype=np.float32) / d))
    ang = positions[..., None].astype(jnp.float32) * inv_freq[None, :]
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_partial_rope(q, k, cos, sin, rot: int):
    # q, k: (B, S, H, hd); rotate the first `rot` dims only
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    q_r, q_p = q[..., :rot], q[..., rot:]
    k_r, k_p = k[..., :rot], k[..., rot:]
    q_r = q_r * cos.astype(q.dtype) + _rotate_half(q_r) * sin.astype(q.dtype)
    k_r = k_r * cos.astype(k.dtype) + _rotate_half(k_r) * sin.astype(k.dtype)
    return (jnp.concatenate([q_r, q_p], -1),
            jnp.concatenate([k_r, k_p], -1))


def attention(cfg: ModelConfig, attn_p: Params, x, cos, sin, kv_cache,
              cache_position, attn_mask, linear_kw, captures, attn_window=None):
    B, S, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    if captures is not None:
        captures["qkv"] = x
    qkv = linear_apply(attn_p["query_key_value"], x, **linear_kw)
    qkv = qkv.reshape(B, S, H, 3, hd)          # HF interleaved layout
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    q, k = _apply_partial_rope(q, k, cos, sin, rotary_dims(cfg))

    k, v, new_cache = update_kv_cache(kv_cache, k, v, cache_position)

    ctx = sdpa_cache_layout(q, k, v, attn_mask, x.dtype,
                            attn_window=attn_window)
    if captures is not None:
        captures["o"] = ctx
    out = linear_apply(attn_p["dense"], ctx, **linear_kw)
    return out, new_cache


def block_apply(cfg: ModelConfig, blk: Params, x, cos=None, sin=None,
                kv_cache=None, cache_position=None, attn_mask=None,
                linear_kw: Optional[dict] = None, capture: bool = False,
                attn_window=None):
    linear_kw = linear_kw or {}
    captures: Optional[dict] = {} if capture else None
    h = layer_norm(blk["input_layernorm"], x, cfg.rms_norm_eps)
    a, new_cache = attention(cfg, blk["attention"], h, cos, sin, kv_cache,
                             cache_position, attn_mask, linear_kw, captures,
                         attn_window)

    def mlp(h):
        if captures is not None:
            captures["fc1"] = h
        m = linear_apply(blk["mlp"]["dense_h_to_4h"], h, **linear_kw)
        m = jax.nn.gelu(m, approximate=True)
        if captures is not None:
            captures["fc2"] = m
        return linear_apply(blk["mlp"]["dense_4h_to_h"], m, **linear_kw)

    if cfg.use_parallel_residual:
        h2 = layer_norm(blk["post_attention_layernorm"], x,
                        cfg.rms_norm_eps)
        x = x + a + mlp(h2)
    else:
        x = x + a
        h2 = layer_norm(blk["post_attention_layernorm"], x,
                        cfg.rms_norm_eps)
        x = x + mlp(h2)
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids,
                positions=None, kv_caches=None, cache_position=None,
                attn_mask=None, linear_kw=None, dtype=jnp.float32,
                attn_window=None):
    B, S = input_ids.shape
    x = jnp.take(params["embed_in"]["weight"], input_ids, axis=0
                 ).astype(dtype)
    if positions is None:
        positions = jnp.arange(S)[None, :].repeat(B, 0)
    cos, sin = rope_tables(cfg, positions)
    if attn_mask is None:
        if kv_caches is None:
            attn_mask = causal_mask(S, S)
        else:
            from .common import kv_len
            attn_mask = cache_mask(positions, kv_len(kv_caches[0][0]))
    new_caches = [] if kv_caches is not None else None
    for i in range(cfg.num_hidden_layers):
        cache_i = kv_caches[i] if kv_caches is not None else None
        x, nc, _ = block_apply(cfg, params["layers"][i], x, cos, sin,
                               cache_i, cache_position, attn_mask,
                               linear_kw, attn_window=attn_window)
        if new_caches is not None:
            new_caches.append(nc)
    x = layer_norm(params["final_layer_norm"], x, cfg.rms_norm_eps)
    logits = linear_apply(params["embed_out"], x, **(linear_kw or {}))
    return logits, new_caches


def init_gpt_neox_params(cfg: ModelConfig, seed: int = 0,
                         dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size

    def lin(out_f, in_f):
        w = (rng.standard_normal((out_f, in_f)) / np.sqrt(in_f)
             ).astype(np.float32)
        return {"weight": jnp.asarray(w, dtype=dtype),
                "bias": jnp.zeros((out_f,), dtype)}

    def ln():
        return {"weight": jnp.ones((D,), dtype),
                "bias": jnp.zeros((D,), dtype)}

    return {
        "embed_in": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "layers": [
            {"input_layernorm": ln(), "post_attention_layernorm": ln(),
             "attention": {"query_key_value": lin(3 * D, D),
                           "dense": lin(D, D)},
             "mlp": {"dense_h_to_4h": lin(I, D),
                     "dense_4h_to_h": lin(D, I)}}
            for _ in range(cfg.num_hidden_layers)
        ],
        "final_layer_norm": ln(),
        "embed_out": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype), "bias": None},
    }
