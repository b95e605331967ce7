"""Functional Falcon family decoder (falcon-7b/40b-style), pure JAX.

Fifth architecture family. The reference covers Falcon via name patterns
(``/root/reference/constants.py:22`` "transformer.h" + ATTN patterns for
"self_attention.query_key_value"/"self_attention.dense"). Family behavior
handled natively:
  - fused query_key_value with HF's GROUPED interleaved layout: output rows
    ordered (kv_group, {q_0..q_per_group-1, k, v}, head_dim); covers both
    the multi-query 7b layout (1 kv group) and the 40b GQA layout;
  - parallel attention + MLP off a single input LayerNorm
    (parallel_attn=True); the non-parallel pre/post-LN variant
    (cfg.use_parallel_residual=False); and the new_decoder_architecture
    (falcon-40B/180B) variant: GQA num_kv_heads plus parallel residual off
    separate ln_attn / ln_mlp input norms (cfg.parallel_dual_ln);
  - full rotary embeddings, LayerNorm with bias, tied lm_head.

Same API surface as models/llama.py so the quantizer, generate loop and
serving engine work unchanged through models.registry.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .gpt2 import layer_norm
from .common import sdpa_cache_layout, update_kv_cache
from .llama import (apply_rope, causal_mask, cache_mask, linear_apply,
                    rope_tables)

Params = Dict[str, Any]


def split_fused_qkv(cfg: ModelConfig, qkv: jax.Array):
    """HF Falcon fused layout -> q (B,S,H,hd), k/v (B,S,KV,hd)."""
    B, S = qkv.shape[:2]
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    per = H // KV
    g = qkv.reshape(B, S, KV, per + 2, hd)
    q = g[..., :per, :].reshape(B, S, H, hd)
    k = g[..., per, :]
    v = g[..., per + 1, :]
    return q, k, v


def attention(cfg: ModelConfig, attn_p: Params, x, cos, sin, kv_cache,
              cache_position, attn_mask, linear_kw, captures, attn_window=None):
    B, S, D = x.shape
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    if captures is not None:
        captures["qkv"] = x
    qkv = linear_apply(attn_p["query_key_value"], x, **linear_kw)
    q, k, v = split_fused_qkv(cfg, qkv)
    q, k = apply_rope(q, k, cos, sin)

    k, v, new_cache = update_kv_cache(kv_cache, k, v, cache_position)

    # GQA/MQA grouping happens inside sdpa_cache_layout (never repeat the
    # cache: at KV=1 multi-query that would materialize an H× copy of the
    # whole window every decode step)
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

    def mlp(h):
        if captures is not None:
            captures["fc1"] = h
        m = linear_apply(blk["mlp"]["dense_h_to_4h"], h, **linear_kw)
        m = jax.nn.gelu(m, approximate=True)
        if captures is not None:
            captures["fc2"] = m
        return linear_apply(blk["mlp"]["dense_4h_to_h"], m, **linear_kw)

    if cfg.parallel_dual_ln:
        # new_decoder_architecture (falcon-40B/180B): parallel residual
        # with separate attention/MLP input norms (HF FalconDecoderLayer)
        ha = layer_norm(blk["ln_attn"], x, cfg.rms_norm_eps)
        hm = layer_norm(blk["ln_mlp"], x, cfg.rms_norm_eps)
        a, new_cache = attention(cfg, blk["self_attention"], ha, cos, sin,
                                 kv_cache, cache_position, attn_mask,
                                 linear_kw, captures,
                         attn_window)
        x = x + a + mlp(hm)
    elif cfg.use_parallel_residual:  # falcon parallel_attn: one shared LN
        h = layer_norm(blk["input_layernorm"], x, cfg.rms_norm_eps)
        a, new_cache = attention(cfg, blk["self_attention"], h, cos, sin,
                                 kv_cache, cache_position, attn_mask,
                                 linear_kw, captures,
                         attn_window)
        x = x + a + mlp(h)
    else:
        h = layer_norm(blk["input_layernorm"], x, cfg.rms_norm_eps)
        a, new_cache = attention(cfg, blk["self_attention"], h, cos, sin,
                                 kv_cache, cache_position, attn_mask,
                                 linear_kw, captures,
                         attn_window)
        x = x + a
        h = layer_norm(blk["post_attention_layernorm"], x,
                       cfg.rms_norm_eps)
        x = x + mlp(h)
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids,
                positions=None, kv_caches=None, cache_position=None,
                attn_mask=None, linear_kw=None, dtype=jnp.float32,
                attn_window=None):
    B, S = input_ids.shape
    x = jnp.take(params["word_embeddings"]["weight"], input_ids, axis=0
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
    x = layer_norm(params["ln_f"], x, cfg.rms_norm_eps)
    logits = x @ params["word_embeddings"]["weight"].astype(x.dtype).T
    return logits, new_caches


def init_falcon_params(cfg: ModelConfig, seed: int = 0,
                       dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    def lin(out_f, in_f, bias=True):
        w = (rng.standard_normal((out_f, in_f)) / np.sqrt(in_f)
             ).astype(np.float32)
        return {"weight": jnp.asarray(w, dtype=dtype),
                "bias": jnp.zeros((out_f,), dtype) if bias else None}

    def ln():
        return {"weight": jnp.ones((D,), dtype),
                "bias": jnp.zeros((D,), dtype)}

    def block():
        blk = {
            "self_attention": {
                "query_key_value": lin((H + 2 * KV) * hd, D, bias=False),
                "dense": lin(D, H * hd, bias=False)},
            "mlp": {"dense_h_to_4h": lin(I, D, bias=False),
                    "dense_4h_to_h": lin(D, I, bias=False)},
        }
        if cfg.parallel_dual_ln:
            blk["ln_attn"] = ln()
            blk["ln_mlp"] = ln()
        else:
            blk["input_layernorm"] = ln()
            if not cfg.use_parallel_residual:
                blk["post_attention_layernorm"] = ln()
        return blk

    return {
        "word_embeddings": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "layers": [block() for _ in range(cfg.num_hidden_layers)],
        "ln_f": ln(),
    }
