"""Functional OPT family decoder, pure JAX.

Fourth architecture family. The reference covers OPT via name patterns
(``/root/reference/constants.py:21`` "model.decoder.layers",
``ATTN_OUT_PATTENRS`` "self_attn.out_proj", ``FC1_PATTERN`` "fc1").
Family-specific behavior handled natively here:
  - learned absolute position embeddings with OPT's +2 index offset
    (HF OPTLearnedPositionalEmbedding);
  - pre-LayerNorm blocks (do_layer_norm_before=True; the post-LN OPT-350m
    variant is rejected at config load), ReLU MLP, biases everywhere;
  - lm_head tied to embed_tokens.

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
from .llama import causal_mask, cache_mask, linear_apply
from .common import sdpa_cache_layout, update_kv_cache

Params = Dict[str, Any]

POS_OFFSET = 2   # HF OPTLearnedPositionalEmbedding offset


def attention(cfg: ModelConfig, attn_p: Params, x, kv_cache,
              cache_position, attn_mask, linear_kw, captures, attn_window=None):
    B, S, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    if captures is not None:
        captures["qkv"] = x
    q = linear_apply(attn_p["q_proj"], x, **linear_kw).reshape(B, S, H, hd)
    k = linear_apply(attn_p["k_proj"], x, **linear_kw).reshape(B, S, H, hd)
    v = linear_apply(attn_p["v_proj"], x, **linear_kw).reshape(B, S, H, hd)

    k, v, new_cache = update_kv_cache(kv_cache, k, v, cache_position)

    ctx = sdpa_cache_layout(q, k, v, attn_mask, x.dtype,
                            attn_window=attn_window)
    if captures is not None:
        captures["o"] = ctx
    out = linear_apply(attn_p["out_proj"], ctx, **linear_kw)
    return out, new_cache


def block_apply(cfg: ModelConfig, blk: Params, x, cos=None, sin=None,
                kv_cache=None, cache_position=None, attn_mask=None,
                linear_kw: Optional[dict] = None, capture: bool = False,
                attn_window=None):
    linear_kw = linear_kw or {}
    captures: Optional[dict] = {} if capture else None
    h = layer_norm(blk["self_attn_layer_norm"], x, cfg.rms_norm_eps)
    a, new_cache = attention(cfg, blk["self_attn"], h, kv_cache,
                             cache_position, attn_mask, linear_kw, captures,
                         attn_window)
    x = x + a
    h = layer_norm(blk["final_layer_norm"], x, cfg.rms_norm_eps)
    if captures is not None:
        captures["fc1"] = h
    m = jax.nn.relu(linear_apply(blk["fc1"], h, **linear_kw))
    if captures is not None:
        captures["fc2"] = m
    x = x + linear_apply(blk["fc2"], m, **linear_kw)
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids,
                positions=None, kv_caches=None, cache_position=None,
                attn_mask=None, linear_kw=None, dtype=jnp.float32,
                attn_window=None):
    B, S = input_ids.shape
    if positions is None:
        positions = jnp.arange(S)[None, :].repeat(B, 0)
    x = jnp.take(params["embed_tokens"]["weight"], input_ids, axis=0
                 ).astype(dtype)
    x = x + jnp.take(params["embed_positions"]["weight"],
                     positions + POS_OFFSET, axis=0).astype(dtype)
    if attn_mask is None:
        if kv_caches is None:
            attn_mask = causal_mask(S, S)
        else:
            from .common import kv_len
            attn_mask = cache_mask(positions, kv_len(kv_caches[0][0]))
    new_caches = [] if kv_caches is not None else None
    for i in range(cfg.num_hidden_layers):
        cache_i = kv_caches[i] if kv_caches is not None else None
        x, nc, _ = block_apply(cfg, params["layers"][i], x,
                               kv_cache=cache_i,
                               cache_position=cache_position,
                               attn_mask=attn_mask, linear_kw=linear_kw,
                               attn_window=attn_window)
        if new_caches is not None:
            new_caches.append(nc)
    x = layer_norm(params["final_layer_norm"], x, cfg.rms_norm_eps)
    logits = x @ params["embed_tokens"]["weight"].astype(x.dtype).T  # tied
    return logits, new_caches


def init_opt_params(cfg: ModelConfig, seed: int = 0,
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
        "embed_tokens": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "embed_positions": {"weight": jnp.asarray(
            (rng.standard_normal(
                (cfg.max_position_embeddings + POS_OFFSET, D)) * 0.01
             ).astype(np.float32), dtype=dtype)},
        "layers": [
            {"self_attn_layer_norm": ln(), "final_layer_norm": ln(),
             "self_attn": {"q_proj": lin(D, D), "k_proj": lin(D, D),
                           "v_proj": lin(D, D), "out_proj": lin(D, D)},
             "fc1": lin(I, D), "fc2": lin(D, I)}
            for _ in range(cfg.num_hidden_layers)
        ],
        "final_layer_norm": ln(),
    }
