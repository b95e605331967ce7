"""Functional GPT-2 family decoder (pure JAX pytrees).

Second architecture family beside llama/Mixtral — substantiates the
reference's "for-all" genericity (its constants.py covers GPT-2's
`transformer.h` / `attn.c_attn` / `mlp.c_fc` patterns;
``/root/reference/constants.py:19-95``). Differences from llama handled
here: LayerNorm with bias, learned absolute position embeddings (wpe),
single fused qkv projection (c_attn), gelu MLP, tied lm_head. HF GPT-2
checkpoints store Conv1D weights as (in, out); the importer transposes them
to the (out, in) convention (the reference does the same via
``transformers.Conv1D`` handling, ``quip.py:29-30``).

Same API surface as models/llama.py (block_apply with capture /
model_apply) so the quantizer, generate loop and serving engine work
unchanged through models.registry.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .llama import causal_mask, cache_mask, linear_apply
from .common import sdpa_cache_layout, update_kv_cache

Params = Dict[str, Any]


def layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dt)


def attention(cfg: ModelConfig, attn_p: Params, x, kv_cache,
              cache_position, attn_mask, linear_kw, captures, attn_window=None):
    B, S, D = x.shape
    H = cfg.num_attention_heads
    hd = cfg.head_dim
    if captures is not None:
        captures["qkv"] = x
    qkv = linear_apply(attn_p["c_attn"], x, **linear_kw)     # (B,S,3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, H, hd)
    v = v.reshape(B, S, H, hd)

    k, v, new_cache = update_kv_cache(kv_cache, k, v, cache_position)

    ctx = sdpa_cache_layout(q, k, v, attn_mask, x.dtype,
                            attn_window=attn_window)
    if captures is not None:
        captures["o"] = ctx
    out = linear_apply(attn_p["c_proj"], ctx, **linear_kw)
    return out, new_cache


def block_apply(cfg: ModelConfig, blk: Params, x, cos=None, sin=None,
                kv_cache=None, cache_position=None, attn_mask=None,
                linear_kw: Optional[dict] = None, capture: bool = False,
                attn_window=None):
    linear_kw = linear_kw or {}
    captures: Optional[dict] = {} if capture else None
    h = layer_norm(blk["ln_1"], x, cfg.rms_norm_eps)
    a, new_cache = attention(cfg, blk["attn"], h, kv_cache, cache_position,
                             attn_mask, linear_kw, captures,
                         attn_window)
    x = x + a
    h = layer_norm(blk["ln_2"], x, cfg.rms_norm_eps)
    if captures is not None:
        captures["fc1"] = h
    m = linear_apply(blk["mlp"]["c_fc"], h, **linear_kw)
    m = jax.nn.gelu(m, approximate=True)
    if captures is not None:
        captures["fc2"] = m
    m = linear_apply(blk["mlp"]["c_proj"], m, **linear_kw)
    x = x + m
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids,
                positions=None, kv_caches=None, cache_position=None,
                attn_mask=None, linear_kw=None, dtype=jnp.float32,
                attn_window=None):
    B, S = input_ids.shape
    if positions is None:
        positions = jnp.arange(S)[None, :].repeat(B, 0)
    x = jnp.take(params["wte"]["weight"], input_ids, axis=0).astype(dtype)
    x = x + jnp.take(params["wpe"]["weight"], positions, axis=0
                     ).astype(dtype)
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
    x = layer_norm(params["ln_f"], x, cfg.rms_norm_eps)
    logits = x @ params["wte"]["weight"].astype(x.dtype).T  # tied head
    return logits, new_caches


def init_gpt2_params(cfg: ModelConfig, seed: int = 0,
                     dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    D = cfg.hidden_size
    I = cfg.intermediate_size

    def lin(out_f, in_f):
        w = (rng.standard_normal((out_f, in_f)) / np.sqrt(in_f)
             ).astype(np.float32)
        return {"weight": jnp.asarray(w, dtype=dtype),
                "bias": jnp.zeros((out_f,), dtype)}

    def ln():
        return {"weight": jnp.ones((D,), dtype),
                "bias": jnp.zeros((D,), dtype)}

    return {
        "wte": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "wpe": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.max_position_embeddings, D)) * 0.01
             ).astype(np.float32), dtype=dtype)},
        "layers": [
            {"ln_1": ln(), "ln_2": ln(),
             "attn": {"c_attn": lin(3 * D, D), "c_proj": lin(D, D)},
             "mlp": {"c_fc": lin(I, D), "c_proj": lin(D, I)}}
            for _ in range(cfg.num_hidden_layers)
        ],
        "ln_f": ln(),
    }
