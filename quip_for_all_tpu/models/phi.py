"""Functional Phi family decoder (phi-1 / phi-1.5 / phi-2), pure JAX.

Sixth architecture family. The reference covers Phi via name patterns
(``/root/reference/constants.py``: "model.layers" + "self_attn.dense" in
ATTN_OUT_PATTENRS + "mlp.fc1" in FC1_PATTERN). Family behavior handled
natively:
  - parallel attention + MLP off a SINGLE input LayerNorm:
    x = x + attn(ln(x)) + mlp(ln(x));
  - partial rotary embeddings (partial_rotary_factor, 0.4 for phi-2 —
    mapped onto cfg.rotary_pct, shared with gpt_neox);
  - separate q/k/v projections, LayerNorm + biases everywhere, untied
    lm_head WITH bias.

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
from .gpt_neox import _apply_partial_rope, rope_tables, rotary_dims
from .llama import causal_mask, cache_mask, linear_apply
from .common import sdpa_cache_layout, update_kv_cache

Params = Dict[str, Any]


def attention(cfg: ModelConfig, attn_p: Params, x, cos, sin, kv_cache,
              cache_position, attn_mask, linear_kw, captures, attn_window=None):
    B, S, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    if captures is not None:
        captures["qkv"] = x
    q = linear_apply(attn_p["q_proj"], x, **linear_kw).reshape(B, S, H, hd)
    k = linear_apply(attn_p["k_proj"], x, **linear_kw).reshape(B, S, H, hd)
    v = linear_apply(attn_p["v_proj"], x, **linear_kw).reshape(B, S, H, hd)
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
    a, new_cache = attention(cfg, blk["self_attn"], h, cos, sin, kv_cache,
                             cache_position, attn_mask, linear_kw, captures,
                         attn_window)
    if captures is not None:
        captures["fc1"] = h
    m = linear_apply(blk["mlp"]["fc1"], h, **linear_kw)
    m = jax.nn.gelu(m, approximate=True)
    if captures is not None:
        captures["fc2"] = m
    m = linear_apply(blk["mlp"]["fc2"], m, **linear_kw)
    x = x + a + m                         # parallel residual
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids,
                positions=None, kv_caches=None, cache_position=None,
                attn_mask=None, linear_kw=None, dtype=jnp.float32,
                attn_window=None):
    B, S = input_ids.shape
    x = jnp.take(params["embed_tokens"]["weight"], input_ids, axis=0
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
    x = layer_norm(params["final_layernorm"], x, cfg.rms_norm_eps)
    logits = linear_apply(params["lm_head"], x, **(linear_kw or {}))
    return logits, new_caches


def init_phi_params(cfg: ModelConfig, seed: int = 0,
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
        "layers": [
            {"input_layernorm": ln(),
             "self_attn": {"q_proj": lin(D, D), "k_proj": lin(D, D),
                           "v_proj": lin(D, D), "dense": lin(D, D)},
             "mlp": {"fc1": lin(I, D), "fc2": lin(D, I)}}
            for _ in range(cfg.num_hidden_layers)
        ],
        "final_layernorm": ln(),
        "lm_head": lin(cfg.vocab_size, D),
    }
