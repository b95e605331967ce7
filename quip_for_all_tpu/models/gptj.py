"""Functional GPT-J family decoder (gpt-j-6b), pure JAX.

Seventh architecture family. The reference covers GPT-J via name patterns
(``/root/reference/constants.py``: "transformer.h" + "attn.q_proj" in
ATTN_QKV_PATTERNS + "mlp.fc_in"/"mlp.fc_out" in FC1/FC2_PATTERN).
Family behavior handled natively:
  - INTERLEAVED partial rotary ("rotate every two", unlike the half-split
    llama/neox layout): the first rotary_dim dims rotate pairwise
    (x[2i], x[2i+1]);
  - parallel attention + MLP off a single ln_1:
    x = x + attn(ln_1(x)) + mlp(ln_1(x));
  - un-biased q/k/v/out projections, biased fc_in/fc_out, untied lm_head
    with bias.

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
from .gpt_neox import rotary_dims
from .llama import causal_mask, cache_mask, linear_apply
from .common import sdpa_cache_layout, update_kv_cache

Params = Dict[str, Any]


def rope_tables(cfg: ModelConfig, positions: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin over the rotary sub-dimension in INTERLEAVED layout
    (each frequency duplicated for the (2i, 2i+1) pair), matching HF
    GPTJ's create_sinusoidal_positions + repeated sin/cos."""
    d = rotary_dims(cfg)
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2,
                                                   dtype=np.float32) / d))
    ang = positions[..., None].astype(jnp.float32) * inv_freq[None, :]
    emb = jnp.repeat(ang, 2, axis=-1)          # (..., d) interleaved dup
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_every_two(x):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_interleaved_rope(q, k, cos, sin, rot: int):
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    q_r, q_p = q[..., :rot], q[..., rot:]
    k_r, k_p = k[..., :rot], k[..., rot:]
    q_r = (q_r * cos.astype(q.dtype)
           + _rotate_every_two(q_r) * sin.astype(q.dtype))
    k_r = (k_r * cos.astype(k.dtype)
           + _rotate_every_two(k_r) * sin.astype(k.dtype))
    return (jnp.concatenate([q_r, q_p], -1),
            jnp.concatenate([k_r, k_p], -1))


def attention(cfg: ModelConfig, attn_p: Params, x, cos, sin, kv_cache,
              cache_position, attn_mask, linear_kw, captures, attn_window=None):
    B, S, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    if captures is not None:
        captures["qkv"] = x
    q = linear_apply(attn_p["q_proj"], x, **linear_kw).reshape(B, S, H, hd)
    k = linear_apply(attn_p["k_proj"], x, **linear_kw).reshape(B, S, H, hd)
    v = linear_apply(attn_p["v_proj"], x, **linear_kw).reshape(B, S, H, hd)
    q, k = _apply_interleaved_rope(q, k, cos, sin, rotary_dims(cfg))

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
    h = layer_norm(blk["ln_1"], x, cfg.rms_norm_eps)
    a, new_cache = attention(cfg, blk["attn"], h, cos, sin, kv_cache,
                             cache_position, attn_mask, linear_kw, captures,
                         attn_window)
    if captures is not None:
        captures["fc1"] = h
    m = linear_apply(blk["mlp"]["fc_in"], h, **linear_kw)
    m = jax.nn.gelu(m, approximate=True)
    if captures is not None:
        captures["fc2"] = m
    m = linear_apply(blk["mlp"]["fc_out"], m, **linear_kw)
    x = x + a + m                          # parallel residual
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids,
                positions=None, kv_caches=None, cache_position=None,
                attn_mask=None, linear_kw=None, dtype=jnp.float32,
                attn_window=None):
    B, S = input_ids.shape
    x = jnp.take(params["wte"]["weight"], input_ids, axis=0).astype(dtype)
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
    logits = linear_apply(params["lm_head"], x, **(linear_kw or {}))
    return logits, new_caches


def init_gptj_params(cfg: ModelConfig, seed: int = 0,
                     dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size

    def lin(out_f, in_f, bias=True):
        w = (rng.standard_normal((out_f, in_f)) / np.sqrt(in_f)
             ).astype(np.float32)
        return {"weight": jnp.asarray(w, dtype=dtype),
                "bias": jnp.zeros((out_f,), dtype) if bias else None}

    def ln():
        return {"weight": jnp.ones((D,), dtype),
                "bias": jnp.zeros((D,), dtype)}

    return {
        "wte": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "layers": [
            {"ln_1": ln(),
             "attn": {"q_proj": lin(D, D, bias=False),
                      "k_proj": lin(D, D, bias=False),
                      "v_proj": lin(D, D, bias=False),
                      "out_proj": lin(D, D, bias=False)},
             "mlp": {"fc_in": lin(I, D), "fc_out": lin(D, I)}}
            for _ in range(cfg.num_hidden_layers)
        ],
        "ln_f": ln(),
        "lm_head": lin(cfg.vocab_size, D),
    }
