"""Functional legacy-QWen (Qwen-1) decoder.

The original QWen-7B/14B architecture (HF model_type "qwen",
trust_remote_code): RMSNorm blocks named ln_1/ln_2, ONE fused qkv linear
``attn.c_attn`` (always biased), ``attn.c_proj`` out-projection, and a
halved-intermediate MLP ``w1 * silu(w2) -> c_proj`` (HF config
intermediate_size is stored pre-halving; ModelConfig keeps the actual
projection width). Qwen2+ uses llama naming and loads via models/llama.py.

Reference parity: QWen appears in the pattern DB at
``/root/reference/constants.py:30`` (attn.c_attn), ``:57-58``
(mlp.w1/w2) and the merge map at ``/root/reference/utils.py:170-175``.

The attention math is llama's (rotary, MHA) — we alias the fused c_attn
onto llama.attention's W_pack path so the cache/bucket logic is shared.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .llama import (attention, causal_mask, cache_mask, linear_apply,
                    rms_norm, rope_tables)

Params = Dict[str, Any]


def _attn_alias(attn_p: Params) -> Params:
    d = {"o_proj": attn_p["c_proj"]}
    if "qkv_proj" in attn_p:     # fused single-launch decode (inference)
        d["qkv_proj"] = attn_p["qkv_proj"]
    else:
        d["W_pack"] = attn_p["c_attn"]
    return d


def mlp_apply(mlp_p: Params, x: jax.Array, linear_kw: dict,
              captures: Optional[dict]) -> jax.Array:
    if captures is not None:
        captures["fc1"] = x
    if "w12_proj" in mlp_p:      # fused single-launch decode (inference)
        from ..nn.qlinear import fused_apply
        a1, a2 = fused_apply(mlp_p["w12_proj"], x, **{
            k_: v_ for k_, v_ in linear_kw.items() if k_ != "training"})
    else:
        a1 = linear_apply(mlp_p["w1"], x, **linear_kw)     # up
        a2 = linear_apply(mlp_p["w2"], x, **linear_kw)     # gate
    h = a1 * jax.nn.silu(a2)
    if captures is not None:
        captures["fc2"] = h
    return linear_apply(mlp_p["c_proj"], h, **linear_kw)


def block_apply(cfg: ModelConfig, blk: Params, x: jax.Array, cos, sin,
                kv_cache=None, cache_position=None, attn_mask=None,
                linear_kw: Optional[dict] = None, capture: bool = False,
                attn_window: Optional[int] = None):
    linear_kw = linear_kw or {}
    captures: Optional[dict] = {} if capture else None
    h = rms_norm(blk["ln_1"]["weight"], x, cfg.rms_norm_eps)
    attn_out, new_cache = attention(cfg, _attn_alias(blk["attn"]), h, cos,
                                    sin, kv_cache, cache_position,
                                    attn_mask, linear_kw, captures,
                                    attn_window)
    x = x + attn_out
    h = rms_norm(blk["ln_2"]["weight"], x, cfg.rms_norm_eps)
    x = x + mlp_apply(blk["mlp"], h, linear_kw, captures)
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids: jax.Array,
                positions: Optional[jax.Array] = None,
                kv_caches: Optional[list] = None,
                cache_position=None,
                attn_mask: Optional[jax.Array] = None,
                linear_kw: Optional[dict] = None,
                dtype=jnp.float32,
                attn_window: Optional[int] = None):
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
    x = rms_norm(params["ln_f"]["weight"], x, cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        logits = x @ params["wte"]["weight"].astype(x.dtype).T
    else:
        logits = linear_apply(head, x, **(linear_kw or {}))
    return logits, new_caches


def fuse_for_inference(cfg: ModelConfig, params: Params,
                       release_originals: bool = False) -> Params:
    """c_attn is already one fused launch; w1/w2 are one capture group
    (shared SU + left transform under share_group_transforms), so they
    fuse into a single decode+matmul launch like llama's gate/up."""
    from ..models.llama import fuse_for_inference as _lf  # noqa: F401
    from ..nn.qlinear import QuantLinearParams, fuse_qlinears

    def sharable(ps):
        if not all(isinstance(p, QuantLinearParams) for p in ps):
            return False
        p0 = ps[0]
        for p in ps[1:]:
            if p.q_in != p0.q_in or p.K_left != p0.K_left or \
                    p.shards_left != p0.shards_left:
                return False
            for a, b in ((p.SU, p0.SU), (p.had_left, p0.had_left)):
                if (a is None) != (b is None):
                    return False
                if a is not None and not np.array_equal(np.asarray(a),
                                                        np.asarray(b)):
                    return False
        return True

    out_layers = []
    for src in params["layers"]:
        blk = dict(src)
        mlp = dict(blk["mlp"])
        duo = [mlp.get("w1"), mlp.get("w2")]
        if sharable(duo):
            mlp["w12_proj"] = fuse_qlinears(duo)
            del mlp["w1"], mlp["w2"]
            if release_originals:
                src["mlp"].pop("w1", None)
                src["mlp"].pop("w2", None)
            blk["mlp"] = mlp
        out_layers.append(blk)
    out = dict(params)
    out["layers"] = out_layers
    return out


def init_qwen_params(cfg: ModelConfig, seed: int = 0,
                     dtype=jnp.float32) -> Params:
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def lin(out_f, in_f, bias=False):
        w = (rng.standard_normal((out_f, in_f)) / np.sqrt(in_f)
             ).astype(np.float32)
        return {"weight": jnp.asarray(w, dtype=dtype),
                "bias": jnp.zeros((out_f,), dtype) if bias else None}

    def block():
        return {
            "ln_1": {"weight": jnp.ones((D,), dtype)},
            "ln_2": {"weight": jnp.ones((D,), dtype)},
            "attn": {"c_attn": lin(3 * H * hd, D, bias=True),
                     "c_proj": lin(D, H * hd)},
            "mlp": {"w1": lin(I, D), "w2": lin(I, D),
                    "c_proj": lin(D, I)},
        }

    params = {
        "wte": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "layers": [block() for _ in range(cfg.num_hidden_layers)],
        "ln_f": {"weight": jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, D)
    return params
