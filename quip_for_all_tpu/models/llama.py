"""Functional llama-family decoder (Llama/TinyLlama/Mistral/Qwen2/Yi) and
Mixtral MoE, pure JAX pytrees.

The reference runs stock HF torch models with Linear layers swapped for
QuantLinear (``quantizer.py:163-248``); here the model itself is native:
params are nested dicts whose linear leaves are either dense
{"weight", "bias"?} dicts or QuantLinearParams, dispatched by
``linear_apply``. Everything jits and shards under pjit; the KV cache is a
static preallocated pytree so the decode step compiles once (the role of
torch.compile + StaticCache in ``example_generate.py:66-70``).

Activation capture: ``block_apply(..., capture=True)`` returns the inputs of
every linear sub-layer group — the functional equivalent of the reference's
Hessian forward hooks (``quantizer.py:426-451``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import qlinear
from .common import sdpa_cache_layout
from ..nn.qlinear import QuantLinearParams
from .config import ModelConfig

Params = Dict[str, Any]


# --------------------------------------------------------------- primitives

def linear_apply(lin: Any, x: jax.Array, **kw) -> jax.Array:
    if isinstance(lin, QuantLinearParams):
        return qlinear.apply(lin, x, **kw)
    if isinstance(lin, dict) and "lora_base" in lin:
        from ..nn.lora import lora_apply
        return lora_apply(lin, x, **kw)
    w = lin["weight"]  # (out, in) HF convention
    y = jax.lax.dot_general(x, w.astype(x.dtype),
                            (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype)
    if lin.get("bias") is not None:
        y = y + lin["bias"].astype(y.dtype)
    return y


def rms_norm(weight: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf.astype(dt)) * weight.astype(dt)


def rope_tables(cfg: ModelConfig, positions: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """HF llama rotary tables: (…, head_dim) cos/sin with half-split layout."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2,
                                                   dtype=np.float32) / d))
    ang = positions[..., None].astype(jnp.float32) * inv_freq[None, :]
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    # q,k: (B, S, H, D); cos/sin: (B, S, D)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    q = q * cos.astype(q.dtype) + _rotate_half(q) * sin.astype(q.dtype)
    k = k * cos.astype(k.dtype) + _rotate_half(k) * sin.astype(k.dtype)
    return q, k


# --------------------------------------------------------------- attention

def attention(cfg: ModelConfig, attn_p: Params, x: jax.Array,
              cos, sin,
              kv_cache: Optional[Tuple[jax.Array, jax.Array]],
              cache_position: Optional[jax.Array],
              attn_mask: jax.Array,
              linear_kw: dict,
              captures: Optional[dict],
              attn_window: Optional[int] = None
              ) -> Tuple[jax.Array, Optional[tuple]]:
    B, S, D = x.shape
    H, KV, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if captures is not None:
        captures["qkv"] = x
    if "qkv_proj" in attn_p:   # fused single-launch decode (inference)
        from ..nn.qlinear import fused_apply
        q, k, v = fused_apply(attn_p["qkv_proj"], x, **{
            k_: v_ for k_, v_ in linear_kw.items() if k_ != "training"})
    elif "W_pack" in attn_p:   # baichuan fused qkv (rows [q; k; v])
        qkv = linear_apply(attn_p["W_pack"], x, **linear_kw)
        q, k, v = jnp.split(qkv, [H * hd, H * hd + KV * hd], axis=-1)
    else:
        q = linear_apply(attn_p["q_proj"], x, **linear_kw)
        k = linear_apply(attn_p["k_proj"], x, **linear_kw)
        v = linear_apply(attn_p["v_proj"], x, **linear_kw)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KV, hd)
    v = v.reshape(B, S, KV, hd)
    q, k = apply_rope(q, k, cos, sin)

    if kv_cache is not None:
        from .common import write_kv
        ck, cv = kv_cache  # (B, S_max, KV, hd) arrays or QuantKVCache
        cp = jnp.asarray(cache_position)
        ck = write_kv(ck, k, cp)
        cv = write_kv(cv, v, cp)
        k, v = ck, cv
        new_cache = (ck, cv)
    else:
        new_cache = None

    def _sdpa(k, v, attn_mask):
        # k/v stay in cache layout (B, T, KV, hd) throughout; GQA batches
        # the dots over the KV head axis instead of repeating the cache
        # (see models/common.py sdpa_cache_layout).
        return sdpa_cache_layout(q, k, v, attn_mask, x.dtype)

    from .common import kv_dyn_slice, kv_len, kv_window
    T = kv_len(k) if kv_cache is not None else k.shape[1]
    if kv_cache is not None and attn_window is not None:
        # static prefix window (caller guarantees every query position is
        # < attn_window): no lax.switch at all — the per-layer conditional
        # costs ~20 µs/layer of branch dispatch on TPU, ~0.7 ms/token over
        # 32 layers. generate() segments its decode scan at the statically
        # known bucket boundaries so each segment lands here.
        W = min(attn_window, T)
        ctx = _sdpa(kv_window(k, W), kv_window(v, W), attn_mask[..., :W])
    elif (kv_cache is not None and S == 1 and T >= 512):
        # bucketed decode attention: only read the cache prefix that can be
        # attended to (a lax.switch over static prefix lengths) — a full
        # static cache otherwise costs the whole 2048-slot read every token
        buckets = [256]
        while buckets[-1] < T:
            buckets.append(min(buckets[-1] * 2, T))
        need = jnp.max(jnp.asarray(cache_position)) + 1

        def branch(tb):
            def f(_):
                kb = kv_dyn_slice(k, 0, tb)
                vb = kv_dyn_slice(v, 0, tb)
                mb = jax.lax.dynamic_slice_in_dim(attn_mask, 0, tb, axis=3)
                c = _sdpa(kb, vb, mb)
                return c
            return f

        bidx = jnp.searchsorted(jnp.asarray(buckets), need)
        bidx = jnp.clip(bidx, 0, len(buckets) - 1)
        ctx = jax.lax.switch(bidx, [branch(tb) for tb in buckets],
                             operand=None)
    else:
        ctx = _sdpa(k, v, attn_mask)
    if captures is not None:
        captures["o"] = ctx
    out = linear_apply(attn_p["o_proj"], ctx, **linear_kw)
    return out, new_cache


# --------------------------------------------------------------- mlp / moe

def mlp_apply(mlp_p: Params, x: jax.Array, linear_kw: dict,
              captures: Optional[dict]) -> jax.Array:
    if captures is not None:
        captures["gateup"] = x
    if "gateup_proj" in mlp_p:   # fused single-launch decode (inference)
        from ..nn.qlinear import fused_apply
        g, u = fused_apply(mlp_p["gateup_proj"], x, **{
            k_: v_ for k_, v_ in linear_kw.items() if k_ != "training"})
    else:
        g = linear_apply(mlp_p["gate_proj"], x, **linear_kw)
        u = linear_apply(mlp_p["up_proj"], x, **linear_kw)
    h = jax.nn.silu(g) * u
    if captures is not None:
        captures["down"] = h
    return linear_apply(mlp_p["down_proj"], h, **linear_kw)


def moe_apply(cfg: ModelConfig, moe_p: Params, x: jax.Array, linear_kw: dict,
              captures: Optional[dict]) -> jax.Array:
    """Mixtral top-k MoE.

    Three formulations (nn/qmoe.py):
      - stacked sparse (decode, small token count): scalar-prefetch Pallas
        dispatch reads only the selected experts' planes from HBM;
      - per-expert dense masked loop (prefill / capture / unquantized):
        every expert on every token — MXU-friendly, round-1 behavior;
      - ``moe_dense_stacked_apply`` (called by EP-sharded pipelines
        directly) distributes the stacked E axis over an "ep" mesh axis.
    """
    B, S, D = x.shape
    router_logits = linear_apply(moe_p["gate"], x, **linear_kw)  # (B,S,E)
    if "experts_stacked" in moe_p and captures is None:
        from ..nn.qmoe import moe_dense_stacked_apply, moe_sparse_apply
        cd = linear_kw.get("compute_dtype", jnp.bfloat16)
        # trace-time knob: EP-sharded meshes route decode through the
        # dense-stacked formulation (each device computes ITS experts,
        # one psum over "ep") instead of the sparse gather — the sparse
        # path's dynamic plane take over an ep-sharded E axis would
        # all-gather the full expert planes under GSPMD
        if os.environ.get("QFA_MOE_DENSE_STACKED", "0") == "1":
            return moe_dense_stacked_apply(cfg, moe_p, x, router_logits,
                                           compute_dtype=cd)
        if B * S < 32 and not linear_kw.get("training"):
            return moe_sparse_apply(cfg, moe_p, x, router_logits,
                                    compute_dtype=cd)
        from ..nn.qmoe import unstack_qlinear
        experts = []
        for e in range(cfg.num_local_experts):
            w1, w3 = unstack_qlinear(moe_p["experts_stacked"]["w13"], e)
            w2, = unstack_qlinear(moe_p["experts_stacked"]["w2"], e)
            experts.append({"w1": w1, "w3": w3, "w2": w2})
    else:
        experts = moe_p["experts"]
    E, K = cfg.num_local_experts, cfg.num_experts_per_tok
    topv, topi = jax.lax.top_k(router_logits.astype(jnp.float32), K)
    topw = jax.nn.softmax(topv, axis=-1)                         # (B,S,K)
    routing = jnp.sum(
        jax.nn.one_hot(topi, E, dtype=jnp.float32) * topw[..., None],
        axis=2)                                                   # (B,S,E)
    if captures is not None:
        captures["moe_routing"] = routing
        captures["moe_input"] = x
    out = jnp.zeros_like(x)
    for e in range(E):
        ep = experts[e]
        w = routing[..., e][..., None].astype(x.dtype)
        h = jax.nn.silu(linear_apply(ep["w1"], x, **linear_kw)) * \
            linear_apply(ep["w3"], x, **linear_kw)
        if captures is not None:
            captures[f"expert{e}_down"] = h * (routing[..., e][..., None] > 0)
        out = out + w * linear_apply(ep["w2"], h, **linear_kw)
    return out


# --------------------------------------------------------------- blocks

def block_apply(cfg: ModelConfig, blk: Params, x: jax.Array,
                cos, sin,
                kv_cache=None, cache_position=None, attn_mask=None,
                linear_kw: Optional[dict] = None,
                capture: bool = False,
                attn_window: Optional[int] = None):
    linear_kw = linear_kw or {}
    captures: Optional[dict] = {} if capture else None
    h = rms_norm(blk["input_layernorm"]["weight"], x, cfg.rms_norm_eps)
    attn_out, new_cache = attention(cfg, blk["self_attn"], h, cos, sin,
                                    kv_cache, cache_position, attn_mask,
                                    linear_kw, captures, attn_window)
    x = x + attn_out
    h = rms_norm(blk["post_attention_layernorm"]["weight"], x,
                 cfg.rms_norm_eps)
    if cfg.arch == "mixtral":
        y = moe_apply(cfg, blk["block_sparse_moe"], h, linear_kw, captures)
    else:
        y = mlp_apply(blk["mlp"], h, linear_kw, captures)
    x = x + y
    return x, new_cache, captures


def model_apply(cfg: ModelConfig, params: Params, input_ids: jax.Array,
                positions: Optional[jax.Array] = None,
                kv_caches: Optional[list] = None,
                cache_position=None,
                attn_mask: Optional[jax.Array] = None,
                linear_kw: Optional[dict] = None,
                dtype=jnp.float32,
                attn_window: Optional[int] = None):
    """Full forward. input_ids (B, S) -> logits (B, S, V).

    With kv_caches (list over layers of (k, v) with shape (B, S_max, KV, hd)),
    runs incremental decoding writing at cache_position. attn_window (static)
    promises every query position is < attn_window, so attention reads only
    that cache prefix with no runtime bucket switch.
    """
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
                               cache_i, cache_position, attn_mask, linear_kw,
                               attn_window=attn_window)
        if new_caches is not None:
            new_caches.append(nc)
    x = rms_norm(params["norm"]["weight"], x, cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        logits = x @ params["embed_tokens"]["weight"].astype(x.dtype).T
    else:
        logits = linear_apply(head, x, **(linear_kw or {}))
    return logits, new_caches


def causal_mask(S: int, T: int, dtype=jnp.float32) -> jax.Array:
    i = jnp.arange(S)[:, None]
    j = jnp.arange(T)[None, :]
    m = jnp.where(j <= i + (T - S), 0.0, -1e9).astype(dtype)
    return m[None, None, :, :]


def cache_mask(positions: jax.Array, T: int, dtype=jnp.float32) -> jax.Array:
    """Mask for cached decode: token at position p attends to cache slots
    j <= p. positions: (B, S)."""
    j = jnp.arange(T)[None, None, :]
    m = jnp.where(j <= positions[:, :, None], 0.0, -1e9).astype(dtype)
    return m[:, None, :, :].transpose(0, 1, 2, 3)


# --------------------------------------------------------------- fusion

def fuse_for_inference(cfg: ModelConfig, params: Params,
                       release_originals: bool = False) -> Params:
    """Fuse qkv and gate/up QuantLinears that share left transforms into
    single-launch FusedQuantLinear entries (decode-path optimization;
    produced by QuipQuantizer.share_group_transforms)."""
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
                if a is b:
                    # same buffer (the fast random builder and the HF
                    # importer share left-transform arrays by object) —
                    # skip the device->host fetch, which costs a full
                    # relay roundtrip per array over the remote TPU
                    continue
                if a is not None and not np.array_equal(np.asarray(a),
                                                        np.asarray(b)):
                    return False
        return True

    out_layers = []
    for src in params["layers"]:
        blk = dict(src)
        attn = dict(blk["self_attn"])
        trio = [attn.get("q_proj"), attn.get("k_proj"), attn.get("v_proj")]
        if sharable(trio):
            attn["qkv_proj"] = fuse_qlinears(trio)
            for k in ("q_proj", "k_proj", "v_proj"):
                del attn[k]
                if release_originals:
                    src["self_attn"].pop(k, None)
        blk["self_attn"] = attn
        if cfg.arch != "mixtral" and "mlp" in blk:
            mlp = dict(blk["mlp"])
            duo = [mlp.get("gate_proj"), mlp.get("up_proj")]
            if sharable(duo):
                mlp["gateup_proj"] = fuse_qlinears(duo)
                del mlp["gate_proj"], mlp["up_proj"]
                if release_originals:
                    src["mlp"].pop("gate_proj", None)
                    src["mlp"].pop("up_proj", None)
            blk["mlp"] = mlp
        if cfg.arch == "mixtral" and "block_sparse_moe" in blk:
            from ..nn.qmoe import stack_experts
            moe = dict(blk["block_sparse_moe"])
            stacked = stack_experts(moe)
            if stacked is not None:
                moe["experts_stacked"] = stacked
                del moe["experts"]
                blk["block_sparse_moe"] = moe
                if release_originals:
                    # drop the per-expert originals NOW: a stacked Mixtral
                    # otherwise exists twice until the caller rebinds
                    # (8x7B planes alone are ~11GB — guaranteed HBM OOM)
                    src["block_sparse_moe"].pop("experts", None)
        out_layers.append(blk)
    out = dict(params)
    out["layers"] = out_layers
    return out


# --------------------------------------------------------------- init

def init_llama_params(cfg: ModelConfig, seed: int = 0,
                      dtype=jnp.float32) -> Params:
    """Random-init params (HF layout) — benchmarks and tests run without
    downloadable checkpoints (zero-egress environment)."""
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    def lin(out_f, in_f, bias=False):
        w = (rng.standard_normal((out_f, in_f)) / np.sqrt(in_f)
             ).astype(np.float32)
        d = {"weight": jnp.asarray(w, dtype=dtype)}
        d["bias"] = (jnp.zeros((out_f,), dtype=dtype) if bias else None)
        return d

    def block():
        if cfg.arch == "baichuan":
            attn = {"W_pack": lin((H + 2 * KV) * hd, D),
                    "o_proj": lin(D, H * hd)}
        else:
            attn = {
                "q_proj": lin(H * hd, D, cfg.attention_bias),
                "k_proj": lin(KV * hd, D, cfg.attention_bias),
                "v_proj": lin(KV * hd, D, cfg.attention_bias),
                "o_proj": lin(D, H * hd),
            }
        blk = {
            "input_layernorm": {"weight": jnp.ones((D,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((D,), dtype)},
            "self_attn": attn,
        }
        if cfg.arch == "mixtral":
            blk["block_sparse_moe"] = {
                "gate": lin(cfg.num_local_experts, D),
                "experts": [
                    {"w1": lin(I, D), "w3": lin(I, D), "w2": lin(D, I)}
                    for _ in range(cfg.num_local_experts)
                ],
            }
        else:
            blk["mlp"] = {
                "gate_proj": lin(I, D),
                "up_proj": lin(I, D),
                "down_proj": lin(D, I),
            }
        return blk

    params = {
        "embed_tokens": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "layers": [block() for _ in range(cfg.num_hidden_layers)],
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(cfg.vocab_size, D)
    return params
