"""Sequence parallelism: ring-attention prefill over an "sp" mesh axis.

ABSENT upstream (and in most quantization stacks): the reference caps
context at ``model_seqlen`` on one device (SURVEY.md §2.4 — no sequence/
context parallelism of any kind). Here long-context prefill/eval shards
the SEQUENCE dimension across devices: every pointwise-over-S module
(norms, quantized linears, MLP) runs on the local chunk untouched, and
attention runs as a causal RING — each device's K/V chunk hops around the
"sp" ring with ``lax.ppermute`` while a flash-style online softmax
(running row-max + denominator) accumulates the exact full-sequence
attention in P steps. Activation memory per device drops from O(S) to
O(S/P) with no approximation (bit-parity with single-device attention up
to f32 reduction order).

Scope: llama-family blocks, prefill/eval (no KV cache — decode is
latency-bound and uses TP instead). Composes with the quantized runtime:
the per-chunk linears are the same QuantLinearParams/FusedQuantLinear
pytrees, so the Pallas decode kernels run unchanged inside shard_map.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from .pipeline import shard_map

__all__ = ["make_sp_mesh", "ring_attention", "sequence_parallel_logits"]

_NEG = -1e30


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())[:sp]
    return Mesh(np.array(devs), ("sp",))


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis: str = "sp") -> jax.Array:
    """Exact causal attention over the sequence sharded on ``axis``.

    q: (B, Sl, H, hd), k/v: (B, Sl, KV, hd) — the LOCAL chunks, in global
    order (device i holds tokens [i*Sl, (i+1)*Sl)). Returns the local
    (B, Sl, H, hd) context. Must be called inside shard_map over ``axis``.
    """
    B, Sl, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    Pn = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    scale = 1.0 / np.sqrt(hd)

    # head-grouped layout for GQA: (B, KV, G, Sl, hd)
    qg = q.reshape(B, Sl, KV, G, hd).transpose(0, 2, 3, 1, 4)
    qf = (qg.astype(jnp.float32)) * scale

    a = jnp.arange(Sl)

    def step(carry, t):
        k_c, v_c, acc, m, l = carry
        src = (idx - t) % Pn
        kf = k_c.transpose(0, 2, 1, 3).astype(jnp.float32)  # (B, KV, Sl, hd)
        vf = v_c.transpose(0, 2, 1, 3).astype(jnp.float32)
        s = jnp.einsum("bkgqh,bkth->bkgqt", qf, kf)          # (B,KV,G,Sl,Sl)
        gq = idx * Sl + a                                    # global q pos
        gk = src * Sl + a
        mask = gq[:, None] >= gk[None, :]
        s = jnp.where(mask[None, None, None], s, _NEG)
        m_new = jnp.maximum(m, s.max(axis=-1))               # (B,KV,G,Sl)
        w = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + w.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bkgqt,bkth->bkgqh", w, vf)
        # rotate: chunk held by device i moves to i+1, so at step t+1
        # device i holds chunk (i - t - 1) mod P
        k_c, v_c = jax.lax.ppermute(
            (k_c, v_c), axis, [(i, (i + 1) % Pn) for i in range(Pn)])
        return (k_c, v_c, acc, m_new, l), None

    acc0 = jnp.zeros((B, KV, G, Sl, hd), jnp.float32)
    m0 = jnp.full((B, KV, G, Sl), _NEG, jnp.float32)
    l0 = jnp.zeros((B, KV, G, Sl), jnp.float32)
    (_, _, acc, m, l), _ = jax.lax.scan(
        step, (k, v, acc0, m0, l0), jnp.arange(Pn))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, Sl, H, hd)
    return out.astype(q.dtype)


def _block_sp(cfg: ModelConfig, blk: Dict[str, Any], x: jax.Array,
              cos, sin, linear_kw: dict) -> jax.Array:
    """One llama-family block on a local sequence chunk, ring attention
    replacing the full-window SDPA (models/llama.py block_apply is the
    single-device analog)."""
    from ..models.llama import apply_rope, linear_apply, rms_norm
    B, Sl, D = x.shape
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    h = rms_norm(blk["input_layernorm"]["weight"], x, cfg.rms_norm_eps)
    attn_p = blk["self_attn"]
    if "qkv_proj" in attn_p:
        from ..nn.qlinear import fused_apply
        q, k, v = fused_apply(attn_p["qkv_proj"], h, **{
            k_: v_ for k_, v_ in linear_kw.items() if k_ != "training"})
    elif "W_pack" in attn_p:
        qkv = linear_apply(attn_p["W_pack"], h, **linear_kw)
        q, k, v = jnp.split(qkv, [H * hd, H * hd + KV * hd], axis=-1)
    else:
        q = linear_apply(attn_p["q_proj"], h, **linear_kw)
        k = linear_apply(attn_p["k_proj"], h, **linear_kw)
        v = linear_apply(attn_p["v_proj"], h, **linear_kw)
    q = q.reshape(B, Sl, H, hd)
    k = k.reshape(B, Sl, KV, hd)
    v = v.reshape(B, Sl, KV, hd)
    q, k = apply_rope(q, k, cos, sin)
    ctx = ring_attention(q, k, v).reshape(B, Sl, H * hd)
    x = x + linear_apply(attn_p["o_proj"], ctx, **linear_kw)
    h = rms_norm(blk["post_attention_layernorm"]["weight"], x,
                 cfg.rms_norm_eps)
    from ..models.llama import mlp_apply
    return x + mlp_apply(blk["mlp"], h, linear_kw, None)


def _block_sp_neox(cfg: ModelConfig, blk: Dict[str, Any], x: jax.Array,
                   cos, sin, linear_kw: dict) -> jax.Array:
    """One GPT-NeoX block on a local sequence chunk: fused interleaved
    qkv, partial rotary, parallel residual — ring attention replacing the
    full-window SDPA (models/gpt_neox.py block_apply is the single-device
    analog). Second family routed through sp (VERDICT r3 #9)."""
    from ..models.gpt2 import layer_norm
    from ..models.gpt_neox import _apply_partial_rope, rotary_dims
    from ..models.llama import linear_apply
    B, Sl, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    h = layer_norm(blk["input_layernorm"], x, cfg.rms_norm_eps)
    qkv = linear_apply(blk["attention"]["query_key_value"], h, **linear_kw)
    qkv = qkv.reshape(B, Sl, H, 3, hd)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    q, k = _apply_partial_rope(q, k, cos, sin, rotary_dims(cfg))
    ctx = ring_attention(q, k, v).reshape(B, Sl, H * hd)
    a = linear_apply(blk["attention"]["dense"], ctx, **linear_kw)

    def mlp(h):
        m = linear_apply(blk["mlp"]["dense_h_to_4h"], h, **linear_kw)
        m = jax.nn.gelu(m, approximate=True)
        return linear_apply(blk["mlp"]["dense_4h_to_h"], m, **linear_kw)

    if cfg.use_parallel_residual:
        h2 = layer_norm(blk["post_attention_layernorm"], x,
                        cfg.rms_norm_eps)
        return x + a + mlp(h2)
    x = x + a
    h2 = layer_norm(blk["post_attention_layernorm"], x, cfg.rms_norm_eps)
    return x + mlp(h2)


def sequence_parallel_logits(cfg: ModelConfig, params: Dict[str, Any],
                             input_ids: jax.Array, mesh: Mesh,
                             linear_kw: Optional[dict] = None,
                             dtype=jnp.float32) -> jax.Array:
    """Full forward with the sequence dim sharded over mesh's "sp" axis:
    (B, S) ids -> (B, S, V) logits, S % sp == 0. Params are replicated;
    per-device activation memory is O(S / sp). Families: llama-family
    (incl. baichuan W_pack) and gpt_neox."""
    assert cfg.arch in ("llama", "baichuan", "gpt_neox"), cfg.arch
    B, S = input_ids.shape
    sp = mesh.shape["sp"]
    assert S % sp == 0, (S, sp)
    linear_kw = linear_kw or {}
    positions = jnp.arange(S)[None, :].repeat(B, 0)

    def fn(params, ids, pos):
        from ..models.llama import linear_apply
        if cfg.arch == "gpt_neox":
            from ..models.gpt2 import layer_norm
            from ..models.gpt_neox import rope_tables
            x = jnp.take(params["embed_in"]["weight"], ids, axis=0
                         ).astype(dtype)
            cos, sin = rope_tables(cfg, pos)
            for i in range(cfg.num_hidden_layers):
                x = _block_sp_neox(cfg, params["layers"][i], x, cos, sin,
                                   linear_kw)
            x = layer_norm(params["final_layer_norm"], x,
                           cfg.rms_norm_eps)
            return linear_apply(params["embed_out"], x, **linear_kw)
        from ..models.llama import rms_norm, rope_tables
        x = jnp.take(params["embed_tokens"]["weight"], ids, axis=0
                     ).astype(dtype)
        cos, sin = rope_tables(cfg, pos)
        for i in range(cfg.num_hidden_layers):
            x = _block_sp(cfg, params["layers"][i], x, cos, sin,
                          linear_kw)
        x = rms_norm(params["norm"]["weight"], x, cfg.rms_norm_eps)
        head = params.get("lm_head")
        if head is None:
            return x @ params["embed_tokens"]["weight"].astype(x.dtype).T
        return linear_apply(head, x, **linear_kw)

    shard = shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                  P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp", None), check_rep=False)
    return shard(params, input_ids, positions)
