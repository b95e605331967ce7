"""Build a quantized model with random codes — for benchmarks and compile
checks in environments without downloadable checkpoints (zero egress).
Shapes, dtypes, and compute paths are identical to a really-quantized model;
only the code values are random.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook, get_codebook
from ..models import llama as M
from ..models.config import ModelConfig
from ..nn.qlinear import QuantLinearParams
from ..ops.qtensor import from_raw_idxs
from ..transforms.incoherence import get_hadK


def _n_codes(cb: Codebook) -> int:
    return {"D4": 256, "E8P12": 1 << 16, "HI": 16,
            "E8P12RVQ3B": 1 << 24, "E8P12RVQ4B": 1 << 32}[cb.id]


def random_qlinear(cb: Codebook, in_f: int, out_f: int,
                   rng: np.random.Generator, use_rand: bool = True,
                   bias: bool = False, dtype=jnp.bfloat16,
                   lspec=None, SU=None) -> QuantLinearParams:
    if lspec is None:
        lspec = get_hadK(in_f, use_rand=use_rand, rng=rng)
    rspec = get_hadK(out_f, use_rand=use_rand, rng=rng)
    qt = _random_qtensor(cb, rspec.padN, lspec.padN, rng)
    if SU is None:
        SU = np.sign(rng.standard_normal(in_f)).astype(np.float32)
    return QuantLinearParams(
        qweight=qt, Wscale=None,
        SU=jnp.asarray(SU, dtype=dtype),
        SV=jnp.asarray(np.sign(rng.standard_normal(out_f)).astype(np.float32),
                       dtype=dtype),
        bias=jnp.zeros((out_f,), dtype) if bias else None,
        had_left=None if lspec.hadK is None else jnp.asarray(lspec.hadK,
                                                             dtype=dtype),
        had_right=None if rspec.hadK is None else jnp.asarray(rspec.hadK,
                                                              dtype=dtype),
        in_features=in_f, out_features=out_f,
        K_left=lspec.K, K_right=rspec.K,
        q_in=lspec.padN, q_out=rspec.padN,
        per_channel=False,
        wscale_float=float(1.0 / np.sqrt(in_f)))


def _random_qtensor(cb: Codebook, q_out: int, q_in: int,
                    rng: np.random.Generator):
    """Random-but-valid runtime word planes, generated ON DEVICE (a 7B
    model's planes would take minutes to push through the host link)."""
    import jax

    from ..ops.qtensor import QuantizedTensor
    G = q_in // 8
    Gp = -(-G // 128) * 128
    def rand_words(mask, extra=0):
        key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
        r = jax.random.bits(key, (q_out, Gp), jnp.uint32)
        w = (r & jnp.uint32(mask)) | (r & jnp.uint32(extra))
        return jax.lax.bitcast_convert_type(w, jnp.int32)
    # E8P word: keep each 3-bit field in {0..3} (valid subset of {0..5}),
    # random parity bit
    e8p_mask, e8p_par = np.uint32(0x6DB6DB), np.uint32(0x1000000)
    if cb.id == "E8P12":
        planes = {"w0": jnp.asarray(rand_words(e8p_mask, e8p_par))}
    elif cb.id == "E8P12RVQ4B":
        from ..ops.qtensor import paired_wp, rvq_paired_default
        if rvq_paired_default():
            # paired ~6.5-bit layout (ops/qtensor.py): u0 in {0..3},
            # random u1-low bit per nibble; u1-high fields in {0,1};
            # random parity pairs
            Gpp = -(-G // 256) * 256
            def rw(cols, mask):
                key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
                r = jax.random.bits(key, (q_out, cols), jnp.uint32)
                return jax.lax.bitcast_convert_type(
                    r & jnp.uint32(mask), jnp.int32)
            planes = {"w0": rw(Gpp, 0xBBBBBBBB),
                      "w1": rw(Gpp // 2, 0x55555555),
                      "w2": rw(paired_wp(Gpp), 0xFFFFFFFF)}
            ors = getattr(cb, "opt_resid_scale", -1.0)
            return QuantizedTensor(planes, cb.id, q_out, q_in, float(ors),
                                   layout="paired")
        planes = {"w0": jnp.asarray(rand_words(e8p_mask, e8p_par)),
                  "w1": jnp.asarray(rand_words(e8p_mask, e8p_par))}
    elif cb.id == "E8P12RVQ3B":
        planes = {"w0": jnp.asarray(rand_words(e8p_mask, e8p_par)),
                  "w1": jnp.asarray(rand_words(np.uint32(0xFFFFFFFF)))}
    elif cb.id in ("D4", "HI"):
        planes = {"w0": jnp.asarray(rand_words(np.uint32(0xFFFFFFFF)))}
    else:
        raise ValueError(cb.id)
    ors = getattr(cb, "opt_resid_scale", -1.0)
    qt = QuantizedTensor(planes, cb.id, q_out, q_in, float(ors))
    from ..ops.qtensor import (bfp_default, subword_split_default, to_bfp,
                               to_subword)
    if subword_split_default() > 1:
        qt = to_subword(qt, subword_split_default())
    elif bfp_default() and q_out % 2 == 0:
        qt = to_bfp(qt)
    return qt


def random_quantized_model(cfg: ModelConfig, codebook: str = "E8P12",
                           seed: int = 0, use_rand: bool = True,
                           dtype=jnp.bfloat16,
                           quantize_experts: bool = True,
                           quantize_head: bool = False) -> Dict[str, Any]:
    """Full model params with every block linear quantized (gates and
    embeddings stay dense, matching modules_to_not_convert defaults).
    quantize_head also replaces lm_head — measured a ~0.2 ms/token win at
    llama-7B shapes (traced 2026-08-17; an earlier 5x-regression reading
    was an artifact of a degraded relay worker)."""
    cb = get_codebook(codebook)
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    def dense(out_f, in_f, scale=0.02):
        import jax
        key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
        w = jax.random.normal(key, (out_f, in_f), dtype) * scale
        return {"weight": w, "bias": None}

    def q(in_f, out_f, lspec=None, SU=None):
        return random_qlinear(cb, in_f, out_f, rng, use_rand, dtype=dtype,
                              lspec=lspec, SU=SU)

    def block():
        # shared left transforms per activation group (fusable at runtime)
        qkv_spec = get_hadK(D, use_rand=use_rand, rng=rng)
        qkv_su = np.sign(rng.standard_normal(D)).astype(np.float32)
        mlp_spec = get_hadK(D, use_rand=use_rand, rng=rng)
        mlp_su = np.sign(rng.standard_normal(D)).astype(np.float32)
        blk = {
            "input_layernorm": {"weight": jnp.ones((D,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((D,), dtype)},
            "self_attn": {
                "q_proj": q(D, H * hd, qkv_spec, qkv_su),
                "k_proj": q(D, KV * hd, qkv_spec, qkv_su),
                "v_proj": q(D, KV * hd, qkv_spec, qkv_su),
                "o_proj": q(H * hd, D),
            },
        }
        if cfg.arch == "mixtral":
            # w1/w3 share the expert's left transform (the quantizer's
            # share_group_transforms guarantee) — required for expert
            # stacking / the sparse MoE decode path
            experts = []
            for _ in range(cfg.num_local_experts):
                espec = get_hadK(D, use_rand=use_rand, rng=rng)
                esu = np.sign(rng.standard_normal(D)).astype(np.float32)
                experts.append(
                    {"w1": q(D, I, espec, esu) if quantize_experts
                     else dense(I, D),
                     "w3": q(D, I, espec, esu) if quantize_experts
                     else dense(I, D),
                     "w2": q(I, D) if quantize_experts else dense(D, I)})
            blk["block_sparse_moe"] = {
                "gate": dense(cfg.num_local_experts, D),
                "experts": experts,
            }
        else:
            blk["mlp"] = {"gate_proj": q(D, I, mlp_spec, mlp_su),
                          "up_proj": q(D, I, mlp_spec, mlp_su),
                          "down_proj": q(I, D)}
        return blk

    params = {
        "embed_tokens": dense(cfg.vocab_size, D),
        "layers": [block() for _ in range(cfg.num_hidden_layers)],
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    params["embed_tokens"].pop("bias")
    if not cfg.tie_word_embeddings:
        if quantize_head and cfg.vocab_size % 128 == 0:
            params["lm_head"] = q(D, cfg.vocab_size)
        else:
            params["lm_head"] = dense(cfg.vocab_size, D)
    return params
