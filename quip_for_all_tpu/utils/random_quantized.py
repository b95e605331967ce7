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
                   bias: bool = False, dtype=jnp.bfloat16
                   ) -> QuantLinearParams:
    lspec = get_hadK(in_f, use_rand=use_rand, rng=rng)
    rspec = get_hadK(out_f, use_rand=use_rand, rng=rng)
    n_codes = _n_codes(cb)
    size = (rspec.padN, lspec.padN // cb.codesz)
    if n_codes >= 1 << 32:
        raw = rng.integers(0, 1 << 32, size=size,
                           dtype=np.uint32).view(np.int32)
    else:
        raw = rng.integers(0, n_codes, size=size,
                           dtype=np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, rspec.padN, lspec.padN)
    return QuantLinearParams(
        qweight=qt, Wscale=None,
        SU=jnp.asarray(np.sign(rng.standard_normal(in_f)).astype(np.float32),
                       dtype=dtype),
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


def random_quantized_model(cfg: ModelConfig, codebook: str = "E8P12",
                           seed: int = 0, use_rand: bool = True,
                           dtype=jnp.bfloat16,
                           quantize_experts: bool = True) -> Dict[str, Any]:
    """Full model params with every block linear quantized (gates and
    embeddings stay dense, matching modules_to_not_convert defaults)."""
    cb = get_codebook(codebook)
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    def dense(out_f, in_f, scale=0.02):
        w = (rng.standard_normal((out_f, in_f)) * scale).astype(np.float32)
        return {"weight": jnp.asarray(w, dtype=dtype), "bias": None}

    def q(in_f, out_f):
        return random_qlinear(cb, in_f, out_f, rng, use_rand, dtype=dtype)

    def block():
        blk = {
            "input_layernorm": {"weight": jnp.ones((D,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((D,), dtype)},
            "self_attn": {
                "q_proj": q(D, H * hd), "k_proj": q(D, KV * hd),
                "v_proj": q(D, KV * hd), "o_proj": q(H * hd, D),
            },
        }
        if cfg.arch == "mixtral":
            blk["block_sparse_moe"] = {
                "gate": dense(cfg.num_local_experts, D),
                "experts": [
                    {"w1": q(D, I) if quantize_experts else dense(I, D),
                     "w3": q(D, I) if quantize_experts else dense(I, D),
                     "w2": q(I, D) if quantize_experts else dense(D, I)}
                    for _ in range(cfg.num_local_experts)
                ],
            }
        else:
            blk["mlp"] = {"gate_proj": q(D, I), "up_proj": q(D, I),
                          "down_proj": q(I, D)}
        return blk

    params = {
        "embed_tokens": {"weight": jnp.asarray(
            (rng.standard_normal((cfg.vocab_size, D)) * 0.02
             ).astype(np.float32), dtype=dtype)},
        "layers": [block() for _ in range(cfg.num_hidden_layers)],
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(cfg.vocab_size, D)
    return params
