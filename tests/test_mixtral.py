"""Mixtral MoE: forward, per-expert routed-Hessian quantization with
unquantized gates (modules_to_not_convert), generate (SURVEY.md §2.4 EP,
BASELINE config #4)."""
import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import ModelConfig
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import generate, perplexity


def _tiny_mixtral():
    return ModelConfig(arch="mixtral", vocab_size=256, hidden_size=64,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128, num_local_experts=4,
                       num_experts_per_tok=2)


def test_mixtral_forward_and_generate():
    cfg = _tiny_mixtral()
    params = M.init_llama_params(cfg, seed=0)
    ids = jnp.asarray(np.arange(12).reshape(2, 6) % cfg.vocab_size)
    logits, _ = M.model_apply(cfg, params, ids)
    assert logits.shape == (2, 6, cfg.vocab_size)
    out = np.asarray(generate(cfg, params, jnp.asarray([[1, 2]]), 6,
                              cache_len=16, dtype_str="float32"))
    assert out.shape == (1, 8)


def test_mixtral_quantize_e2e():
    cfg = _tiny_mixtral()
    params = M.init_llama_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0,
                      modules_to_not_convert=["gate"])
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    # experts quantized, gate left dense (README.md:41 semantics)
    assert isinstance(blk["block_sparse_moe"]["experts"][0]["w1"],
                      QuantLinearParams)
    assert isinstance(blk["block_sparse_moe"]["experts"][3]["w2"],
                      QuantLinearParams)
    assert isinstance(blk["block_sparse_moe"]["gate"], dict)
    assert isinstance(blk["self_attn"]["q_proj"], QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    ppl_f = perplexity(cfg, M.init_llama_params(cfg, seed=0), eval_toks,
                       batch_size=4)
    assert np.isfinite(ppl_q)
    assert ppl_q < ppl_f * 3.0

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=16, dtype_str="float32"))
    assert out.shape == (1, 8)


def test_mixtral_checkpoint_roundtrip(tmp_path):
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = _tiny_mixtral()
    params = M.init_llama_params(cfg, seed=0)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0,
                      modules_to_not_convert=["gate"])
    qparams = q.quantize_model(cfg, params, calib)
    d = str(tmp_path / "mix")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lparams, _ = load_quantized(d)
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = M.model_apply(cfg, qparams, ids)
    l2, _ = M.model_apply(cfg2, lparams, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)
