"""GPT-2 family: forward, quantization end-to-end, generate, serving —
the second native architecture family (reference constants.py covers
transformer.h / attn.c_attn / mlp.c_fc patterns)."""
import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import gpt2 as G
from quip_for_all_tpu.models.config import ModelConfig
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import generate, perplexity
from quip_for_all_tpu.runtime.serving import ServingEngine


def _tiny_gpt2():
    return ModelConfig(arch="gpt2", vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       max_position_embeddings=128,
                       tie_word_embeddings=True)


def test_gpt2_forward_and_cached_decode():
    cfg = _tiny_gpt2()
    params = G.init_gpt2_params(cfg, seed=0)
    ids = jnp.asarray((np.arange(10) * 7 % cfg.vocab_size)[None, :])
    full_logits, _ = G.model_apply(cfg, params, ids)
    assert full_logits.shape == (1, 10, cfg.vocab_size)

    from quip_for_all_tpu.runtime.generate import init_kv_caches
    caches = init_kv_caches(cfg, 1, 16, dtype=jnp.float32)
    l0, caches = G.model_apply(cfg, params, ids[:, :4],
                               positions=jnp.arange(4)[None, :],
                               kv_caches=caches, cache_position=0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(full_logits[:, :4]),
                               rtol=3e-3, atol=3e-3)
    for t in range(4, 10):
        lt, caches = G.model_apply(cfg, params, ids[:, t:t + 1],
                                   positions=jnp.asarray([[t]]),
                                   kv_caches=caches, cache_position=t)
        np.testing.assert_allclose(np.asarray(lt[0, 0]),
                                   np.asarray(full_logits[0, t]),
                                   rtol=6e-3, atol=6e-3)


def test_gpt2_quantize_generate_serve():
    cfg = _tiny_gpt2()
    params = G.init_gpt2_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["attn"]["c_attn"], QuantLinearParams)
    assert isinstance(blk["mlp"]["c_proj"], QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    ppl_f = perplexity(cfg, G.init_gpt2_params(cfg, seed=0), eval_toks,
                       batch_size=4)
    assert np.isfinite(ppl_q) and ppl_q < ppl_f * 3.0

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    eng = ServingEngine(cfg, qparams, max_batch=2, cache_len=32,
                        dtype=jnp.float32, prefill_buckets=(8,))
    rid = eng.add_request(np.array([1, 2, 3]), max_new_tokens=4)
    res = eng.run(max_steps=50)
    assert res[rid].shape[0] == 7


def test_gpt2_checkpoint_roundtrip(tmp_path):
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = _tiny_gpt2()
    params = G.init_gpt2_params(cfg, seed=0)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    d = str(tmp_path / "g2")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "gpt2"
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = G.model_apply(cfg, qparams, ids)
    l2, _ = G.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)
