"""int8 KV cache (models/common.py QuantKVCache): half the attention HBM
reads/cache memory; near-lossless. Beyond the reference (HF StaticCache
is fp16, example_generate.py:66)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.common import (QuantKVCache, kv_materialize,
                                            kv_quantize)
from quip_for_all_tpu.models.config import ModelConfig, tiny_config
from quip_for_all_tpu.runtime.generate import (generate, init_kv_caches,
                                               perplexity)

pytestmark = pytest.mark.fast


def test_kv_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 4, 64)) * 3.0, jnp.float32)
    q, s = kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 16, 4, 1)
    back = np.asarray(kv_materialize(QuantKVCache(q, s), jnp.float32))
    # absmax int8: error bounded by scale/2 per element
    np.testing.assert_allclose(back, np.asarray(x),
                               atol=float(np.asarray(s).max()) * 0.51)


def test_cached_decode_with_int8_kv_matches_full_forward():
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    ids = jnp.asarray((np.arange(10) * 7 % cfg.vocab_size)[None, :])
    full, _ = M.model_apply(cfg, params, ids)
    caches = init_kv_caches(cfg, 1, 16, dtype=jnp.float32, quantized=True)
    l0, caches = M.model_apply(cfg, params, ids[:, :4],
                               positions=jnp.arange(4)[None, :],
                               kv_caches=caches, cache_position=0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(full[:, :4]),
                               rtol=0.05, atol=0.05)
    for t in range(4, 10):
        lt, caches = M.model_apply(cfg, params, ids[:, t:t + 1],
                                   positions=jnp.asarray([[t]]),
                                   kv_caches=caches, cache_position=t)
        np.testing.assert_allclose(np.asarray(lt[0, 0]),
                                   np.asarray(full[0, t]),
                                   rtol=0.06, atol=0.06)


def test_generate_int8_kv_matches_bf16_greedy():
    """Greedy tokens with the int8 cache must match the float cache on a
    quantized tiny model (int8 KV noise is far under the greedy margin
    on short sequences)."""
    from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
    cfg = tiny_config(num_hidden_layers=2)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qp = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    ref = np.asarray(generate(cfg, qp, prompt, 8, cache_len=32,
                              dtype_str="float32"))
    out = np.asarray(generate(cfg, qp, prompt, 8, cache_len=32,
                              dtype_str="float32", kv_quantized=True))
    assert np.array_equal(out, ref), (out, ref)


def test_ppl_with_int8_kv_close():
    """Eval ppl through cached windows... perplexity runs uncached full
    forwards; instead check serving with int8 KV produces the same greedy
    stream as bf16-KV serving."""
    from quip_for_all_tpu.runtime.serving import ServingEngine
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    prompt = np.array([3, 1, 4, 1, 5], dtype=np.int32)

    def run(kv_quantized):
        eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                            dtype=jnp.float32, prefill_chunk=8,
                            kv_quantized=kv_quantized)
        rid = eng.add_request(prompt, max_new_tokens=6)
        return eng.run(max_steps=50)[rid]

    assert np.array_equal(run(False), run(True))


def test_int8_kv_gqa_and_window():
    """GQA (KV < H) + static attn_window path with the quantized cache."""
    cfg = ModelConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=64)
    params = M.init_llama_params(cfg, seed=1)
    ids = jnp.asarray((np.arange(6) * 5 % cfg.vocab_size)[None, :])
    full, _ = M.model_apply(cfg, params, ids)
    caches = init_kv_caches(cfg, 1, 16, dtype=jnp.float32, quantized=True)
    l0, caches = M.model_apply(cfg, params, ids,
                               positions=jnp.arange(6)[None, :],
                               kv_caches=caches, cache_position=0,
                               attn_window=8)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(full),
                               rtol=0.05, atol=0.05)
