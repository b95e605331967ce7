"""End-to-end: tiny llama forward, generate with static cache, full
quantization pipeline, checkpoint round-trip, perplexity sanity
(SURVEY.md §4: end-to-end tiny-model perplexity; build plan step 3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import generate, perplexity
from quip_for_all_tpu.utils.checkpoint import load_quantized, save_quantized


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    params = M.init_llama_params(cfg, seed=0)
    return cfg, params


def test_forward_shapes(tiny_model):
    cfg, params = tiny_model
    ids = jnp.asarray(np.arange(12).reshape(2, 6) % cfg.vocab_size)
    logits, _ = M.model_apply(cfg, params, ids)
    assert logits.shape == (2, 6, cfg.vocab_size)


def test_cached_decode_matches_full_forward(tiny_model):
    """Incremental decode with static KV cache must reproduce the full
    causal forward logits."""
    cfg, params = tiny_model
    from quip_for_all_tpu.runtime.generate import init_kv_caches
    ids = jnp.asarray((np.arange(10) * 7 % cfg.vocab_size)[None, :])
    full_logits, _ = M.model_apply(cfg, params, ids)

    caches = init_kv_caches(cfg, 1, 16, dtype=jnp.float32)
    # prefill first 4
    pos = jnp.arange(4)[None, :]
    l0, caches = M.model_apply(cfg, params, ids[:, :4], positions=pos,
                               kv_caches=caches, cache_position=0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(full_logits[:, :4]),
                               rtol=2e-3, atol=2e-3)
    # decode rest one-by-one
    for t in range(4, 10):
        pos = jnp.asarray([[t]])
        lt, caches = M.model_apply(cfg, params, ids[:, t:t + 1],
                                   positions=pos, kv_caches=caches,
                                   cache_position=t)
        np.testing.assert_allclose(
            np.asarray(lt[0, 0]), np.asarray(full_logits[0, t]),
            rtol=5e-3, atol=5e-3)


def test_generate_greedy_deterministic(tiny_model):
    cfg, params = tiny_model
    prompt = jnp.asarray([[1, 2, 3, 4]])
    out1 = np.asarray(generate(cfg, params, prompt, 8, cache_len=32,
                               dtype_str="float32"))
    out2 = np.asarray(generate(cfg, params, prompt, 8, cache_len=32,
                               dtype_str="float32"))
    assert out1.shape == (1, 12)
    assert np.array_equal(out1, out2)
    assert np.array_equal(out1[:, :4], np.asarray(prompt))


@pytest.mark.parametrize("codebook", ["D4", "E8P12RVQ4B"])
def test_quantize_model_e2e(codebook, tiny_model, tmp_path):
    cfg, params = tiny_model
    params = jax.tree_util.tree_map(lambda x: x, params)  # deep-ish copy
    import copy
    params = copy.deepcopy(jax.device_get(params))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook=codebook, nsamples=16, batch_size=4,
                      quip_tune_iters=1, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)

    # every block linear is now quantized
    blk = qparams["layers"][0]
    assert isinstance(blk["self_attn"]["q_proj"], QuantLinearParams)
    assert isinstance(blk["mlp"]["down_proj"], QuantLinearParams)

    # quantized model still predicts: ppl on the calibration stream is
    # finite and not catastrophically far from the float model
    eval_toks = synthetic_tokens(8, 32, cfg.vocab_size, seed=2)
    cfg2, fparams = cfg, M.init_llama_params(cfg, seed=0)
    ppl_f = perplexity(cfg, fparams, eval_toks, batch_size=4)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    assert np.isfinite(ppl_q)
    assert ppl_q < ppl_f * 3.0, (ppl_f, ppl_q)

    # generate works on the quantized model
    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=16, dtype_str="float32"))
    assert out.shape == (1, 8)

    # checkpoint round-trip preserves logits exactly
    save_dir = str(tmp_path / f"ckpt_{codebook}")
    save_quantized(cfg, qparams, q.to_dict(), save_dir)
    cfg_l, lparams, qcfg = load_quantized(save_dir)
    assert qcfg["codebook"] == codebook
    ids = jnp.asarray(eval_toks[:2, :16])
    l1, _ = M.model_apply(cfg, qparams, ids)
    l2, _ = M.model_apply(cfg_l, lparams, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)
