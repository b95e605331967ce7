"""Optional lm_head quantization (beyond the reference, which always keeps
the head fp16)."""
import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import generate, perplexity
from quip_for_all_tpu.utils.checkpoint import load_quantized, save_quantized


def test_quantize_lm_head_roundtrip(tmp_path):
    cfg = tiny_config(num_hidden_layers=1)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12RVQ4B", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0, quantize_lm_head=True)
    params = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    assert isinstance(params["lm_head"], QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl = perplexity(cfg, params, eval_toks, batch_size=4)
    assert np.isfinite(ppl)

    out = np.asarray(generate(cfg, params, jnp.asarray([[1, 2]]), 4,
                              cache_len=16, dtype_str="float32"))
    assert out.shape == (1, 6)

    d = str(tmp_path / "qh")
    save_quantized(cfg, params, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert isinstance(lp["lm_head"], QuantLinearParams)
    ids = jnp.asarray(eval_toks[:2, :12])
    l1, _ = M.model_apply(cfg, params, ids)
    l2, _ = M.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_quantize_lm_head_phi():
    """Head quantization routed through the registry's per-arch final
    norm/head (VERDICT r1 #6 — used to KeyError on phi's untied biased
    head + final_layernorm)."""
    from quip_for_all_tpu.models import phi as P
    from quip_for_all_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="phi", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128, rotary_pct=0.5)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0, quantize_lm_head=True)
    params = q.quantize_model(cfg, P.init_phi_params(cfg, seed=0), calib)
    assert isinstance(params["lm_head"], QuantLinearParams)
    assert params["lm_head"].bias is not None  # phi head keeps its bias
    ppl = perplexity(cfg, params, synthetic_tokens(8, 24, cfg.vocab_size, 2),
                     batch_size=4)
    assert np.isfinite(ppl)


def test_quantize_lm_head_gpt_neox():
    """embed_out (gpt_neox's untied head name) is found by the registry."""
    from quip_for_all_tpu.models import gpt_neox as N
    from quip_for_all_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="gpt_neox", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0, quantize_lm_head=True)
    params = q.quantize_model(cfg, N.init_gpt_neox_params(cfg, seed=0), calib)
    assert isinstance(params["embed_out"], QuantLinearParams)
    ppl = perplexity(cfg, params, synthetic_tokens(8, 24, cfg.vocab_size, 2),
                     batch_size=4)
    assert np.isfinite(ppl)


def test_head_logits_uses_quantized_untied_head():
    """head_logits must route through a QUANTIZED untied lm_head, not
    silently fall back to the tied-embedding projection (regression:
    untied_head_key() returned None for QuantLinearParams)."""
    import jax.numpy as jnp
    import numpy as np
    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.models.config import tiny_config
    from quip_for_all_tpu.models.registry import (head_logits,
                                                  untied_head_key)
    from quip_for_all_tpu.utils.random_quantized import \
        random_quantized_model

    cfg = tiny_config()
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    quantize_head=True)
    assert untied_head_key(cfg, params) == "lm_head"
    h = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, cfg.hidden_size)), jnp.float32)
    got = np.asarray(head_logits(cfg, params, h))
    want = np.asarray(M.linear_apply(params["lm_head"], h))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    tied = np.asarray(
        h @ params["embed_tokens"]["weight"].astype(h.dtype).T)
    assert np.abs(got - tied).max() > 1e-2  # really not the tied path
