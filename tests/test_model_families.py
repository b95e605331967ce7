"""GPT-NeoX and OPT families: forward/cached-decode parity, quantization
end-to-end, generate, checkpoint roundtrip (reference constants.py covers
both via name patterns: "gpt_neox.layers" / "model.decoder.layers")."""
import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import gpt_neox as NX
from quip_for_all_tpu.models import opt as OPT
from quip_for_all_tpu.models.config import ModelConfig
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import (generate, init_kv_caches,
                                               perplexity)


def _tiny_neox(**kw):
    base = dict(arch="gpt_neox", vocab_size=256, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=4,
                max_position_embeddings=128, rotary_pct=0.25)
    base.update(kw)
    return ModelConfig(**base)


def _tiny_opt():
    return ModelConfig(arch="opt", vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       max_position_embeddings=128,
                       tie_word_embeddings=True)


def _check_cached_decode(cfg, A, params):
    ids = jnp.asarray((np.arange(10) * 7 % cfg.vocab_size)[None, :])
    full_logits, _ = A.model_apply(cfg, params, ids)
    assert full_logits.shape == (1, 10, cfg.vocab_size)
    caches = init_kv_caches(cfg, 1, 16, dtype=jnp.float32)
    l0, caches = A.model_apply(cfg, params, ids[:, :4],
                               positions=jnp.arange(4)[None, :],
                               kv_caches=caches, cache_position=0)
    np.testing.assert_allclose(np.asarray(l0),
                               np.asarray(full_logits[:, :4]),
                               rtol=3e-3, atol=3e-3)
    for t in range(4, 10):
        lt, caches = A.model_apply(cfg, params, ids[:, t:t + 1],
                                   positions=jnp.asarray([[t]]),
                                   kv_caches=caches, cache_position=t)
        np.testing.assert_allclose(np.asarray(lt[0, 0]),
                                   np.asarray(full_logits[0, t]),
                                   rtol=6e-3, atol=6e-3)


def test_neox_forward_and_cached_decode():
    cfg = _tiny_neox()
    _check_cached_decode(cfg, NX, NX.init_gpt_neox_params(cfg, seed=0))


def test_neox_sequential_residual():
    cfg = _tiny_neox(use_parallel_residual=False)
    _check_cached_decode(cfg, NX, NX.init_gpt_neox_params(cfg, seed=0))


def test_opt_forward_and_cached_decode():
    cfg = _tiny_opt()
    _check_cached_decode(cfg, OPT, OPT.init_opt_params(cfg, seed=0))


def test_neox_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = _tiny_neox()
    params = NX.init_gpt_neox_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["attention"]["query_key_value"],
                      QuantLinearParams)
    assert isinstance(blk["mlp"]["dense_4h_to_h"], QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    ppl_f = perplexity(cfg, params, eval_toks, batch_size=4)
    assert np.isfinite(ppl_q) and ppl_q < ppl_f * 3.0

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    d = str(tmp_path / "nx")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "gpt_neox" and cfg2.rotary_pct == cfg.rotary_pct
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = NX.model_apply(cfg, qparams, ids)
    l2, _ = NX.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_opt_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = _tiny_opt()
    params = OPT.init_opt_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["self_attn"]["out_proj"], QuantLinearParams)
    assert isinstance(blk["fc1"], QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    ppl_f = perplexity(cfg, params, eval_toks, batch_size=4)
    assert np.isfinite(ppl_q) and ppl_q < ppl_f * 3.0

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    d = str(tmp_path / "op")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "opt"
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = OPT.model_apply(cfg, qparams, ids)
    l2, _ = OPT.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_new_family_roles():
    from quip_for_all_tpu.parallel.sharding import role_of
    assert role_of("attention.query_key_value") == "col"
    assert role_of("mlp.dense_h_to_4h") == "col"
    assert role_of("attention.dense") == "row"
    assert role_of("mlp.dense_4h_to_h") == "row"
    assert role_of("self_attn.out_proj") == "row"
    assert role_of("fc1") == "col"
    assert role_of("fc2") == "row"


def test_falcon_forward_and_cached_decode():
    from quip_for_all_tpu.models import falcon as FA
    cfg = ModelConfig(arch="falcon", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=1,
                      max_position_embeddings=128,
                      tie_word_embeddings=True)
    _check_cached_decode(cfg, FA, FA.init_falcon_params(cfg, seed=0))


def test_falcon_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.models import falcon as FA
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = ModelConfig(arch="falcon", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=1,
                      max_position_embeddings=128,
                      tie_word_embeddings=True)
    params = FA.init_falcon_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["self_attention"]["query_key_value"],
                      QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    ppl_f = perplexity(cfg, params, eval_toks, batch_size=4)
    assert np.isfinite(ppl_q) and ppl_q < ppl_f * 3.0

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    d = str(tmp_path / "fa")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "falcon" and cfg2.num_key_value_heads == 1
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = FA.model_apply(cfg, qparams, ids)
    l2, _ = FA.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def _tiny_falcon40b_cfg():
    """Falcon-40B-shaped: new_decoder_architecture (dual-LN parallel
    residual) + grouped GQA qkv with 1 < kv < heads."""
    return ModelConfig(arch="falcon", vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128,
                       use_parallel_residual=True, parallel_dual_ln=True,
                       tie_word_embeddings=True)


def test_falcon_new_decoder_forward_and_cached_decode():
    from quip_for_all_tpu.models import falcon as FA
    cfg = _tiny_falcon40b_cfg()
    _check_cached_decode(cfg, FA, FA.init_falcon_params(cfg, seed=0))


def test_falcon_new_decoder_hf_oracle(tmp_path):
    """Logit parity against transformers' FalconForCausalLM with
    new_decoder_architecture=True (the falcon-40b layer,
    reference constants.py:19-24 handles it via generic patterns)."""
    import torch
    from transformers import FalconConfig, FalconForCausalLM
    from quip_for_all_tpu.models import falcon as FA
    from quip_for_all_tpu.utils.hf_import import load_hf_model

    hf_cfg = FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2,
        new_decoder_architecture=True, parallel_attn=True,
        bias=False, alibi=False, tie_word_embeddings=True)
    torch.manual_seed(0)
    m = FalconForCausalLM(hf_cfg).eval()
    d = str(tmp_path / "falcon40b_tiny")
    m.save_pretrained(d)

    cfg, params = load_hf_model(d)
    assert cfg.parallel_dual_ln and cfg.num_key_value_heads == 2
    ids = (np.arange(10) * 7 % 256)[None, :]
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.float().numpy()
    ours, _ = FA.model_apply(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_falcon_new_decoder_quantize_roundtrip(tmp_path):
    from quip_for_all_tpu.models import falcon as FA
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = _tiny_falcon40b_cfg()
    params = FA.init_falcon_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    assert isinstance(qparams["layers"][0]["self_attention"]
                      ["query_key_value"], QuantLinearParams)
    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)
    d = str(tmp_path / "fa40")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.parallel_dual_ln and cfg2.num_key_value_heads == 2
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = FA.model_apply(cfg, qparams, ids)
    l2, _ = FA.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_phi_forward_and_cached_decode():
    from quip_for_all_tpu.models import phi as PH
    cfg = ModelConfig(arch="phi", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128, rotary_pct=0.4)
    _check_cached_decode(cfg, PH, PH.init_phi_params(cfg, seed=0))


def test_phi_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.models import phi as PH
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = ModelConfig(arch="phi", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128, rotary_pct=0.4)
    params = PH.init_phi_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["self_attn"]["dense"], QuantLinearParams)
    assert isinstance(blk["mlp"]["fc1"], QuantLinearParams)

    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppl_q = perplexity(cfg, qparams, eval_toks, batch_size=4)
    ppl_f = perplexity(cfg, params, eval_toks, batch_size=4)
    assert np.isfinite(ppl_q) and ppl_q < ppl_f * 3.0

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    d = str(tmp_path / "ph")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "phi" and abs(cfg2.rotary_pct - 0.4) < 1e-9
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = PH.model_apply(cfg, qparams, ids)
    l2, _ = PH.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_baichuan_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.models import llama as L
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = ModelConfig(arch="baichuan", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128)
    params = L.init_llama_params(cfg, seed=0)
    assert "W_pack" in params["layers"][0]["self_attn"]
    _check_cached_decode(cfg, L, params)

    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    assert isinstance(qparams["layers"][0]["self_attn"]["W_pack"],
                      QuantLinearParams)

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    d = str(tmp_path / "bc")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "baichuan"
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = L.model_apply(cfg, qparams, ids)
    l2, _ = L.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_gptj_forward_and_cached_decode():
    from quip_for_all_tpu.models import gptj as GJ
    cfg = ModelConfig(arch="gptj", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128, rotary_pct=0.5)
    _check_cached_decode(cfg, GJ, GJ.init_gptj_params(cfg, seed=0))


def test_gptj_rope_matches_hf_reference():
    """Interleaved ('rotate every two') rope against a literal numpy
    transcription of HF GPTJ's apply_rotary_pos_emb."""
    from quip_for_all_tpu.models import gptj as GJ
    cfg = ModelConfig(arch="gptj", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=64, rotary_pct=0.5)
    rng = np.random.default_rng(0)
    B, S, H, hd = 1, 5, 4, 16
    rot = 8
    q = rng.standard_normal((B, S, H, hd)).astype(np.float32)
    pos = np.arange(S)[None, :]
    cos, sin = GJ.rope_tables(cfg, jnp.asarray(pos))
    out, _ = GJ._apply_interleaved_rope(jnp.asarray(q), jnp.asarray(q),
                                        cos, sin, rot)
    # HF-style reference
    inv = 1.0 / (10000.0 ** (np.arange(0, rot, 2) / rot))
    ang = pos[..., None] * inv                    # (1, S, rot/2)
    sin_h = np.repeat(np.sin(ang), 2, axis=-1)[:, :, None, :]
    cos_h = np.repeat(np.cos(ang), 2, axis=-1)[:, :, None, :]
    qr = q[..., :rot]
    rot_q = np.stack([-qr[..., 1::2], qr[..., ::2]], axis=-1
                     ).reshape(qr.shape)
    expect = np.concatenate([qr * cos_h + rot_q * sin_h, q[..., rot:]],
                            axis=-1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5,
                               atol=1e-5)


def test_gptj_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.models import gptj as GJ
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = ModelConfig(arch="gptj", vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128, rotary_pct=0.5)
    params = GJ.init_gptj_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["attn"]["out_proj"], QuantLinearParams)
    assert isinstance(blk["mlp"]["fc_in"], QuantLinearParams)

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)

    d = str(tmp_path / "gj")
    save_quantized(cfg, qparams, q.to_dict(), d)
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "gptj" and abs(cfg2.rotary_pct - 0.5) < 1e-9
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = GJ.model_apply(cfg, qparams, ids)
    l2, _ = GJ.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_neox_serving_engine():
    from quip_for_all_tpu.runtime.serving import ServingEngine
    cfg = _tiny_neox()
    params = NX.init_gpt_neox_params(cfg, seed=0)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    eng = ServingEngine(cfg, qparams, max_batch=2, cache_len=32,
                        dtype=jnp.float32, prefill_buckets=(8,))
    rid = eng.add_request(np.array([1, 2, 3]), max_new_tokens=4)
    res = eng.run(max_steps=50)
    assert res[rid].shape[0] == 7
