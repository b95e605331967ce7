"""Finetune pipeline tests: block MSE finetune improves reconstruction,
ft quantization path runs end-to-end, merge_suv preserves model function
(SURVEY.md §2 P1 ft_*, P9 merge maps)."""
import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import perplexity


def _fresh(cfg):
    return M.init_llama_params(cfg, seed=0)


def test_quantize_with_finetune_runs_and_helps():
    cfg = tiny_config(num_hidden_layers=1)
    params = _fresh(cfg)
    calib = synthetic_tokens(24, 32, cfg.vocab_size, seed=1)
    eval_toks = synthetic_tokens(8, 32, cfg.vocab_size, seed=2)

    q0 = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                       quip_tune_iters=0, ft_epochs=0)
    ppl_noft = perplexity(cfg, q0.quantize_model(cfg, _fresh(cfg), calib),
                          eval_toks, batch_size=4)

    q1 = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                       quip_tune_iters=0, ft_epochs=2,
                       ft_train_size=4, ft_valid_size=4, ft_batch_size=4)
    qparams = q1.quantize_model(cfg, _fresh(cfg), calib)
    ppl_ft = perplexity(cfg, qparams, eval_toks, batch_size=4)

    assert np.isfinite(ppl_ft)
    # finetune must not make things dramatically worse (usually helps)
    assert ppl_ft < ppl_noft * 1.1, (ppl_noft, ppl_ft)
    # no W_cache left behind
    for blk in qparams["layers"]:
        q = blk["self_attn"]["q_proj"]
        assert isinstance(q, QuantLinearParams) and q.W_cache is None


def test_merge_suv_model_consistency():
    """merge_suv folds interface signs into norms; the quantized model must
    still approximate the float model about as well as non-merged."""
    cfg = tiny_config(num_hidden_layers=2, num_key_value_heads=4)
    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    eval_toks = synthetic_tokens(8, 32, cfg.vocab_size, seed=2)

    qm = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                       quip_tune_iters=0, ft_epochs=0, merge_suv=True)
    pm = qm.quantize_model(cfg, _fresh(cfg), calib)
    ppl_m = perplexity(cfg, pm, eval_toks, batch_size=4)

    qn = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                       quip_tune_iters=0, ft_epochs=0, merge_suv=False)
    pn = qn.quantize_model(cfg, _fresh(cfg), calib)
    ppl_n = perplexity(cfg, pn, eval_toks, batch_size=4)

    assert np.isfinite(ppl_m)
    assert ppl_m < ppl_n * 1.25, (ppl_m, ppl_n)
    # merged attention inputs: SU dropped (merged into the norm)
    q = pm["layers"][0]["self_attn"]["q_proj"]
    assert q.SU is None


def test_merge_suv_rejects_ft():
    with pytest.raises(ValueError):
        QuipQuantizer(codebook="D4", merge_suv=True,
                      ft_epochs=2).quantize_model(
            tiny_config(), _fresh(tiny_config()),
            synthetic_tokens(8, 16, 256, 0))


def test_merge_suv_mixtral_consistency():
    """merge_suv on mixtral: expert interface signs (per-expert w3->w2,
    shared moe input incl. the unquantized router gate fold) must keep
    quality on par with non-merged (VERDICT r1 #6; parity:
    utils.py:176-185)."""
    from quip_for_all_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="mixtral", vocab_size=256, hidden_size=64,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=128, num_local_experts=4,
                      num_experts_per_tok=2)
    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    eval_toks = synthetic_tokens(8, 32, cfg.vocab_size, seed=2)

    qm = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                       quip_tune_iters=0, ft_epochs=0, merge_suv=True,
                       modules_to_not_convert=["gate"])
    pm = qm.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    ppl_m = perplexity(cfg, pm, eval_toks, batch_size=4)

    qn = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                       quip_tune_iters=0, ft_epochs=0, merge_suv=False,
                       modules_to_not_convert=["gate"])
    pn = qn.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    ppl_n = perplexity(cfg, pn, eval_toks, batch_size=4)

    assert np.isfinite(ppl_m)
    assert ppl_m < ppl_n * 1.25, (ppl_m, ppl_n)


def test_merge_suv_baichuan_runs():
    """merge_suv over the fused-W_pack baichuan family (beyond the
    reference, which raises for baichuan)."""
    cfg = tiny_config(arch="baichuan")
    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0, merge_suv=True)
    pm = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    ppl = perplexity(cfg, pm, synthetic_tokens(8, 32, cfg.vocab_size, 2),
                     batch_size=4)
    assert np.isfinite(ppl)


def test_merge_suv_unsupported_arch_raises():
    cfg = tiny_config(arch="gpt2")
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, merge_suv=True)
    calib = synthetic_tokens(8, 32, cfg.vocab_size, seed=1)
    from quip_for_all_tpu.models import gpt2 as G
    with pytest.raises(ValueError, match="merge_suv"):
        q.quantize_model(cfg, G.init_gpt2_params(cfg, seed=0), calib)


def test_e2e_finetune_pipelined_over_mesh():
    """ft_pp>1 runs the end-to-end CE finetune through the GPipe pipeline
    (parallel/pipeline.py) — the reference pipelines e2e ft across GPUs
    via accelerate device_map (quantizer.py:626-638); here it must work
    on a CPU pp-mesh with validation CE no worse than the initial
    quantized model, matching the single-device ft path's behavior."""
    cfg = tiny_config(num_hidden_layers=2)
    params = _fresh(cfg)
    calib = synthetic_tokens(32, 32, cfg.vocab_size, seed=1)
    eval_toks = synthetic_tokens(8, 32, cfg.vocab_size, seed=2)

    q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=2,
                      ft_train_size=12, ft_valid_size=4, ft_batch_size=4,
                      ft_pp=2, ft_microbatches=2)
    qparams = q.quantize_model(cfg, params, calib)
    assert hasattr(q, "e2e_ft_stats_")
    assert q.e2e_ft_stats_["best"] <= q.e2e_ft_stats_["initial"], \
        q.e2e_ft_stats_
    ppl = perplexity(cfg, qparams, eval_toks, batch_size=4)
    assert np.isfinite(ppl)


def test_e2e_finetune_pipelined_matches_single_device_loss():
    """The pipelined ft student loss must equal the single-device one for
    identical params (the pipeline is a scheduling change, not a numerics
    change)."""
    from quip_for_all_tpu.parallel.pipeline import (make_pp_mesh,
                                                    pipeline_logits)
    from quip_for_all_tpu.models import registry as R
    cfg = tiny_config(num_hidden_layers=2)
    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, _fresh(cfg), calib)
    ids = jnp.asarray(calib[:4])
    mesh = make_pp_mesh(2)
    lp = pipeline_logits(cfg, qparams, ids, mesh, n_microbatches=2,
                         linear_kw={"training": True})
    ls, _ = R.get_arch(cfg).model_apply(cfg, qparams, ids,
                                        linear_kw={"training": True})
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                               rtol=2e-4, atol=2e-4)


def test_ft_pp_must_divide_layers():
    cfg = tiny_config(num_hidden_layers=3)
    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=1, ft_train_size=4,
                      ft_valid_size=4, ft_batch_size=4, ft_pp=2)
    with pytest.raises(ValueError, match="ft_pp"):
        q.quantize_model(cfg, _fresh(cfg), calib)
