"""qkv/gate-up fusion: fused single-launch groups must reproduce the
unfused model exactly (shared left transforms from
share_group_transforms)."""
import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.nn.qlinear import FusedQuantLinear
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.utils.random_quantized import random_quantized_model


def test_fused_random_model_matches_unfused(rng):
    cfg = tiny_config(num_hidden_layers=2)
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.float32)
    fused = M.fuse_for_inference(cfg, params)
    blk = fused["layers"][0]
    assert isinstance(blk["self_attn"]["qkv_proj"], FusedQuantLinear)
    assert isinstance(blk["mlp"]["gateup_proj"], FusedQuantLinear)
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    kw = {"compute_dtype": jnp.float32}
    l1, _ = M.model_apply(cfg, params, ids, linear_kw=kw)
    l2, _ = M.model_apply(cfg, fused, ids, linear_kw=kw)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)


def test_quantizer_shared_transforms_are_fusable():
    cfg = tiny_config(num_hidden_layers=1)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0,
                      share_group_transforms=True)
    params = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    fused = M.fuse_for_inference(cfg, params)
    assert isinstance(fused["layers"][0]["self_attn"]["qkv_proj"],
                      FusedQuantLinear)
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 5))
    kw = {"compute_dtype": jnp.float32}
    l1, _ = M.model_apply(cfg, params, ids, linear_kw=kw)
    l2, _ = M.model_apply(cfg, fused, ids, linear_kw=kw)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)


def test_unshared_transforms_do_not_fuse():
    cfg = tiny_config(num_hidden_layers=1)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0,
                      share_group_transforms=False)
    params = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    fused = M.fuse_for_inference(cfg, params)
    assert "qkv_proj" not in fused["layers"][0]["self_attn"]
