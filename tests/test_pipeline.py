"""Pipeline parallelism: stacked-block GPipe over a "pp" mesh axis
(SURVEY.md §2.4 — the reference's only multi-device mode is sequential
accelerate placement; this is real microbatched pipelining)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.parallel.pipeline import (make_pp_mesh,
                                                pipeline_logits,
                                                shard_stacked_params,
                                                stack_blocks,
                                                unstack_blocks)
from quip_for_all_tpu.utils.random_quantized import random_quantized_model


def _logits_ref(cfg, params, ids):
    logits, _ = M.model_apply(cfg, params, ids)
    return np.asarray(logits)


def test_stack_unstack_roundtrip():
    cfg = tiny_config(num_hidden_layers=4)
    params = M.init_llama_params(cfg, seed=0)
    stacked = stack_blocks(params["layers"])
    blocks = unstack_blocks(stacked, 4)
    l0 = params["layers"][2]["self_attn"]["q_proj"]["weight"]
    np.testing.assert_array_equal(
        np.asarray(blocks[2]["self_attn"]["q_proj"]["weight"]),
        np.asarray(l0))


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (4, 2)])
def test_pipeline_matches_sequential_float(pp, microbatches):
    cfg = tiny_config(num_hidden_layers=4)
    params = M.init_llama_params(cfg, seed=0)
    mesh = make_pp_mesh(pp)
    B, S = 4, 12
    ids = jnp.asarray(np.arange(B * S).reshape(B, S) % cfg.vocab_size)
    ref = _logits_ref(cfg, params, ids)
    out = np.asarray(pipeline_logits(cfg, params, ids, mesh, microbatches))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_pipeline_quantized_and_presharded():
    cfg = tiny_config(num_hidden_layers=4)
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.float32)
    mesh = make_pp_mesh(4)
    B, S = 4, 8
    ids = jnp.asarray(np.arange(B * S).reshape(B, S) % cfg.vocab_size)
    ref = _logits_ref(cfg, params, ids)
    stacked = shard_stacked_params(stack_blocks(params["layers"]), mesh)
    # stacked leaves are sharded over pp on the layer axis
    leaf = stacked["self_attn"]["q_proj"].qweight.planes["w0"]
    assert "pp" in str(leaf.sharding)
    out = np.asarray(pipeline_logits(cfg, params, ids, mesh, 2,
                                     stacked=stacked))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_pipeline_jits_once():
    """The pipelined forward must be jittable end-to-end (single traced
    computation — the torch.compile-fullgraph role)."""
    cfg = tiny_config(num_hidden_layers=4)
    params = M.init_llama_params(cfg, seed=0)
    mesh = make_pp_mesh(2)
    ids = jnp.asarray(np.arange(2 * 8).reshape(2, 8) % cfg.vocab_size)
    fn = jax.jit(lambda p, i: pipeline_logits(cfg, p, i, mesh, 2))
    out = np.asarray(fn(params, ids))
    np.testing.assert_allclose(out, _logits_ref(cfg, params, ids),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_quantized_head():
    """pipeline_logits with a QUANTIZED untied lm_head must use it
    (regression: registry.untied_head_key returned None for
    QuantLinearParams and the head silently fell back to the tied
    embedding)."""
    cfg = tiny_config(num_hidden_layers=2)
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.float32, quantize_head=True)
    mesh = make_pp_mesh(2)
    B, S = 2, 8
    ids = jnp.asarray(np.arange(B * S).reshape(B, S) % cfg.vocab_size)
    ref = _logits_ref(cfg, params, ids)
    out = np.asarray(pipeline_logits(cfg, params, ids, mesh, 2))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
