"""Quality parity on a trained model: quantization must cost little ppl on
a model with real structure, and more bits must help monotonically
(BASELINE.md north-star: quality parity per bit-width)."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import perplexity


@pytest.fixture(scope="module")
def trained_tiny():
    """Train a tiny llama on the synthetic Markov stream until it clearly
    beats the uniform baseline."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    data = synthetic_tokens(512, 32, cfg.vocab_size, seed=11)

    def loss_fn(params, ids):
        logits, _ = M.model_apply(cfg, params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

    opt = optax.adam(2e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, ids):
        loss, g = jax.value_and_grad(loss_fn)(params, ids)
        upd, state = opt.update(g, state, params)
        return optax.apply_updates(params, upd), state, loss

    for epoch in range(6):
        for i in range(0, 512, 16):
            params, state, loss = step(params, state,
                                       jnp.asarray(data[i:i + 16]))
    # evaluate on training windows: quantization-degradation ordering
    # needs a model with real structure, not generalization
    eval_toks = synthetic_tokens(512, 32, cfg.vocab_size, seed=11)[:16]
    ppl = perplexity(cfg, params, eval_toks, batch_size=8)
    assert ppl < 0.6 * cfg.vocab_size, ppl  # clearly beats uniform
    return cfg, params, eval_toks, ppl


def test_bitwidth_quality_ordering(trained_tiny):
    cfg, params, eval_toks, ppl_f = trained_tiny
    calib = synthetic_tokens(32, 32, cfg.vocab_size, seed=13)

    ppls = {}
    for cb in ("E8P12", "E8P12RVQ4B"):
        q = QuipQuantizer(codebook=cb, nsamples=32, batch_size=8,
                          quip_tune_iters=2, ft_epochs=0, seed=1)
        import copy
        p = jax.tree_util.tree_map(jnp.array, params)
        qp = q.quantize_model(cfg, p, calib)
        ppls[cb] = perplexity(cfg, qp, eval_toks, batch_size=8)

    # 4-bit residual must beat 2-bit; both stay within sane range of float
    assert ppls["E8P12RVQ4B"] < ppls["E8P12"], (ppl_f, ppls)
    assert ppls["E8P12RVQ4B"] < ppl_f * 1.35, (ppl_f, ppls)
    assert ppls["E8P12"] < ppl_f * 3.0, (ppl_f, ppls)
