"""Tensor-parallel block-diagonal incoherence transforms (tp_shards):
numerics, quality parity, shard-locality, and sharded execution on the
8-device CPU mesh (the solution to reference README.md:84)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import perplexity
from quip_for_all_tpu.transforms.incoherence import get_hadK, matmul_hadU
from quip_for_all_tpu.utils.checkpoint import load_quantized, save_quantized


def test_block_diag_transform_is_shard_local(rng):
    """Applying the sharded transform globally equals applying the
    sub-transform independently on each shard slice."""
    n, s = 256, 4
    spec = get_hadK(n, use_rand=True, rng=rng, shards=s)
    assert spec.shards == s
    x = rng.standard_normal((3, n)).astype(np.float32)
    y_global = np.asarray(matmul_hadU(jnp.asarray(x), spec))
    sub = get_hadK(n // s, use_rand=False)
    from quip_for_all_tpu.transforms.incoherence import HadSpec
    sub = HadSpec(spec.hadK, spec.K, n // s)
    for i in range(s):
        sl = slice(i * n // s, (i + 1) * n // s)
        y_i = np.asarray(matmul_hadU(jnp.asarray(x[:, sl]), sub))
        assert np.allclose(y_global[:, sl], y_i, atol=1e-5)
    # orthogonality
    assert np.allclose((y_global ** 2).sum(-1), (x ** 2).sum(-1), rtol=1e-4)


def test_tp_quantize_quality_parity():
    """tp_shards=2 quantization stays ppl-comparable to tp_shards=1."""
    cfg = tiny_config(num_hidden_layers=2)
    calib = synthetic_tokens(16, 32, cfg.vocab_size, seed=1)
    eval_toks = synthetic_tokens(8, 32, cfg.vocab_size, seed=2)

    ppls = {}
    for tp in (1, 2):
        q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                          quip_tune_iters=0, ft_epochs=0, tp_shards=tp)
        params = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0),
                                  calib)
        ppls[tp] = perplexity(cfg, params, eval_toks, batch_size=4)
    assert np.isfinite(ppls[2])
    assert ppls[2] < ppls[1] * 1.2, ppls


def test_tp_checkpoint_roundtrip_and_sharded_exec(tmp_path):
    """A tp_shards checkpoint reloads exactly and runs under a real tp mesh
    with identical logits."""
    cfg = tiny_config(num_hidden_layers=2)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0, tp_shards=2)
    params = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)
    d = str(tmp_path / "tp2")
    save_quantized(cfg, params, q.to_dict(), d)
    cfg2, lparams, qcfg = load_quantized(d)
    assert qcfg["tp_shards"] == 2
    blk = lparams["layers"][0]
    assert blk["self_attn"]["q_proj"].shards_right == 2
    assert blk["mlp"]["down_proj"].shards_left == 2

    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l_ref, _ = M.model_apply(cfg, params, ids)
    l_loaded, _ = M.model_apply(cfg2, lparams, ids)
    np.testing.assert_allclose(np.asarray(l_ref), np.asarray(l_loaded),
                               rtol=1e-4, atol=1e-4)

    # sharded execution over a (1, 2) mesh
    from quip_for_all_tpu.parallel.sharding import make_mesh, shard_params
    mesh = make_mesh(2, dp=1)
    sparams = shard_params(cfg2, lparams, mesh)
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(None, None)))
    with mesh:
        l_tp, _ = jax.jit(lambda p, i: M.model_apply(cfg2, p, i))(
            sparams, ids_sh)
    np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_ref),
                               rtol=2e-3, atol=2e-3)
