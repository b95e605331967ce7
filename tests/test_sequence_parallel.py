"""Ring-attention sequence parallelism over an "sp" mesh (beyond the
reference — SURVEY.md §2.4 lists sequence/context parallelism as absent
upstream; here long-context prefill shards S with exact causal ring
attention)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.parallel.pipeline import shard_map
from quip_for_all_tpu.parallel.sequence import (make_sp_mesh,
                                                ring_attention,
                                                sequence_parallel_logits)


def _full_causal(q, k, v):
    """Reference full-sequence causal attention (GQA), f32."""
    B, S, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    qf = q.astype(jnp.float32).reshape(B, S, KV, G, hd)
    qf = qf.transpose(0, 2, 3, 1, 4) / np.sqrt(hd)
    kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
    vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
    s = jnp.einsum("bkgqh,bkth->bkgqt", qf, kf)
    i = jnp.arange(S)
    s = jnp.where((i[:, None] >= i[None, :])[None, None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgqt,bkth->bkgqh", w, vf)
    return o.transpose(0, 3, 1, 2, 4).reshape(B, S, H, hd)


@pytest.mark.parametrize("sp,KV", [(2, 2), (4, 2), (4, 4)])
def test_ring_attention_matches_full(sp, KV):
    rng = np.random.default_rng(0)
    B, S, H, hd = 2, 32, 4, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, KV, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, KV, hd)), jnp.float32)
    ref = np.asarray(_full_causal(q, k, v))
    mesh = make_sp_mesh(sp)
    fn = shard_map(lambda q, k, v: ring_attention(q, k, v),
                   mesh=mesh,
                   in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
                   out_specs=P(None, "sp"), check_rep=False)
    out = np.asarray(fn(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sequence_parallel_logits_float():
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    ids = jnp.asarray(synthetic_tokens(2, 32, cfg.vocab_size, 3))
    ref, _ = M.model_apply(cfg, params, ids)
    mesh = make_sp_mesh(4)
    out = sequence_parallel_logits(cfg, params, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_sequence_parallel_logits_quantized_fused():
    """The sp path must run the QUANTIZED runtime unchanged (fused
    qkv/gateup Pallas groups inside shard_map)."""
    from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
    cfg = tiny_config(num_hidden_layers=2)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0),
                               calib)
    qparams = M.fuse_for_inference(cfg, qparams)
    ids = jnp.asarray(synthetic_tokens(2, 16, cfg.vocab_size, 3))
    # f32 kernel compute on both paths: with bf16 compute the two paths'
    # (identical-value, different-reduction-order) attention outputs
    # round differently at the kernel input and the comparison only
    # bounds bf16 noise, not the sp path
    lkw = {"compute_dtype": jnp.float32}
    ref, _ = M.model_apply(cfg, qparams, ids, linear_kw=lkw)
    mesh = make_sp_mesh(2)
    out = sequence_parallel_logits(cfg, qparams, ids, mesh, linear_kw=lkw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_sequence_parallel_jits_once():
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    ids = jnp.asarray(synthetic_tokens(1, 32, cfg.vocab_size, 5))
    mesh = make_sp_mesh(4)
    fn = jax.jit(lambda p, i: sequence_parallel_logits(cfg, p, i, mesh))
    out = np.asarray(fn(params, ids))
    ref, _ = M.model_apply(cfg, params, ids)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("parallel_residual", [True, False])
def test_sequence_parallel_gpt_neox(parallel_residual):
    """Second family through sp (VERDICT r3 #9): gpt_neox — fused
    interleaved qkv, partial rotary, parallel residual — must match its
    single-device forward on the 8-device mesh."""
    from quip_for_all_tpu.models import gpt_neox as NX
    from quip_for_all_tpu.models.config import tiny_config
    cfg = tiny_config(num_hidden_layers=2, arch="gpt_neox",
                      num_key_value_heads=4, rotary_pct=0.25,
                      use_parallel_residual=parallel_residual)
    params = NX.init_gpt_neox_params(cfg, seed=0)
    ids = jnp.asarray(synthetic_tokens(2, 32, cfg.vocab_size, 3))
    ref, _ = NX.model_apply(cfg, params, ids)
    mesh = make_sp_mesh(4)
    out = sequence_parallel_logits(cfg, params, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
