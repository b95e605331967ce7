"""Bucketed decode attention (prefix-sliced static cache) must equal the
full-cache computation at every position."""
import numpy as np

import jax
import jax.numpy as jnp

from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.runtime.generate import init_kv_caches


def test_bucketed_decode_matches_full_forward():
    cfg = tiny_config(num_hidden_layers=2, max_position_embeddings=1024)
    params = M.init_llama_params(cfg, seed=0)
    ids = jnp.asarray((np.arange(40) * 13 % cfg.vocab_size)[None, :])
    full_logits, _ = M.model_apply(cfg, params, ids)

    caches = init_kv_caches(cfg, 1, 1024, dtype=jnp.float32)  # T>=512
    pos = jnp.arange(8)[None, :]
    l0, caches = M.model_apply(cfg, params, ids[:, :8], positions=pos,
                               kv_caches=caches, cache_position=0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(full_logits[:, :8]),
                               rtol=3e-3, atol=3e-3)
    for t in range(8, 40):  # decode one by one through the bucketed path
        lt, caches = M.model_apply(cfg, params, ids[:, t:t + 1],
                                   positions=jnp.asarray([[t]]),
                                   kv_caches=caches, cache_position=t)
        np.testing.assert_allclose(np.asarray(lt[0, 0]),
                                   np.asarray(full_logits[0, t]),
                                   rtol=6e-3, atol=6e-3)


def test_static_window_matches_switch_path():
    """attn_window (static prefix, no lax.switch) must equal both the
    runtime-bucketed decode and the full forward."""
    cfg = tiny_config(num_hidden_layers=2, max_position_embeddings=1024)
    params = M.init_llama_params(cfg, seed=0)
    ids = jnp.asarray((np.arange(40) * 13 % cfg.vocab_size)[None, :])
    full_logits, _ = M.model_apply(cfg, params, ids)

    caches = init_kv_caches(cfg, 1, 1024, dtype=jnp.float32)
    pos = jnp.arange(8)[None, :]
    _, caches = M.model_apply(cfg, params, ids[:, :8], positions=pos,
                              kv_caches=caches, cache_position=0,
                              attn_window=256)
    for t in range(8, 40):
        lt, caches = M.model_apply(cfg, params, ids[:, t:t + 1],
                                   positions=jnp.asarray([[t]]),
                                   kv_caches=caches, cache_position=t,
                                   attn_window=256)
        np.testing.assert_allclose(np.asarray(lt[0, 0]),
                                   np.asarray(full_logits[0, t]),
                                   rtol=6e-3, atol=6e-3)


def test_generate_segmented_scan_crosses_bucket_boundary():
    """generate() with decode positions spanning the 256-slot bucket
    boundary (segmented scans with different static windows) must match
    one-shot full-context logits argmax at every step."""
    from quip_for_all_tpu.runtime.generate import generate

    cfg = tiny_config(num_hidden_layers=2, max_position_embeddings=640)
    params = M.init_llama_params(cfg, seed=0)
    prompt = jnp.asarray((np.arange(250) * 7 % cfg.vocab_size)[None, :])
    out = np.asarray(generate(cfg, params, prompt, 12, cache_len=640,
                              dtype_str="float32"))[0]
    # oracle: greedy continuation via repeated full forwards (no cache)
    seq = np.asarray(prompt[0]).tolist()
    for _ in range(12):
        logits, _ = M.model_apply(cfg, params, jnp.asarray([seq]))
        seq.append(int(np.argmax(np.asarray(logits[0, -1]))))
    assert out.tolist() == seq, (out.tolist()[-14:], seq[-14:])


def test_generate_stream_matches_generate():
    """generate_stream chunks (crossing a bucket boundary) must equal the
    one-shot generate() sequence exactly, greedy and sampled."""
    from quip_for_all_tpu.runtime.generate import generate, generate_stream

    cfg = tiny_config(num_hidden_layers=2, max_position_embeddings=640)
    params = M.init_llama_params(cfg, seed=0)
    prompt = jnp.asarray((np.arange(250) * 7 % cfg.vocab_size)[None, :])
    for temp, tk in ((0.0, 0), (0.8, 20)):
        key = jax.random.PRNGKey(5)
        ref = np.asarray(generate(cfg, params, prompt, 12, key=key,
                                  temperature=temp, top_k=tk,
                                  cache_len=640, dtype_str="float32"))
        chunks = list(generate_stream(cfg, params, prompt, 12, chunk=5,
                                      key=key, temperature=temp, top_k=tk,
                                      cache_len=640, dtype_str="float32"))
        got = np.concatenate([np.asarray(prompt)] + chunks, axis=1)
        np.testing.assert_array_equal(got, ref)


def test_static_window_all_families():
    """attn_window decode must match full forward for every registered
    architecture (the shared sdpa_cache_layout window path)."""
    from quip_for_all_tpu.models.registry import get_arch
    from quip_for_all_tpu.models.config import ModelConfig

    for arch in ("gpt2", "gpt_neox", "opt", "falcon", "phi", "gptj"):
        cfg = ModelConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          max_position_embeddings=512, arch=arch)
        A = get_arch(cfg)
        params = getattr(A, f"init_{arch}_params")(cfg, seed=0)
        ids = jnp.asarray((np.arange(20) * 11 % cfg.vocab_size)[None, :])
        full_logits, _ = A.model_apply(cfg, params, ids)
        caches = init_kv_caches(cfg, 1, 512, dtype=jnp.float32)
        pos = jnp.arange(8)[None, :]
        _, caches = A.model_apply(cfg, params, ids[:, :8], positions=pos,
                                  kv_caches=caches, cache_position=0,
                                  attn_window=256)
        for t in range(8, 20):
            lt, caches = A.model_apply(cfg, params, ids[:, t:t + 1],
                                       positions=jnp.asarray([[t]]),
                                       kv_caches=caches, cache_position=t,
                                       attn_window=256)
            np.testing.assert_allclose(np.asarray(lt[0, 0]),
                                       np.asarray(full_logits[0, t]),
                                       rtol=6e-3, atol=6e-3, err_msg=arch)


def test_grouped_gqa_matches_explicit_repeat():
    """The repeat-free grouped GQA in sdpa_cache_layout must equal the
    naive formulation that materializes repeated kv heads, for several
    (H, KV) shapes including multi-query."""
    from quip_for_all_tpu.models.common import sdpa_cache_layout

    rng = np.random.default_rng(0)
    for H, KV, S, T in ((8, 2, 1, 64), (8, 1, 1, 32), (4, 4, 5, 16),
                        (6, 3, 2, 40)):
        B, hd = 2, 16
        q = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, T, KV, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, T, KV, hd)), jnp.float32)
        mask = jnp.asarray(
            np.where(rng.standard_normal((B, 1, S, T)) > 0.5, -1e9, 0.0),
            jnp.float32)
        got = np.asarray(sdpa_cache_layout(q, k, v, mask, jnp.float32))
        kr = jnp.repeat(k, H // KV, axis=2)
        vr = jnp.repeat(v, H // KV, axis=2)
        ref = np.asarray(sdpa_cache_layout(q, kr, vr, mask, jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"H={H} KV={KV}")
