"""Continuous-batching serving engine tests: multi-request completion,
slot reuse, greedy consistency with plain generate."""
import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.runtime.generate import generate
from quip_for_all_tpu.runtime.serving import ServingEngine


def test_serving_completes_requests():
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_buckets=(8, 16))
    rids = [eng.add_request(np.array([1, 2, 3]), max_new_tokens=6),
            eng.add_request(np.array([4, 5]), max_new_tokens=4),
            eng.add_request(np.array([9, 8, 7, 6]), max_new_tokens=5)]
    out = eng.run(max_steps=200)
    assert set(out) == set(rids)
    assert out[rids[0]].shape[0] == 3 + 6
    assert out[rids[1]].shape[0] == 2 + 4
    assert out[rids[2]].shape[0] == 4 + 5  # admitted after a slot frees


def test_serving_tensor_sharded_matches_unsharded():
    """A tp=2 mesh-sharded engine must produce the same greedy tokens as
    the single-device engine (BASELINE config #5: tensor-sharded serving
    with continuous batching)."""
    from quip_for_all_tpu.data.calibration import synthetic_tokens
    from quip_for_all_tpu.parallel.sharding import make_mesh
    from quip_for_all_tpu.quantize.quantizer import QuipQuantizer

    cfg = tiny_config(num_hidden_layers=2)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0, tp_shards=2)
    params = q.quantize_model(cfg, M.init_llama_params(cfg, seed=0), calib)

    prompt = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    ref_eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                            dtype=jnp.float32, prefill_buckets=(8,))
    r0 = ref_eng.add_request(prompt, max_new_tokens=6)
    ref = ref_eng.run(max_steps=50)[r0]

    mesh = make_mesh(2, dp=1)
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_buckets=(8,), mesh=mesh)
    rid = eng.add_request(prompt, max_new_tokens=6)
    with mesh:
        out = eng.run(max_steps=50)[rid]
    assert np.array_equal(out, ref), (out, ref)


def test_serving_matches_generate_greedy():
    """A single greedy request through the engine must equal the plain
    scan-based generate."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    prompt = np.array([3, 1, 4, 1, 5], dtype=np.int32)

    ref = np.asarray(generate(cfg, params, jnp.asarray(prompt[None]), 8,
                              cache_len=64, dtype_str="float32"))[0]
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_buckets=(8,))
    rid = eng.add_request(prompt, max_new_tokens=8)
    out = eng.run(max_steps=100)[rid]
    assert np.array_equal(out, ref), (out, ref)


def test_serving_chunked_prefill_matches_generate():
    """A prompt spanning several prefill chunks must produce the same
    greedy continuation as the one-shot scan generate (chunked prefill
    writes the same cache, chunk by chunk)."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    rng = np.random.RandomState(7)
    prompt = rng.randint(1, cfg.vocab_size, size=21).astype(np.int32)

    ref = np.asarray(generate(cfg, params, jnp.asarray(prompt[None]), 6,
                              cache_len=64, dtype_str="float32"))[0]
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_chunk=8)  # 3 chunks
    rid = eng.add_request(prompt, max_new_tokens=6)
    out = eng.run(max_steps=100)[rid]
    assert np.array_equal(out, ref), (out, ref)


def test_serving_admission_does_not_perturb_inflight():
    """Admitting a long-prompt request mid-decode must not change the
    tokens of the already-running greedy stream (pad chunks of busy slots
    land in the scratch region, never in attended cache)."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    pa = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    pb = np.random.RandomState(3).randint(
        1, cfg.vocab_size, size=19).astype(np.int32)

    solo = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                         dtype=jnp.float32, prefill_chunk=8)
    ra = solo.add_request(pa, max_new_tokens=12)
    ref_a = solo.run(max_steps=100)[ra]

    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_chunk=8)
    ra = eng.add_request(pa, max_new_tokens=12)
    for _ in range(4):
        eng.step()
    rb = eng.add_request(pb, max_new_tokens=4)
    out = eng.run(max_steps=100)
    assert np.array_equal(out[ra], ref_a), (out[ra], ref_a)
    assert out[rb].shape[0] == 19 + 4


def test_serving_batched_admission():
    """Two pending requests with different prompt lengths admit together
    through the same chunk steps and both complete correctly."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    pa = np.array([3, 1, 4], dtype=np.int32)
    pb = np.random.RandomState(5).randint(
        1, cfg.vocab_size, size=13).astype(np.int32)

    ref = {}
    for p, m in ((pa, 5), (pb, 7)):
        solo = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                             dtype=jnp.float32, prefill_chunk=8)
        r = solo.add_request(p, max_new_tokens=m)
        ref[m] = solo.run(max_steps=100)[r]

    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_chunk=8)
    ra = eng.add_request(pa, max_new_tokens=5)
    rb = eng.add_request(pb, max_new_tokens=7)
    out = eng.run(max_steps=100)
    assert np.array_equal(out[ra], ref[5])
    assert np.array_equal(out[rb], ref[7])


def test_serving_prompt_too_long_raises():
    import pytest
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    eng = ServingEngine(cfg, params, max_batch=1, cache_len=16,
                        dtype=jnp.float32, prefill_chunk=8)
    eng.add_request(np.arange(1, 18, dtype=np.int32), max_new_tokens=2)
    with pytest.raises(ValueError):
        eng.run(max_steps=10)


def test_serving_mixtral_sparse_moe():
    """Continuous batching over a stacked-expert Mixtral: chunked decode
    through the sparse MoE path, request results match single-stream
    generate()."""
    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.models.config import ModelConfig
    from quip_for_all_tpu.runtime.generate import generate
    from quip_for_all_tpu.utils.random_quantized import \
        random_quantized_model

    cfg = ModelConfig(arch="mixtral", vocab_size=256, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      num_local_experts=4, num_experts_per_tok=2,
                      max_position_embeddings=256)
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.float32)
    params = M.fuse_for_inference(cfg, params)
    assert "experts_stacked" in params["layers"][0]["block_sparse_moe"]

    prompts = [np.arange(9, dtype=np.int32) % cfg.vocab_size,
               (np.arange(14, dtype=np.int32) * 3) % cfg.vocab_size]
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=128,
                        dtype=jnp.float32, prefill_chunk=8, decode_chunk=4)
    rids = [eng.add_request(p, max_new_tokens=6) for p in prompts]
    results = eng.run()
    for rid, p in zip(rids, prompts):
        ref = np.asarray(generate(cfg, params, jnp.asarray(p)[None], 6,
                                  cache_len=128, dtype_str="float32"))[0]
        np.testing.assert_array_equal(results[rid], ref)


def test_serving_streaming_callback_and_chunk_clamp():
    """on_token streams every generated token in order with a correct
    done flag, and the decode chunk is clamped to the remaining budgets
    (pow2-bucketed) so the engine never decodes a full chunk no consumer
    can use."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    streamed = []
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_chunk=8,
                        decode_chunk=8,
                        on_token=lambda rid, tok, done:
                        streamed.append((rid, tok, done)))
    chunks = []
    orig = eng._decode

    def spy(caches, params, tok, pos, active, key, attn_window=None,
            chunk=1):
        chunks.append(chunk)
        return orig(caches, params, tok, pos, active, key,
                    attn_window=attn_window, chunk=chunk)
    eng._decode = spy

    r0 = eng.add_request(np.array([1, 2, 3]), max_new_tokens=3)
    r1 = eng.add_request(np.array([4, 5]), max_new_tokens=3)
    out = eng.run(max_steps=50)

    # every token was streamed, in emission order, with done on the last
    for rid in (r0, r1):
        toks = [t for r, t, _ in streamed if r == rid]
        assert len(toks) == 3
        gen = out[rid][-3:]
        assert toks == list(gen), (toks, gen)
        flags = [d for r, _, d in streamed if r == rid]
        assert flags == [False, False, True]
    # 3 new tokens: 1 at admission + 2 remaining -> one chunk of 2, never 8
    assert chunks == [2], chunks


def test_serving_single_token_request():
    """max_new_tokens=1 must return exactly one generated token (the
    admission sample) without entering the decode loop for it."""
    cfg = tiny_config(num_hidden_layers=2)
    params = M.init_llama_params(cfg, seed=0)
    eng = ServingEngine(cfg, params, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_chunk=8)
    rid = eng.add_request(np.array([1, 2, 3]), max_new_tokens=1)
    out = eng.run(max_steps=10)
    assert out[rid].shape[0] == 3 + 1
