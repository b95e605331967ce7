"""Continuous-batching serving throughput + latency: N requests through
the ServingEngine (chunked prefill + slot decode). Reports aggregate gen
tokens/s and — the deployment-facing metrics the reference's vLLM row
implies (~159 tok/s bs=1 latency, /root/reference/README.md:83) —
per-request tokens/s and p50/p95 inter-token latency measured at token
emission (chunk granularity; use --decode-chunk 1 for true per-token
latency at bs=1).

    python tools/bench_serving.py                     # 7B shapes, TPU
    python tools/bench_serving.py --max-batch 1 --decode-chunk 1
    python tools/bench_serving.py --small --cpu       # smoke
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=512)
    ap.add_argument("--decode-chunk", type=int, default=8)
    ap.add_argument("--fetch-batch", type=int, default=4)
    ap.add_argument("--codebook", default="E8P12")
    ap.add_argument("--kv-quantized", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    else:
        # serialize against other TPU processes (utils/chiplock.py);
        # held for the process lifetime
        import contextlib
        from quip_for_all_tpu.utils.chiplock import chip_lock
        _stack = contextlib.ExitStack()
        _stack.enter_context(chip_lock(timeout_s=900.0))
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.models.config import (ModelConfig,
                                                llama2_7b_config)
    from quip_for_all_tpu.runtime.serving import ServingEngine
    from quip_for_all_tpu.utils.random_quantized import \
        random_quantized_model

    if args.small:
        cfg = ModelConfig(vocab_size=512, hidden_size=256,
                          intermediate_size=512, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          max_position_embeddings=args.cache_len)
        name = "tiny"
    else:
        cfg = llama2_7b_config()
        name = "llama2_7b"
    dtype = jnp.float32 if args.cpu else jnp.bfloat16

    t0 = time.time()
    params = random_quantized_model(cfg, codebook=args.codebook, seed=0,
                                    dtype=dtype,
                                    quantize_head=not args.small)
    params = M.fuse_for_inference(cfg, params)
    print(f"# built {name} params in {time.time()-t0:.1f}s",
          file=sys.stderr)

    # per-token emission timestamps -> per-request tok/s + inter-token
    # latency distribution (the bs=1 row compares against the reference's
    # vLLM benchmark_latency number)
    stamps: dict = {}

    def on_token(rid, tok, done):
        stamps.setdefault(rid, []).append(time.time())

    engine = ServingEngine(cfg, params, max_batch=args.max_batch,
                           cache_len=args.cache_len, dtype=dtype,
                           decode_chunk=args.decode_chunk,
                           kv_quantized=args.kv_quantized,
                           fetch_batch=args.fetch_batch,
                           on_token=on_token)
    rng = np.random.default_rng(0)
    for _ in range(args.requests):
        plen = int(rng.integers(args.prompt_len // 2, args.prompt_len + 1))
        engine.add_request(rng.integers(0, cfg.vocab_size, size=plen,
                                        dtype=np.int64).astype(np.int32),
                           max_new_tokens=args.max_new)

    # warm: first step compiles prefill + decode
    t0 = time.time()
    engine.step()
    print(f"# first step (compiles): {time.time()-t0:.1f}s",
          file=sys.stderr)
    stamps.clear()        # compile-step emissions pollute the latency dist
    t0 = time.time()
    results = engine.run()
    dt = time.time() - t0
    gen = sum(args.max_new for _ in results)
    print(f"# {len(results)} requests done in {dt:.2f}s", file=sys.stderr)

    per_req = []          # tokens/s per request over its emission span
    gaps = []             # inter-token (chunk-granular) gaps, seconds
    for rid, ts in stamps.items():
        if len(ts) >= 2:
            per_req.append((len(ts) - 1) / (ts[-1] - ts[0]))
            d = np.diff(np.asarray(ts))
            gaps.extend(d[d > 1e-5])      # same-chunk emissions are ~0
    import json
    result = {
        "metric": f"serving_tokens_per_sec_{name}_{args.codebook.lower()}"
                  f"_b{args.max_batch}",
        "value": round(gen / dt, 2),
        "unit": "gen tokens/s",
        "decode_chunk": args.decode_chunk,
        "fetch_batch": args.fetch_batch,
    }
    if per_req:
        result["per_request_tok_s_p50"] = round(
            float(np.percentile(per_req, 50)), 2)
        result["per_request_tok_s_min"] = round(float(min(per_req)), 2)
    if gaps:
        result["inter_chunk_ms_p50"] = round(
            float(np.percentile(gaps, 50)) * 1e3, 2)
        result["inter_chunk_ms_p95"] = round(
            float(np.percentile(gaps, 95)) * 1e3, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
