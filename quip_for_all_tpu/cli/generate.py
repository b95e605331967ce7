"""Generation CLI — parity with ``/root/reference/example_generate.py``.

    python -m quip_for_all_tpu.cli.generate --model-path ckpt/ \
        --prompt "Hello" --max-new-tokens 128 --temperature 0.8 --top-k 200

Unlike the reference (which needs torch.compile + StaticCache plumbing), the
whole decode loop is one jitted lax.scan — "compiled fullgraph" by default.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    from . import honor_platform_env
    honor_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--prompt", default="Hello, my name is")
    ap.add_argument("--max-new-tokens", type=int, default=200)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--top-k", type=int, default=200)
    ap.add_argument("--cache-len", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tokenizer", default=None,
                    help="HF tokenizer path (defaults to model-path)")
    ap.add_argument("--stream", action="store_true",
                    help="print tokens as they decode (chunked scans; "
                    "parity with the reference's callback streaming)")
    ap.add_argument("--stream-chunk", type=int, default=8)
    ap.add_argument("--kv-quantized", action="store_true",
                    help="int8 KV cache: half the attention HBM reads "
                    "and cache memory")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..runtime.generate import generate
    from ..utils.checkpoint import load_quantized

    cfg, params, qcfg = load_quantized(args.model_path)
    print(f"loaded {qcfg.get('codebook')} checkpoint "
          f"({cfg.num_hidden_layers} layers)", file=sys.stderr)

    tok = None
    try:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.tokenizer
                                            or args.model_path)
        ids = np.asarray(tok(args.prompt).input_ids, dtype=np.int32)[None]
    except Exception as e:  # zero-egress/tokenizer-less fallback
        print(f"tokenizer unavailable ({e}); using byte-ish ids",
              file=sys.stderr)
        ids = np.frombuffer(args.prompt.encode()[:64], dtype=np.uint8
                            ).astype(np.int32)[None] % cfg.vocab_size

    if args.stream:
        from ..runtime.generate import generate_stream
        t0 = time.time()
        pieces = [ids]
        for chunk in generate_stream(
                cfg, params, jnp.asarray(ids), args.max_new_tokens,
                chunk=args.stream_chunk, key=jax.random.PRNGKey(args.seed),
                temperature=args.temperature, top_k=args.top_k,
                cache_len=args.cache_len, dtype_str=args.dtype,
                   kv_quantized=args.kv_quantized):
            pieces.append(chunk)
            if tok is not None:
                print(tok.decode(chunk[0].tolist()), end="", flush=True)
            else:
                print(" ".join(map(str, chunk[0].tolist())), end=" ",
                      flush=True)
        print()
        out = np.concatenate(pieces, axis=1)
        dt = time.time() - t0
        n_new = out.shape[1] - ids.shape[1]
        print(f"[streamed {n_new} tokens in {dt:.2f}s incl. compile]",
              file=sys.stderr)
        return

    t0 = time.time()
    out = generate(cfg, params, jnp.asarray(ids), args.max_new_tokens,
                   key=jax.random.PRNGKey(args.seed),
                   temperature=args.temperature, top_k=args.top_k,
                   cache_len=args.cache_len, dtype_str=args.dtype)
    out = np.asarray(out)
    dt = time.time() - t0
    n_new = out.shape[1] - ids.shape[1]
    print(f"[{n_new} tokens in {dt:.2f}s incl. compile]", file=sys.stderr)

    # timed second run (compile cached)
    t0 = time.time()
    out = np.asarray(generate(cfg, params, jnp.asarray(ids),
                              args.max_new_tokens,
                              key=jax.random.PRNGKey(args.seed + 1),
                              temperature=args.temperature,
                              top_k=args.top_k, cache_len=args.cache_len,
                              dtype_str=args.dtype,
                              kv_quantized=args.kv_quantized))
    dt = time.time() - t0
    print(f"throughput: {n_new / dt:.1f} tokens/s", file=sys.stderr)

    if tok is not None:
        print(tok.decode(out[0].tolist()))
    else:
        print(out[0].tolist())


if __name__ == "__main__":
    main()
