"""Trace one jitted decode step and aggregate per-op device time.

Writes a jax.profiler trace of 3 decode steps, then parses the
vm.trace.json.gz to print total device-time per op-name bucket —
the ground truth driving the XLA-overhead work (README "Performance").

    python tools/trace_decode.py [--layers 8] [--cache-len 2048]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=2048)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace2")
    ap.add_argument("--buckets", type=int, default=40)
    ap.add_argument("--model", default="llama",
                    choices=["llama", "mixtral"])
    ap.add_argument("--start-pos", type=int, default=16,
                    help="first decode position (picks the attention bucket)")
    ap.add_argument("--scan", type=int, default=0,
                    help="trace a donated lax.scan over N tokens "
                         "(the bench loop) instead of single steps")
    ap.add_argument("--quantize-head", action="store_true",
                    help="quantize lm_head too (reproduces the 5x "
                         "whole-model regression under investigation)")
    ap.add_argument("--attn-window", type=int, default=0,
                    help="static attention window (the production decode "
                    "protocol — avoids the per-layer bucket lax.switch); "
                    "0 = the runtime switch ladder")
    ap.add_argument("--top", type=int, default=0,
                    help="also print the N largest INDIVIDUAL ops with "
                    "their long_name (which fusion/copy is the time)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.models.config import ModelConfig
    from quip_for_all_tpu.runtime.generate import init_kv_caches
    from quip_for_all_tpu.utils.random_quantized import \
        random_quantized_model

    if args.model == "mixtral":
        import dataclasses
        from quip_for_all_tpu.models.config import mixtral_8x7b_config
        cfg = dataclasses.replace(mixtral_8x7b_config(),
                                  num_hidden_layers=args.layers,
                                  max_position_embeddings=4096)
    else:
        cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                          intermediate_size=11008,
                          num_hidden_layers=args.layers,
                          num_attention_heads=32, num_key_value_heads=32,
                          max_position_embeddings=4096)
    t0 = time.time()
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.bfloat16,
                                    quantize_head=args.quantize_head)
    params = M.fuse_for_inference(cfg, params)
    print(f"# params built {time.time()-t0:.0f}s", file=sys.stderr)

    caches = init_kv_caches(cfg, 1, args.cache_len, dtype=jnp.bfloat16)

    attn_window = args.attn_window or None
    if args.scan:
        def decode_many(params, caches, tok, pos):
            def body(carry, _):
                caches, tok, pos = carry
                logits, caches = M.model_apply(
                    cfg, params, tok[:, None], positions=pos[:, None],
                    kv_caches=caches, cache_position=pos[0],
                    dtype=jnp.bfloat16, attn_window=attn_window)
                nxt = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
                return (caches, nxt, pos + 1), nxt
            (caches, tok, pos), toks = jax.lax.scan(
                body, (caches, tok, pos), None, length=args.scan)
            return caches, toks
        step = jax.jit(decode_many, donate_argnums=(1,))
    else:
        @jax.jit
        def step(params, caches, tok, pos):
            logits, caches = M.model_apply(
                cfg, params, tok[:, None], positions=pos[:, None],
                kv_caches=caches, cache_position=pos[0],
                dtype=jnp.bfloat16)
            return jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32), caches

    tok = jnp.asarray([7], dtype=jnp.int32)
    pos = jnp.asarray([args.start_pos], dtype=jnp.int32)
    if args.scan:
        caches, toks = step(params, caches, tok, pos)
        _ = np.asarray(toks)
        print(f"# compiled {time.time()-t0:.0f}s", file=sys.stderr)
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        with jax.profiler.trace(args.trace_dir):
            t1 = time.time()
            caches, toks = step(params, caches, tok, pos)
            _ = np.asarray(toks)
            print(f"# traced scan: {(time.time()-t1-0.032)/args.scan*1e3:.2f}"
                  f" ms/token wall", file=sys.stderr)
        nsteps = args.scan
    else:
        nxt, caches = step(params, caches, tok, pos)
        _ = np.asarray(nxt)
        print(f"# compiled {time.time()-t0:.0f}s", file=sys.stderr)
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                nxt, caches = step(params, caches, nxt, pos)
                _ = np.asarray(nxt)
        nsteps = 3

    # parse newest trace.json.gz; device ops live on the /device:TPU
    # process's "XLA Ops" lane
    paths = sorted(glob.glob(
        args.trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    assert paths, "no trace written"
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    procs = {e["pid"]: e["args"].get("name", "")
             for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    threads = {(e["pid"], e["tid"]): e["args"].get("name", "")
               for e in tr["traceEvents"]
               if e.get("ph") == "M" and e.get("name") == "thread_name"}
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and "dur" in e
          and "TPU" in procs.get(e.get("pid"), "")
          and threads.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]

    def bucket(name):
        return re.sub(r"[.\d]+$", "", name)

    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for e in ev:
        b = bucket(e["name"])
        agg[b] += e["dur"]
        cnt[b] += 1
        total += e["dur"]
    print(f"# device-op total {total/nsteps:.0f} us/step "
          f"({args.layers} layers, {nsteps} steps traced)")
    for name, dur in agg.most_common(args.buckets):
        print(f"{dur/nsteps:9.1f} us/step  n={cnt[name]/nsteps:<6.1f} "
              f"{name}")
    if args.top:
        per_op = collections.Counter()
        names = {}
        for e in ev:
            per_op[e["name"]] += e["dur"]
            a = e.get("args") or {}
            names.setdefault(e["name"],
                             a.get("long_name", a.get("shape_with_layout",
                                                      "")))
        print(f"# top {args.top} individual ops:")
        for name, dur in per_op.most_common(args.top):
            print(f"{dur/nsteps:9.1f} us/step  {name}  "
                  f"{names[name][:140]}")


if __name__ == "__main__":
    main()
