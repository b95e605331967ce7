"""Round-2 measurement sweep, one TPU process (relay must be serialized):
  phase 1: Llama-2-7B E8P12 bs=1, default path
  phase 2: same params, grouped-prologue left transform (QFA_GROUPED_PROLOGUE)
  phase 3: Llama-2-7B E8P12RVQ4B bs=1 (affine nibble combine, post-6cef79d)
Prints one JSON line per phase.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from quip_for_all_tpu.models import llama as M
from quip_for_all_tpu.models.config import llama2_7b_config
from quip_for_all_tpu.nn import qlinear as Q
from quip_for_all_tpu.runtime.generate import init_kv_caches
from quip_for_all_tpu.utils.random_quantized import random_quantized_model

TOKENS = 64
CACHE_LEN = 2048


def measure(cfg, params, caches, label):
    def decode_many(params, caches, tok, pos, n):
        def step(carry, _):
            caches, tok, pos = carry
            logits, caches = M.model_apply(
                cfg, params, tok[:, None], positions=pos[:, None],
                kv_caches=caches, cache_position=pos[0],
                linear_kw={"matmul_impl": "auto"}, dtype=jnp.bfloat16)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (caches, nxt, pos + 1), nxt
        (caches, tok, pos), toks = jax.lax.scan(
            step, (caches, tok, pos), None, length=n)
        return caches, toks

    fn = jax.jit(functools.partial(decode_many, n=TOKENS),
                 donate_argnums=(1,))
    tok = jnp.full((1,), 7, dtype=jnp.int32)
    pos = jnp.full((1,), 16, dtype=jnp.int32)
    t0 = time.time()
    caches, toks = fn(params, caches, tok, pos)
    _ = np.asarray(toks)
    print(f"# [{label}] compile+first: {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        pos = pos + TOKENS
        caches, toks = fn(params, caches, tok, pos)
        _ = np.asarray(toks)
    dt = (time.time() - t0) / reps
    tps = TOKENS / dt
    print(json.dumps({"phase": label, "tokens_per_sec": round(tps, 2)}),
          flush=True)
    return caches, tps


def main():
    cfg = llama2_7b_config()
    t0 = time.time()
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.bfloat16, quantize_head=True)
    params = M.fuse_for_inference(cfg, params)
    print(f"# built E8P12 params in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    caches = init_kv_caches(cfg, 1, CACHE_LEN, dtype=jnp.bfloat16)
    caches, _ = measure(cfg, params, caches, "e8p12_default")

    Q._GROUPED_PROLOGUE = True
    caches, _ = measure(cfg, params, caches, "e8p12_grouped_prologue")
    Q._GROUPED_PROLOGUE = False

    del params
    t0 = time.time()
    params4 = random_quantized_model(cfg, codebook="E8P12RVQ4B", seed=0,
                                     dtype=jnp.bfloat16, quantize_head=True)
    params4 = M.fuse_for_inference(cfg, params4)
    print(f"# built RVQ4B params in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    caches, _ = measure(cfg, params4, caches, "rvq4b_default")
    print("# sweep done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
