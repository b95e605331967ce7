"""TN (output-tile) sweep for the fused decode kernel, warm-windowed.
One TPU process. Uses jit clear_cache between variants so QFA_TN takes
effect at retrace.
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
from quip_for_all_tpu.ops import dequant_pallas as DP
from quip_for_all_tpu.runtime.generate import init_kv_caches
from quip_for_all_tpu.utils.random_quantized import random_quantized_model

TOKENS = 64
CACHE_LEN = 2048


def main():
    cfg = llama2_7b_config()
    t0 = time.time()
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.bfloat16, quantize_head=True)
    params = M.fuse_for_inference(cfg, params)
    print(f"# built params in {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    caches = init_kv_caches(cfg, 1, CACHE_LEN, dtype=jnp.bfloat16)

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

    for tn in ("auto", "256", "512", "1024", "128"):
        if tn != "auto":
            os.environ["QFA_TN"] = tn
        else:
            os.environ.pop("QFA_TN", None)
        DP._fused_call.clear_cache()
        fn = jax.jit(functools.partial(decode_many, n=TOKENS),
                     donate_argnums=(1,))
        tok = jnp.full((1,), 7, dtype=jnp.int32)
        pos = jnp.full((1,), 16, dtype=jnp.int32)
        t0 = time.time()
        caches, toks = fn(params, caches, tok, pos)
        _ = np.asarray(toks)
        print(f"# [tn={tn}] compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        series = []
        for w in range(5):
            pos = pos + TOKENS
            t0 = time.time()
            caches, toks = fn(params, caches, tok, pos)
            _ = np.asarray(toks)
            series.append(round(TOKENS / (time.time() - t0), 2))
        print(json.dumps({"tn": tn, "windows_tok_s": series,
                          "median": float(np.median(series))}),
              flush=True)
    print("# sweep done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
