"""Decode-path component profiler (ablation-based).

The axon remote platform exposes no tracer, so component costs are measured
by ablation: run the jitted decode loop with specific components disabled
and difference the timings. Produces the breakdown used to drive kernel
work (see README "Performance").

    python tools/profile_decode.py [--layers 8] [--cache-len 2048]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(cfg, mode):
    from quip_for_all_tpu.models.llama import fuse_for_inference
    from quip_for_all_tpu.utils.random_quantized import \
        random_quantized_model
    params = random_quantized_model(cfg, codebook="E8P12", seed=0,
                                    dtype=jnp.bfloat16)
    if mode == "nomm":
        import quip_for_all_tpu.nn.qlinear as QL

        def _fake_qm(x, qt, impl="auto"):
            return jnp.zeros((x.shape[0], qt.q_out), x.dtype) \
                + 1e-6 * x[:, :1]
        QL.quant_matmul = _fake_qm
    if mode == "noht":
        import quip_for_all_tpu.nn.qlinear as QL
        QL.matmul_hadU = lambda x, spec, scale=None, transpose=False: \
            x if scale is None else x * scale
        QL.matmul_hadUt = lambda x, spec, scale=None: \
            x if scale is None else x * scale
    return fuse_for_inference(cfg, params)


def time_decode(cfg, params, cache_len, n_tok=32):
    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.runtime.generate import init_kv_caches
    caches = init_kv_caches(cfg, 1, cache_len, dtype=jnp.bfloat16)

    def decode_many(params, caches, tok, pos):
        def step(carry, _):
            caches, tok, pos = carry
            logits, caches = M.model_apply(
                cfg, params, tok[:, None], positions=pos[:, None],
                kv_caches=caches, cache_position=pos[0],
                dtype=jnp.bfloat16)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (caches, nxt, pos + 1), nxt
        (caches, tok, pos), toks = jax.lax.scan(
            step, (caches, tok, pos), None, length=n_tok)
        return caches, toks

    fn = jax.jit(decode_many, donate_argnums=(1,))
    tok = jnp.asarray([7], dtype=jnp.int32)
    pos = jnp.asarray([16], dtype=jnp.int32)
    caches, toks = fn(params, caches, tok, pos)
    _ = np.asarray(toks)
    t0 = time.time()
    caches, toks = fn(params, caches, tok, pos)
    _ = np.asarray(toks)
    return (time.time() - t0 - 0.032) / n_tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=2048)
    args = ap.parse_args()

    from quip_for_all_tpu.models.config import ModelConfig
    cfg = ModelConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008,
                      num_hidden_layers=args.layers,
                      num_attention_heads=32, num_key_value_heads=32,
                      max_position_embeddings=4096)

    results = {}
    for mode in ("full", "nomm", "noht"):
        params = build(cfg, mode)
        dt = time_decode(cfg, params, args.cache_len)
        results[mode] = dt
        print(f"{mode:6s}: {dt*1e3:7.3f} ms/token ({args.layers} layers)",
              flush=True)

    full, nomm, noht = results["full"], results["nomm"], results["noht"]
    print(f"\nbreakdown per token ({args.layers} layers):")
    print(f"  quant matmuls+stalls : {(full-nomm)*1e3:6.3f} ms")
    print(f"  hadamard transforms  : {(full-noht)*1e3:6.3f} ms")
    print(f"  everything else      : {nomm*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
