"""Microbenchmark the production fused decode+matmul kernel's internals.

WARNING (2026-08-17): running this against the axon relay twice WEDGED the
remote TPU worker (all subsequent jit calls hang until the worker recovers,
~10+ min) with no output produced — suspect one of the variant kernels
crashes the remote compile service. Do NOT run it while anything else needs
the chip; debug variant-by-variant with generous timeouts.

Ablates the in-kernel components to find what holds the kernel at ~65% of
HBM peak (the decode VPU work, the 8 small per-plane dots, or the DMA):

  prod    : the production kernel (ops/dequant_pallas.py) as-is
  nodec   : DMA + 8 dots, decode replaced by one convert (VPU-cost probe)
  onedot  : decode, then planes concatenated in VMEM and ONE big dot
  stream  : DMA floor — read word planes, trivial reduce, no decode/dot

    python tools/microbench_kernel.py [--N 4096 --K 4096] [--TN 512 ...]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quip_for_all_tpu.ops.dequant_pallas import _e8p_planes


def make_call(variant, N, K, TN, m):
    G = K // 8

    def kern_prod(x_ref, w_ref, o_ref):
        planes = _e8p_planes(w_ref[...])
        acc = None
        for i, v in enumerate(planes):
            xi = x_ref[:, i * G:(i + 1) * G]
            part = jax.lax.dot_general(
                xi, v.astype(xi.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[...] = acc.astype(jnp.bfloat16)

    def kern_nodec(x_ref, w_ref, o_ref):
        w = w_ref[...].astype(jnp.bfloat16)
        acc = None
        for i in range(8):
            xi = x_ref[:, i * G:(i + 1) * G]
            part = jax.lax.dot_general(
                xi, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[...] = acc.astype(jnp.bfloat16)

    def kern_onedot(x_ref, w_ref, o_ref):
        planes = _e8p_planes(w_ref[...])
        wcat = jnp.concatenate([v.astype(jnp.bfloat16) for v in planes],
                               axis=1)                    # (TN, 8G)
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], wcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def kern_stream(x_ref, w_ref, o_ref):
        s = jnp.sum(w_ref[...].astype(jnp.float32))
        o_ref[...] = (jnp.zeros((m, TN), jnp.float32) + s
                      + 0.0 * x_ref[0, 0].astype(jnp.float32)
                      ).astype(jnp.bfloat16)

    kernel = {"prod": kern_prod, "nodec": kern_nodec,
              "onedot": kern_onedot, "stream": kern_stream}[variant]

    def call(x, w):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((m, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, G), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, N), jnp.bfloat16),
        )(x, w)

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--TN", type=int, nargs="+", default=[512])
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--variants", nargs="+",
                    default=["prod", "nodec", "onedot", "stream"])
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--latency", type=float, default=0.032)
    args = ap.parse_args()

    N, K, m = args.N, args.K, args.m
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(0, 1 << 25, size=(N, K // 8),
                                 dtype=np.int64).astype(np.int32))
    x = jnp.asarray((rng.standard_normal((m, K)) * 0.1),
                    dtype=jnp.bfloat16)

    for TN in args.TN:
        for v in args.variants:
            try:
                call = make_call(v, N, K, TN, m)

                @jax.jit
                def run(x, w):
                    def body(_, xc):
                        out = call(xc, w)
                        return xc.at[:, :1].add(
                            1e-12 * out[:, :1].astype(jnp.bfloat16))
                    return jax.lax.fori_loop(0, args.iters, body, x)

                _ = np.asarray(run(x, w))
                t0 = time.time()
                _ = np.asarray(run(x, w))
                dt = (time.time() - t0 - args.latency) / args.iters
                bw = (N * (K // 8) * 4) / dt / 1e9
                print(f"TN={TN:5d} {v:7s}: {dt*1e6:8.1f} us "
                      f"plane_bw={bw:7.1f} GB/s", flush=True)
            except Exception as e:
                print(f"TN={TN:5d} {v:7s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
