"""Microbenchmark: E8P decode strategies inside a Pallas fused matvec.

Hardware facts this encodes (measured on TPU v5e via the axon relay):
  - Mosaic supports only 2D gathers: use jnp.take_along_axis with a 2D
    operand. Lane-axis gather (axis=1, operand (rows, 256)) vs sublane-axis
    gather (axis=0, operand (256, cols)) are both tried here.
  - Per-call dispatch over the relay costs ~ms, so all timing loops run
    INSIDE one jit via lax.fori_loop with a data dependence between
    iterations.

Strategies:
  lane   : per-position f32 table broadcast to (TN, 256), gather axis=1
  sub    : per-position f32 table broadcast to (256, G), gather axis=0
  lane_b : two int32 word tables (lane gather) + byte extraction
  stream : lower bound — just stream the code tile and reduce (HBM floor)
  dense  : bf16 dense matvec of the same logical weights (fp16-model floor)

Usage: python tools/microbench_decode.py [--N 4096] [--iters 32]
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

from quip_for_all_tpu.codebooks import e8p12

_SHUF = (0, 2, 1, 3, 4, 6, 5, 7)


def tables_np():
    cols = (e8p12.abs_grid_bytes().astype(np.float32) / 4.0)  # (256, 8)
    byts = e8p12.abs_grid_bytes().astype(np.int64)
    lo = np.zeros(256, np.int64)
    hi = np.zeros(256, np.int64)
    for j in range(4):
        lo |= (byts[:, j] & 0xFF) << (8 * j)
        hi |= (byts[:, j + 4] & 0xFF) << (8 * j)
    return (cols, lo.astype(np.uint32).view(np.int32),
            hi.astype(np.uint32).view(np.int32))


def _common(c):
    signs = c & 0xFF
    abs_idx = c >> 8
    p = signs ^ (signs >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    parity = p & 1
    signs = signs ^ parity
    offs = jnp.where(parity == 1, -0.25, 0.25).astype(jnp.float32)
    return signs, abs_idx, offs


def _lane_gather(row_ref_slice, idx, TN, G):
    """256-entry table lookup built from Mosaic's only fast gather form:
    take_along_axis(op, idx, axis=1) with op/idx/out all (TN, 128) — the
    hardware dynamic_gather is single-vreg-width (operands wider than 128
    lanes crash the compiler). Table split into lo/hi 128-lane rows, chunked
    over G lanes, hi/lo resolved by select."""
    lo = jnp.broadcast_to(row_ref_slice[:, :128], (TN, 128))
    hi = jnp.broadcast_to(row_ref_slice[:, 128:256], (TN, 128))
    chunks = []
    for c in range(0, G, 128):
        ic = idx[:, c:c + 128]
        i7 = ic & 127
        vlo = jnp.take_along_axis(lo, i7, axis=1)
        vhi = jnp.take_along_axis(hi, i7, axis=1)
        chunks.append(jnp.where(ic < 128, vlo, vhi))
    return jnp.concatenate(chunks, axis=1)


def planes_lane(c, tbl_ref):
    """tbl_ref: (8, L) f32, L = max(G, 256); lane-axis gathers."""
    signs, abs_idx, offs = _common(c)
    TN, G = c.shape
    out = []
    for i in range(8):
        ii = _SHUF[i]
        v = _lane_gather(tbl_ref[ii:ii + 1, :], abs_idx, TN, G)
        bit = (signs >> (7 - ii)) & 1
        v = jnp.where(bit == 1, -v, v)
        out.append(v + offs)
    return out


def planes_lane_b(c, lohi_ref):
    """lohi_ref: (2, L) int32; 2 lane gathers + byte extract."""
    signs, abs_idx, offs = _common(c)
    TN, G = c.shape
    lo = _lane_gather(lohi_ref[0:1, :], abs_idx, TN, G)
    hi = _lane_gather(lohi_ref[1:2, :], abs_idx, TN, G)
    out = []
    for i in range(8):
        ii = _SHUF[i]
        word = lo if ii < 4 else hi
        b = (word >> (8 * (ii % 4))) & 0xFF
        b = jnp.where(b >= 128, b - 256, b)
        v = b.astype(jnp.float32) * 0.25
        bit = (signs >> (7 - ii)) & 1
        v = jnp.where(bit == 1, -v, v)
        out.append(v + offs)
    return out


def make_run(strategy, N, K, TN, m, iters, interpret=False):
    G = K // 8
    cols, lo, hi = tables_np()

    def accum(x_ref, planes, out_ref):
        acc = None
        for j, w in enumerate(planes):
            xj = x_ref[:, j * G:(j + 1) * G]
            part = jax.lax.dot_general(
                xj, w.astype(xj.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        out_ref[...] = acc.astype(out_ref.dtype)

    if strategy == "dense":
        def kernel(x_ref, w_ref, out_ref):
            out_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)
        specs = [pl.BlockSpec((m, K), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((TN, K), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
        tbs = []
    elif strategy == "stream":
        def kernel(x_ref, idx_ref, out_ref):
            s = jnp.sum(idx_ref[...].astype(jnp.float32))
            out_ref[...] = (jnp.zeros((m, TN), jnp.float32) + s
                            + 0.0 * x_ref[0, 0]).astype(out_ref.dtype)
        specs = [pl.BlockSpec((m, K), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((TN, G), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
        tbs = []
    else:
        if strategy == "lane":
            tbs = [jnp.asarray(cols.T.copy())]           # (8, 256)
            planes_fn = planes_lane
        else:
            tbs = [jnp.asarray(np.stack([lo, hi]))]      # (2, 256)
            planes_fn = planes_lane_b

        def kernel(x_ref, idx_ref, tbl_ref, out_ref):
            c = idx_ref[...].astype(jnp.int32) & 0xFFFF
            planes = planes_fn(c, tbl_ref)
            accum(x_ref, planes, out_ref)
        specs = [pl.BlockSpec((m, K), lambda i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((TN, G), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.VMEM)]

    def call(x, w):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=specs,
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
            interpret=interpret,
        )(x, w, *tbs)

    @jax.jit
    def run(x, w):
        def body(_, carry):
            x = carry
            out = call(x, w)
            # data dependence across iterations (defeats hoisting)
            nk = min(N, K)
            return x.at[:, :nk].add(1e-12 * out[:, :nk])
        return jax.lax.fori_loop(0, iters, body, x)

    def single(x, w):
        return call(x, w)

    return run, jax.jit(single)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--TN", type=int, default=256)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--strategies", nargs="+",
                    default=["lane", "lane_b", "stream", "dense"])
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--latency", type=float, default=0.032,
                    help="relay roundtrip to subtract from totals")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    N, K, m = args.N, args.K, args.m
    rng = np.random.default_rng(0)
    idx16 = rng.integers(0, 1 << 16, size=(N, K // 8),
                         dtype=np.uint16).view(np.int16)
    x = (rng.standard_normal((m, K)) * 0.1).astype(np.float32)

    full = e8p12.full_grid()
    w_dec = full[idx16.view(np.uint16).astype(np.int32)]  # (N, G, 8)
    G = K // 8
    # grouped permutation: plane j holds position j; x_perm[jG+g] = x[8g+j]
    w_perm = w_dec.transpose(0, 2, 1).reshape(N, K)
    x_perm = x.reshape(m, G, 8).transpose(0, 2, 1).reshape(m, K)
    out_ref = x_perm @ w_perm.T

    w_bf16 = jnp.asarray(w_perm, dtype=jnp.bfloat16)

    for s in args.strategies:
        try:
            run, single = make_run(s, N, K, args.TN, m, args.iters,
                                   args.interpret)
            arg = w_bf16 if s == "dense" else jnp.asarray(idx16)
            xj = jnp.asarray(x_perm)
            out = np.asarray(single(xj, arg))
            if s in ("lane", "sub", "lane_b"):
                err = (np.abs(out - out_ref).max()
                       / (np.abs(out_ref).max() + 1e-9))
            else:
                err = float("nan")
            # warm
            _ = np.asarray(run(xj, arg))
            t0 = time.time()
            _ = np.asarray(run(xj, arg))
            dt = (time.time() - t0 - args.latency) / args.iters
            idx_bytes = N * K // 4 if s != "dense" else N * K * 2
            bw = idx_bytes / dt / 1e9
            print(f"{s:7s}: {dt*1e6:9.1f} us/layer  rel_err={err:.2e} "
                  f"  eff_read_bw={bw:7.1f} GB/s")
        except Exception as e:
            print(f"{s:7s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
