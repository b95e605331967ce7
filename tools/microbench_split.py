"""Isolated A/B: subword-decode (QFA_SPLIT_DECODE) kernel vs the
production nibble kernel, standalone (planes converted host-side), before
plumbing the int8/int16 plane storage through the whole stack.

Motivation (r4 trace): fused kernels run at 72-76% of their DMA floor
because the per-word VPU decode (14 int ops + 8 converts) doesn't hide
under the plane stream. Bitcasting the plane to int16/int8 subwords cuts
the int ops to 6/2 per word and the dots to 4/2 — IF Mosaic supports
int8/int16 shifts, masks and converts at speed.

Serial-feedback fori_loop timing (see microbench_paired.py: measures
relative latency at equal shapes; absolute numbers carry ~50us fixed
per-call overhead). One TPU process at a time; clean exit. Appends JSON
lines to tools/R4_RESULTS.jsonl.

    python tools/microbench_split.py [--shapes 4096x4096,12288x4096]
"""
import argparse
import functools
import json
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

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "R4_RESULTS.jsonl")
_INTERPRET = os.environ.get("QFA_PALLAS_INTERPRET", "0") == "1"

ALPHA, BETA = 0.5, -2.75      # E8P affine


def pick_tn(q_out, Gp):
    for tn in (512, 256, 128):
        if q_out % tn == 0 and tn * 4 * 3 * Gp <= 6 * 1024 * 1024:
            return tn
    return 128


def make_call(P, q_out, Gp, m, TN):
    """P = 1 (int32 nibble loop, the production body), 2 (int16), 4
    (int8). Plane arg dtype/cols must match: int32 (q_out, Gp) /
    int16 (q_out, 2Gp) / int8 (q_out, 4Gp)."""
    nq = 8 // P
    shift_t = {1: jnp.int32, 2: jnp.int16, 4: jnp.int8}[P]

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        wb = w_ref[...]
        acc = None
        for q in range(nq):
            f = (wb if q == 0 else jax.lax.shift_right_logical(
                wb, jnp.asarray(4 * q, shift_t)))
            if q != nq - 1:
                f = f & jnp.asarray(0xF, shift_t)
            v = f.astype(jnp.float32)
            part = jax.lax.dot_general(
                x[:, q * P * Gp:(q + 1) * P * Gp], v,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        out = acc * ALPHA + BETA * jnp.sum(x, axis=1, keepdims=True)
        o_ref[...] = out.astype(jnp.bfloat16)

    def call(x_perm, plane):
        return pl.pallas_call(
            kernel,
            grid=(q_out // TN,),
            in_specs=[
                pl.BlockSpec((m, 8 * Gp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, P * Gp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, q_out), jnp.bfloat16),
            interpret=_INTERPRET,
        )(x_perm, plane)

    return call


def reference(x_nat, words, q_out, q_in):
    G = q_in // 8
    w = words[:, :G].view(np.uint32).astype(np.int64)
    nibs = np.stack([(w >> (4 * i)) & 0xF for i in range(8)],
                    axis=-1)                    # (q_out, G, 8)
    W = (nibs * ALPHA + BETA).reshape(q_out, q_in).astype(np.float32)
    # natural weight index: 8g + i
    return x_nat @ W.T


def x_layout(x_nat, P, G, Gp):
    """natural -> kernel lane layout for split P (x[8g + nq*j + q] at
    lane q*(P*Gp) + g*P + j)."""
    m = x_nat.shape[0]
    nq = 8 // P
    xg = x_nat.reshape(m, G, P, nq).transpose(0, 3, 1, 2)  # (m,nq,G,P)
    xg = np.pad(xg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    return xg.reshape(m, 8 * Gp)


def run_shape(N, K, m, iters):
    rng = np.random.default_rng(0)
    G = K // 8
    Gp = -(-G // 128) * 128
    words = rng.integers(0, 1 << 32, size=(N, Gp),
                         dtype=np.uint64).astype(np.uint32).view(np.int32)
    x_nat = (rng.standard_normal((m, K)) / np.sqrt(K)).astype(np.float32)
    ref = reference(x_nat, words, N, K)
    TN = pick_tn(N, Gp)
    planes = {
        1: jnp.asarray(words),
        2: jnp.asarray(words.view(np.int16)),      # (N, 2Gp)
        4: jnp.asarray(words.view(np.int8)),       # (N, 4Gp)
    }
    for P in (1, 2, 4):
        tag = f"split{P}_{N}x{K}_m{m}"
        try:
            call = make_call(P, N, Gp, m, TN)
            xp = jnp.asarray(x_layout(x_nat, P, G, Gp), jnp.bfloat16)
            out = np.asarray(call(xp, planes[P])).astype(np.float32)
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            ok = rel < 2e-2       # bf16 x
            # serial feedback timing
            scale = 1.0 / (6.0 * np.sqrt(K))

            def body(i, xb):
                o = call(xb, planes[P]) * scale
                o = (o[:, : 8 * Gp] if N >= 8 * Gp else
                     jnp.pad(o, ((0, 0), (0, 8 * Gp - N))))
                return o.astype(jnp.bfloat16)

            runf = jax.jit(lambda xb: jax.lax.fori_loop(0, iters, body, xb))
            t0 = time.time()
            np.asarray(runf(xp))
            compile_s = time.time() - t0
            times = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(runf(xp))
                times.append((time.time() - t0) / iters)
            us = float(np.median(times)) * 1e6
            rec = {"tag": f"kern_{tag}", "us_per_call": round(us, 2),
                   "rel_err": float(rel), "ok": bool(ok),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"tag": f"kern_{tag}",
                   "error": f"{type(e).__name__}: {e}"[-400:]}
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps({**rec, "t": time.strftime("%H:%M:%S")})
                    + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4096x4096")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    for s in args.shapes.split(","):
        N, K = (int(v) for v in s.split("x"))
        run_shape(N, K, args.m, args.iters)


if __name__ == "__main__":
    main()
