"""Hardware probe: output-tile (TN) sweep + pure-DMA reference kernel.

Round-4 state: bfp (zero-convert decode), ksplit (prologue chunking),
magic, and paired (~19% fewer bytes) ALL failed to move the whole-model
number, eliminating VPU decode work as the bottleneck — the fused kernels
sit at 72-76% of the SPEC DMA floor (819GB/s) for some other reason. Two
remaining suspects this probe separates:

  1. achievable-vs-spec HBM bandwidth for this access pattern — measured
     by a decode-free kernel that streams the same plane blocks and issues
     ONE dot per grid step (`dma` rows = the true floor for any design);
  2. per-grid-step cost (block descriptor setup, DMA issue, dot issue) —
     measured by sweeping TN in {256, 512, 1024, 2048}: doubling TN
     halves the step count at identical total bytes. r3 only ever tried
     SMALLER tiles (TN=256: worse).

The gate/up shape (22016 = 2^9 * 43) only divides by TN<=512, so the
sweep also runs a 22528-row PADDED variant (44 * 512) prototyping a
pad-to-big-tile load-time change (+2.3% bytes for 4x fewer steps).

Serial-feedback fori_loop timing (relative numbers only; ~50us fixed
per-call overhead hides in-model). One TPU process; appends to
tools/R4_RESULTS.jsonl.

    python tools/microbench_tn.py
"""
import argparse
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

ALPHA, BETA = 0.5, -2.75


def record(rec):
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps({**rec, "t": time.strftime("%H:%M:%S")}) + "\n")


def make_nibble_call(q_out, Gp, m, TN):
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        w = pltpu.bitcast(w_ref[...], jnp.int32)
        acc = None
        for i in range(8):
            f = w & 0xF if i == 0 else (
                jax.lax.shift_right_logical(w, 4 * i) if i == 7
                else jax.lax.shift_right_logical(w, 4 * i) & 0xF)
            part = jax.lax.dot_general(
                x[:, i * Gp:(i + 1) * Gp], f.astype(jnp.float32),
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
                pl.BlockSpec((TN, Gp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, q_out), jnp.bfloat16),
            interpret=_INTERPRET,
        )(x_perm, plane)

    return call


def make_dma_call(q_out, Gp, m, TN):
    """Decode-free floor: stream the same blocks, ONE dot per step."""
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        w = pltpu.bitcast(w_ref[...], jnp.int32)
        o_ref[...] = jax.lax.dot_general(
            x[:, :Gp], (w & 0xF).astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def call(x_perm, plane):
        return pl.pallas_call(
            kernel,
            grid=(q_out // TN,),
            in_specs=[
                pl.BlockSpec((m, 8 * Gp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, Gp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, q_out), jnp.bfloat16),
            interpret=_INTERPRET,
        )(x_perm, plane)

    return call


def time_call(call, args, m, q_out, Gp, iters):
    scale = 1.0 / (6.0 * np.sqrt(8 * Gp))

    def body(i, xb):
        o = call(xb, *args) * scale
        o = (o[:, :8 * Gp] if q_out >= 8 * Gp else
             jnp.pad(o, ((0, 0), (0, 8 * Gp - q_out))))
        return o.astype(jnp.bfloat16)

    runf = jax.jit(lambda xb: jax.lax.fori_loop(
        0, iters, body, jnp.zeros((m, 8 * Gp), jnp.bfloat16) + 0.01))
    t0 = time.time()
    np.asarray(runf(jnp.zeros((m, 8 * Gp), jnp.bfloat16)))
    compile_s = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(runf(jnp.zeros((m, 8 * Gp), jnp.bfloat16)))
        times.append((time.time() - t0) / iters)
    return float(np.median(times)) * 1e6, compile_s


def run_shape(N, K, m, iters):
    rng = np.random.default_rng(0)
    G = K // 8
    Gp = -(-G // 128) * 128
    words = rng.integers(0, 1 << 32, size=(N, Gp),
                         dtype=np.uint64).astype(np.uint32).view(np.int32)
    plane = jnp.asarray(words)
    xj = jnp.zeros((m, 8 * Gp), jnp.bfloat16) + 0.01
    gb = N * Gp * 4 / 1e9
    for TN in (256, 512, 1024, 2048):
        if N % TN != 0:
            continue
        for name, mk in (("dma", make_dma_call), ("nib", make_nibble_call)):
            tag = f"kern_tn{TN}_{name}_{N}x{K}_m{m}"
            try:
                call = mk(N, Gp, m, TN)
                us, compile_s = time_call(call, (plane,), m, N, Gp, iters)
                record({"tag": tag, "us_per_call": round(us, 2),
                        "gbps": round(gb / (us * 1e-6), 1),
                        "compile_s": round(compile_s, 1)})
            except Exception as e:  # noqa: BLE001
                record({"tag": tag,
                        "error": f"{type(e).__name__}: {e}"[-300:]})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="12288x4096,22528x4096,4096x11264")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    for s in args.shapes.split(","):
        N, K = (int(v) for v in s.split("x"))
        run_shape(N, K, args.m, args.iters)


if __name__ == "__main__":
    main()
