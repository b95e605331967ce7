"""Isolated fused-kernel timing: nibble vs paired RVQ4B on one square
layer. A lax.fori_loop feeds the (m, N) output back as the next input so
per-call relay dispatch amortizes away and XLA can't CSE the calls.

    python tools/microbench_paired.py [--N 4096] [--m 8] [--iters 64]

One TPU process at a time; clean exit. Appends JSON lines to
tools/R3_RESULTS.jsonl.
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

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.ops.dequant_pallas import fused_quant_matmul
from quip_for_all_tpu.utils.random_quantized import _random_qtensor

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "R3_RESULTS.jsonl")


def time_variant(tag, qt, m, iters, scale):
    def body(i, x):
        out = fused_quant_matmul(x, qt)
        out = (out * scale).astype(jnp.bfloat16)
        if qt.q_out == qt.q_in:
            return out
        if qt.q_out > qt.q_in:                   # keep the feedback square
            return out[:, : qt.q_in]
        return jnp.pad(out, ((0, 0), (0, qt.q_in - qt.q_out)))

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, body, x)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (m, qt.q_in)), jnp.bfloat16)
    t0 = time.time()
    out = np.asarray(run(x))
    print(f"# {tag}: compile+first {time.time()-t0:.1f}s "
          f"(|out| {float(np.abs(out.astype(np.float32)).max()):.3f})",
          file=sys.stderr)
    times = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(run(x))
        times.append((time.time() - t0) / iters)
    us = float(np.median(times)) * 1e6
    rec = {"tag": f"kern_{tag}", "us_per_call": round(us, 2),
           "m": m, "N": qt.q_out, "K": qt.q_in}
    print(json.dumps(rec))
    with open(RESULTS, "a") as f:
        f.write(json.dumps({**rec, "t": time.strftime("%H:%M:%S")}) + "\n")
    return us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4096)
    ap.add_argument("--K", type=int, default=0, help="q_in (default N)")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--layouts", default="nibble,paired")
    ap.add_argument("--codebook", default="E8P12RVQ4B")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    cb = get_codebook(args.codebook)
    # keep |x| bounded through the feedback loop
    scale = 1.0 / (6.0 * np.sqrt(args.N))
    K = args.K or args.N
    for layout in args.layouts.split(","):
        os.environ["QFA_RVQ_PAIRED"] = "1" if layout == "paired" else "0"
        qt = _random_qtensor(cb, args.N, K, rng)
        assert qt.layout == layout or args.codebook != "E8P12RVQ4B"
        time_variant(f"{args.codebook}_{layout}_{args.N}x{K}_m{args.m}",
                     qt, args.m, args.iters, scale)


if __name__ == "__main__":
    main()
