"""Isolated hardware probe: the bf16 lane-magic ("bfp") decode vs the
production int32 nibble kernel.

Background: the sw2/sw4 subword layouts died on hardware — Mosaic cannot
legalize `arith.shrui` on i16/i8 vectors (R4_RESULTS kern_split{2,4}
rows). bfp reaches the same goal (cut the per-word VPU decode work that
keeps the fused kernels at 72-76% of their DMA floor) using ONLY ops the
hardware supports:

  - plane stored as TWO half-height i32 arrays A/B; word A(t', g) packs
    nibbles q=0..3 of output-row PAIR (2t', 2t'+1) — one row per 16-bit
    half; B packs q=4..7
  - in-kernel: f = (w >> 4q) & 0x000F000F | 0x43004300 (three plain i32
    vector ops; bf16 0x4300 = 128.0, so each half becomes 128+nib EXACTLY)
  - pltpu.bitcast i32 (TN/2, Gp) -> bf16 (TN, Gp): Mosaic's sublane
    packing doubles rows, landing each half on its own output row — the
    dot consumes it directly, ZERO convert instructions
  - the +128 offset folds into the existing beta*rowsum(x) correction:
    out = alpha*acc + (beta - 128*alpha)*sum(x)

Per original word: ~11 int ops + 0 converts (vs 14 + 8 today), same
bytes, same x layout, same dot count.

Phase 1 discovers the bitcast sublane order (interleaved vs blocked,
lo-half-first vs hi) with a tiny pattern kernel; phase 2 value-checks and
serial-feedback-times the full decode kernel (see microbench_paired.py:
RELATIVE numbers only, ~50us fixed per-call overhead).

    python tools/microbench_bfp.py [--shapes 4096x4096,12288x4096]
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

ALPHA, BETA = 0.5, -2.75      # E8P affine


def record(rec):
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps({**rec, "t": time.strftime("%H:%M:%S")}) + "\n")


# ------------------------------------------------- phase 1: bitcast order

def discover_bitcast_order():
    """Return (interleaved, lo_first): how pltpu.bitcast i32->bf16 maps
    word sublane s's (lo16, hi16) onto output sublanes."""
    S, L = 8, 128

    def kernel(w_ref, o_ref):
        o_ref[...] = pltpu.bitcast(w_ref[...], jnp.bfloat16)

    # word s: lo16 = bf16 bits of float(2s), hi16 = bits of float(2s+1)
    vals = np.arange(2 * S, dtype=np.float32)
    bits = (vals[None, :].astype(np.float32).view(np.uint32) >> 16
            ).astype(np.uint32).reshape(1, 2 * S)     # bf16 bit patterns
    lo = bits[0, 0::2]
    hi = bits[0, 1::2]
    words = ((hi.astype(np.uint64) << 16) | lo.astype(np.uint64)
             ).astype(np.uint32).view(np.int32)
    w = np.broadcast_to(words[:, None], (S, L)).copy()
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((S, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * S, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * S, L), jnp.bfloat16),
        interpret=_INTERPRET,
    )(jnp.asarray(w))
    col = np.asarray(out)[:, 0].astype(np.float32)    # (2S,)
    seq = np.arange(2 * S, dtype=np.float32)
    if np.array_equal(col, seq):
        return True, True        # interleaved [lo(0),hi(0),lo(1),...]
    if np.array_equal(col, seq.reshape(S, 2)[:, ::-1].reshape(-1)):
        return True, False       # interleaved hi-first
    blocked_lo = np.concatenate([seq[0::2], seq[1::2]])
    if np.array_equal(col, blocked_lo):
        return False, True       # [all lo halves, then all hi halves]
    blocked_hi = np.concatenate([seq[1::2], seq[0::2]])
    if np.array_equal(col, blocked_hi):
        return False, False
    raise RuntimeError(f"unrecognized bitcast order: {col.tolist()}")


# ------------------------------------------------- phase 2: decode kernel

def pick_tn(q_out, Gp):
    for tn in (512, 256, 128):
        if q_out % tn == 0 and tn * 4 * 3 * Gp <= 6 * 1024 * 1024:
            return tn
    return 128


def pack_bfp(words, interleaved, lo_first):
    """(N, Gp) i32 nibble plane -> (A, B) each (N/2, Gp) i32.

    A word (t', g) must bitcast to bf16 rows r0/r1 = output rows
    2t'/2t'+1 at nibble q; with nibble q of output row t in word bits
    [4q, 4q+4) of the 16-bit half assigned to row t.
    """
    N, Gp = words.shape
    w = words.view(np.uint32).astype(np.uint64)
    nib = np.stack([(w >> (4 * i)) & 0xF for i in range(8)],
                   axis=0)                     # (8, N, Gp)

    def halfpack(qlo):
        # 16-bit half for output row t at nibble window qlo..qlo+3
        h = (nib[qlo] | (nib[qlo + 1] << 4) | (nib[qlo + 2] << 8)
             | (nib[qlo + 3] << 12))           # (N, Gp) uint64
        if interleaved:
            r0, r1 = h[0::2], h[1::2]          # rows 2t', 2t'+1
        else:
            half = N // 2
            r0, r1 = h[:half], h[half:]
        lo, hi = (r0, r1) if lo_first else (r1, r0)
        return ((hi << 16) | lo).astype(np.uint32).view(np.int32)

    return halfpack(0), halfpack(4)


def make_bfp_call(q_out, Gp, m, TN):
    TNH = TN // 2

    def kernel(x_ref, a_ref, b_ref, o_ref):
        x = x_ref[...]                                 # (m, 8Gp) bf16
        acc = None
        for qbase, w_ref in ((0, a_ref), (4, b_ref)):
            w = pltpu.bitcast(w_ref[...], jnp.int32)   # (TNH, Gp)
            for k in range(4):
                f = (w if k == 0
                     else jax.lax.shift_right_logical(w, 4 * k))
                f = (f & 0x000F000F) | 0x43004300
                v = pltpu.bitcast(f, jnp.bfloat16)     # (TN, Gp)
                q = qbase + k
                part = jax.lax.dot_general(
                    x[:, q * Gp:(q + 1) * Gp], v,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        out = acc * ALPHA + (BETA - 128.0 * ALPHA) * xs
        o_ref[...] = out.astype(jnp.bfloat16)

    def call(x_perm, pa, pb):
        return pl.pallas_call(
            kernel,
            grid=(q_out // TN,),
            in_specs=[
                pl.BlockSpec((m, 8 * Gp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TNH, Gp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TNH, Gp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, q_out), jnp.bfloat16),
            interpret=_INTERPRET,
        )(x_perm, pa, pb)

    return call


def make_base_call(q_out, Gp, m, TN):
    """The production int32 nibble body (f32 small-m variant shape)."""
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        w = pltpu.bitcast(w_ref[...], jnp.int32)
        acc = None
        for i in range(8):
            f = w & 0xF if i == 0 else (
                jax.lax.shift_right_logical(w, 4 * i) if i == 7
                else jax.lax.shift_right_logical(w, 4 * i) & 0xF)
            v = f.astype(jnp.float32)
            part = jax.lax.dot_general(
                x[:, i * Gp:(i + 1) * Gp], v, (((1,), (1,)), ((), ())),
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


def reference(x_nat, words, q_out, q_in):
    G = q_in // 8
    w = words[:, :G].view(np.uint32).astype(np.int64)
    nibs = np.stack([(w >> (4 * i)) & 0xF for i in range(8)], axis=-1)
    W = (nibs * ALPHA + BETA).reshape(q_out, q_in).astype(np.float64)
    return x_nat.astype(np.float64) @ W.T


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


def run_shape(N, K, m, iters, order):
    interleaved, lo_first = order
    rng = np.random.default_rng(0)
    G = K // 8
    Gp = -(-G // 128) * 128
    words = rng.integers(0, 1 << 32, size=(N, Gp),
                         dtype=np.uint64).astype(np.uint32).view(np.int32)
    x_nat = (rng.standard_normal((m, K)) / np.sqrt(K)).astype(np.float32)
    ref = reference(x_nat, words, N, K)
    TN = pick_tn(N, Gp)
    # grouped x layout: nibble i of group g <- x[8g + i] at lane i*Gp + g
    xg = x_nat.reshape(m, G, 8).transpose(0, 2, 1)
    xg = np.pad(xg, ((0, 0), (0, 0), (0, Gp - G))).reshape(m, 8 * Gp)
    xj = jnp.asarray(xg, jnp.bfloat16)

    pa, pb = pack_bfp(words, interleaved, lo_first)
    for name, call, args in (
            ("base", make_base_call(N, Gp, m, TN), (jnp.asarray(words),)),
            ("bfp", make_bfp_call(N, Gp, m, TN),
             (jnp.asarray(pa), jnp.asarray(pb)))):
        tag = f"kern_{name}_{N}x{K}_m{m}"
        try:
            out = np.asarray(call(xj, *args)).astype(np.float64)
            rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            ok = rel < 2e-2                   # bf16 x
            us, compile_s = time_call(call, args, m, N, Gp, iters)
            record({"tag": tag, "us_per_call": round(us, 2),
                    "rel_err": float(rel), "ok": bool(ok),
                    "compile_s": round(compile_s, 1)})
        except Exception as e:  # noqa: BLE001 — record and continue
            record({"tag": tag, "error": f"{type(e).__name__}: {e}"[-400:]})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4096x4096,12288x4096")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    try:
        order = discover_bitcast_order()
        record({"tag": "bfp_bitcast_order",
                "interleaved": order[0], "lo_first": order[1]})
    except Exception as e:  # noqa: BLE001
        record({"tag": "bfp_bitcast_order",
                "error": f"{type(e).__name__}: {e}"[-400:]})
        return
    for s in args.shapes.split(","):
        N, K = (int(v) for v in s.split("x"))
        run_shape(N, K, args.m, args.iters, order)


if __name__ == "__main__":
    main()
