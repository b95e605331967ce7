"""Find the fused-vs-dense crossover m for the prefill regime.

The reference switches GEMV-decode -> decompress+GEMM at m=32
(``codebook/e8p12.py:147``) because its CUDA decode amortizes over m.
On TPU the fused Pallas kernel streams 4 bits/weight while the dense
path writes + re-reads a bf16 W (≈5x the HBM traffic), so the
crossover should sit far higher. One process, one layer shape, both
impls at several m — prints µs per call.

    python tools/microbench_prefill.py [--n 4096] [--k 4096] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)   # q_out
    ap.add_argument("--k", type=int, default=4096)   # q_in
    ap.add_argument("--codebook", default="E8P12")
    ap.add_argument("--ms", type=int, nargs="*",
                    default=[8, 32, 128, 512, 2048])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("QFA_PALLAS_INTERPRET", "1")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quip_for_all_tpu.codebooks import get_codebook
    from quip_for_all_tpu.ops.qtensor import from_raw_idxs
    from quip_for_all_tpu.ops.quant_matmul import quant_matmul

    cb = get_codebook(args.codebook)
    rng = np.random.default_rng(0)
    idxs = rng.integers(0, 2 ** 16, size=(args.n, args.k // 8),
                        dtype=np.int64).astype(np.uint16)
    if args.codebook != "E8P12":
        raise SystemExit("E8P12 only (keep the probe minimal)")
    qt = from_raw_idxs(cb, idxs.astype(np.int32), args.n, args.k)

    # timing helper: loop inside one jit (relay roundtrip is ~32ms)
    def timed(impl, m):
        x = jnp.asarray(rng.standard_normal((m, args.k)), jnp.bfloat16)

        def many(x):
            def body(c, _):
                y = quant_matmul(c, qt, impl=impl)
                # feed output back (data dependence, same shape via slice)
                c = c * 0.999 + y[:, : args.k] * 1e-6
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=args.reps)
            return c
        assert args.n >= args.k, "feedback slice needs q_out >= q_in"
        f = jax.jit(many)
        r = f(x)
        _ = np.asarray(r)            # compile + warm
        times = []
        for _i in range(5):
            t0 = time.time()
            r = f(x)
            _ = np.asarray(r)
            times.append(time.time() - t0)
        dt = (float(np.median(times)) - 0.032) / args.reps
        return dt * 1e6

    print(f"# {args.codebook} {args.n}x{args.k}, reps={args.reps}")
    print(f"# {'m':>6} {'fused µs':>10} {'dense µs':>10}")
    for m in args.ms:
        tf = timed("pallas", m)
        td = timed("dequant", m)
        print(f"  {m:>6} {tf:>10.1f} {td:>10.1f}"
              f"   ({'fused' if tf < td else 'dense'} wins)")


if __name__ == "__main__":
    main()
