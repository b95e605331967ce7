"""First-hardware-contact probe for the u3 / pb Pallas kernels — ONE shape
per invocation, incremental prints, clean exit (round-2 lesson: never let a
new kernel's first Mosaic compile share a process with anything else).

    python tools/probe_u3_kernel.py --layout u3 [--halfdots] [--shape 4096x4096]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="u3", choices=["u3", "pb"])
    ap.add_argument("--halfdots", action="store_true")
    ap.add_argument("--shape", default="4096x4096")  # q_out x q_in
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()
    if args.halfdots:
        os.environ["QFA_U3_HALFDOTS"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    q_out, q_in = (int(x) for x in args.shape.split("x"))
    cb = "E8P12" if args.layout == "u3" else "E8P12RVQ4B"
    print(f"# probe {args.layout} {q_out}x{q_in} m={args.m} "
          f"halfdots={args.halfdots}", flush=True)

    from quip_for_all_tpu.codebooks import get_codebook
    from quip_for_all_tpu.ops.dequant_pallas import fused_quant_matmul
    from quip_for_all_tpu.ops.qtensor import QuantizedTensor
    from quip_for_all_tpu.utils.random_quantized import random_plane_shapes

    rng = np.random.default_rng(0)
    t0 = time.time()
    planes = {}
    for pname, shape in random_plane_shapes(cb, args.layout,
                                            q_out, q_in).items():
        key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
        planes[pname] = jax.lax.bitcast_convert_type(
            jax.random.bits(key, shape, jnp.uint32), jnp.int32)
    ors = -1.0 if args.layout == "u3" else float(
        get_codebook(cb).opt_resid_scale)
    qt = QuantizedTensor(planes, cb, q_out, q_in, ors, layout=args.layout)
    jax.block_until_ready(list(planes.values()))
    print(f"# planes built in {time.time()-t0:.1f}s", flush=True)

    x = jnp.asarray(rng.standard_normal((args.m, q_in)), jnp.bfloat16)
    t0 = time.time()
    out = fused_quant_matmul(x, qt)
    out_h = np.asarray(out)
    print(f"# first call (compile+run) {time.time()-t0:.1f}s "
          f"out={out_h.shape} finite={np.isfinite(out_h).all()}", flush=True)

    # correctness vs the XLA dense decode ON DEVICE (same chip, bf16 x)
    from quip_for_all_tpu.ops.dequant_xla import decode_weights
    W = decode_weights(qt, dtype=jnp.float32)
    ref = np.asarray(jnp.einsum("mk,nk->mn", x.astype(jnp.float32),
                                W[:, : q_in]))
    pad = np.asarray(out_h, np.float32)
    rel = np.abs(pad - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"# vs dense decode rel={rel:.2e}", flush=True)

    # serial-feedback timing (latency-style; relative use only)
    def chain(x0):
        def body(i, acc):
            y = fused_quant_matmul(acc, qt)
            return acc * 0 + y[:, : q_in] * 1e-6 + x0
        return jax.lax.fori_loop(0, args.iters, body, x0)
    if q_out >= q_in:
        t0 = time.time()
        r = jax.jit(chain)(x)
        _ = np.asarray(r)
        t_compile = time.time() - t0
        t0 = time.time()
        _ = np.asarray(jax.jit(chain)(x))
        dt = time.time() - t0
        us = dt / args.iters * 1e6
        gb = sum(p.nbytes for p in planes.values()) / 1e9
        print(json.dumps({
            "layout": args.layout, "shape": args.shape,
            "halfdots": args.halfdots,
            "us_per_call": round(us, 1),
            "gbps": round(gb / (us / 1e6), 1),
            "rel_err": float(rel),
            "compile_s": round(t_compile, 1)}), flush=True)
    else:
        print(json.dumps({"layout": args.layout, "shape": args.shape,
                          "rel_err": float(rel)}), flush=True)


if __name__ == "__main__":
    main()
