"""Chained-dispatch kernel timing for the round-5 byte-cut layouts.

The 11:44 probes (tools/probe_u3_kernel.py) measured u3 at ~900-1060
us/call — but one pl.pallas_call per dispatch over the axon relay pays
~1.3 ms dispatch, so those numbers say nothing about kernel time. This
harness times the REAL fused path (ops.dequant_pallas.fused_quant_matmul
with random planes) inside a serial-feedback fori_loop — the same
protocol as tools/microbench_tn.py, whose nibble numbers correlated with
the whole-model result — so nibble / u3 / u3-halfdots / pb compare on
kernel time alone.

    python tools/microbench_u3.py --shapes 4096x4096,22016x4096

Appends to tools/R5_RESULTS.jsonl. One shape+layout per jit; the
persistent compile cache (.jax_cache) makes reruns cheap. u3 first
Mosaic compiles are ~230 s each (measured 11:49) — budget accordingly.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RESULTS = os.path.join(ROOT, "tools", "R5_RESULTS.jsonl")


def record(rec):
    line = json.dumps({**rec, "t": time.strftime("%H:%M:%S")})
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="4096x4096,22016x4096")
    ap.add_argument("--layouts", default="nibble,u3,u3hd")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from quip_for_all_tpu.codebooks import get_codebook
    from quip_for_all_tpu.ops import dequant_pallas as dp
    from quip_for_all_tpu.ops.qtensor import QuantizedTensor
    from quip_for_all_tpu.utils.random_quantized import random_plane_shapes

    rng = np.random.default_rng(0)

    def build(cb, layout, q_out, q_in):
        planes = {}
        for pname, shape in random_plane_shapes(cb, layout,
                                                q_out, q_in).items():
            key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
            planes[pname] = jax.lax.bitcast_convert_type(
                jax.random.bits(key, shape, jnp.uint32), jnp.int32)
        ors = (-1.0 if layout in ("u3", "nibble") and cb == "E8P12"
               else float(get_codebook(cb).opt_resid_scale))
        return QuantizedTensor(planes, cb, q_out, q_in, ors, layout=layout)

    for spec in args.shapes.split(","):
        q_out, q_in = (int(v) for v in spec.split("x"))
        for lay in args.layouts.split(","):
            env = {}
            if lay in ("u3", "u3hd"):
                env = {"QFA_E8P_U3": "1",
                       "QFA_U3_HALFDOTS": "1" if lay == "u3hd" else "0"}
                cb, layout = "E8P12", "u3"
            elif lay == "pb":
                env = {"QFA_RVQ_PB": "1"}
                cb, layout = "E8P12RVQ4B", "pb"
            elif lay == "rvq4b":
                cb, layout = "E8P12RVQ4B", "nibble"
            else:
                cb, layout = "E8P12", "nibble"
            for k, v in env.items():
                os.environ[k] = v
            tag = f"chain_{lay}_{q_out}x{q_in}_m{args.m}"
            try:
                qt = build(cb, layout, q_out, q_in)
                gb = sum(int(np.prod(p.shape)) for p in
                         qt.planes.values()) * 4 / 1e9
                m, iters = args.m, args.iters

                def body(i, xb, qt=qt, q_out=q_out, q_in=q_in):
                    o = dp.fused_quant_matmul(xb, qt) * 1e-3
                    o = (o[:, :q_in] if q_out >= q_in else
                         jnp.pad(o, ((0, 0), (0, q_in - q_out))))
                    return o.astype(jnp.bfloat16)

                runf = jax.jit(lambda xb: jax.lax.fori_loop(
                    0, iters, body, xb))
                x0 = jnp.zeros((m, q_in), jnp.bfloat16) + 0.01
                t0 = time.time()
                np.asarray(runf(x0))
                compile_s = time.time() - t0
                times = []
                for _ in range(5):
                    t0 = time.time()
                    np.asarray(runf(x0))
                    times.append((time.time() - t0) / iters)
                us = float(np.median(times)) * 1e6
                record({"tag": tag, "us_per_call": round(us, 2),
                        "gbps": round(gb / (us * 1e-6), 1),
                        "plane_gb": round(gb, 4),
                        "compile_s": round(compile_s, 1)})
            except Exception as e:  # noqa: BLE001
                record({"tag": tag,
                        "error": f"{type(e).__name__}: {e}"[-300:]})
            for k in env:
                os.environ.pop(k, None)


if __name__ == "__main__":
    main()
