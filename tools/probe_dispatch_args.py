"""Does per-dispatch overhead scale with the ARGUMENT COUNT over the
axon relay? Serving chunk=8 sits at ~80 ms/chunk where compute is ~56 ms
(tools/R5_RESULTS.jsonl 13:30), and the decode program carries ~600 param
leaves — if marshaling is ~0.05 ms/arg, that is the missing ~30 ms and a
stacked-params decode (20 args) would reclaim it. This probe dispatches
the SAME trivial compute as (a) 640 small arrays, (b) 8 arrays, (c) 640
arrays donated, and times enqueue-only (no fetch) and enqueue+fetch.

    python tools/probe_dispatch_args.py
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def run_case(tag, n_args, iters=24):
        xs = [jnp.full((8, 128), float(i), jnp.float32)
              for i in range(n_args)]

        @jax.jit
        def f(*a):
            s = a[0]
            for v in a[1:]:
                s = s + v
            return s * 0.5

        t0 = time.time()
        r = np.asarray(f(*xs))
        print(f"# {tag}: compile+first {time.time()-t0:.1f}s", flush=True)
        # enqueue-only loop: dispatch iters times, fetch once at the end
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = f(*xs)
        _ = np.asarray(out)
        enq = (time.time() - t0) / iters * 1e3
        # enqueue+fetch per iteration
        t0 = time.time()
        for _ in range(iters):
            _ = np.asarray(f(*xs))
        sync = (time.time() - t0) / iters * 1e3
        print(json.dumps({"tag": tag, "n_args": n_args,
                          "enqueue_ms": round(enq, 2),
                          "sync_ms": round(sync, 2)}), flush=True)

    run_case("args640", 640)
    run_case("args8", 8)
    run_case("args640b", 640)   # repeat: warm-order control
    print("rc=0", flush=True)


if __name__ == "__main__":
    main()
