"""Measure axon-relay primitive costs: per-op dispatch, host->device
transfer, device->host fetch, tiny-compile, and persistent-cache viability.
One short clean-exiting run; informs the bench.py build-time restructure.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.environ.get("QFA_JAX_CACHE", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        cache_ok = True
    except Exception as e:  # noqa: BLE001
        print(f"cache config failed: {e}")
        cache_ok = False
    out = {"cache_config_ok": cache_ok}
    def rec(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    t0 = time.time()
    d = jax.devices()
    rec("devices_s", round(time.time() - t0, 3))
    out["device"] = str(d[0])

    # first tiny compile+run
    t0 = time.time()
    x = jnp.ones((8, 128), jnp.float32)
    _ = np.asarray(x + 1)
    rec("first_tiny_op_s", round(time.time() - t0, 3))

    # per-op enqueue cost: 50 dependent tiny ops then one fetch
    y = x
    t0 = time.time()
    for _ in range(50):
        y = y + 1
    _ = np.asarray(y)
    rec("chain50_s", round(time.time() - t0, 3))

    # distinct-shape tiny compiles (are compiles the build bottleneck?)
    t0 = time.time()
    for i in range(5):
        z = jnp.ones((8, 128 + 8 * (i + 1)), jnp.float32)
        _ = np.asarray(z * 2)
    rec("five_fresh_shapes_s", round(time.time() - t0, 3))

    # host->device transfers: 30 x 16KB
    t0 = time.time()
    hs = [np.random.randn(4096).astype(np.float32) for _ in range(30)]
    ds = [jnp.asarray(h) for h in hs]
    for a in ds:
        a.block_until_ready()
    rec("h2d_30x16k_s", round(time.time() - t0, 3))

    # one big host->device transfer: 64MB
    t0 = time.time()
    big = np.random.randint(0, 2**31, size=(4096, 4096),
                            dtype=np.int32)
    bd = jnp.asarray(big)
    bd.block_until_ready()
    rec("h2d_64mb_s", round(time.time() - t0, 3))

    # device->host scalar fetch x10 (the sharable() pattern)
    t0 = time.time()
    for a in ds[:10]:
        _ = np.asarray(a)
    rec("d2h_10x16k_s", round(time.time() - t0, 3))

    # rand_words-like sequence (one plane tensor)
    t0 = time.time()
    key = jax.random.PRNGKey(7)
    r = jax.random.bits(key, (4096, 512), jnp.uint32)
    w = jax.lax.bitcast_convert_type(r & jnp.uint32(0x6DB6DB), jnp.int32)
    w.block_until_ready()
    rec("one_plane_gen_s", round(time.time() - t0, 3))
    # second identical (compile cached in-process)
    t0 = time.time()
    key = jax.random.PRNGKey(8)
    r = jax.random.bits(key, (4096, 512), jnp.uint32)
    w = jax.lax.bitcast_convert_type(r & jnp.uint32(0x6DB6DB), jnp.int32)
    w.block_until_ready()
    rec("one_plane_gen_warm_s", round(time.time() - t0, 3))

    # a jit compile of a medium fused program, to check the persistent cache
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 16)
        return [jax.lax.bitcast_convert_type(
            jax.random.bits(k, (1024, 512), jnp.uint32) & jnp.uint32(0xF0F),
            jnp.int32) for k in ks]

    t0 = time.time()
    res = gen(jax.random.PRNGKey(0))
    res[0].block_until_ready()
    rec("jit16_compile_run_s", round(time.time() - t0, 3))
    ncache = 0
    if os.path.isdir(CACHE_DIR):
        ncache = len(os.listdir(CACHE_DIR))
    out["cache_entries_after"] = ncache
    print(json.dumps(out))


if __name__ == "__main__":
    main()
