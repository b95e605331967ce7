"""Headline benchmark: bs=1 decode throughput, Llama-2-7B E8P12 2-bit.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N/138}

Baseline: the reference's ~138 tokens/s (Llama-2-7B 2-bit, bs=1, RTX 4090,
static cache + torch.compile; /root/reference/README.md:73, BASELINE.md).

Runs on whatever backend is active (the real TPU chip under the driver;
pass --cpu --small for a smoke run). Weights are random codes — identical
compute/memory behavior to a real checkpoint (zero-egress environment).

Resilience: the TPU chip is reached through a relay that can be
transiently unavailable or wedged. A top-level supervisor therefore runs
the actual measurement in a fresh subprocess per attempt (JAX caches a
failed backend init for the life of the process, so in-process retry is
useless), waits for the relay listener with backoff between attempts, and
exits nonzero only after the whole retry budget is exhausted — emitting a
diagnostics JSON line in that case. `--cpu` runs skip the supervisor.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_TOKENS_PER_SEC = 138.0  # reference README.md:73

# Loopback ports the TPU relay daemon listens on (first of them is enough
# to establish liveness; see /root/.tpu_init.py PORTS).
RELAY_PORTS = (8082, 8083, 8087)

# Substrings that mark a transient backend/relay failure worth retrying.
TRANSIENT_MARKERS = (
    "Unable to initialize backend",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection refused",
    "Connection reset",
    "Socket closed",
    "failed to connect",
    "Broken pipe",
)


def _relay_listening() -> bool:
    """True if the TPU relay daemon has a listener on any known port.

    Pure loopback TCP connect — never touches the TPU claim protocol, so
    it is always safe to poll (unlike jax.devices() probes, which can
    leave half-open claims if they hang and get killed).
    """
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def _classify(output: str) -> str:
    for marker in TRANSIENT_MARKERS:
        if marker in output:
            return f"transient: {marker}"
    return "nontransient"


def supervise(argv) -> int:
    """Retry-with-backoff wrapper around one measurement subprocess.

    Never returns nonzero while retry budget (attempts AND wall-clock)
    remains. On success, re-prints the child's JSON result line on stdout.
    On final failure, prints a diagnostics JSON line and returns 1.
    """
    max_attempts = int(os.environ.get("QFA_BENCH_MAX_ATTEMPTS", "8"))
    budget_s = float(os.environ.get("QFA_BENCH_BUDGET_S", "4200"))
    attempt_timeout_s = float(
        os.environ.get("QFA_BENCH_ATTEMPT_TIMEOUT_S", "1200"))
    relay_wait_s = float(os.environ.get("QFA_BENCH_RELAY_WAIT_S", "900"))
    relay_poll_s = float(os.environ.get("QFA_BENCH_RELAY_POLL_S", "20"))
    # escalating sleeps between failed attempts (relay wedge recovery is
    # typically 10-30 min of zero contact)
    backoffs = [float(x) for x in os.environ.get(
        "QFA_BENCH_BACKOFF_S", "60,120,240,480,600,600,600").split(",")]
    child_cmd = os.environ.get("QFA_BENCH_CHILD_CMD")  # test hook

    start = time.time()

    def remaining():
        return budget_s - (time.time() - start)

    errors = []
    for attempt in range(1, max_attempts + 1):
        if remaining() <= 0:
            break
        # Wait for the relay daemon to be up (cheap loopback probe). If it
        # never shows, still burn one real attempt near the end of the
        # budget in case the relay design changed under us.
        if child_cmd is None and not _relay_listening():
            waited = 0.0
            cap = min(relay_wait_s, max(0.0, remaining() - 120.0))
            while waited < cap and not _relay_listening():
                time.sleep(relay_poll_s)
                waited += relay_poll_s
            if not _relay_listening():
                print(f"# attempt {attempt}: relay not listening after "
                      f"{waited:.0f}s wait", file=sys.stderr)
                errors.append("relay not listening")
                if remaining() > 300 and attempt < max_attempts:
                    continue
                # fall through: attempt anyway as a last resort
        if child_cmd is not None:
            cmd = [child_cmd]
        else:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--_child"] + argv
            # probe bit-exact kernel variants by default on the real
            # chip (token-equality-gated; base result always kept);
            # disable with QFA_BENCH_AUTO_VARIANT=0
            if ("--auto-variant" not in argv and "--prefill" not in
                    " ".join(argv) and os.environ.get(
                        "QFA_BENCH_AUTO_VARIANT", "1") == "1"):
                cmd.append("--auto-variant")
        print(f"# bench attempt {attempt}/{max_attempts} "
              f"({remaining():.0f}s budget left)", file=sys.stderr)
        timed_out = False
        try:
            # serialize against any other TPU process on this host (the
            # chip wedges under concurrency; utils/chiplock.py) — queuing
            # here costs budget like a relay wait, which is what it is
            from quip_for_all_tpu.utils.chiplock import (ChipLockTimeout,
                                                         chip_lock)
            with chip_lock(timeout_s=max(60.0, min(900.0,
                                                   remaining() - 180.0))):
                proc = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=min(attempt_timeout_s, max(120.0, remaining())))
            out, err, rc = proc.stdout, proc.stderr, proc.returncode
        except ChipLockTimeout:
            errors.append("chip lock held by another TPU process")
            print("# chip lock busy — treating as transient",
                  file=sys.stderr)
            continue
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(
                e.stderr, bytes) else (e.stderr or "")
            rc, timed_out = -1, True
        # re-emit child stderr (progress lines, tracebacks) for the log
        if err:
            sys.stderr.write(err if len(err) < 8000 else
                             err[:2000] + "\n...[truncated]...\n" + err[-6000:])
        def last_result(text):
            for line in reversed(text.strip().splitlines()):
                try:
                    parsed = json.loads(line)
                except (json.JSONDecodeError, ValueError):
                    continue
                if isinstance(parsed, dict) and "metric" in parsed \
                        and parsed.get("value") is not None:
                    return line
            return None

        if rc == 0:
            line = last_result(out)
            if line is not None:
                print(line)
                return 0
            errors.append("rc=0 but no JSON result line")
        elif (line := last_result(out)) is not None:
            # the child died mid-probe but the base measurement landed:
            # salvage it rather than losing the round's number
            print("# child failed after a provisional result — using it",
                  file=sys.stderr)
            print(line)
            return 0
        elif timed_out:
            # a killed TPU client can wedge the relay for 10-30 min: take
            # a long mandatory rest before touching the chip again
            errors.append(f"attempt timed out after {attempt_timeout_s:.0f}s "
                          "(possible relay wedge)")
            print("# attempt timed out — resting 900s before any further "
                  "TPU contact (wedge recovery)", file=sys.stderr)
            if remaining() > 960 and attempt < max_attempts:
                time.sleep(900)
            continue
        else:
            kind = _classify(out + err)
            tail = (out + err).strip().splitlines()
            errors.append(f"rc={rc} {kind}: {tail[-1][:200] if tail else ''}")
        if attempt < max_attempts and remaining() > 0:
            delay = backoffs[min(attempt - 1, len(backoffs) - 1)]
            delay = min(delay, max(0.0, remaining() - 60.0))
            if delay > 0:
                print(f"# backing off {delay:.0f}s before retry",
                      file=sys.stderr)
                time.sleep(delay)

    print(json.dumps({
        "metric": "decode_tokens_per_sec_llama2_7b_e8p12_bs1",
        "value": None,
        "unit": "tokens/s",
        "error": "all bench attempts failed",
        "attempts": len(errors),
        "attempt_errors": errors[-8:],
        "elapsed_s": round(time.time() - start, 1),
    }))
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--_child", action="store_true",
                    help=argparse.SUPPRESS)  # internal: run measurement
    ap.add_argument("--no-retry", action="store_true",
                    help="run the measurement in-process (no supervisor)")
    ap.add_argument("--codebook", default="E8P12")
    ap.add_argument("--model", default="llama2_7b",
                    choices=["llama2_7b", "mixtral"],
                    help="mixtral = 8x7B shapes at 16 layers (the 32-layer "
                    "nibble-format model exceeds one chip's 16GB HBM; "
                    "north-star #4 runs expert-sharded on a mesh)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--cache-len", type=int, default=2048)
    ap.add_argument("--small", action="store_true",
                    help="tiny model smoke-run")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prefill", type=int, default=0, metavar="S",
                    help="measure prefill throughput over an S-token "
                    "prompt instead of decode")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "dequant", "pallas"])
    ap.add_argument("--kv-quantized", action="store_true",
                    help="int8 KV cache (half the attention HBM reads)")
    ap.add_argument("--auto-variant", action="store_true",
                    help="after the base decode measurement, probe the "
                    "bit-exact kernel variants and report the fastest "
                    "whose greedy tokens match the base run exactly")
    ap.add_argument("--dense-head", action="store_true",
                    help="keep lm_head dense bf16 (default: quantized, "
                    "the framework's serving config — saves ~0.2 ms/token)")
    args = ap.parse_args()

    if not (args._child or args.no_retry or args.cpu):
        argv = [a for a in sys.argv[1:] if a not in ("--_child",
                                                     "--no-retry")]
        sys.exit(supervise(argv))

    if args.no_retry and not args.cpu:
        # direct in-process TPU measurement (session tools): hold the
        # chip lock for the process lifetime. Children under supervise()
        # (--_child) skip — the supervisor already holds it.
        from quip_for_all_tpu.utils.chiplock import chip_lock
        import contextlib as _cl
        _stack = _cl.ExitStack()
        _stack.enter_context(chip_lock(timeout_s=900.0))

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        # persistent compilation cache: a retry attempt after a relay wedge
        # (or a warm session earlier in the round) skips the 40-60s AOT
        # compiles entirely — part of the round-5 time-to-first-JSON work
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("QFA_JAX_CACHE",
                                         "/root/repo/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"# compile cache unavailable: {e}", file=sys.stderr)
    import jax.numpy as jnp

    from quip_for_all_tpu.models import llama as M
    from quip_for_all_tpu.models.config import (ModelConfig,
                                                llama2_7b_config)
    from quip_for_all_tpu.runtime.generate import init_kv_caches
    from quip_for_all_tpu.utils.random_quantized import \
        random_quantized_model

    if args.small:
        cfg = ModelConfig(vocab_size=512, hidden_size=256,
                          intermediate_size=512, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          max_position_embeddings=args.cache_len)
        if args.model == "mixtral":
            cfg = ModelConfig(arch="mixtral", vocab_size=512,
                              hidden_size=256, intermediate_size=512,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, num_local_experts=4,
                              num_experts_per_tok=2,
                              max_position_embeddings=args.cache_len)
        name = "tiny_" + args.model if args.model != "llama2_7b" else "tiny"
    elif args.model == "mixtral":
        from quip_for_all_tpu.models.config import mixtral_8x7b_config
        cfg = mixtral_8x7b_config()
        import dataclasses
        cfg = dataclasses.replace(cfg, num_hidden_layers=16)
        name = "mixtral8x7b_16l"
    else:
        cfg = llama2_7b_config()
        name = "llama2_7b"

    t0 = time.time()
    params = random_quantized_model(
        cfg, codebook=args.codebook, seed=0, dtype=jnp.bfloat16,
        quantize_head=not args.dense_head and not args.small)
    params = M.fuse_for_inference(cfg, params, release_originals=True)
    print(f"# built random {name} {args.codebook} params (qkv/gateup "
          f"fused) in {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- speed-of-light accounting (VERDICT r4 #7): bytes every decode
    # step must stream from HBM = all param leaves except the embedding
    # table (one row gathered per token). KV-cache reads are reported
    # separately since they grow with position.
    def _leaf_bytes(tree):
        return sum(getattr(l, "nbytes", 0)
                   for l in jax.tree_util.tree_leaves(tree))
    embed_b = _leaf_bytes(params.get("embed_tokens"))
    weight_stream_bytes = _leaf_bytes(params) - embed_b + 2 * cfg.hidden_size
    if cfg.num_local_experts:
        # sparse MoE: only experts_per_tok of num_local_experts experts
        # stream per token at bs=1 — counting all of them made the
        # mixtral gbps field read 2.4x HBM peak (impossible; 17:05 r5)
        expert_b = sum(
            _leaf_bytes(v) for path, v in jax.tree_util.tree_leaves_with_path(
                params, is_leaf=lambda l: hasattr(l, "q_out"))
            if "expert" in jax.tree_util.keystr(path))
        frac = cfg.num_experts_per_tok / cfg.num_local_experts
        weight_stream_bytes -= expert_b * (1.0 - frac)
    HBM_PEAK_GBPS = float(os.environ.get("QFA_HBM_PEAK_GBPS", "819"))
    print(f"# weight stream/token: {weight_stream_bytes/1e9:.3f} GB "
          f"(embed table {embed_b/1e9:.2f} GB excluded)", file=sys.stderr)

    B = args.batch
    if args.cache_len == 0:
        # derive cache_len from free HBM instead of catch-and-retry
        # (VERDICT r4 #3): params + workspace are resident; the rest is
        # KV. elt bytes/pos/head-dim: bf16=2, int8+scale ~= 1 + 4/hd
        hbm_gb = float(os.environ.get("QFA_HBM_GB", "15.5"))
        elt = (1 + 4.0 / cfg.head_dim) if args.kv_quantized else 2
        kv_per_pos = (2 * cfg.num_hidden_layers * B
                      * cfg.num_key_value_heads * cfg.head_dim * elt)
        free = hbm_gb * 1e9 - _leaf_bytes(params) - 1.8e9
        # budget for a FULL transient copy of the caches: XLA inserts
        # entry-layout copies of donated cache args when the program
        # prefers a different minor-to-major (measured 16:40 r5, bs=32
        # int8: 64x 128MB `copy(caches_*__data)` HLO temps), so peak is
        # params + 2x KV during the first window
        cap = int(free // (2 * kv_per_pos))
        cl = 256
        while cl * 2 <= min(cap, cfg.max_position_embeddings):
            cl *= 2
        args.cache_len = cl
        print(f"# auto cache_len={cl} (free {free/1e9:.1f} GB, "
              f"{kv_per_pos/1e6:.1f} MB/pos)", file=sys.stderr)
    linear_kw = {"matmul_impl": args.impl}
    from quip_for_all_tpu.runtime.generate import attn_bucket

    if args.prefill:
        # prefill throughput: one full forward over (B, S) writing the
        # cache; --impl pallas/dequant switches the m>=... regime under test
        caches = init_kv_caches(cfg, B, args.cache_len,
                                dtype=jnp.bfloat16,
                                quantized=args.kv_quantized)
        S = args.prefill
        ids = jnp.asarray(
            (np.arange(B * S).reshape(B, S) * 13) % cfg.vocab_size,
            dtype=jnp.int32)
        pos = jnp.arange(S)[None, :].repeat(B, 0)

        def prefill(params, caches, ids):
            logits, caches = M.model_apply(
                cfg, params, ids, positions=pos, kv_caches=caches,
                cache_position=0, linear_kw=linear_kw, dtype=jnp.bfloat16,
                attn_window=attn_bucket(S, args.cache_len))
            return caches, logits[:, -1]
        fn = jax.jit(prefill, donate_argnums=(1,))
        t0 = time.time()
        caches, last = fn(params, caches, ids)
        _ = np.asarray(last)
        print(f"# prefill compile+first: {time.time()-t0:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(5):
            t0 = time.time()
            caches, last = fn(params, caches, ids)
            _ = np.asarray(last)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        print(f"# prefill windows: "
              f"{[round(B * S / t, 0) for t in times]}", file=sys.stderr)
        # MFU (VERDICT r4 #7): model FLOPs = 2 * quantized-matmul params
        # per token (attention flops excluded — <3% at S<=2048), vs the
        # chip's bf16 peak
        PEAK_TFLOPS = float(os.environ.get("QFA_PEAK_TFLOPS", "197"))
        n_mm = sum(
            q.q_out * q.q_in for q in jax.tree_util.tree_leaves(
                params, is_leaf=lambda l: hasattr(l, "q_out"))
            if hasattr(q, "q_out"))
        flops = 2.0 * n_mm * B * S
        mfu = flops / dt / (PEAK_TFLOPS * 1e12)
        print(json.dumps({
            "metric": f"prefill_tokens_per_sec_{name}"
                      f"_{args.codebook.lower()}_impl_{args.impl}",
            "value": round(B * S / dt, 1),
            "unit": "tokens/s",
            "mfu_pct": round(100 * mfu, 1),
            "matmul_tflops": round(flops / dt / 1e12, 1),
        }))
        return

    def decode_many(params, caches, tok, pos, n, attn_window):
        def step(carry, _):
            caches, tok, pos = carry
            logits, caches = M.model_apply(
                cfg, params, tok[:, None], positions=pos[:, None],
                kv_caches=caches, cache_position=pos[0],
                linear_kw=linear_kw, dtype=jnp.bfloat16,
                attn_window=attn_window)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (caches, nxt, pos + 1), nxt
        (caches, tok, pos), toks = jax.lax.scan(
            step, (caches, tok, pos), None, length=n)
        return caches, toks

    import functools

    # per-window static attention buckets, exactly as generate() segments
    # its decode scan: window i (positions known on host) attends a fixed
    # cache prefix attn_bucket(end_pos) — no per-layer lax.switch, and no
    # over-reading a max-sized window at early positions. AOT-precompile
    # every distinct bucket so no compile lands inside a timed window.
    # Window protocol: positions advance sequentially; a window is TIMED
    # only once its bucket's compiled program has already executed at
    # least once — the FIRST execution of each AOT program pays a one-time
    # program-load to the remote worker (measured: 126 and 98 tok/s for
    # the first 512-/1024-bucket windows vs 145-147 warm, while the traced
    # steady-state cost at bucket 1024 matches pure physics).
    warmup, reps = (0, 1) if args.small else (2, 5)
    max_win = 2 + 3 * (1 + warmup + reps)
    start = 16
    ends = [start + args.tokens * (i + 1) for i in range(max_win)
            if start + args.tokens * (i + 1) + 16 <= args.cache_len]
    buckets = sorted({attn_bucket(e, args.cache_len) for e in ends})
    assert len(ends) >= 2, "cache too short for even one timed window"
    # quick-provisional phase (round 5, VERDICT #1): the smallest prefix of
    # windows that stays inside the FIRST attention bucket — one AOT
    # compile, one program load, >=1 timed window, so a JSON line lands
    # within ~2 min of chip contact and the supervisor can salvage it if
    # anything later wedges
    first_bucket = attn_bucket(ends[0], args.cache_len)
    quick_ends = [e for e in ends
                  if attn_bucket(e, args.cache_len) == first_bucket][:4]
    if len(quick_ends) < 2:
        quick_ends = ends[:2]

    # Chained dispatch (round 4, default ON; QFA_BENCH_CHAIN=0 restores
    # the per-window-sync protocol): consecutive decode windows have ZERO
    # host dependency — the window seed token is a constant and `pos` is
    # host arithmetic — so the timed windows are enqueued back-to-back
    # and fetched once at the end. This is exactly how generate()/serving
    # run segments; the old protocol paid one full host<->relay roundtrip
    # (~30-50 ms) *inside* every timed 64-token window, charging the
    # remote tunnel's latency (a harness artifact the reference's
    # local-GPU numbers never pay) to the framework.
    chain_default = os.environ.get("QFA_BENCH_CHAIN", "1") == "1"

    _compiled = {}      # bucket -> AOT executable (cleared per variant)
    _preloaded = set()  # buckets whose program already ran on the worker

    def run_protocol(tag: str, chain_mode: bool, use_ends,
                     reps_sel: int, warmup_sel: int):
        """One measurement pass (fresh caches; AOT compile + per-bucket
        program pre-load; first-window + warm discards; timed windows
        chained or per-window-synced). Returns (tokens/s, all generated
        tokens in window order) — the token stream doubles as a
        bit-exactness witness for variant probing. Compiled programs are
        cached across passes (same executables serve sync, chain and
        quick phases)."""
        use_buckets = sorted({attn_bucket(e, args.cache_len)
                              for e in use_ends})
        tok = jnp.full((B,), 7, dtype=jnp.int32)
        pos = jnp.full((B,), start, dtype=jnp.int32)
        t0 = time.time()
        # one cache set alive at a time: at bs=32 cache=512 bf16 a cache
        # set is ~8.6GB, so pre-loading on scratch caches while the real
        # set already exists OOMs (r4 bs32_e8p12_bf16kv HLO-temp copy).
        # Build scratch, compile+pre-load on it, free it, THEN build the
        # measurement caches.
        todo = [w for w in use_buckets if w not in _compiled]
        scratch = None
        if todo or (chain_mode and any(w not in _preloaded
                                       for w in use_buckets)):
            scratch = init_kv_caches(cfg, B, args.cache_len,
                                     dtype=jnp.bfloat16,
                                     quantized=args.kv_quantized)
        for w in todo:
            f = jax.jit(functools.partial(decode_many, n=args.tokens,
                                          attn_window=w),
                        donate_argnums=(1,))
            _compiled[w] = f.lower(params, scratch, tok, pos).compile()
        if todo:
            print(f"# [{tag}] AOT-compiled buckets {todo} in "
                  f"{time.time()-t0:.1f}s", file=sys.stderr)
        compiled = _compiled

        def run_window(caches, pos, end):
            return compiled[attn_bucket(end, args.cache_len)](
                params, caches, tok, pos)

        if chain_mode:
            # pre-load every bucket's program onto the worker (its first
            # execution pays a one-time program transfer) on scratch
            # caches so no first-of-bucket discard lands mid-chain
            t0 = time.time()
            pre = [w for w in use_buckets if w not in _preloaded]
            for w in pre:
                e_w = next(e for e in use_ends
                           if attn_bucket(e, args.cache_len) == w)
                ps = jnp.full((B,), e_w - args.tokens, dtype=jnp.int32)
                scratch, tks = compiled[w](params, scratch, tok, ps)
                _ = np.asarray(tks)
                _preloaded.add(w)
            if pre:
                print(f"# [{tag}] bucket programs pre-loaded in "
                      f"{time.time()-t0:.1f}s", file=sys.stderr)
        del scratch
        caches = init_kv_caches(cfg, B, args.cache_len, dtype=jnp.bfloat16,
                                quantized=args.kv_quantized)

        # NOTE: block_until_ready is unreliable over the experimental
        # remote backend; np.asarray forces a real device->host fetch of
        # the produced tokens, which cannot complete before the
        # computation does.
        all_toks = []
        t0 = time.time()
        caches, toks = run_window(caches, pos, use_ends[0])
        all_toks.append(np.asarray(toks))
        print(f"# [{tag}] first window: {time.time()-t0:.1f}s",
              file=sys.stderr)

        # the remote worker also reads ~20-50% low for the first windows
        # after a large param transfer (measured: 69.8 -> 137 tok/s within
        # 3 windows): `warmup` extra untimed windows beyond per-program
        reps, warmup = reps_sel, warmup_sel
        warm_left = min(warmup, max(0, len(use_ends) - 1 - reps - 2))
        ran = {attn_bucket(use_ends[0], args.cache_len)}
        windows = []           # per-window-sync mode: seconds per window
        pending = []           # chain mode: unfetched device tok arrays
        chain_t0 = None
        for e in use_ends[1:]:
            if len(windows) >= reps or len(pending) >= reps:
                break
            pos = pos + args.tokens
            b = attn_bucket(e, args.cache_len)
            first_of_bucket = b not in ran
            ran.add(b)
            skip = (first_of_bucket and not chain_mode) or warm_left > 0
            if skip and e != use_ends[-1]:
                warm_left -= 0 if first_of_bucket else 1
                caches, toks = run_window(caches, pos, e)
                all_toks.append(np.asarray(toks))
                continue
            if chain_mode:
                if chain_t0 is None:
                    chain_t0 = time.time()
                caches, toks = run_window(caches, pos, e)
                pending.append(toks)
            else:
                t0 = time.time()
                caches, toks = run_window(caches, pos, e)
                all_toks.append(np.asarray(toks))
                windows.append(time.time() - t0)
        if chain_mode:
            assert pending, "no timed windows (cache too short)"
            for d in pending:
                all_toks.append(np.asarray(d))
            dt_chain = time.time() - chain_t0
            n_tok = len(pending) * args.tokens * B
            tps = n_tok / dt_chain
            print(f"# [{tag}] chain of {len(pending)} windows: {n_tok} "
                  f"tokens in {dt_chain:.3f}s", file=sys.stderr)
        else:
            assert windows, "no timed windows (cache too short for "\
                            "protocol)"
            if len(windows) < reps:
                print(f"# WARNING: only {len(windows)}/{reps} timed "
                      f"windows", file=sys.stderr)
            dt = float(np.median(windows))
            tps = args.tokens * B / dt
            print(f"# [{tag}] median of {len(windows)} windows: "
                  f"{args.tokens} tokens in {dt:.3f}s (windows: "
                  f"{[round(args.tokens * B / w, 1) for w in windows]})",
                  file=sys.stderr)
        return tps, np.concatenate(all_toks, axis=0)

    metric = (f"decode_tokens_per_sec_{name}_{args.codebook.lower()}"
              f"_bs{B}") + ("_kvq8" if args.kv_quantized else "")

    def sol_fields(tps):
        """Speed-of-light accounting (VERDICT r4 #7): achieved weight-
        stream GB/s and % of HBM peak at this tokens/s."""
        gbps = weight_stream_bytes * tps / B / 1e9
        return {"gbps": round(gbps, 1),
                "pct_hbm_peak": round(100 * gbps / HBM_PEAK_GBPS, 1),
                "weight_stream_gb": round(weight_stream_bytes / 1e9, 3)}

    def emit(sync_tps, chain_tps, provisional, extra=None):
        """value = per-window-SYNC tokens/s (the conservative protocol);
        the chained-dispatch number rides alongside (r4 VERDICT: report
        both, driver prints both)."""
        val = sync_tps if sync_tps is not None else chain_tps
        d = {"metric": metric, "value": round(val, 2), "unit": "tokens/s",
             "vs_baseline": round(val / BASELINE_TOKENS_PER_SEC, 3)}
        if chain_tps is not None:
            d["chained_tokens_per_sec"] = round(chain_tps, 2)
            d["chained_vs_baseline"] = round(
                chain_tps / BASELINE_TOKENS_PER_SEC, 3)
        d.update(sol_fields(chain_tps if chain_tps is not None else val))
        if provisional:
            d["provisional"] = True
        if extra:
            d.update(extra)
        print(json.dumps(d), flush=True)
        return d

    if args.small:
        tps, _ = run_protocol("base", chain_default, ends, reps, warmup)
        emit(None if chain_default else tps,
             tps if chain_default else None, False)
        return

    # phase 1 — quick sync windows inside the first bucket: a salvageable
    # JSON line lands within ~2 min of first chip contact
    q_tps, _ = run_protocol("quick", False, quick_ends,
                            min(2, len(quick_ends) - 1), 0)
    emit(q_tps, None, True)

    # phase 2 — full sync protocol over all buckets (the headline `value`)
    sync_tps, _ = run_protocol("sync", False, ends, reps, warmup)
    emit(sync_tps, None, True)

    # phase 3 — chained-dispatch protocol (same programs, windows enqueued
    # back-to-back: how generate()/serving actually dispatch segments)
    chain_tps, base_toks = run_protocol("chain", True, ends, reps, 0)
    emit(sync_tps, chain_tps, True)

    chosen = "base"
    if args.auto_variant:
        # probe bit-exact-intent kernel variants; accept one only if its
        # greedy token stream MATCHES the base run exactly (a runtime
        # correctness witness — interpret-mode parity can't catch Mosaic
        # lowering bugs) AND it beats the base chained number. Any probe
        # failure leaves the base result untouched.
        # probe list pruned to the variants that ever won on hardware
        # (r3 7B sweep: base 142.4, f32sm 144.0, magic 137.8, directcvt
        # 136.2, tn256 128.1, ksplit2/4 122/110)
        for vname, venv in (("f32sm32", {"QFA_F32_SMALL_M": "32"}),
                            ("magic32", {"QFA_MAGIC_SMALL_M": "32"})):
            saved = {k: os.environ.get(k) for k in venv}
            try:
                os.environ.update(venv)
                _compiled.clear()
                _preloaded.clear()
                vtps, vtoks = run_protocol(vname, True, ends, reps, 0)
                exact = np.array_equal(vtoks, base_toks)
                print(f"# variant {vname}: {vtps:.2f} tok/s, "
                      f"bit-exact={exact}", file=sys.stderr)
                if exact and vtps > chain_tps:
                    chain_tps, chosen = vtps, vname
            except Exception as e:  # noqa: BLE001 — keep the base result
                print(f"# variant {vname} failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        _compiled.clear()
        _preloaded.clear()

    # auxiliary int8-KV metric (docs/BYTECUT.md: with sub-4-bit weight
    # layouts falsified, the KV stream is the remaining byte lever; the
    # kv8 number is a different serving config — quality row in
    # docs/QUALITY.md — so it rides as extra fields, never the headline).
    # Guarded: any failure leaves the headline untouched.
    extra = {"kernel_variant": chosen} if chosen != "base" else {}
    if (B == 1 and not args.kv_quantized
            and os.environ.get("QFA_BENCH_KV8", "1") == "1"):
        try:
            args.kv_quantized = True
            _compiled.clear()
            _preloaded.clear()
            k_tps, _ = run_protocol("kv8", chain_default, ends, reps, 0)
            extra["kv8_chained_tokens_per_sec"] = round(k_tps, 2)
            extra["kv8_chained_vs_baseline"] = round(
                k_tps / BASELINE_TOKENS_PER_SEC, 3)
        except Exception as e:  # noqa: BLE001 — aux metric is best-effort
            print(f"# kv8 aux metric failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        finally:
            args.kv_quantized = False
            _compiled.clear()
            _preloaded.clear()

    emit(sync_tps, chain_tps, False, extra=extra or None)


if __name__ == "__main__":
    main()
