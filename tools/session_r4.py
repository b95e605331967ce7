"""Round-4 consolidated TPU measurement session.

Same subprocess-isolation protocol as round 3 (tools/session_r3.py): each
measurement runs in a FRESH clean-exiting subprocess, strictly sequential,
appending one JSON line per measurement to tools/R4_RESULTS.jsonl. New in
round 4 (VERDICT r3 #7): a pre-flight HBM-fit estimate skips configs that
cannot fit on one v5e chip with a logged reason instead of crashing into
RESOURCE_EXHAUSTED (which poisoned 5 phases in round 3), and a relay
listener probe + inter-run rest keeps the volley under the wedge threshold.

    python tools/session_r4.py [--phases trace,window,rvq4b,bs32,mixtral]

Phases:
  trace      — re-trace decode per-op breakdown at the current default
               kernel variant (VERDICT #10; splits serial-launch vs op soup)
  window     — bench --tokens 64/128/256: how much of the headline is
               relay window-dispatch amortization (VERDICT #1 framing)
  rvq4b      — RVQ4B bs=1 with the new combined-plane kernel
               (QFA_COMBINE_PLANES, VERDICT #2) vs the split base
  bs32       — the clean bs=32 matrix (VERDICT #6): E8P12 / RVQ4B ×
               bf16-KV / int8-KV at one cache size
  mixtral    — mixtral 16L bs=1 trace + combined-plane probe (VERDICT #3)
  headline   — E8P12 bs=1 decode with the round-4 op-soup work
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "R4_RESULTS.jsonl")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RELAY_PORTS = (8082, 8083, 8087)

HBM_GB = float(os.environ.get("QFA_HBM_GB", "15.5"))   # usable of 16GB v5e


def record(tag: str, payload: dict) -> None:
    line = json.dumps({"tag": tag, "t": time.strftime("%H:%M:%S"),
                       **payload})
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def relay_up() -> bool:
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


def wait_relay(tag: str, cap_s: float = 900.0) -> bool:
    waited = 0.0
    while waited < cap_s and not relay_up():
        time.sleep(20)
        waited += 20
    if not relay_up():
        record(tag, {"error": f"relay not listening after {waited:.0f}s"})
        return False
    return True


# ------------------------------------------------------ HBM fit pre-flight

PLANE_SETS = {"E8P12": 1, "D4": 1, "HI": 1, "E8P12RVQ3B": 2,
              "E8P12RVQ4B": 2}


def estimate_hbm_gb(model: str, codebook: str, batch: int, cache_len: int,
                    kv_quantized: bool) -> float:
    """Rough single-chip resident-bytes estimate: quantized planes (4 bits
    per weight per plane set) + embeds + KV cache + ~1.2GB workspace
    (compiled programs, activations, donation slack)."""
    if model == "mixtral":
        L, D, I, KV, hd, V, E = 16, 4096, 14336, 8, 128, 32000, 8
        per_layer = (D + 2 * KV * hd) * D + D * D \
            + E * (2 * I * D + D * I)
    else:
        L, D, I, KV, hd, V = 32, 4096, 11008, 32, 128, 32000,
        per_layer = (D + 2 * KV * hd) * D + D * D + 3 * I * D
    weights = L * per_layer + V * D            # + quantized lm_head
    plane_bytes = weights * 0.5 * PLANE_SETS.get(codebook, 1)
    embed_bytes = V * D * 2                    # bf16 embed table
    kv_elt = 1 + 4.0 / hd if kv_quantized else 2
    kv_bytes = 2 * L * batch * cache_len * KV * hd * kv_elt
    return (plane_bytes + embed_bytes + kv_bytes) / 1e9 + 1.2


def preflight(tag: str, model: str, codebook: str, batch: int,
              cache_len: int, kv_quantized: bool) -> bool:
    est = estimate_hbm_gb(model, codebook, batch, cache_len, kv_quantized)
    if est > HBM_GB:
        record(tag, {"skipped": f"est {est:.1f}GB > {HBM_GB}GB HBM"})
        return False
    return True


# ------------------------------------------------------ subprocess runners

SMOKE_ARGS: list = []
REST_S = float(os.environ.get("QFA_SESSION_REST_S", "30"))


def run_bench(tag: str, argv: list, env: dict | None = None,
              timeout_s: float = 1500.0, model: str = "llama2_7b",
              codebook: str = "E8P12", batch: int = 1,
              cache_len: int = 2048, kv_quantized: bool = False
              ) -> dict | None:
    if not SMOKE_ARGS:
        if not preflight(tag, model, codebook, batch, cache_len,
                         kv_quantized):
            return None
        if not wait_relay(tag):
            return None
    cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
           "--no-retry"] + argv + SMOKE_ARGS
    child_env = dict(os.environ)
    for k, v in (env or {}).items():
        child_env[k] = str(v)
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout_s, env=child_env)
    except subprocess.TimeoutExpired:
        record(tag, {"error": f"timeout after {timeout_s:.0f}s"})
        return None
    finally:
        if not SMOKE_ARGS:
            time.sleep(REST_S)     # let the worker settle between runs
    if proc.returncode != 0:
        tail = (proc.stdout + proc.stderr).strip().splitlines()
        record(tag, {"error": f"rc={proc.returncode}: "
                     + " | ".join(tail[-3:])[-700:]})
        return None
    parsed = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    record(tag, {"result": parsed, "wall_s": round(time.time() - t0, 1),
                 "env": env or {}, **({"smoke": True} if SMOKE_ARGS else {})})
    return parsed


def run_tool(tag: str, argv: list, env: dict | None = None,
             timeout_s: float = 1500.0, tail_lines: int = 40) -> None:
    """Run an arbitrary tools/ script, recording its stdout tail."""
    if not SMOKE_ARGS and not wait_relay(tag):
        return
    child_env = dict(os.environ)
    for k, v in (env or {}).items():
        child_env[k] = str(v)
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable] + argv, capture_output=True,
                              text=True, timeout=timeout_s, env=child_env)
    except subprocess.TimeoutExpired:
        record(tag, {"error": f"timeout after {timeout_s:.0f}s"})
        return
    finally:
        if not SMOKE_ARGS:
            time.sleep(REST_S)
    out = proc.stdout.strip().splitlines()
    record(tag, {"rc": proc.returncode,
                 "stdout_tail": out[-tail_lines:],
                 "stderr_tail": proc.stderr.strip().splitlines()[-6:],
                 "wall_s": round(time.time() - t0, 1), "env": env or {}})


# ------------------------------------------------------------------ phases

def phase_trace():
    run_tool("trace_decode_default",
             [os.path.join(ROOT, "tools", "trace_decode.py"),
              "--scan", "8", "--layers", "8", "--attn-window", "256",
              "--quantize-head", "--top", "25"], timeout_s=1800)


def phase_window():
    run_bench("window_t64", ["--tokens", "64"])
    run_bench("window_t128", ["--tokens", "128"])
    run_bench("window_t256", ["--tokens", "256"])


def phase_rvq4b():
    run_bench("rvq4b_base", ["--codebook", "E8P12RVQ4B"],
              codebook="E8P12RVQ4B")
    run_bench("rvq4b_combine", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_COMBINE_PLANES": "32",
                   "QFA_BENCH_AUTO_VARIANT": "0"},
              codebook="E8P12RVQ4B")


def phase_bs32():
    # clean 4-cell matrix at one cache size (VERDICT #6); cells whose
    # pre-flight estimate exceeds HBM re-run at cache 256 WITH their
    # comparison partner so every bf16-vs-int8 pair shares a cache size
    any_skipped = False
    for cache in (512, 256):
        if cache == 256 and not any_skipped:
            return     # full matrix landed at 512
        for cb in ("E8P12", "E8P12RVQ4B"):
            for kvq in (False, True):
                tag = (f"bs32_{cb.lower()}_{'kvq8' if kvq else 'bf16kv'}"
                       f"_c{cache}")
                if cache == 512 and estimate_hbm_gb(
                        "llama2_7b", cb, 32, cache, kvq) > HBM_GB:
                    any_skipped = True
                args = ["--codebook", cb, "--batch", "32",
                        "--cache-len", str(cache)]
                if kvq:
                    args.append("--kv-quantized")
                res = run_bench(tag, args, codebook=cb, batch=32,
                                cache_len=cache, kv_quantized=kvq)
                if cache == 512 and res is None:
                    # NOTE (ADVICE r4): run_bench returns None for ANY
                    # failure (timeout, relay unavailability, transient
                    # crash), not just the HLO-temp OOM this fallback was
                    # built for — so a flaky relay also forces the 256
                    # rerun. Conservative but safe: a voided 512 matrix
                    # re-measures both partners at one shared cache size.
                    # (Round 5 replaces the retry entirely: bench.py
                    # --cache-len 0 derives cache from free HBM up front.)
                    any_skipped = True


def phase_mixtral():
    run_tool("trace_mixtral",
             [os.path.join(ROOT, "tools", "trace_decode.py"),
              "--scan", "8", "--layers", "8", "--model", "mixtral",
              "--attn-window", "256", "--top", "25"], timeout_s=1800)
    run_bench("mixtral_bs1_base", ["--model", "mixtral"], model="mixtral")


def phase_moegrid():
    """bs=1 MoE grid-order A/B (VERDICT #3): tiles-inner streams each
    expert's planes contiguously instead of alternating experts every
    tile — candidate win at R=2 (no duplicate rows to exploit)."""
    run_bench("mixtral_bs1_tilesinner", ["--model", "mixtral"],
              env={"QFA_MOE_TILES_INNER": "1",
                   "QFA_BENCH_AUTO_VARIANT": "0"}, model="mixtral")
    run_bench("mixtral_bs8_tilesinner",
              ["--model", "mixtral", "--batch", "8", "--cache-len", "512"],
              env={"QFA_MOE_TILES_INNER": "1",
                   "QFA_BENCH_AUTO_VARIANT": "0"},
              model="mixtral", batch=8, cache_len=512)


def phase_moemerged():
    """bs=1 MoE merged-rows A/B (VERDICT #3): both top-2 experts' plane
    blocks as same-grid-step inputs — concurrent expert DMA streams, half
    the grid steps — vs the rows-in-grid default. bs=8 checks the merged
    formulation doesn't regress the batched sorted-row reuse regime."""
    run_bench("mixtral_bs1_moemerged", ["--model", "mixtral"],
              env={"QFA_MOE_MERGED": "1", "QFA_BENCH_AUTO_VARIANT": "0"},
              model="mixtral")
    run_bench("mixtral_bs8_moemerged",
              ["--model", "mixtral", "--batch", "8", "--cache-len", "512"],
              env={"QFA_MOE_MERGED": "1", "QFA_BENCH_AUTO_VARIANT": "0"},
              model="mixtral", batch=8, cache_len=512)


def phase_tn():
    """Output-tile-size A/B via QFA_TN (in-model, the only trustworthy
    instrument — the standalone probe drowned in the 32ms relay
    roundtrip at 64 iters). 1024/2048 apply where q_out divides AND the
    tile fits VMEM (qkv/o at both; down at 1024; gate-up/head stay at
    the heuristic), so a win here isolates per-grid-step cost."""
    run_bench("tn1024_e8p12", [],
              env={"QFA_TN": "1024", "QFA_BENCH_AUTO_VARIANT": "0"})
    run_bench("tn2048_e8p12", [],
              env={"QFA_TN": "2048", "QFA_BENCH_AUTO_VARIANT": "0"})


def phase_headline():
    run_bench("headline_e8p12", [])


def phase_chain():
    """Chained-dispatch protocol (round 4): timed windows enqueued
    back-to-back with ONE fetch at the end, vs per-window host sync.
    The old protocol paid a full host<->relay roundtrip inside every
    timed 64-token window — tunnel latency, not framework time;
    generate()/serving chain segments exactly like the new default.
    chain_e8p12 keeps auto-variant probing (picks the best bit-exact
    kernel variant under the new protocol)."""
    # chain_e8p12 measured directly 2026-08-20 (155.21 tok/s, R4_RESULTS
    # bench_chain_headline row) — not re-run here; nochain is the same-day
    # protocol A/B, then the two slow decode targets under the new protocol
    run_bench("nochain_e8p12", [], env={"QFA_BENCH_CHAIN": "0",
                                        "QFA_BENCH_AUTO_VARIANT": "0"})
    run_bench("chain_rvq4b", ["--codebook", "E8P12RVQ4B"],
              codebook="E8P12RVQ4B")
    run_bench("chain_mixtral_bs1", ["--model", "mixtral"],
              model="mixtral")


def phase_bfp():
    """bf16 lane-magic layout A/B (the round-4 headline lever): whole-model
    7B decode with QFA_BFP=1 (row-pair bf16 planes, zero converts) vs the
    round-3 nibble base. The hardware microbench (R4_RESULTS kern_bfp
    rows) showed bit-exact decode and 999->580us on the 12288x4096 shape;
    only the whole-model number decides (relay microbench variance)."""
    run_bench("bfp_e8p12", [],
              env={"QFA_BFP": "1", "QFA_BENCH_AUTO_VARIANT": "0"})
    run_bench("nibble_e8p12", [],
              env={"QFA_BFP": "0"})
    run_bench("bfp_rvq4b", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_BFP": "1", "QFA_BENCH_AUTO_VARIANT": "0"},
              codebook="E8P12RVQ4B")


def phase_serving():
    """Per-request latency under serving (VERDICT #8): bs=1 decode_chunk=1
    is the honest comparison against the reference's vLLM
    benchmark_latency ~159 tok/s row (README.md:83)."""
    sv = os.path.join(ROOT, "tools", "bench_serving.py")
    run_tool("serving_b1_chunk1",
             [sv, "--max-batch", "1", "--decode-chunk", "1",
              "--requests", "4", "--max-new", "64"], timeout_s=1500,
             tail_lines=3)
    run_tool("serving_b8",
             [sv, "--max-batch", "8", "--requests", "16",
              "--max-new", "64"], timeout_s=1500, tail_lines=3)


PHASES = {"serving": phase_serving, "trace": phase_trace,
          "window": phase_window, "bfp": phase_bfp,
          "rvq4b": phase_rvq4b, "bs32": phase_bs32,
          "mixtral": phase_mixtral, "moegrid": phase_moegrid,
          "moemerged": phase_moemerged,
          "tn": phase_tn, "headline": phase_headline,
          "chain": phase_chain}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="trace,window,rvq4b")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model on CPU — wiring check only")
    args = ap.parse_args()
    if args.smoke:
        SMOKE_ARGS.extend(["--small", "--cpu"])
    record("session_start", {"phases": args.phases})
    for name in args.phases.split(","):
        name = name.strip()
        if not name:
            continue
        try:
            PHASES[name]()
        except Exception:
            record(f"{name}_phase_error",
                   {"error": traceback.format_exc()[-800:]})
    record("session_end", {})


if __name__ == "__main__":
    main()
