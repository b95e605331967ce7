"""Round-3 consolidated TPU measurement session.

Each measurement runs in a FRESH clean-exiting subprocess (sequential,
never overlapping — overlap or kills wedge the relay; an in-process OOM
poisons the TPU client for every later phase), appending one JSON line
per measurement to tools/R3_RESULTS.jsonl so a crash loses at most the
in-flight phase. Run with a GENEROUS timeout (60+ min) and never
alongside another TPU process:

    python tools/session_r3.py [--phases decode_ab,prefill,rvq4b,mixtral]

Phases:
  decode_ab  — 7B E8P12 bs=1 baseline + kernel-variant A/Bs
               (QFA_F32_SMALL_M, QFA_DIRECT_CVT; knobs are trace-time so
               one process recompiles per variant)
  prefill    — S=2048 whole-model prefill, fused vs dense (settles the
               m in (1024, 2048] crossover, VERDICT #8)
  rvq4b      — RVQ4B bs=1 and bs=32 decode (north-star #3)
  mixtral    — mixtral 16L bs=1/8/32 sparse decode (north-star #4)
  pipeline   — QFA_KSPLIT / QFA_TN DMA-pipeline sweep (VERDICT #2)
  rvq4b_ab   — RVQ4B decode-compute variants
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "R3_RESULTS.jsonl")


def record(tag: str, payload: dict) -> None:
    line = json.dumps({"tag": tag, "t": time.strftime("%H:%M:%S"),
                       **payload})
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


SMOKE_ARGS: list = []     # set by --smoke: tiny model, CPU, wiring check


def run_bench(tag: str, argv: list, env: dict | None = None,
              timeout_s: float = 1500.0) -> dict | None:
    """Run ONE bench measurement in a FRESH subprocess (--no-retry path)
    and record its JSON stdout line. Subprocess isolation is mandatory:
    an OOM (RESOURCE_EXHAUSTED) leaves the in-process TPU client unable
    to allocate, poisoning every later phase (observed r3: rvq4b bs32
    OOM -> all mixtral runs dead). Clean-exit sequential subprocesses
    are relay-safe (the bench supervisor uses the same pattern)."""
    import subprocess
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))), "bench.py"),
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


def phase_decode_ab():
    base = run_bench("decode_e8p12_base", [])
    v1 = run_bench("decode_e8p12_f32smallm", [],
                   env={"QFA_F32_SMALL_M": "32"})
    v2 = run_bench("decode_e8p12_directcvt", [],
                   env={"QFA_DIRECT_CVT": "1"})
    v3 = run_bench("decode_e8p12_kvq8", ["--kv-quantized"])
    v4 = run_bench("decode_e8p12_magic", [],
                   env={"QFA_MAGIC_SMALL_M": "32"})
    vals = {"base": base, "f32smallm": v1, "directcvt": v2, "kvq8": v3,
            "magic": v4}
    best = max((v["value"], k) for k, v in vals.items() if v)
    record("decode_ab_summary", {"best": best[1], "value": best[0]})


def phase_prefill():
    # auto currently routes m=2048 to dense; force both regimes
    run_bench("prefill_2048_fused", ["--prefill", "2048"],
              env={"QFA_FUSED_MAX_M": "999999"})
    run_bench("prefill_2048_dense", ["--prefill", "2048"],
              env={"QFA_FUSED_MAX_M": "1"})
    run_bench("prefill_1024_fused", ["--prefill", "1024"],
              env={"QFA_FUSED_MAX_M": "999999"})


def phase_rvq4b():
    run_bench("decode_rvq4b_bs1", ["--codebook", "E8P12RVQ4B"])
    # bs=32 bf16 KV at cache 2048 is 32 GB — int8 KV + 512-token cache
    # fits beside the ~6.7 GB RVQ4B planes (r3: the 2048 run OOM'd)
    run_bench("decode_rvq4b_bs32", ["--codebook", "E8P12RVQ4B",
                                    "--batch", "32", "--cache-len", "512",
                                    "--kv-quantized"])


def phase_mixtral():
    run_bench("decode_mixtral_bs1", ["--model", "mixtral"])
    run_bench("decode_mixtral_bs1_magic", ["--model", "mixtral"],
              env={"QFA_MAGIC_MOE": "1"})
    run_bench("decode_mixtral_bs8", ["--model", "mixtral", "--batch", "8",
                                     "--cache-len", "512"])
    run_bench("decode_mixtral_bs32", ["--model", "mixtral",
                                      "--batch", "32",
                                      "--cache-len", "512"])


def phase_pipeline():
    """DMA-pipeline shape sweep (VERDICT #2): K-chunked accumulator
    scratch (QFA_KSPLIT) shrinks the per-call pipeline prologue bubble;
    QFA_TN trades chunk size for grid depth. All bit-exact variants."""
    run_bench("decode_e8p12_ksplit2", [], env={"QFA_KSPLIT": "2"})
    run_bench("decode_e8p12_ksplit4", [], env={"QFA_KSPLIT": "4"})
    run_bench("decode_e8p12_tn256", [], env={"QFA_TN": "256"})
    run_bench("decode_e8p12_tn256_ksplit2", [],
              env={"QFA_TN": "256", "QFA_KSPLIT": "2"})
    run_bench("decode_e8p12_ksplit4_magic", [],
              env={"QFA_KSPLIT": "4", "QFA_MAGIC_SMALL_M": "32"})


def phase_rvq4b_ab():
    """RVQ4B decode-compute variants (its gap to the ~115 DMA floor is
    exposed VPU decode; north-star #3 wants >= 100)."""
    run_bench("rvq4b_magic", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_MAGIC_SMALL_M": "32"})
    run_bench("rvq4b_f32sm", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_F32_SMALL_M": "32"})
    run_bench("rvq4b_ksplit4", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_KSPLIT": "4"})
    run_bench("rvq4b_ksplit4_magic", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_KSPLIT": "4", "QFA_MAGIC_SMALL_M": "32"})


PHASES = {"decode_ab": phase_decode_ab, "prefill": phase_prefill,
          "rvq4b": phase_rvq4b, "mixtral": phase_mixtral,
          "pipeline": phase_pipeline, "rvq4b_ab": phase_rvq4b_ab}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="decode_ab,prefill,rvq4b,mixtral")
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
