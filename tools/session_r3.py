"""Round-3 consolidated TPU measurement session.

ONE process runs every phase sequentially (the relay wedges if TPU
processes overlap or get killed; see README perf notes), appending one
JSON line per measurement to tools/R3_RESULTS.jsonl so a crash loses at
most the in-flight phase. Run it with a GENEROUS timeout (60+ min) and
never alongside another TPU process:

    python tools/session_r3.py [--phases decode_ab,prefill,rvq4b,mixtral]

Phases:
  decode_ab  — 7B E8P12 bs=1 baseline + kernel-variant A/Bs
               (QFA_F32_SMALL_M, QFA_DIRECT_CVT; knobs are trace-time so
               one process recompiles per variant)
  prefill    — S=2048 whole-model prefill, fused vs dense (settles the
               m in (1024, 2048] crossover, VERDICT #8)
  rvq4b      — RVQ4B bs=1 and bs=32 decode (north-star #3)
  mixtral    — mixtral 16L bs=1/8/32 sparse decode (north-star #4)
"""
from __future__ import annotations

import argparse
import contextlib
import io
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


def run_bench(tag: str, argv: list, env: dict | None = None) -> dict | None:
    """Call bench.main() in-process (--no-retry measurement path),
    capturing its JSON stdout line. env overrides are set for the call
    and restored after (all kernel knobs are trace-time reads)."""
    import bench
    old = {}
    for k, v in (env or {}).items():
        old[k] = os.environ.get(k)
        os.environ[k] = str(v)
    buf = io.StringIO()
    t0 = time.time()
    try:
        old_argv = sys.argv
        sys.argv = ["bench.py", "--no-retry"] + argv + SMOKE_ARGS
        with contextlib.redirect_stdout(buf):
            bench.main()
    except SystemExit as e:
        if e.code not in (0, None):
            record(tag, {"error": f"bench exited {e.code}",
                         "stdout": buf.getvalue()[-500:]})
            return None
    except Exception:
        record(tag, {"error": traceback.format_exc()[-800:]})
        return None
    finally:
        sys.argv = old_argv
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    parsed = None
    for line in reversed(buf.getvalue().strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    record(tag, {"result": parsed, "wall_s": round(time.time() - t0, 1),
                 "env": env or {}})
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
    run_bench("decode_rvq4b_bs32", ["--codebook", "E8P12RVQ4B",
                                    "--batch", "32"])


def phase_mixtral():
    run_bench("decode_mixtral_bs1", ["--model", "mixtral"])
    run_bench("decode_mixtral_bs1_magic", ["--model", "mixtral"],
              env={"QFA_MAGIC_MOE": "1"})
    run_bench("decode_mixtral_bs8", ["--model", "mixtral", "--batch", "8"])
    run_bench("decode_mixtral_bs32", ["--model", "mixtral",
                                      "--batch", "32"])


PHASES = {"decode_ab": phase_decode_ab, "prefill": phase_prefill,
          "rvq4b": phase_rvq4b, "mixtral": phase_mixtral}


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
