"""Round-5 consolidated TPU measurement session.

Same subprocess-isolation protocol as rounds 3/4 (tools/session_r4.py):
each measurement runs in a FRESH clean-exiting subprocess, strictly
sequential, appending one JSON line per measurement to
tools/R5_RESULTS.jsonl, with an HBM-fit pre-flight and relay probe.

    python tools/session_r5.py --phases u3,pb

Phases:
  u3       — E8P12 bs=1 with the 3.125-bit u3 layout (QFA_E8P_U3), both
             dot formulations (concat vs halfdots) — the round-5 byte-cut
             headline lever (VERDICT r4 #2; target >= 1.4x nibble)
  pb       — RVQ4B bs=1 with the ~6.5-bit pb layout (QFA_RVQ_PB)
  u3bs32   — u3 at bs=32 (checks the m-tiled grid path on hardware)
  serving  — per-request latency (bs=1 chunk=1 honest-vs-vLLM row, bs=8)
  headline — driver-bench dress rehearsal at the chosen default layout
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
                       "R5_RESULTS.jsonl")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RELAY_PORTS = (8082, 8083, 8087)
HBM_GB = float(os.environ.get("QFA_HBM_GB", "15.5"))


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


SMOKE_ARGS: list = []
REST_S = float(os.environ.get("QFA_SESSION_REST_S", "30"))


def run_bench(tag: str, argv: list, env: dict | None = None,
              timeout_s: float = 1200.0) -> dict | None:
    if not SMOKE_ARGS and not wait_relay(tag):
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
            time.sleep(REST_S)
    parsed = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            cand = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(cand, dict) and "metric" in cand:
            parsed = cand
            break
    if proc.returncode != 0 and parsed is None:
        tail = (proc.stdout + proc.stderr).strip().splitlines()
        record(tag, {"error": f"rc={proc.returncode}: "
                     + " | ".join(tail[-3:])[-700:]})
        return None
    record(tag, {"result": parsed, "wall_s": round(time.time() - t0, 1),
                 "env": env or {}, **({"smoke": True} if SMOKE_ARGS else {})})
    return parsed


def run_tool(tag: str, argv: list, env: dict | None = None,
             timeout_s: float = 1200.0, tail_lines: int = 6) -> None:
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

NOVAR = {"QFA_BENCH_AUTO_VARIANT": "0"}


def phase_u3():
    run_bench("u3_concat", [], env={"QFA_E8P_U3": "1", **NOVAR})
    run_bench("u3_halfdots", [],
              env={"QFA_E8P_U3": "1", "QFA_U3_HALFDOTS": "1", **NOVAR})


def phase_pb():
    run_bench("pb_rvq4b", ["--codebook", "E8P12RVQ4B"],
              env={"QFA_RVQ_PB": "1", **NOVAR})
    run_bench("nibble_rvq4b", ["--codebook", "E8P12RVQ4B"], env=NOVAR)


def phase_u3bs32():
    run_bench("u3_bs32_kvq8",
              ["--batch", "32", "--cache-len", "0", "--kv-quantized"],
              env={"QFA_E8P_U3": "1", **NOVAR})


def phase_serving():
    sv = os.path.join(ROOT, "tools", "bench_serving.py")
    # true per-token latency row: chunk=1, no fetch batching
    run_tool("serving_b1_chunk1",
             [sv, "--max-batch", "1", "--decode-chunk", "1",
              "--fetch-batch", "1",
              "--requests", "4", "--max-new", "64"], tail_lines=3)
    run_tool("serving_b1_chunk8",
             [sv, "--max-batch", "1", "--decode-chunk", "8",
              "--requests", "4", "--max-new", "128"], tail_lines=3)
    run_tool("serving_b8",
             [sv, "--max-batch", "8", "--requests", "16",
              "--max-new", "64"], tail_lines=3)


def phase_headline():
    run_bench("headline", [], env={"QFA_BENCH_AUTO_VARIANT": "1"})


PHASES = {"u3": phase_u3, "pb": phase_pb, "u3bs32": phase_u3bs32,
          "serving": phase_serving, "headline": phase_headline}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="u3,pb")
    ap.add_argument("--smoke", action="store_true")
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
