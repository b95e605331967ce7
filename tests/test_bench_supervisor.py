"""bench.py supervisor: retry/backoff resilience against relay failures.

Round-2 lesson: the driver's bench run died with a single transient
"Unable to initialize backend 'axon'" and the round's headline perf number
was lost (BENCH_r02.json rc=1). The supervisor must retry transient
failures in fresh subprocesses, never give up while budget remains, and
emit diagnostics JSON on final failure.
"""
import json
import os
import stat
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

pytestmark = pytest.mark.fast


def _fake_child(tmp_path, script_body):
    p = tmp_path / "child.sh"
    p.write_text("#!/bin/bash\n" + script_body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def _run(child, **env_overrides):
    env = dict(os.environ)
    env.update({"QFA_BENCH_CHILD_CMD": child,
                "QFA_BENCH_BACKOFF_S": "0.05,0.05",
                "QFA_BENCH_MAX_ATTEMPTS": "4",
                "QFA_BENCH_BUDGET_S": "30"})
    env.update(env_overrides)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=60)


def test_transient_failure_then_success(tmp_path):
    state = tmp_path / "n"
    child = _fake_child(tmp_path, f"""
N=$(cat {state} 2>/dev/null || echo 0); echo $((N+1)) > {state}
if [ "$N" -lt 2 ]; then
  echo "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE" >&2
  exit 1
fi
echo '{{"metric": "m", "value": 150.0, "unit": "tokens/s"}}'
""")
    r = _run(child)
    assert r.returncode == 0, r.stderr
    parsed = json.loads(r.stdout.strip().splitlines()[-1])
    assert parsed["value"] == 150.0
    assert state.read_text().strip() == "3"  # 2 failures + 1 success


def test_final_failure_emits_diagnostics_json(tmp_path):
    child = _fake_child(tmp_path, """
echo "UNAVAILABLE: relay down" >&2
exit 1
""")
    r = _run(child)
    assert r.returncode == 1
    parsed = json.loads(r.stdout.strip().splitlines()[-1])
    assert parsed["value"] is None
    assert parsed["attempts"] == 4
    assert any("UNAVAILABLE" in e for e in parsed["attempt_errors"])


def test_noise_before_json_line_is_tolerated(tmp_path):
    child = _fake_child(tmp_path, """
echo "# some progress noise"
echo '{"metric": "m", "value": 99.5, "unit": "tokens/s"}'
echo "WARNING: trailing non-json noise"
""")
    r = _run(child)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.strip().splitlines()]
    parsed = json.loads(lines[-1])
    assert parsed["value"] == 99.5


def test_rc0_without_json_is_a_failure(tmp_path):
    child = _fake_child(tmp_path, 'echo "no json here"\n')
    r = _run(child)
    assert r.returncode == 1
    parsed = json.loads(r.stdout.strip().splitlines()[-1])
    assert parsed["value"] is None


def test_provisional_result_salvaged_from_failed_child(tmp_path):
    """A child that lands a provisional measurement then dies mid-probe
    must still produce the round's number (rc=0, provisional value)."""
    child = _fake_child(tmp_path, """
echo '{"metric": "m", "value": 141.5, "unit": "tokens/s", "provisional": true}'
echo "variant probe crashed the remote compiler" >&2
exit 1
""")
    r = _run(child)
    assert r.returncode == 0, r.stderr
    parsed = json.loads(r.stdout.strip().splitlines()[-1])
    assert parsed["value"] == 141.5
