"""Chip-claim serialization (utils/chiplock.py): two cooperating
processes must never hold the lock simultaneously, a crashed holder's
lock must self-release, and JAX_PLATFORMS=cpu must bypass entirely."""
import os
import subprocess
import sys
import time

import pytest

from quip_for_all_tpu.utils.chiplock import ChipLockTimeout, chip_lock

HOLDER = r"""
import sys, time
sys.path.insert(0, {root!r})
import os
os.environ.pop("JAX_PLATFORMS", None)
from quip_for_all_tpu.utils.chiplock import chip_lock
with chip_lock(path={path!r}):
    print("HELD", flush=True)
    time.sleep({hold})
"""

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(path, hold):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    p = subprocess.Popen(
        [sys.executable, "-c",
         HOLDER.format(root=ROOT, path=path, hold=hold)],
        stdout=subprocess.PIPE, text=True, env=env)
    assert p.stdout.readline().strip() == "HELD"
    return p


@pytest.fixture
def lockfile(tmp_path):
    return str(tmp_path / "chip.lock")


def test_mutual_exclusion_and_queueing(lockfile):
    env_save = os.environ.pop("JAX_PLATFORMS", None)
    try:
        p = _spawn(lockfile, hold=3.0)
        t0 = time.time()
        with chip_lock(timeout_s=30.0, poll_s=0.2, path=lockfile):
            waited = time.time() - t0
        assert waited >= 1.0, "acquired while holder still alive"
        p.wait(timeout=10)
    finally:
        if env_save is not None:
            os.environ["JAX_PLATFORMS"] = env_save


def test_timeout_raises(lockfile):
    env_save = os.environ.pop("JAX_PLATFORMS", None)
    try:
        p = _spawn(lockfile, hold=8.0)
        with pytest.raises(ChipLockTimeout):
            with chip_lock(timeout_s=0.6, poll_s=0.2, path=lockfile):
                pass
        p.kill()
        p.wait(timeout=10)
    finally:
        if env_save is not None:
            os.environ["JAX_PLATFORMS"] = env_save


def test_crashed_holder_releases(lockfile):
    env_save = os.environ.pop("JAX_PLATFORMS", None)
    try:
        p = _spawn(lockfile, hold=60.0)
        p.kill()
        p.wait(timeout=10)
        t0 = time.time()
        with chip_lock(timeout_s=10.0, poll_s=0.2, path=lockfile):
            pass
        assert time.time() - t0 < 5.0, "stale lock survived holder death"
    finally:
        if env_save is not None:
            os.environ["JAX_PLATFORMS"] = env_save


def test_cpu_env_bypasses(lockfile):
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        p = _spawn(lockfile, hold=5.0)
        t0 = time.time()
        with chip_lock(timeout_s=30.0, path=lockfile):
            pass
        assert time.time() - t0 < 2.0
        p.kill()
        p.wait(timeout=10)
    finally:
        os.environ["JAX_PLATFORMS"] = "cpu"
