"""Single-chip claim lock — serialize TPU processes on one host.

The remote v5e worker wedges (10-30+ min of dead chip) when two
processes run against it concurrently, and even non-wedging contention
skews benchmarks (r5, 15:25: quality-matrix subprocesses silently landed
on the chip and ran concurrently with serving sessions). The reference
stack has no equivalent because CUDA multiplexes; a single-tenant TPU
tunnel needs explicit serialization.

``chip_lock()`` is an advisory flock on a well-known file, taken by
every TPU-touching entry point in this repo (bench.py supervisor,
tools/session_r5.py, tools/bench_serving.py). Cooperating processes
queue instead of colliding; a crashed holder's lock dies with its fd
(flock semantics — no stale-lockfile cleanup needed).

    with chip_lock(timeout_s=1800):
        ...  # jax/TPU work

Lock is a no-op when the active backend is cpu (JAX_PLATFORMS=cpu) so
CPU test/tool runs never queue behind a chip user.
"""
from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import time

LOCK_PATH = os.environ.get("QFA_CHIP_LOCK", "/tmp/qfa_chip.lock")


class ChipLockTimeout(TimeoutError):
    pass


@contextlib.contextmanager
def chip_lock(timeout_s: float = 1800.0, poll_s: float = 5.0,
              path: str | None = None):
    """Advisory inter-process lock around TPU usage.

    Blocks up to ``timeout_s`` waiting for the current holder (another
    bench/session run) to finish, then yields holding the lock. Raises
    ChipLockTimeout on expiry — callers treat that like an unavailable
    relay (retry later), NOT as a reason to proceed unlocked.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        yield None
        return
    p = path or LOCK_PATH
    fd = os.open(p, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.time()
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    raise
                if time.time() - t0 > timeout_s:
                    raise ChipLockTimeout(
                        f"chip lock {p} held elsewhere for "
                        f"> {timeout_s:.0f}s") from None
                time.sleep(poll_s)
        try:
            os.ftruncate(fd, 0)
            os.write(fd, f"pid={os.getpid()} t={time.time():.0f}\n"
                     .encode())
        except OSError:
            pass
        yield fd
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)
