"""Host-global serialization lock (vacuumlock.rb:184-285 parity).

Redshift allows one concurrent VACUUM per cluster, so the reference
serializes vacuums behind a host-global lock file with a timeout
(default 3600 s, ``BRICOLAGE_VACUUM_LOCK``). Spark compaction has no such
hard limit, but serializing heavy rewrites is still operationally useful
(I/O contention), so the utility is kept with the same contract:
create-exclusive lock file, poll with timeout, stale-lock detection via
the writing pid.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

from bricolage_spark.exception import JobFailure

DEFAULT_TIMEOUT = 3600  # vacuumlock.rb:191
DEFAULT_POLL = 1.0


class LockTimeout(JobFailure):
    pass


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except (ProcessLookupError, PermissionError):
        return False
    except Exception:
        return True


@contextmanager
def serialized(lock_path: str, timeout: float = DEFAULT_TIMEOUT, poll: float = DEFAULT_POLL):
    """Acquire ``lock_path`` exclusively, waiting up to ``timeout`` s.

    A lock whose writing process is dead is broken automatically
    (create-lockfile stale handling parity).
    """
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                with open(lock_path) as f:
                    owner = int(f.read().strip() or 0)
            except (OSError, ValueError):
                owner = 0
            if owner and not _pid_alive(owner):
                try:
                    os.remove(lock_path)  # stale: owner died
                    continue
                except FileNotFoundError:
                    continue
            if time.monotonic() >= deadline:
                raise LockTimeout(
                    f"could not acquire lock within {timeout}s: {lock_path}"
                )
            time.sleep(poll)
    try:
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))
        yield
    finally:
        try:
            os.remove(lock_path)
        except FileNotFoundError:
            pass
