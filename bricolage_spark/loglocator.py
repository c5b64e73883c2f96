"""Per-job log-file locator: templated log paths + stdout/stderr capture.

Parity with ``lib/bricolage/logfilepath.rb`` and
``lib/bricolage/loglocator.rb:22-39`` — the reference redirects each
job's stdout/stderr to a path expanded from a ``%{var}`` template
(``--log-dir``/``--log-path``/``$BRICOLAGE_LOG_DIR``/
``$BRICOLAGE_LOG_PATH``), so an operator debugging a 200-job jobnet gets
one log file per job instead of one interleaved stream.

Differences, both deliberate:

- ``%{job_start_date}``/``%{job_start_time}`` work here; in the
  reference they call ``params.start_time`` on a Struct that has no such
  member (``logfilepath.rb:51-57`` — a latent NoMethodError), so no
  working behavior existed to mirror. We use the job's start time, which
  is what the names say.
- redirection is OS-level (``dup2`` on fds 1/2) so forked ``--isolate``
  children and any subprocess the job spawns inherit it; the Spark JVM
  keeps ITS OWN copy of the original fds from session launch, so
  executor/log4j output stays in the runner's main log — per-job files
  capture the job's Python-side output, same as the reference captures
  only the forked Ruby child's.
"""

from __future__ import annotations

import contextlib
import os
import re
import sys
import threading
from collections.abc import Callable
from datetime import datetime

from bricolage_spark.exception import ParameterError

_VAR_RE = re.compile(r"%\{(\w+)\}")

#: logfilepath.rb:44 — the ``%{std}`` layout
STD_TEMPLATE = "%{jobnet_start_date}/%{jobnet}/%{jobnet_start_time}/%{subsystem}-%{job}"

_JOBNET_ALIASES = ("jobnet", "net", "jobnet_id", "net_id", "flow", "flow_id")


def _hms_millis(t: datetime) -> str:
    # Ruby's %Y%m%d_%H%M%S%L: milliseconds, 3 digits
    return f"{t:%Y%m%d_%H%M%S}{t.microsecond // 1000:03d}"


class LogFilePath:
    """A ``%{var}`` path template (logfilepath.rb:1-90)."""

    def __init__(self, template: str):
        self.template = template

    @classmethod
    def default(cls) -> "LogFilePath | None":
        """Environment defaults (logfilepath.rb:3-12): $BRICOLAGE_LOG_DIR
        wins over $BRICOLAGE_LOG_PATH; neither -> no per-job logs."""
        d = os.environ.get("BRICOLAGE_LOG_DIR")
        if d:
            return cls(f"{d}/%{{std}}.log")
        p = os.environ.get("BRICOLAGE_LOG_PATH")
        if p:
            return cls(p)
        return None

    def format(
        self,
        *,
        subsystem: str,
        job: str,
        jobnet_id: str,
        job_start_time: datetime,
        jobnet_start_time: datetime,
    ) -> str:
        def expand(template: str) -> str:
            def sub(m: re.Match) -> str:
                var = m.group(1)
                if var == "std":
                    return expand(STD_TEMPLATE)
                if var == "jobnet_start_date":
                    return f"{jobnet_start_time:%Y%m%d}"
                if var == "jobnet_start_time":
                    return _hms_millis(jobnet_start_time)
                if var == "job_start_date":
                    return f"{job_start_time:%Y%m%d}"
                if var == "job_start_time":
                    return _hms_millis(job_start_time)
                if var in _JOBNET_ALIASES:
                    return jobnet_id.replace("/", "::")
                if var == "subsystem":
                    return subsystem
                if var in ("job", "job_id"):
                    return job
                raise ParameterError(f"bad log path variable: %{{{var}}}")

            return _VAR_RE.sub(sub, template)

        return expand(self.template)


class _StreamRouter:
    """A sys.stdout/stderr stand-in that routes writes per-thread.

    Threads that registered a stream via ``push`` write there; everyone
    else falls through to the original stream, so the runner's own
    scheduling output and any unregistered thread (Py4J callback threads,
    user threads inside a job) behave exactly as before.
    """

    def __init__(self, fallback):
        self._fallback = fallback
        self._local = threading.local()

    # -- routing -----------------------------------------------------
    def push(self, stream) -> None:
        self._local.stream = stream

    def pop(self) -> None:
        self._local.stream = None

    def _target(self):
        return getattr(self._local, "stream", None) or self._fallback

    # -- file-object protocol (the subset print/logging/traceback use) --
    def write(self, s) -> int:
        return self._target().write(s)

    def writelines(self, lines) -> None:
        self._target().writelines(lines)

    def flush(self) -> None:
        self._target().flush()

    def isatty(self) -> bool:
        t = self._target()
        return bool(getattr(t, "isatty", lambda: False)())

    def fileno(self) -> int:
        # Always the FALLBACK's fd: code that grabs fileno() wants the
        # process-level stream (e.g. subprocess wiring); per-thread files
        # deliberately do not masquerade as fd 1/2.
        return self._fallback.fileno()

    @property
    def encoding(self):
        return getattr(self._target(), "encoding", "utf-8")

    @property
    def errors(self):
        return getattr(self._target(), "errors", "strict")


_ROUTER_LOCK = threading.Lock()
_ROUTERS: tuple[_StreamRouter, _StreamRouter] | None = None
_ROUTER_REFS = 0


def _active_routers() -> tuple[_StreamRouter, _StreamRouter] | None:
    return _ROUTERS


@contextlib.contextmanager
def thread_stream_routing():
    """Install per-thread stdout/stderr routers for the duration.

    Re-entrant and refcounted: nested/concurrent installs share one
    router pair; the originals are restored when the last user exits.
    Installed once by the parallel runner around the whole scheduling
    loop, NOT per job — swapping sys.stdout per job would race.
    """
    global _ROUTERS, _ROUTER_REFS
    with _ROUTER_LOCK:
        if _ROUTERS is None:
            _ROUTERS = (_StreamRouter(sys.stdout), _StreamRouter(sys.stderr))
            sys.stdout, sys.stderr = _ROUTERS
        _ROUTER_REFS += 1
    try:
        yield
    finally:
        with _ROUTER_LOCK:
            _ROUTER_REFS -= 1
            if _ROUTER_REFS == 0 and _ROUTERS is not None:
                out_r, err_r = _ROUTERS
                # only restore what we installed: a job that reassigned
                # sys.stdout itself keeps its assignment
                if sys.stdout is out_r:
                    sys.stdout = out_r._fallback
                if sys.stderr is err_r:
                    sys.stderr = err_r._fallback
                _ROUTERS = None


class LogLocator:
    """One job's log destination (loglocator.rb:4-96): a local path (or
    None for no capture) plus an optional ``upload(path)`` callable — the
    reference's S3Writer slot; here any callable that ships the file to
    durable storage (an s3a:// copy on a real cluster). On successful
    upload the local file is removed and empty parent dirs pruned, as the
    reference does."""

    def __init__(self, path: str | None, upload: Callable[[str], None] | None = None):
        self.path = path
        self._upload = upload

    @contextlib.contextmanager
    def redirect_stdouts(self):
        """Capture fds 1/2 into ``path`` for the duration (loglocator.rb:
        22-39). fd-level so forked children inherit it; always restores."""
        if not self.path:
            yield
            return
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        sys.stdout.flush()
        sys.stderr.flush()
        # open BEFORE dup'ing: if open raises there is nothing to leak,
        # while dup-then-open would leak two fds per failed job
        f = open(self.path, "wb", buffering=0)
        try:
            saved_out, saved_err = os.dup(1), os.dup(2)
        except OSError:
            f.close()
            raise
        try:
            os.dup2(f.fileno(), 1)
            os.dup2(f.fileno(), 2)
            yield
        finally:
            sys.stdout.flush()
            sys.stderr.flush()
            os.dup2(saved_out, 1)
            os.dup2(saved_err, 2)
            os.close(saved_out)
            os.close(saved_err)
            f.close()
            self._ship()

    @contextlib.contextmanager
    def redirect_thread_stdouts(self):
        """Per-THREAD capture for the parallel runner: route this thread's
        ``sys.stdout``/``sys.stderr`` writes into ``path`` while other
        threads keep writing to their own (or the shared) destination.

        Python-level, not fd-level: ``redirect_stdouts`` dup2's fds 1/2,
        which is process-global — two concurrent jobs would interleave
        into whichever file was dup'd last. Here ``thread_stream_routing``
        has replaced sys.stdout/stderr with per-thread routers, and this
        context registers the job's file for the current thread only.
        Trade-off (documented in --parallel's help): writers that bypass
        sys.stdout — subprocess children of an exec job, C extensions
        writing to fd 1 — are NOT captured under --parallel; they are
        under sequential fd-level capture.
        """
        if not self.path:
            yield
            return
        routers = _active_routers()
        if routers is None:
            raise RuntimeError(
                "redirect_thread_stdouts requires thread_stream_routing() "
                "to be installed"
            )
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        f = open(self.path, "w", buffering=1, encoding="utf-8")
        out_r, err_r = routers
        out_r.push(f)
        err_r.push(f)
        try:
            yield
        finally:
            out_r.pop()
            err_r.pop()
            f.close()
            self._ship()

    def _ship(self) -> None:
        if not (self.path and self._upload):
            return
        try:
            self._upload(self.path)
        except Exception as err:  # parity: upload failure is a warning
            print(
                f"warning: log upload failed: {type(err).__name__}: {err}",
                file=sys.stderr,
            )
            return
        os.unlink(self.path)
        # prune now-empty parents (loglocator.rb:80-89)
        d = os.path.dirname(self.path)
        while d and d not in ("/", "."):
            try:
                os.rmdir(d)
            except OSError:
                break
            d = os.path.dirname(d)
