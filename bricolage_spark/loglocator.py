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
