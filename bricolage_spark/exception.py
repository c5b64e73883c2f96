"""Error taxonomy (parity with reference lib/bricolage/exception.rb:150-209).

The reference distinguishes user errors (ParameterError — bad job files,
undefined variables), job failures (JobFailure — expected runtime failure,
e.g. SQL error; the jobnet stops and can resume), and job errors
(JobError — unexpected bugs). Exit-status mapping mirrors jobresult.rb.
"""

from __future__ import annotations


class ApplicationError(Exception):
    """Base for all engine errors."""

    exit_status = 1


class ParameterError(ApplicationError):
    """Bad user input: job file syntax, undefined/cyclic variables."""

    exit_status = 2


class JobFailure(ApplicationError):
    """Expected failure of a job (SQL error, missing file, timeout)."""

    exit_status = 3


class JobError(ApplicationError):
    """Unexpected error inside a job (a bug)."""

    exit_status = 4


def concise_error(err: BaseException, limit: int = 300) -> str:
    """First line of an exception message, trimmed.

    Spark analysis errors embed the whole logical plan + JVM stack in
    ``str(err)`` — users need the first line ('TABLE_OR_VIEW_NOT_FOUND
    ...'), not 5 KB of tree dump.
    """
    first = str(err).strip().splitlines()[0] if str(err).strip() else repr(err)
    return first[:limit]
