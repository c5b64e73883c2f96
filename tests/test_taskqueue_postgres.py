"""DatabaseTaskQueue against a REAL PostgreSQL server (r12 verdict ask
#5).

This container ships the PostgreSQL 15 server binaries but no psycopg —
and installs are off-limits — so the psycopg import line stays covered
by the stub tests in test_parity_extras.py, while THIS module validates
everything downstream of the driver against a real server: the
postgres-dialect DDL (IDENTITY keys), the rewritten ``%s`` statements,
ON CONFLICT / RETURNING behavior, cross-connection persist + resume
(the multi-host semantics the backend exists for), jobnet isolation,
and true server-side advisory-lock mutual exclusion across two
sessions.

Mechanism: a throwaway cluster (initdb + unix socket, run as the
``postgres`` user via runuser) and ``PsqlConn`` — a minimal DB-API
shim over one persistent ``psql`` session with AUTOCOMMIT off, which
performs psycopg's two client-side duties (placeholder interpolation
with literal quoting, transaction demarcation) and leaves every
server-side behavior to PostgreSQL itself. Skipped automatically where
the server binaries or the postgres user are unavailable.
"""

from __future__ import annotations

import csv
import io
import os
import re
import shutil
import subprocess
import uuid

import pytest

from bricolage_spark.exception import ParameterError
from bricolage_spark.taskqueue import DatabaseTaskQueue

_HAVE_PG = bool(shutil.which("initdb") and shutil.which("pg_ctl")
                and shutil.which("psql") and shutil.which("runuser"))
pytestmark = pytest.mark.skipif(
    not _HAVE_PG, reason="PostgreSQL server binaries not available"
)

_NOISE = re.compile(
    r"^(INSERT|UPDATE|DELETE|SELECT \d|CREATE|DROP|COMMIT|BEGIN|ROLLBACK|SET)\b"
)


class PsqlCursor:
    def __init__(self, conn: "PsqlConn"):
        self._conn = conn
        self._rows: list[tuple] = []

    def execute(self, sql: str, params=()):
        self._rows = self._conn._run(sql, tuple(params))
        return self

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def fetchall(self):
        return list(self._rows)


class PsqlConn:
    """One persistent psql session, AUTOCOMMIT off (psycopg-like
    transaction demarcation: implicit BEGIN, explicit commit/rollback)."""

    def __init__(self, sockdir: str, dbname: str):
        self._p = subprocess.Popen(
            ["psql", "-h", sockdir, "-U", "postgres", "-d", dbname,
             "-X", "-q", "-A", "-t", "--csv"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, bufsize=1,
        )
        self._seq = 0
        self._write("\\set AUTOCOMMIT off\n")
        self._drain()  # sync once so startup noise can't pollute results

    # -- plumbing ----------------------------------------------------------
    def _write(self, s: str) -> None:
        assert self._p.stdin is not None
        self._p.stdin.write(s)
        self._p.stdin.flush()

    def _drain(self) -> list[str]:
        """Echo a sentinel and read every line up to it."""
        self._seq += 1
        mark = f"__SYNC_{self._seq}__"
        self._write(f"\\echo {mark}\n")
        lines: list[str] = []
        assert self._p.stdout is not None
        for line in self._p.stdout:
            line = line.rstrip("\n")
            if line == mark:
                return lines
            lines.append(line)
        raise RuntimeError("psql session died: " + "\n".join(lines[-5:]))

    @staticmethod
    def _literal(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    def _interpolate(self, sql: str, params: tuple) -> str:
        """psycopg's client-side parameter binding: %s -> quoted literal
        (outside string literals), %% -> %."""
        out: list[str] = []
        it = iter(params)
        in_str = False
        i = 0
        while i < len(sql):
            ch = sql[i]
            if ch == "'":
                in_str = not in_str
                out.append(ch)
            elif not in_str and sql.startswith("%s", i):
                out.append(self._literal(next(it)))
                i += 1
            elif sql.startswith("%%", i):
                out.append("%")
                i += 1
            else:
                out.append(ch)
            i += 1
        leftover = list(it)
        assert not leftover, f"unbound params: {leftover}"
        return "".join(out)

    def _run(self, sql: str, params: tuple) -> list[tuple]:
        stmt = self._interpolate(sql, params).strip()
        if not stmt.endswith(";"):
            stmt += ";"
        self._write(stmt + "\n")
        lines = self._drain()
        errors = [l for l in lines if l.startswith(("ERROR:", "psql:"))]
        if errors:
            raise RuntimeError("; ".join(errors))
        data = "\n".join(
            l for l in lines
            if l and not _NOISE.match(l) and not l.startswith(("WARNING:",
                                                               "NOTICE:",
                                                               "HINT:",
                                                               "DETAIL:",
                                                               "LINE ",
                                                               " "))
        )
        # psycopg converts by server type OID; a CSV shim must infer.
        # Bare t/f is how psql spells booleans (pg_try_advisory_lock's
        # result — psycopg hands back a real bool, and the queue's
        # ``if not got`` depends on it); no queue column ever stores a
        # one-char t/f payload, so the inference is safe HERE (it is a
        # test shim, not a driver).
        def conv(x: str):
            if x == "":
                return None
            if x == "t":
                return True
            if x == "f":
                return False
            return int(x) if re.fullmatch(r"-?\d+", x) else x

        rows = []
        for rec in csv.reader(io.StringIO(data)):
            rows.append(tuple(conv(x) for x in rec))
        return rows

    # -- DB-API surface DatabaseTaskQueue uses -----------------------------
    def cursor(self) -> PsqlCursor:
        return PsqlCursor(self)

    def commit(self) -> None:
        self._write("COMMIT;\n")
        self._drain()

    def rollback(self) -> None:
        self._write("ROLLBACK;\n")
        self._drain()

    def close(self) -> None:
        try:
            self._write("\\q\n")
            self._p.wait(timeout=10)
        except Exception:
            self._p.kill()


@pytest.fixture(scope="module")
def pg_server():
    # NOT pytest's tmp_path: the server runs as the ``postgres`` user,
    # which cannot traverse /tmp/pytest-of-root (0700). A fresh 0755
    # dir directly under /tmp, chowned to postgres, is reachable by
    # both sides; cwd="/" because runuser keeps the caller's cwd and
    # postgres can't read /root.
    import shutil as _shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="bricolage_pgq_", dir="/tmp")
    try:
        _shutil.chown(base, "postgres", "postgres")
    except (PermissionError, LookupError):
        _shutil.rmtree(base, ignore_errors=True)
        pytest.skip("cannot chown a server dir to the postgres user")
    data = os.path.join(base, "data")
    r = subprocess.run(
        ["runuser", "-u", "postgres", "--", "initdb", "-D", data, "-A",
         "trust"],
        capture_output=True, text=True, cwd="/",
    )
    if r.returncode != 0:
        _shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = subprocess.run(
        ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
         "-l", os.path.join(base, "log"),
         "-o", f"-c listen_addresses='' -k {base}", "-w", "start"],
        capture_output=True, text=True, cwd="/",
    )
    if r.returncode != 0:
        _shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    try:
        yield base
    finally:
        subprocess.run(
            ["runuser", "-u", "postgres", "--", "pg_ctl", "-D", data,
             "-m", "immediate", "-w", "stop"],
            capture_output=True, text=True, cwd="/",
        )
        _shutil.rmtree(base, ignore_errors=True)


@pytest.fixture()
def pg_queue_factory(pg_server, monkeypatch):
    """DatabaseTaskQueue factory bound to a fresh database on the real
    server; the shim is injected at the _connect seam, so everything
    from the dialect switch down runs unmodified."""
    dbname = f"q_{uuid.uuid4().hex[:12]}"
    subprocess.run(
        ["psql", "-h", pg_server, "-U", "postgres", "-d", "postgres",
         "-qAtc", f"CREATE DATABASE {dbname}"],
        check=True, capture_output=True,
    )
    conns: list[PsqlConn] = []

    def connect(dsn: str):
        assert dsn.startswith(("postgresql://", "postgres://"))
        conn = PsqlConn(pg_server, dbname)
        conns.append(conn)
        return conn, "postgres"

    monkeypatch.setattr(
        DatabaseTaskQueue, "_connect", staticmethod(connect)
    )

    def make(jobnet_name: str = "net1") -> DatabaseTaskQueue:
        return DatabaseTaskQueue(
            f"postgresql://local/{dbname}", jobnet_name=jobnet_name
        )

    yield make
    for c in conns:
        c.close()


def test_pg_schema_and_persist_resume_audit(pg_queue_factory):
    """The SQLite twin test (test_parity_extras.py::
    test_db_queue_persist_resume_and_audit), replayed verbatim against
    real PostgreSQL: IDENTITY DDL, ON CONFLICT, INSERT..RETURNING, and
    cross-CONNECTION restore (each queue object is its own session —
    the multi-host model)."""
    q = pg_queue_factory()
    for j in ("s/a", "s/b"):
        q.enqueue(j)
    for task in q.consume_each():
        task.transition("succeeded" if task.job == "s/a" else "failed", "boom")
    q.close()

    q2 = pg_queue_factory()
    assert [(t.job, t.status) for t in q2.tasks] == [
        ("s/a", "succeeded"),
        ("s/b", "failed"),
    ]
    ran = []
    for task in q2.consume_each():
        ran.append(task.job)
        task.transition("succeeded")
    assert ran == ["s/b"]
    hist = [s for s, _ in q2.state_history("s/b")]
    assert hist[0] == "waiting" and hist[-1] == "succeeded"
    assert "failed" in hist and "running" in hist
    q2.close()

    q3 = pg_queue_factory()
    assert q3.tasks == []  # completed run → fresh start
    q3.close()


def test_pg_running_state_resets_on_restore(pg_queue_factory):
    q = pg_queue_factory()
    q.enqueue("s/a")
    q.tasks[0].transition("running")
    q.save()
    q.close()
    q2 = pg_queue_factory()
    assert q2.tasks[0].status == "waiting"  # mid-run crash → re-run
    q2.close()


def test_pg_jobnet_isolation(pg_queue_factory):
    q = pg_queue_factory("net1")
    q.enqueue("s/a")
    q.save()
    other = pg_queue_factory("net2")
    assert other.tasks == []
    other.close()
    q.close()


def test_pg_advisory_lock_excludes_second_session(pg_queue_factory):
    """True server-side mutual exclusion: the second SESSION (separate
    psql backend) must be refused while the first holds the jobnet's
    advisory lock, and admitted after unlock — the cross-host contract
    the SQLite file lock cannot provide."""
    q1 = pg_queue_factory()
    q2 = pg_queue_factory()
    q1.lock()
    with pytest.raises(ParameterError, match="already running"):
        q2.lock()
    q1.unlock()
    q2.lock()  # now admitted
    q2.unlock()
    q1.close()
    q2.close()
