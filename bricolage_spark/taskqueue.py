"""Resumable task queues + job-execution state machine.

Parity targets:
- FileTaskQueue (lib/bricolage/taskqueue.rb:63-172): queue persisted
  after every job; a restart restores the unfinished queue and skips
  completed jobs; a lock file guards concurrent runs.
- Job-execution states (lib/bricolage/dao/jobexecution.rb:7-11):
  waiting / running / succeeded / failed / canceled, with an audit trail
  of transitions (job_execution_states, schema/Schemafile:16-33).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from dataclasses import dataclass, field

from bricolage_spark.exception import ParameterError

STATES = ("waiting", "running", "succeeded", "failed", "canceled")


@dataclass
class Task:
    job: str  # "subsys/name"
    status: str = "waiting"
    message: str = ""
    history: list[dict] = field(default_factory=list)

    def transition(self, status: str, message: str = "") -> None:
        if status not in STATES:
            raise ParameterError(f"unknown job state: {status}")
        self.status = status
        self.message = message
        self.history.append(
            {
                "status": status,
                "message": message,
                "at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            }
        )


class MemoryTaskQueue:
    """In-memory queue (taskqueue.rb:13-60)."""

    def __init__(self) -> None:
        self.tasks: list[Task] = []

    def enqueue(self, job: str) -> None:
        self.tasks.append(Task(job=job))

    @property
    def pending(self) -> list[Task]:
        return [t for t in self.tasks if t.status in ("waiting", "failed", "running")]

    def consume_each(self):
        """Yield pending tasks; caller marks them via ``task.transition``
        and the queue persists after each (save() hook)."""
        for task in self.tasks:
            if task.status == "succeeded":
                continue
            task.transition("running")
            self.save()
            yield task
            self.save()
            if task.status == "failed":
                break

    def save(self) -> None:  # memory queue: no-op
        pass

    def lock(self) -> None:  # overridden by persistent queues
        pass

    def unlock(self) -> None:
        pass

    def unlink(self) -> None:
        pass

    @property
    def unfinished(self) -> bool:
        return bool(self.pending)


class FileTaskQueue(MemoryTaskQueue):
    """Queue persisted to a JSON state file; restart resumes
    (taskqueue.rb:63-172: save :110-127, restore :78-109, lock :129-147).
    """

    def __init__(self, path: str):
        super().__init__()
        self.path = path

    @classmethod
    def restore_if_exists(cls, path: str) -> "FileTaskQueue":
        q = cls(path)
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            for t in data.get("tasks", []):
                task = Task(
                    job=t["job"],
                    status=t["status"],
                    message=t.get("message", ""),
                    history=t.get("history", []),
                )
                # a job mid-run when we crashed is re-run
                if task.status == "running":
                    task.status = "waiting"
                q.tasks.append(task)
        return q

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "tasks": [
                        {
                            "job": t.job,
                            "status": t.status,
                            "message": t.message,
                            "history": t.history,
                        }
                        for t in self.tasks
                    ]
                },
                f,
                indent=2,
            )
        os.replace(tmp, self.path)

    def unlink(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)

    # -- lock (taskqueue.rb:129-147) ---------------------------------------

    @property
    def lock_path(self) -> str:
        return self.path + ".LOCK"

    def lock(self) -> None:
        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ParameterError(
                f"another jobnet is already running (lock exists: {self.lock_path})"
            )
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))

    def unlock(self) -> None:
        if os.path.exists(self.lock_path):
            os.remove(self.lock_path)

    @property
    def locked(self) -> bool:
        return os.path.exists(self.lock_path)


class DatabaseTaskQueue(MemoryTaskQueue):
    """DB-backed queue + job-execution audit (taskqueue.rb:175-310,
    dao/jobexecution.rb, schema/Schemafile:1-57).

    Tables mirror the reference Schemafile: ``jobs`` (identity),
    ``job_executions`` (latest state per job) and
    ``job_execution_states`` (append-only transition audit).

    ``dsn`` selects the backend: a ``postgresql://`` / ``postgres://`` URL
    connects via psycopg (v3 or v2, whichever is installed) and gives the
    reference's multi-host semantics — shared state, cross-host resume,
    and a server-side advisory lock per jobnet; anything else is a SQLite
    file path (zero-dependency default, single-writer). The SQL below is
    written once in the common subset (``?`` placeholders, ``RETURNING``,
    ``ON CONFLICT DO NOTHING``) and rewritten per paramstyle.
    """

    _SCHEMA = """
    CREATE TABLE IF NOT EXISTS jobs (
        job_id {pk},
        subsystem TEXT NOT NULL,
        job_name TEXT NOT NULL,
        jobnet_name TEXT NOT NULL,
        UNIQUE (subsystem, job_name, jobnet_name)
    );
    CREATE TABLE IF NOT EXISTS job_executions (
        job_execution_id {pk},
        job_id BIGINT NOT NULL REFERENCES jobs (job_id),
        status TEXT NOT NULL,
        message TEXT,
        execution_sequence BIGINT NOT NULL DEFAULT 0,
        submitted_at TEXT, started_at TEXT, finished_at TEXT
    );
    CREATE TABLE IF NOT EXISTS job_execution_states (
        id {pk},
        job_execution_id BIGINT NOT NULL REFERENCES job_executions (job_execution_id),
        job_id BIGINT NOT NULL,
        status TEXT NOT NULL,
        message TEXT,
        created_at TEXT NOT NULL
    );
    """

    _PK = {
        "sqlite": "INTEGER PRIMARY KEY AUTOINCREMENT",
        "postgres": "BIGINT GENERATED BY DEFAULT AS IDENTITY PRIMARY KEY",
    }

    def __init__(self, dsn: str, jobnet_name: str = "net"):
        super().__init__()
        self.db_path = dsn  # retained name: lock_path/tests use it
        self.jobnet_name = jobnet_name
        self._conn, self._dialect = self._connect(dsn)
        for stmt in self._SCHEMA.format(pk=self._PK[self._dialect]).split(";"):
            if stmt.strip():
                self._exec(stmt)
        self._conn.commit()
        self._restore()

    @staticmethod
    def _connect(dsn: str):
        if dsn.startswith(("postgresql://", "postgres://")):
            try:
                import psycopg  # psycopg 3
            except ImportError:
                try:
                    import psycopg2 as psycopg
                except ImportError:
                    raise ParameterError(
                        "PostgreSQL task queue requires psycopg (v3) or "
                        "psycopg2; pass a SQLite path instead, or install one"
                    )
            return psycopg.connect(dsn), "postgres"
        import sqlite3

        os.makedirs(os.path.dirname(dsn) or ".", exist_ok=True)
        return sqlite3.connect(dsn), "sqlite"

    @staticmethod
    def _to_pg_paramstyle(sql: str) -> str:
        """Rewrite ``?`` placeholders to ``%s``, skipping single-quoted SQL
        string literals (and doubling any literal ``%`` so psycopg's
        pyformat layer never misreads it). A blanket ``str.replace`` would
        corrupt a statement whose literal text contains ``?``."""
        out: list[str] = []
        in_str = False
        for ch in sql:
            if ch == "'":
                in_str = not in_str
                out.append(ch)
            elif in_str:
                out.append("%%" if ch == "%" else ch)
            elif ch == "?":
                out.append("%s")
            else:
                out.append(ch)
        return "".join(out)

    def _exec(self, sql: str, params: tuple = ()):
        """Run one statement, rewriting ``?`` to the driver's paramstyle."""
        if self._dialect == "postgres":
            sql = self._to_pg_paramstyle(sql)
        cur = self._conn.cursor()
        cur.execute(sql, params)
        return cur

    def _insert_returning_id(self, sql: str, params: tuple) -> int:
        """INSERT .. RETURNING <id>; on SQLite older than 3.35 (no
        RETURNING support) fall back to ``cursor.lastrowid``."""
        if self._dialect == "sqlite" and not self._sqlite_has_returning():
            cur = self._exec(sql[: sql.rindex(" RETURNING ")], params)
            return cur.lastrowid
        return self._exec(sql, params).fetchone()[0]

    @staticmethod
    def _sqlite_has_returning() -> bool:
        import sqlite3

        return sqlite3.sqlite_version_info >= (3, 35, 0)

    def _restore(self) -> None:
        rows = self._exec(
            """SELECT j.subsystem || '/' || j.job_name, e.status, e.message
               FROM job_executions e JOIN jobs j USING (job_id)
               WHERE j.jobnet_name = ?
                 AND e.job_execution_id IN (
                     SELECT MAX(job_execution_id) FROM job_executions
                     GROUP BY job_id)
               ORDER BY e.execution_sequence""",
            (self.jobnet_name,),
        ).fetchall()
        for job, status, message in rows:
            t = Task(job=job, status=status, message=message or "")
            if t.status == "running":  # crashed mid-run → re-run
                t.status = "waiting"
            self.tasks.append(t)
        if self.tasks and all(t.status == "succeeded" for t in self.tasks):
            self.tasks = []  # previous run completed → start fresh

    def _job_id(self, job: str) -> int:
        subsys, _, name = job.partition("/")
        self._exec(
            "INSERT INTO jobs (subsystem, job_name, jobnet_name) VALUES (?,?,?) "
            "ON CONFLICT DO NOTHING",
            (subsys, name or subsys, self.jobnet_name),
        )
        (jid,) = self._exec(
            "SELECT job_id FROM jobs WHERE subsystem=? AND job_name=? AND jobnet_name=?",
            (subsys, name or subsys, self.jobnet_name),
        ).fetchone()
        return jid

    def save(self) -> None:
        now = _dt.datetime.now(_dt.timezone.utc).isoformat()
        try:
            for seq, t in enumerate(self.tasks):
                jid = self._job_id(t.job)
                row = self._exec(
                    "SELECT job_execution_id, status FROM job_executions "
                    "WHERE job_id=? ORDER BY job_execution_id DESC LIMIT 1",
                    (jid,),
                ).fetchone()
                if row and row[1] == t.status:
                    continue
                if row:
                    self._exec(
                        "UPDATE job_executions SET status=?, message=?, "
                        "execution_sequence=?, finished_at=? WHERE job_execution_id=?",
                        (t.status, t.message, seq, now, row[0]),
                    )
                    eid = row[0]
                else:
                    eid = self._insert_returning_id(
                        "INSERT INTO job_executions (job_id, status, message, "
                        "execution_sequence, submitted_at) VALUES (?,?,?,?,?) "
                        "RETURNING job_execution_id",
                        (jid, t.status, t.message, seq, now),
                    )
                self._exec(
                    "INSERT INTO job_execution_states "
                    "(job_execution_id, job_id, status, message, created_at) "
                    "VALUES (?,?,?,?,?)",
                    (eid, jid, t.status, t.message, now),
                )
            self._conn.commit()
        except Exception:
            self._conn.rollback()
            raise

    # lock: SQLite keeps the exclusive-file contract (single host by
    # definition); PostgreSQL takes a server-side advisory lock so the
    # mutual exclusion spans every host sharing the queue database.
    @property
    def lock_path(self) -> str:
        return f"{self.db_path}.{self.jobnet_name.replace('/', '__')}.LOCK"

    def lock(self) -> None:
        if self._dialect == "postgres":
            (got,) = self._exec(
                "SELECT pg_try_advisory_lock(hashtext(?))", (self.jobnet_name,)
            ).fetchone()
            self._conn.commit()
            if not got:
                raise ParameterError(
                    f"another jobnet is already running (advisory lock held: "
                    f"{self.jobnet_name})"
                )
            return
        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ParameterError(
                f"another jobnet is already running (lock exists: {self.lock_path})"
            )
        with os.fdopen(fd, "w") as f:
            f.write(str(os.getpid()))

    def unlock(self) -> None:
        if self._dialect == "postgres":
            self._exec(
                "SELECT pg_advisory_unlock(hashtext(?))", (self.jobnet_name,)
            )
            self._conn.commit()
            return
        if os.path.exists(self.lock_path):
            os.remove(self.lock_path)

    def unlink(self) -> None:
        pass  # DB rows are the audit trail; nothing to delete on success

    def state_history(self, job: str) -> list[tuple[str, str]]:
        subsys, _, name = job.partition("/")
        return self._exec(
            """SELECT s.status, s.created_at FROM job_execution_states s
               JOIN jobs j ON j.job_id = s.job_id
               WHERE j.subsystem=? AND j.job_name=? AND j.jobnet_name=?
               ORDER BY s.id""",
            (subsys, name or subsys, self.jobnet_name),
        ).fetchall()

    def close(self) -> None:
        self._conn.close()
