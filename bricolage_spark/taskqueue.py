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
    dao/jobexecution.rb, schema/Schemafile:1-57) on SQLite.

    Tables mirror the reference Schemafile: ``jobs`` (identity),
    ``job_executions`` (latest state per job) and
    ``job_execution_states`` (append-only transition audit).
    """

    _SCHEMA = """
    CREATE TABLE IF NOT EXISTS jobs (
        job_id INTEGER PRIMARY KEY AUTOINCREMENT,
        subsystem TEXT NOT NULL,
        job_name TEXT NOT NULL,
        jobnet_name TEXT NOT NULL,
        UNIQUE (subsystem, job_name, jobnet_name)
    );
    CREATE TABLE IF NOT EXISTS job_executions (
        job_execution_id INTEGER PRIMARY KEY AUTOINCREMENT,
        job_id INTEGER NOT NULL REFERENCES jobs (job_id),
        status TEXT NOT NULL,
        message TEXT,
        execution_sequence INTEGER NOT NULL DEFAULT 0,
        submitted_at TEXT, started_at TEXT, finished_at TEXT
    );
    CREATE TABLE IF NOT EXISTS job_execution_states (
        id INTEGER PRIMARY KEY AUTOINCREMENT,
        job_execution_id INTEGER NOT NULL REFERENCES job_executions (job_execution_id),
        job_id INTEGER NOT NULL,
        status TEXT NOT NULL,
        message TEXT,
        created_at TEXT NOT NULL
    );
    """

    def __init__(self, db_path: str, jobnet_name: str = "net"):
        super().__init__()
        import sqlite3

        self.db_path = db_path
        self.jobnet_name = jobnet_name
        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        self._conn = sqlite3.connect(db_path)
        self._conn.executescript(self._SCHEMA)
        self._restore()

    def _restore(self) -> None:
        rows = self._conn.execute(
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
        self._conn.execute(
            "INSERT OR IGNORE INTO jobs (subsystem, job_name, jobnet_name) VALUES (?,?,?)",
            (subsys, name or subsys, self.jobnet_name),
        )
        (jid,) = self._conn.execute(
            "SELECT job_id FROM jobs WHERE subsystem=? AND job_name=? AND jobnet_name=?",
            (subsys, name or subsys, self.jobnet_name),
        ).fetchone()
        return jid

    def save(self) -> None:
        now = _dt.datetime.now(_dt.timezone.utc).isoformat()
        with self._conn:
            for seq, t in enumerate(self.tasks):
                jid = self._job_id(t.job)
                row = self._conn.execute(
                    "SELECT job_execution_id, status FROM job_executions "
                    "WHERE job_id=? ORDER BY job_execution_id DESC LIMIT 1",
                    (jid,),
                ).fetchone()
                if row and row[1] == t.status:
                    continue
                if row:
                    self._conn.execute(
                        "UPDATE job_executions SET status=?, message=?, "
                        "execution_sequence=?, finished_at=? WHERE job_execution_id=?",
                        (t.status, t.message, seq, now, row[0]),
                    )
                    eid = row[0]
                else:
                    cur = self._conn.execute(
                        "INSERT INTO job_executions (job_id, status, message, "
                        "execution_sequence, submitted_at) VALUES (?,?,?,?,?)",
                        (jid, t.status, t.message, seq, now),
                    )
                    eid = cur.lastrowid
                self._conn.execute(
                    "INSERT INTO job_execution_states "
                    "(job_execution_id, job_id, status, message, created_at) "
                    "VALUES (?,?,?,?,?)",
                    (eid, jid, t.status, t.message, now),
                )

    # lock: same exclusive-file contract as FileTaskQueue, keyed per jobnet
    @property
    def lock_path(self) -> str:
        return f"{self.db_path}.{self.jobnet_name.replace('/', '__')}.LOCK"

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

    def unlink(self) -> None:
        pass  # DB rows are the audit trail; nothing to delete on success

    def state_history(self, job: str) -> list[tuple[str, str]]:
        subsys, _, name = job.partition("/")
        return self._conn.execute(
            """SELECT s.status, s.created_at FROM job_execution_states s
               JOIN jobs j ON j.job_id = s.job_id
               WHERE j.subsystem=? AND j.job_name=? AND j.jobnet_name=?
               ORDER BY s.id""",
            (subsys, name or subsys, self.jobnet_name),
        ).fetchall()

    def close(self) -> None:
        self._conn.close()
