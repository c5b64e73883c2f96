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
