"""File task queue tests — mirrors reference test_filetaskqueue.rb:9-30."""

from __future__ import annotations

import pytest

from bricolage_spark.exception import ParameterError
from bricolage_spark.taskqueue import FileTaskQueue


def test_save_restore_roundtrip(tmp_path):
    p = str(tmp_path / "q.json")
    q = FileTaskQueue(p)
    q.enqueue("s/a")
    q.enqueue("s/b")
    q.save()
    q2 = FileTaskQueue.restore_if_exists(p)
    assert [t.job for t in q2.tasks] == ["s/a", "s/b"]


def test_consume_marks_and_resumes(tmp_path):
    p = str(tmp_path / "q.json")
    q = FileTaskQueue(p)
    for j in ("s/a", "s/b", "s/c"):
        q.enqueue(j)
    # run: a succeeds, b fails → stop
    for task in q.consume_each():
        if task.job == "s/b":
            task.transition("failed", "boom")
        else:
            task.transition("succeeded")
    assert [t.status for t in q.tasks] == ["succeeded", "failed", "waiting"]

    # restart: restore → a skipped, b retried, c runs
    q2 = FileTaskQueue.restore_if_exists(p)
    ran = []
    for task in q2.consume_each():
        ran.append(task.job)
        task.transition("succeeded")
    assert ran == ["s/b", "s/c"]
    assert not q2.unfinished


def test_running_state_reset_on_restore(tmp_path):
    p = str(tmp_path / "q.json")
    q = FileTaskQueue(p)
    q.enqueue("s/a")
    q.tasks[0].transition("running")
    q.save()
    q2 = FileTaskQueue.restore_if_exists(p)
    assert q2.tasks[0].status == "waiting"  # mid-run crash → re-run


def test_lock_excludes_second_runner(tmp_path):
    p = str(tmp_path / "q.json")
    q = FileTaskQueue(p)
    q.lock()
    q2 = FileTaskQueue(p)
    with pytest.raises(ParameterError, match="already running"):
        q2.lock()
    q.unlock()
    q2.lock()
    q2.unlock()


def test_audit_history_records_transitions(tmp_path):
    q = FileTaskQueue(str(tmp_path / "q.json"))
    q.enqueue("s/a")
    t = q.tasks[0]
    t.transition("running")
    t.transition("succeeded", "done")
    assert [h["status"] for h in t.history] == ["running", "succeeded"]
    with pytest.raises(ParameterError, match="unknown job state"):
        t.transition("exploded")
