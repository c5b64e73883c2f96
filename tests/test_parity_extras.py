"""Parity extras: SQL header metadata, DB task queue, vacuum lock,
query_batch, custom job classes, stateful sessionization."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from bricolage_spark.context import Context
from bricolage_spark.exception import ParameterError
from bricolage_spark.jobs import Job, JobResult, jobclass
from bricolage_spark.locks import LockTimeout, serialized
from bricolage_spark.sqltext import parse_sql_metadata
from bricolage_spark.taskqueue import DatabaseTaskQueue


# -- SQL header metadata (sqlstatement.rb:242-300) --------------------------


def test_parse_sql_metadata_keys():
    sql = (
        "--dest-table: d\n"
        "--src-tables: [a, b]\n"
        "-- a plain comment\n"
        "--params: {x: 1}\n"
        "select * from a;\n"
        "--dest-table: ignored_after_body\n"
    )
    meta = parse_sql_metadata(sql)
    assert meta == {"dest-table": "d", "src-tables": ["a", "b"], "params": {"x": 1}}


def test_parse_sql_metadata_unknown_key_raises():
    with pytest.raises(ParameterError, match="unknown SQL meta data"):
        parse_sql_metadata("--bogus-key: 1\nselect 1;\n")


def test_external_sql_file_with_header(engine, spark, tmp_path):
    """A plain .sql file referenced by sql-file: its --header metadata
    feeds declarations (dest-table/src-tables) at lowest precedence."""
    engine.save_table(spark.createDataFrame([(1,), (2,)], "x int"), "src_t")
    (tmp_path / "q.sql").write_text(
        "--dest-table: built\n--src-tables: {s: src_t}\n"
        "create table $dest_table as select * from $s;\n"
    )
    (tmp_path / "j.job").write_text(f"class: sql\nsql-file: {tmp_path}/q.sql\n")
    job = Job.load(engine, str(tmp_path / "j.job"))
    r = job.execute()
    assert r.success
    assert engine.table("built").count() == 2


# -- DatabaseTaskQueue (taskqueue.rb:175-310 / dao) -------------------------


def test_db_queue_persist_resume_and_audit(tmp_path):
    db = str(tmp_path / "state.db")
    q = DatabaseTaskQueue(db, jobnet_name="net1")
    for j in ("s/a", "s/b"):
        q.enqueue(j)
    for task in q.consume_each():
        task.transition("succeeded" if task.job == "s/a" else "failed", "boom")
    q.close()

    q2 = DatabaseTaskQueue(db, jobnet_name="net1")
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
    # full audit: submitted(waiting) → running → failed → running → succeeded
    assert hist[0] == "waiting" and hist[-1] == "succeeded"
    assert "failed" in hist and "running" in hist
    q2.close()

    # completed run → next restore starts fresh
    q3 = DatabaseTaskQueue(db, jobnet_name="net1")
    assert q3.tasks == []
    q3.close()


def test_db_queue_isolates_jobnets(tmp_path):
    db = str(tmp_path / "state.db")
    q = DatabaseTaskQueue(db, jobnet_name="net1")
    q.enqueue("s/a")
    q.save()
    q.close()
    other = DatabaseTaskQueue(db, jobnet_name="net2")
    assert other.tasks == []
    other.close()


def test_db_queue_pg_dsn_requires_driver(monkeypatch):
    """A postgresql:// DSN without psycopg installed fails with a clear
    ParameterError, never an ImportError traceback."""
    import builtins

    real_import = builtins.__import__

    def no_psycopg(name, *a, **kw):
        if name.startswith("psycopg"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_psycopg)
    with pytest.raises(ParameterError, match="psycopg"):
        DatabaseTaskQueue("postgresql://h/db", jobnet_name="net1")


def test_db_queue_pg_dialect_sql():
    """The postgres dialect rewrites placeholders and uses IDENTITY keys;
    statements are captured by a stub connection (no server needed)."""
    ran: list[tuple[str, tuple]] = []

    class StubCursor:
        sql = ""

        def execute(self, sql, params=()):
            self.sql = sql
            ran.append((sql, tuple(params)))

        def fetchone(self):
            if "job_execution_id, status" in self.sql:
                return None  # no prior execution row → INSERT..RETURNING path
            return (1,)  # job_id / RETURNING id / advisory-lock true

        def fetchall(self):
            return []

    class StubConn:
        def cursor(self):
            return StubCursor()

        def commit(self):
            pass

        def rollback(self):
            pass

    q = DatabaseTaskQueue.__new__(DatabaseTaskQueue)
    q.tasks = []
    q.db_path = "postgresql://h/db"
    q.jobnet_name = "net1"
    q._conn, q._dialect = StubConn(), "postgres"
    for stmt in q._SCHEMA.format(pk=q._PK["postgres"]).split(";"):
        if stmt.strip():
            q._exec(stmt)
    assert all("AUTOINCREMENT" not in sql for sql, _ in ran)
    assert any("GENERATED BY DEFAULT AS IDENTITY" in sql for sql, _ in ran)

    ran.clear()
    q.enqueue("s/a")
    q.save()
    joined = "\n".join(sql for sql, _ in ran)
    assert "?" not in joined and "%s" in joined
    assert "ON CONFLICT DO NOTHING" in joined
    assert "RETURNING job_execution_id" in joined

    ran.clear()
    q.lock()
    q.unlock()
    assert "pg_try_advisory_lock" in ran[0][0]
    assert "pg_advisory_unlock" in ran[1][0]


def test_pg_paramstyle_rewrite_skips_string_literals():
    """'?' inside a quoted SQL literal must survive the %s rewrite, and a
    literal '%' must be doubled so psycopg never misparses it."""
    f = DatabaseTaskQueue._to_pg_paramstyle
    assert f("SELECT * FROM t WHERE a=? AND b=?") == (
        "SELECT * FROM t WHERE a=%s AND b=%s"
    )
    assert f("INSERT INTO t (msg) VALUES ('why?') ON CONFLICT DO NOTHING") == (
        "INSERT INTO t (msg) VALUES ('why?') ON CONFLICT DO NOTHING"
    )
    assert f("SELECT '100% done?' , ?") == "SELECT '100%% done?' , %s"
    # doubled '' quote inside a literal toggles out/in — net effect: still
    # treated as literal text either way, placeholder after it rewrites
    assert f("SELECT 'it''s ?', ?").endswith("%s")


def test_db_queue_insert_id_without_returning(tmp_path, monkeypatch):
    """Forcing the pre-3.35 path: INSERT id comes from cursor.lastrowid and
    the audit trail still links states to the execution row."""
    db = str(tmp_path / "old.sqlite")
    monkeypatch.setattr(
        DatabaseTaskQueue, "_sqlite_has_returning", staticmethod(lambda: False)
    )
    q = DatabaseTaskQueue(db, jobnet_name="net1")
    q.enqueue("s/a")
    q.save()
    q.tasks[0].transition("succeeded")
    q.save()
    assert [s for s, _ in q.state_history("s/a")] == ["waiting", "succeeded"]
    q.close()


# -- serialization lock (vacuumlock.rb) -------------------------------------


def test_serialized_lock_mutual_exclusion(tmp_path):
    lock = str(tmp_path / "vacuum.LOCK")
    order = []

    def worker(tag):
        with serialized(lock, timeout=10, poll=0.05):
            order.append(f"{tag}-in")
            time.sleep(0.2)
            order.append(f"{tag}-out")

    t1 = threading.Thread(target=worker, args=("a",))
    t2 = threading.Thread(target=worker, args=("b",))
    t1.start(); time.sleep(0.05); t2.start()
    t1.join(); t2.join()
    assert order[0].endswith("-in") and order[1] == order[0].replace("-in", "-out")


def test_serialized_lock_timeout(tmp_path):
    lock = str(tmp_path / "x.LOCK")
    with serialized(lock, timeout=10):
        with pytest.raises(LockTimeout):
            with serialized(lock, timeout=0.3, poll=0.05):
                pass


def test_serialized_lock_breaks_stale(tmp_path):
    lock = str(tmp_path / "stale.LOCK")
    with open(lock, "w") as f:
        f.write("999999999")  # dead pid
    with serialized(lock, timeout=2, poll=0.05):
        pass  # acquired by breaking the stale lock


# -- engine extras ----------------------------------------------------------


def test_query_batch_pages(engine, spark):
    engine.save_table(spark.range(25).selectExpr("id as x"), "t")
    batches = list(engine.query_batch("select x from t order by x", batch_size=10))
    assert [len(b) for b in batches] == [10, 10, 5]
    assert batches[0][0].x == 0


def test_create_dummy_table(engine):
    engine.create_dummy_table("swapme")
    assert engine.table_exists("swapme")
    engine.create_dummy_table("swapme")  # idempotent
    assert [f.name for f in engine.table("swapme").schema.fields] == ["x"]


# -- custom (user) job classes — RubyJobClass parity ------------------------


def test_custom_python_jobclass(engine, tmp_path):
    @jobclass("my-custom-op")
    def my_custom_op(job):
        out = tmp_path / "touched.json"
        out.write_text(json.dumps({"param": job.param("my-param")}))
        return JobResult(message="custom ran")

    (tmp_path / "c.job").write_text("class: my-custom-op\nmy-param: hello\n")
    job = Job.load(engine, str(tmp_path / "c.job"))
    r = job.execute()
    assert r.message == "custom ran"
    assert json.loads((tmp_path / "touched.json").read_text()) == {"param": "hello"}


# -- stateful sessionization ------------------------------------------------


@pytest.fixture()
def session_events(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:05:00", 2.0),   # same session (gap 5m < 10m)
        (1, "2024-01-01 00:30:00", 3.0),   # new session (gap 25m)
        (2, "2024-01-01 00:00:00", 4.0),
    ]
    return (
        spark.createDataFrame(rows, "user_id long, ts string, value double")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_sessionize_batch_values(session_events):
    from bricolage_spark.streaming.stateful import sessionize

    out = sessionize(session_events, gap_minutes=10).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append((r.n_events, r.total_value))
    assert sorted(by_user[1]) == [(1, 3.0), (2, 3.0)]
    assert by_user[2] == [(1, 4.0)]


def test_sessionize_stream_emits_on_timeout(spark, tmp_path):
    import json as _json

    from bricolage_spark.streaming.stateful import sessionize
    from bricolage_spark.streaming.windows import read_event_stream
    from tests.test_streaming_windows import SCHEMA

    src = tmp_path / "sess_in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i, (ts, v) in enumerate(
            [("2024-01-01T00:00:00", 1.0), ("2024-01-01T00:05:00", 2.0)]
        ):
            f.write(_json.dumps({"event_id": i, "ts": ts, "user_id": 1,
                                 "event_type": "click", "value": v}) + "\n")
        # a much later event advances the watermark past user 1's timeout
        f.write(_json.dumps({"event_id": 9, "ts": "2024-01-01T01:00:00",
                             "user_id": 2, "event_type": "click", "value": 9.0}) + "\n")
    stream = read_event_stream(spark, str(src), SCHEMA).select("user_id", "ts", "value")
    q = (
        sessionize(stream, gap_minutes=10)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions_out").collect()
    closed = {r.user_id: (r.n_events, r.total_value, r.closed_reason) for r in rows}
    # user 1's session closed by event-time timeout once the watermark passed
    assert closed.get(1) == (2, 3.0, "timeout")


def test_pid_alive_eperm_means_alive(monkeypatch):
    """EPERM from kill(pid, 0) = process exists under another uid — the
    exact cross-user case the host-global lock serializes (reference
    vacuumlock rescues Errno::EPERM as 'running')."""
    import bricolage_spark.locks as L

    def eperm(pid, sig):
        raise PermissionError("op not permitted")

    monkeypatch.setattr(L.os, "kill", eperm)
    assert L._pid_alive(12345) is True


def test_serialized_lock_does_not_break_other_users_live_lock(tmp_path, monkeypatch):
    import bricolage_spark.locks as L

    lock = str(tmp_path / "v.lock")
    with open(lock, "w") as f:
        f.write("99999")  # pretend-owner

    def eperm(pid, sig):
        raise PermissionError

    monkeypatch.setattr(L.os, "kill", eperm)
    with pytest.raises(LockTimeout):
        with L.serialized(lock, timeout=0.3, poll=0.05):
            pass
    assert os.path.exists(lock)  # live foreign lock left intact


def test_q33_releases_shingle_cache(spark, sf_dir):
    """q33 persists its shingle set for reuse across three consumers; a
    long-lived engine must get that cache back after the query is built."""
    from bricolage_spark.queries import load_all

    df = load_all()["q33_minhash_lsh_pairs"].fn(spark, sf_dir)
    assert df.count() >= 0
    jsc = spark.sparkContext._jsc.sc()
    cached = [
        r for r in jsc.getRDDStorageInfo() if r.memSize() > 0 or r.diskSize() > 0
    ]
    # only the tiny localCheckpoint of the result may remain cached
    for r in cached:
        assert "checkpoint" in r.name().lower() or r.memSize() < 1 << 20, r.name()


def test_sns_datasource_log_fallback_and_logger_device():
    """Without boto3 (this container) publish logs instead of raising;
    write/close keep the reference's logger-device IO surface
    (snsdatasource.rb:31-37)."""
    from bricolage_spark.sources import SNSDataSource

    ds = SNSDataSource("sns1", {"topic_arn": "arn:aws:sns:us-east-1:1:t", "region": "us-east-1"})
    ds.publish("job finished")
    ds.write("as a logger device")
    ds.close()


def test_release_caches_skips_dead_session_handles(spark):
    """release_caches() after a session restart must drop stale entries
    without calling unpersist on them — a dead Py4J handle raises an NPE
    from the driver endpoint (observed when bench blocks restart the
    session between config blocks)."""
    from bricolage_spark.queries import llm_ops
    from bricolage_spark.session import session_token

    class DeadHandle:
        def unpersist(self, blocking=False):
            raise RuntimeError("unpersist called on a dead-session handle")

    calls = []

    class LiveHandle:
        def unpersist(self, blocking=False):
            calls.append(blocking)

    llm_ops._SHINGLE_CACHE[("stopped-app/0", "/tmp/x", 3)] = DeadHandle()
    llm_ops._SHINGLE_CACHE[(session_token(spark), "/tmp/x", 3)] = LiveHandle()
    llm_ops._IVF_MODEL_CACHE[("stopped-app/0", "/tmp/x", 8, 1)] = ([], DeadHandle())
    try:
        llm_ops.release_shingles()
        llm_ops.release_ivf_index()
    finally:
        # never leak fakes into other tests even on assertion failure
        llm_ops._SHINGLE_CACHE.clear()
        llm_ops._IVF_MODEL_CACHE.clear()
    assert calls == [False]  # live handle unpersisted, dead ones skipped


def test_semantic_dedup_cell_cap_raises_on_degenerate_embeddings(spark, tmp_path):
    """q77's within-cell pairwise join is quadratic in cell size; a
    degenerate (constant) embedding column collapses the quantizer into
    one mega-cell, which must raise LOUDLY at assignment time instead of
    silently going n² (same capping discipline as q48/q74/q79 — except a
    dropped dedup cell would skip duplicates, so here the cap is fatal)."""
    import pytest

    from bricolage_spark.exception import ApplicationError
    from bricolage_spark.queries import llm_ops

    n = 600  # one mega-cell of 600 > cap = max(256, 8*600//32)
    vec = [0.25] * 64
    spark.createDataFrame(
        [(i, vec, 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    try:
        with pytest.raises(ApplicationError, match="quantizer collapsed"):
            llm_ops._sem_assignment(spark, str(tmp_path))
    finally:
        # the raise path must not leave a cache entry behind
        llm_ops.release_sem_assignment(str(tmp_path))
        llm_ops._SEM_CENT_CACHE.clear()


def test_sessionize_state_fn_honors_gap_and_timezone():
    """The state function's timeout = epoch(ts_max) + the CALLER's gap
    (a hardcoded gap would disagree with the watermark/batch path), and
    naive timestamps are localized to the session timezone before the
    epoch conversion (a bare .timestamp() reads them as UTC)."""
    import pandas as pd

    from bricolage_spark.streaming.stateful import _sessionize_group_fn

    class FakeState:
        hasTimedOut = False
        exists = False

        def __init__(self, watermark_ms=0):
            self.timeout = None
            self._wm = watermark_ms

        def update(self, v):
            self.stored = v

        def setTimeoutTimestamp(self, ms):
            # mirror GroupState's contract (the r16 stream profile hit it
            # live): a timeout at/below the current watermark is rejected
            assert ms > self._wm, "timeout must be past the watermark"
            self.timeout = ms

        def getCurrentWatermarkMs(self):
            return self._wm

    rows = pd.DataFrame(
        {"ts": [pd.Timestamp("2024-01-01 00:00:00")], "value": [1.0]}
    )
    base_utc = int(pd.Timestamp("2024-01-01 00:00:00", tz="UTC").timestamp() * 1000)

    for gap_min in (10, 30):
        st = FakeState()
        list(_sessionize_group_fn(gap_min * 60 * 1000, "UTC")((7,), iter([rows]), st))
        assert st.timeout == base_utc + gap_min * 60 * 1000

    # a non-UTC session hands the UDF naive LOCAL times: 00:00 in
    # UTC+2 is 22:00 UTC the previous day — 2h EARLIER than the naive
    # UTC reading
    st = FakeState()
    list(_sessionize_group_fn(600_000, "Etc/GMT-2")((7,), iter([rows]), st))
    assert st.timeout == base_utc - 2 * 3600 * 1000 + 600_000

    # late data: a batch whose events sit behind the watermark must clamp
    # the timeout to watermark+1 (GroupState rejects a timeout in the
    # past — INVALID_TIMEOUT_TIMESTAMP, surfaced live by the r16 stream
    # profile on unordered parquet chunks), which fires at the next
    # trigger: the inactivity gap has already passed for that session
    late_wm = base_utc + 3 * 3600 * 1000  # watermark 3h past the event
    st = FakeState(watermark_ms=late_wm)
    list(_sessionize_group_fn(600_000, "UTC")((7,), iter([rows]), st))
    assert st.timeout == late_wm + 1
