"""streaming_load tests — includes the reference's own pattern-compiler
test case (test/test_c_streaming_load.rb:6-13) and the exactly-once
contract."""

from __future__ import annotations

import os

import pytest

from bricolage_spark.context import Context
from bricolage_spark.exception import ParameterError
from bricolage_spark.streaming.streaming_load import (
    FileQueue,
    StreamingLoader,
    compile_name_pattern,
    format_path,
)


def test_compile_name_pattern_reference_case():
    """Exact case from the reference unit test."""
    re_ = compile_name_pattern("%*%Y%m%d-%H%M_%Q.gz")
    m = re_.match("anything20141002-1355_00.gz")
    assert m
    assert m.group("year") == "2014"
    assert m.group("month") == "10"
    assert m.group("minute") == "55"
    assert m.group("seq") == "00"
    assert not re_.match("2014100x-1355_00.gz")
    assert not re_.match("prefix/20141002-1355_00.gz")  # %* excludes /


def test_compile_name_pattern_nanos_and_escape():
    re_ = compile_name_pattern("%Y%m%d_%6N.json")
    m = re_.match("20240101_123456.json")
    assert m.group("nanosecond") == "123456"
    assert not re_.match("20240101_123456xjson")  # '.' is literal


def test_compile_name_pattern_unknown_op():
    with pytest.raises(ParameterError, match="unknown time format"):
        compile_name_pattern("%Z.json")


def test_format_path_from_name():
    pat = compile_name_pattern("%Y%m%d_%H%M_%Q.json")
    out = format_path("archive/%Y/%m/%d", "20240102_1355_00.json", pat)
    assert out == "archive/2024/01/02"
    with pytest.raises(ParameterError, match="does not match"):
        format_path("x/%Y", "nope.json", pat)


@pytest.fixture()
def queue_dir(tmp_path):
    q = tmp_path / "queue"
    q.mkdir()
    return q


def write_files(queue_dir, names_rows):
    for name, rows in names_rows.items():
        with open(queue_dir / name, "w") as f:
            for row in rows:
                f.write(row + "\n")


def make_loader(engine, queue_dir, tmp_path, **kw):
    queue = FileQueue(
        queue_path=str(queue_dir),
        persistent_path=str(tmp_path / "archive" / "%Y" / "%m" / "%d"),
        file_name="%Y%m%d_%H%M_%Q.json",
    )
    return StreamingLoader(
        engine=engine,
        queue=queue,
        dest_table="load_test",
        log_table="load_test_l",
        work_table="load_test_wk",
        fmt="json",
        **kw,
    )


def test_load_once_and_dedup(engine, tmp_path, queue_dir):
    write_files(queue_dir, {
        "20240101_0000_00.json": ['{"x": 1, "y": "a"}', '{"x": 2, "y": "b"}'],
        "20240101_0100_00.json": ['{"x": 3, "y": "c"}'],
        "ignored.txt": ["junk"],  # does not match pattern
    })
    loader = make_loader(engine, queue_dir, tmp_path)
    stats = loader.run_once()
    assert stats["loaded_files"] == 2
    assert stats["rows"] == 3
    assert engine.table("load_test").count() == 3
    # log records both files
    logged = {r.data_file for r in engine.table("load_test_l").collect()}
    assert logged == {"20240101_0000_00.json", "20240101_0100_00.json"}
    # files moved to date-templated archive
    assert not (queue_dir / "20240101_0000_00.json").exists()
    assert (tmp_path / "archive" / "2024" / "01" / "01" / "20240101_0000_00.json").exists()
    # non-matching file untouched
    assert (queue_dir / "ignored.txt").exists()


def test_exactly_once_across_retry(engine, tmp_path, queue_dir):
    """Crash-after-load simulation: file loaded+logged but NOT dequeued →
    retry must not double-load (streaming_load.rb:294-330 contract)."""
    write_files(queue_dir, {"20240101_0000_00.json": ['{"x": 1, "y": "a"}']})
    loader = make_loader(engine, queue_dir, tmp_path)
    stats = loader.run_once(load_only=True)  # load, log, do NOT move
    assert stats["loaded_files"] == 1
    assert (queue_dir / "20240101_0000_00.json").exists()

    # retry: file still queued, but the log dedups it
    stats2 = loader.run_once()
    assert stats2["loaded_files"] == 0
    assert stats2["skipped_files"] == 1
    assert engine.table("load_test").count() == 1  # NOT doubled

    # new file arrives → only it loads
    write_files(queue_dir, {"20240101_0100_00.json": ['{"x": 2, "y": "b"}']})
    stats3 = loader.run_once()
    assert stats3["loaded_files"] == 1
    assert engine.table("load_test").count() == 2


def test_hadoop_queue_over_file_uri(spark, tmp_path):
    """HadoopFileQueue drives the same contract through the Hadoop FS API
    (file:// here; s3a:// on a cluster with the same code path)."""
    from bricolage_spark.streaming.streaming_load import HadoopFileQueue

    qdir = tmp_path / "hq"
    qdir.mkdir()
    (qdir / "20240102_0000_00.json").write_text('{"x": 1}\n')
    (qdir / "junk.txt").write_text("no")
    q = HadoopFileQueue(
        spark,
        f"file://{qdir}",
        f"file://{tmp_path}/arch/%Y/%m/%d",
        "%Y%m%d_%H%M_%Q.json",
    )
    files = q.queued_files()
    assert len(files) == 1 and files[0].endswith("20240102_0000_00.json")
    dest = q.dequeue(files[0])
    assert dest.endswith("arch/2024/01/02/20240102_0000_00.json")
    assert (tmp_path / "arch" / "2024" / "01" / "02" / "20240102_0000_00.json").exists()
    assert not (qdir / "20240102_0000_00.json").exists()
    assert q.queued_files() == []


def test_streaming_load_jobclass_hadoop_uri(engine, tmp_path):
    """streaming_load job with a file:// queue-path selects the Hadoop
    queue automatically."""
    from bricolage_spark.context import Context

    qdir = tmp_path / "uriq"
    qdir.mkdir()
    (qdir / "20240101_0000_00.json").write_text('{"x": 5, "y": "z"}\n')
    home = tmp_path / "home"
    (home / "subsys").mkdir(parents=True)
    (home / "subsys" / "s.job").write_text(
        "class: streaming_load\n"
        "dest-table: uri_load\n"
        f"queue-path: file://{qdir}\n"
        f"persistent-path: file://{tmp_path}/uridone/%Y/%m/%d\n"
        "file-name: '%Y%m%d_%H%M_%Q.json'\n"
        "skip-work: true\n"
    )
    ctx = Context(engine, home=str(home))
    r = ctx.load_job(str(home / "subsys" / "s.job")).execute()
    assert r.success and r.rows == 1
    assert engine.table("uri_load").count() == 1


def test_streaming_load_jobclass(engine, tmp_path, queue_dir):
    """Drive through the job-class surface with a .job file."""
    write_files(queue_dir, {"20240101_0000_00.json": ['{"x": 1, "y": "a"}']})
    home = tmp_path / "home"
    (home / "subsys").mkdir(parents=True)
    job_path = home / "subsys" / "stream.job"
    job_path.write_text(
        "class: streaming_load\n"
        "dest-table: load_test\n"
        f"queue-path: {queue_dir}\n"
        f"persistent-path: {tmp_path}/done/%Y/%m/%d\n"
        "file-name: '%Y%m%d_%H%M_%Q.json'\n"
        "skip-work: true\n"
    )
    ctx = Context(engine, home=str(home))
    job = ctx.load_job(str(job_path))
    r = job.execute()
    assert r.success and r.rows == 1
    # second run: nothing new
    r2 = ctx.load_job(str(job_path)).execute()
    assert "0 file(s)" in r2.message

def test_crash_between_appends_rolls_forward(engine, tmp_path, queue_dir):
    """Kill the loader AT the commit point (manifest written, moves not
    applied): recovery must publish dest AND log together — no
    double-load on retry (streaming_load.rb:166-195 joint transaction)."""
    write_files(queue_dir, {"20240101_0000_00.json": ['{"x": 1, "y": "a"}']})
    loader = make_loader(engine, queue_dir, tmp_path)

    boom = RuntimeError("killed between appends")

    def crash(_moves):
        raise boom

    orig = loader._apply_moves
    loader._apply_moves = crash
    with pytest.raises(RuntimeError):
        loader.run_once()
    loader._apply_moves = orig
    # manifest exists; neither table is published yet
    assert not engine.table_exists("load_test")
    txs = os.listdir(loader._tx_dir)
    assert any(t.endswith(".json") for t in txs)

    # retry: recover() rolls the manifest forward, then the anti-join
    # sees the file as loaded — exactly once
    stats = loader.run_once()
    assert stats["loaded_files"] == 0
    assert stats["skipped_files"] == 1
    assert engine.table("load_test").count() == 1
    logged = {r.data_file for r in engine.table("load_test_l").collect()}
    assert logged == {"20240101_0000_00.json"}
    assert os.listdir(loader._tx_dir) == []


def test_crash_before_commit_reloads_cleanly(engine, tmp_path, queue_dir):
    """Crash BEFORE the manifest rename (dest delta staged only): nothing
    was published, staging garbage is swept, the batch reloads once."""
    write_files(queue_dir, {"20240101_0000_00.json": ['{"x": 1, "y": "a"}']})
    loader = make_loader(engine, queue_dir, tmp_path)

    orig_stage = loader._stage_delta
    calls = {"n": 0}

    def stage_then_crash(df, table, txid):
        out = orig_stage(df, table, txid)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("killed after first staged write")
        return out

    loader._stage_delta = stage_then_crash
    with pytest.raises(RuntimeError):
        loader.run_once()
    loader._stage_delta = orig_stage
    assert not engine.table_exists("load_test")
    assert not engine.table_exists("load_test_l")

    stats = loader.run_once()
    assert stats["loaded_files"] == 1
    assert engine.table("load_test").count() == 1  # exactly once
    # pre-commit staging dirs were swept
    parent = os.path.dirname(engine.table_dir("load_test"))
    assert not [d for d in os.listdir(parent) if ".__delta__" in d]


def test_custom_sql_insert_into_dest_style(engine, tmp_path, queue_dir):
    """Reference-style body `INSERT INTO $dest_table SELECT ... FROM work`
    (streaming_load.rb:203) is converted to its SELECT and committed
    jointly — not executed as a second out-of-transaction append."""
    write_files(queue_dir, {
        "20240101_0000_00.json": ['{"x": 1, "y": "a"}', '{"x": 2, "y": "b"}'],
    })
    loader = make_loader(
        engine, queue_dir, tmp_path,
        sql="INSERT INTO load_test SELECT x, upper(y) AS y FROM load_test_wk WHERE x > 1;",
    )
    stats = loader.run_once()
    assert stats["rows"] == 1
    rows = [(r.x, r.y) for r in engine.table("load_test").collect()]
    assert rows == [(2, "B")]


def test_custom_sql_wrong_dest_rejected_before_publish(engine, tmp_path, queue_dir):
    write_files(queue_dir, {"20240101_0000_00.json": ['{"x": 1, "y": "a"}']})
    loader = make_loader(
        engine, queue_dir, tmp_path,
        sql="INSERT INTO other_table SELECT * FROM load_test_wk;",
    )
    with pytest.raises(ParameterError, match="dest-table"):
        loader.run_once()
    # nothing published, file still queued for a corrected retry
    assert not engine.table_exists("load_test")
    assert (queue_dir / "20240101_0000_00.json").exists()


def test_custom_sql_non_select_rejected(engine, tmp_path, queue_dir):
    write_files(queue_dir, {"20240101_0000_00.json": ['{"x": 1, "y": "a"}']})
    loader = make_loader(
        engine, queue_dir, tmp_path,
        sql="DROP TABLE IF EXISTS load_test;",
    )
    with pytest.raises(ParameterError, match="must end with a SELECT"):
        loader.run_once()
    assert engine.table_exists("load_test") is False


def test_parquet_format_loads(engine, tmp_path, queue_dir):
    """format=parquet works: DataFrameReader.parquet is varargs-only and
    must be splatted (a list crashes py4j)."""
    import pandas as pd

    for name, xs in (
        ("20240101_0000_00.json", [1, 2]),   # queue pattern; content parquet
        ("20240101_0100_00.json", [3]),
    ):
        pd.DataFrame({"x": xs}).to_parquet(queue_dir / name)
    queue = FileQueue(
        queue_path=str(queue_dir),
        persistent_path=str(tmp_path / "arch"),
        file_name="%Y%m%d_%H%M_%Q.json",
    )
    loader = StreamingLoader(
        engine=engine,
        queue=queue,
        dest_table="pq_dest",
        log_table="pq_dest_l",
        work_table="pq_dest_wk",
        fmt="parquet",
    )
    stats = loader.run_once()
    assert stats["loaded_files"] == 2 and stats["rows"] == 3
    assert {r.x for r in engine.table("pq_dest").collect()} == {1, 2, 3}


def test_custom_sql_does_not_force_dest_schema_on_raw_files(
    engine, tmp_path, queue_dir
):
    """With a custom SQL the dest table's schema describes TRANSFORMED
    rows; forcing it onto the raw file reader would parse every field as
    NULL and silently commit garbage under exactly-once."""
    from pyspark.sql import functions as F

    # dest pre-exists with the AGGREGATED shape (user, total)
    seed = engine.spark.createDataFrame([(0, 0.0)], "user long, total double")
    engine.save_table(seed.limit(0), "agg_dest", mode="overwrite")
    write_files(queue_dir, {
        "20240101_0000_00.json": [
            '{"user": 1, "amount": 2.5}', '{"user": 1, "amount": 1.5}',
            '{"user": 2, "amount": 4.0}',
        ],
    })
    queue = FileQueue(
        queue_path=str(queue_dir),
        persistent_path=str(tmp_path / "arch2"),
        file_name="%Y%m%d_%H%M_%Q.json",
    )
    loader = StreamingLoader(
        engine=engine,
        queue=queue,
        dest_table="agg_dest",
        log_table="agg_dest_l",
        work_table="agg_wk",
        fmt="json",
        sql="insert into agg_dest select user, sum(amount) as total "
            "from agg_wk group by user",
    )
    stats = loader.run_once()
    assert stats["rows"] == 2
    out = {r.user: r.total for r in engine.table("agg_dest").collect()}
    assert out == {1: 4.0, 2: 4.0}
