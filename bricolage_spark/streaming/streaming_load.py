"""streaming_load: exactly-once micro-batch file loader.

Semantics reproduced from jobclass/streaming_load.rb (531 LoC — SURVEY.md
§2.6), the one true streaming operator of the reference:

1. list candidate files under ``queue-path`` whose basename matches the
   strftime-like ``file-name`` pattern (``%Y%m%d-%H%M_%Q`` → named-group
   regex, compile_name_pattern :455-473);
2. dedup against the **load log** table by ``data_file``
   (right-outer/NOT-IN joins :294-330) — exactly-once across crash/retry;
3. load new files into the work table, ``INSERT INTO dest SELECT * FROM
   work`` (or a custom SQL), and append the load log — atomically (the
   reference uses one Redshift transaction :166-195; we stage both the
   dest append and the log append behind the stage-and-swap writer and
   only move files after both commit);
4. dequeue: move each loaded file to ``persistent-path`` (date-templated
   from the file name's captured fields, format_path :429-449).

``load-only`` / ``dequeue-only`` / ``noop`` flags mirror the reference's
operational modes.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, Observation, functions as F

from bricolage_spark.engine import TableSpec, split_statements
from bricolage_spark.exception import ParameterError
from bricolage_spark.jobs import Job, JobResult, jobclass

_PATTERN_TOKEN = re.compile(r"[^%]+|%\d*.")

_LOG_COLUMNS = ("job_process_id", "start_time", "end_time", "target_table", "data_file")


def compile_name_pattern(template: str) -> re.Pattern:
    """strftime-ish file-name template → anchored named-group regex
    (parity incl. %*, %%, %<n>N — streaming_load.rb:455-473)."""
    parts: list[str] = []
    for m in _PATTERN_TOKEN.finditer(template):
        op = m.group(0)
        if op == "%Y":
            parts.append(r"(?P<year>\d{4})")
        elif op == "%m":
            parts.append(r"(?P<month>\d{2})")
        elif op == "%d":
            parts.append(r"(?P<day>\d{2})")
        elif op == "%H":
            parts.append(r"(?P<hour>\d{2})")
        elif op == "%M":
            parts.append(r"(?P<minute>\d{2})")
        elif op == "%S":
            parts.append(r"(?P<second>\d{2})")
        elif op == "%Q":
            parts.append(r"(?P<seq>\d+)")
        elif op == "%*":
            parts.append(r"[^/]*")
        elif op == "%%":
            parts.append("%")
        else:
            nm = re.fullmatch(r"%(\d+)N", op)
            if nm:
                parts.append(rf"(?P<nanosecond>\d{{{nm.group(1)}}})")
            elif op.startswith("%"):
                raise ParameterError(
                    f"unknown time format in file_name config: {op!r}"
                )
            else:
                parts.append(re.escape(op))
    return re.compile(r"\A" + "".join(parts) + r"\Z")


def format_path(template: str, basename: str, pattern: re.Pattern) -> str:
    """Expand %Y/%m/… in ``template`` from fields captured off
    ``basename`` (streaming_load.rb:438-449)."""
    m = pattern.match(basename)
    if not m:
        raise ParameterError(f"file name does not match the pattern: {basename!r}")
    groups = m.groupdict()
    field_of = {
        "%Y": "year", "%m": "month", "%d": "day", "%H": "hour",
        "%M": "minute", "%S": "second", "%N": "nanosecond", "%Q": "seq",
    }

    def sub(mm: re.Match) -> str:
        op = mm.group(0)
        if op not in field_of or groups.get(field_of[op]) is None:
            raise ParameterError(f"unknown time format in persistent path: {op}")
        return groups[field_of[op]]

    return re.sub(r"%.", sub, template)


class FileQueue:
    """The S3Queue stand-in: a directory of pending files
    (streaming_load.rb:392-527; any Hadoop URI at scale, local dir here).
    """

    def __init__(self, queue_path: str, persistent_path: str, file_name: str):
        self.queue_path = queue_path
        self.persistent_path = persistent_path
        self.pattern = compile_name_pattern(file_name)

    def queued_files(self) -> list[str]:
        if not os.path.isdir(self.queue_path):
            return []
        return sorted(
            os.path.join(self.queue_path, f)
            for f in os.listdir(self.queue_path)
            if self.pattern.match(f)
        )

    def dequeue(self, path: str) -> str:
        """Move a loaded file to its date-templated persistent location."""
        base = os.path.basename(path)
        dest_dir = format_path(self.persistent_path, base, self.pattern)
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, base)
        shutil.move(path, dest)
        return dest


class HadoopFileQueue:
    """FileQueue over the Hadoop FileSystem API: works for ANY URI the
    Spark runtime can reach — ``file://`` locally, ``s3a://``/``hdfs://``
    on a cluster. This is the production queue (the reference's S3Queue);
    the plain :class:`FileQueue` is the zero-dependency local variant.
    Listing and renames run driver-side (control plane only — the data
    itself is read by executors via ``spark.read``).
    """

    def __init__(self, spark, queue_path: str, persistent_path: str, file_name: str):
        self.spark = spark
        self.queue_path = queue_path
        self.persistent_path = persistent_path
        self.pattern = compile_name_pattern(file_name)
        jvm = spark._jvm  # noqa: SLF001
        self._jpath = jvm.org.apache.hadoop.fs.Path
        hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
        self._fs = self._jpath(queue_path).getFileSystem(hconf)

    def queued_files(self) -> list[str]:
        p = self._jpath(self.queue_path)
        if not self._fs.exists(p):
            return []
        out = []
        for st in self._fs.listStatus(p):
            name = st.getPath().getName()
            if st.isFile() and self.pattern.match(name):
                out.append(st.getPath().toString())
        return sorted(out)

    def dequeue(self, path: str) -> str:
        base = path.rsplit("/", 1)[-1]
        dest_dir = format_path(self.persistent_path, base, self.pattern)
        self._fs.mkdirs(self._jpath(dest_dir))
        dest = f"{dest_dir}/{base}"
        if not self._fs.rename(self._jpath(path), self._jpath(dest)):
            raise ParameterError(f"dequeue rename failed: {path} -> {dest}")
        return dest


class StreamingLoader:
    """The load algorithm, reusable outside the job class."""

    def __init__(
        self,
        engine,
        queue: FileQueue,
        dest_table: str,
        log_table: str,
        work_table: str | None = None,
        fmt: str = "json",
        sql: str | None = None,
        process_id: str = "local",
    ):
        self.engine = engine
        self.queue = queue
        self.dest_table = dest_table
        self.log_table = log_table
        self.work_table = work_table
        self.fmt = fmt
        self.sql = sql
        self.process_id = process_id

    def loaded_files(self) -> set[str]:
        if not self.engine.table_exists(self.log_table):
            return set()
        return {
            r.data_file
            for r in self.engine.table(self.log_table).select("data_file").collect()
        }
        # NOTE: at 100 TB the log has millions of rows — production path
        # below (new_files) uses an anti-join, never this collect; this
        # helper exists for tests/inspection only.

    def new_files(self, candidates: list[str]) -> list[str]:
        """Anti-join candidates against the load log (exactly-once core,
        streaming_load.rb:294-312). Distributed: both sides are frames."""
        if not candidates:
            return []
        spark = self.engine.spark
        cand = spark.createDataFrame(
            [(os.path.basename(p), p) for p in candidates], "data_file string, path string"
        )
        if self.engine.table_exists(self.log_table):
            log = self.engine.table(self.log_table).select("data_file")
            cand = cand.join(log, "data_file", "left_anti")
        return [r.path for r in cand.select("path").collect()]

    # -- joint dest+log commit (streaming_load.rb:166-195 parity) -----------
    #
    # The reference appends dest AND the load log in ONE Redshift
    # transaction. Two independent parquet appends can't be joint-atomic,
    # so the commit protocol is write-ahead-manifest:
    #
    #   1. stage the dest delta and the log delta into hidden sibling
    #      dirs (``<table>.__delta__<txid>``) — invisible to readers;
    #   2. COMMIT POINT: atomically rename a manifest JSON into
    #      ``<warehouse>/.streaming_load_tx/`` naming both staged dirs;
    #   3. move the staged part-files into the live table dirs;
    #   4. delete the manifest.
    #
    # A crash before (2) leaves only invisible garbage (cleaned by
    # recover(); the batch reloads — nothing was published). A crash
    # after (2) is rolled FORWARD by recover() on the next invocation:
    # both appends complete together, so dest and log can never disagree
    # and the anti-join stays exactly-once.

    @property
    def _tx_dir(self) -> str:
        return os.path.join(self.engine.warehouse, ".streaming_load_tx")

    def _stage_delta(self, df: DataFrame, table: str, txid: str) -> tuple[str, int]:
        """Write ``df`` as parquet into a hidden staging dir; returns
        (stage_dir, row_count) — rows observed during the write itself."""
        stage = self.engine.table_dir(table) + f".__delta__{txid}"
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
        df.write.mode("overwrite").parquet(stage)
        return stage, int(obs.get["rows_written"])

    def _apply_moves(self, moves: list[dict]) -> None:
        for mv in moves:
            src, dest = mv["src"], mv["dest"]
            if os.path.isdir(src):
                os.makedirs(dest, exist_ok=True)
                for f in os.listdir(src):
                    if f.startswith(("_", ".")):
                        continue  # _SUCCESS / .crc markers stay behind
                    os.rename(os.path.join(src, f), os.path.join(dest, f))
                shutil.rmtree(src, ignore_errors=True)
            if os.path.isdir(dest):
                self.engine.register(mv["table"])

    def recover(self) -> int:
        """Roll forward any committed-but-unapplied manifests, then drop
        pre-commit staging garbage. Idempotent; call before each batch.
        (Single concurrent loader per dest table, as in the reference —
        the job-level lock serializes invocations.)"""
        applied = 0
        if os.path.isdir(self._tx_dir):
            for mf in sorted(os.listdir(self._tx_dir)):
                if not mf.endswith(".json"):
                    continue
                path = os.path.join(self._tx_dir, mf)
                with open(path) as f:
                    manifest = json.load(f)
                self._apply_moves(manifest["moves"])
                os.remove(path)
                applied += 1
        # staging dirs with no manifest = crash before the commit point
        for table in (self.dest_table, self.log_table):
            tdir = self.engine.table_dir(table)
            parent = os.path.dirname(tdir)
            base = os.path.basename(tdir)
            if not os.path.isdir(parent):
                continue
            for name in os.listdir(parent):
                if name.startswith(base + ".__delta__"):
                    shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
        return applied

    def _select_df(self) -> DataFrame:
        """Resolve the custom SQL body to the SELECT that produces the
        insert rows — validated BEFORE anything is published.

        The reference's documented body is ``INSERT INTO $dest_table
        SELECT ... FROM work;`` (streaming_load.rb:203). The loader owns
        the dest append (joint-atomic commit), so that wrapper is
        converted to its inner SELECT; executing it as-is would append
        dest outside the transaction (and double-append).
        """
        stmts = split_statements(self.sql)
        if not stmts:
            raise ParameterError("streaming_load: empty sql body")
        *setup, last = stmts
        m = re.match(r"insert\s+into\s+([\w.]+)\s+(.*)\Z", last, re.S | re.I)
        if m:
            if TableSpec.parse(m.group(1)) != TableSpec.parse(self.dest_table):
                raise ParameterError(
                    f"streaming_load sql inserts into {m.group(1)!r}, "
                    f"but dest-table is {self.dest_table!r}"
                )
            last = m.group(2)
        kind = last.split(None, 1)[0].lower() if last.split() else ""
        if kind not in ("select", "with", "("):
            raise ParameterError(
                "streaming_load sql must end with a SELECT "
                "(or 'INSERT INTO <dest-table> SELECT ...')"
            )
        for s in setup:
            self.engine.execute_statement(s)
        return self.engine.sql(last)

    def run_once(self, load_only: bool = False) -> dict:
        """One micro-batch. Returns counters."""
        self.recover()
        candidates = self.queue.queued_files()
        new = self.new_files(candidates)
        skipped = len(candidates) - len(new)
        if not new:
            return {"loaded_files": 0, "skipped_files": skipped, "rows": 0}

        spark = self.engine.spark
        reader = spark.read
        # Schema hint for the RAW files. With a custom SQL the dest
        # schema describes the TRANSFORMED rows, not the files — forcing
        # it onto the reader would parse every mismatched field as NULL
        # and silently commit garbage (exactly-once then prevents the
        # re-load). The work table's (.ct-defined) schema is the raw
        # shape in that case; without a custom SQL the dest schema is.
        schema_src = None
        if self.sql:
            if self.work_table and self.engine.table_exists(self.work_table):
                schema_src = self.engine.table(self.work_table).schema
        elif self.engine.table_exists(self.dest_table):
            schema_src = self.engine.table(self.dest_table).schema
        if schema_src is not None:
            reader = reader.schema(schema_src)
        # DataFrameReader.parquet is varargs-only; csv/json accept a list
        # (their second positional is schema — never splat those)
        df: DataFrame = (
            reader.parquet(*new) if self.fmt == "parquet" else getattr(reader, self.fmt)(new)
        )

        # work table (skip-work mode loads straight into dest)
        if self.work_table:
            self.engine.save_table(df, self.work_table, mode="overwrite")
            work_df = self.engine.table(self.work_table)
            insert_df = self._select_df() if self.sql else work_df
        elif self.sql:
            insert_df = self._select_df()
        else:
            insert_df = df

        txid = uuid.uuid4().hex[:12]
        dest_stage, rows = self._stage_delta(insert_df, self.dest_table, txid)
        now = F.current_timestamp()
        log_rows = (
            spark.createDataFrame(
                [(os.path.basename(p),) for p in new], "data_file string"
            )
            .select(
                F.lit(self.process_id).alias("job_process_id"),
                now.alias("start_time"),
                now.alias("end_time"),
                F.lit(self.dest_table).alias("target_table"),
                F.col("data_file"),
            )
        )
        log_stage, _ = self._stage_delta(log_rows, self.log_table, txid)

        manifest = {
            "txid": txid,
            "moves": [
                {"src": dest_stage, "dest": self.engine.table_dir(self.dest_table),
                 "table": self.dest_table},
                {"src": log_stage, "dest": self.engine.table_dir(self.log_table),
                 "table": self.log_table},
            ],
        }
        os.makedirs(self._tx_dir, exist_ok=True)
        mpath = os.path.join(self._tx_dir, f"{txid}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, mpath)  # ← the commit point
        self._apply_moves(manifest["moves"])
        os.remove(mpath)

        moved = 0
        if not load_only:
            for p in new:
                self.queue.dequeue(p)
                moved += 1
        return {
            "loaded_files": len(new),
            "skipped_files": skipped,
            "rows": rows,
            "dequeued": moved,
        }


@jobclass("streaming_load")
def streaming_load(job: Job) -> JobResult:
    """jobclass/streaming_load.rb — micro-batch exactly-once loader."""
    qpath = job.require("queue-path")
    ppath = job.param("persistent-path", job.require("queue-path") + "/done/%Y/%m/%d")
    fname = job.require("file-name")
    if "://" in qpath:  # any Hadoop URI (s3a://, hdfs://, file://)
        queue = HadoopFileQueue(job.engine.spark, qpath, ppath, fname)
    else:
        queue = FileQueue(queue_path=qpath, persistent_path=ppath, file_name=fname)
    dest = job.require("dest-table")
    loader = StreamingLoader(
        engine=job.engine,
        queue=queue,
        dest_table=dest,
        log_table=job.param("log-table", f"{dest}_l"),
        work_table=None if job.bool_param("skip-work") else job.param("work-table", f"{dest}_wk"),
        fmt=str(job.param("format", "json")),
        sql=job.sql,
        process_id=str(os.getpid()),
    )
    if job.bool_param("noop"):
        files = queue.queued_files()
        return JobResult(message=f"noop: {len(files)} queued file(s)")
    if job.bool_param("dequeue-only"):
        moved = 0
        # one scan of the load log, not one per queued file
        loaded = loader.loaded_files()
        for p in queue.queued_files():
            if os.path.basename(p) in loaded:
                queue.dequeue(p)
                moved += 1
        return JobResult(message=f"dequeued {moved} file(s)")
    stats = loader.run_once(load_only=job.bool_param("load-only"))
    return JobResult(
        message=(
            f"loaded {stats['loaded_files']} file(s) "
            f"({stats['skipped_files']} already loaded) into {dest}"
        ),
        rows=stats["rows"],
    )
