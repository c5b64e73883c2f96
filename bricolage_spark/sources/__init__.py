"""Data sources (SURVEY.md §1.1/§2.1 — lib/bricolage/*datasource.rb).

The reference wires named data sources from ``datasource.yml``; jobs refer
to them by name (``src-ds``, ``dest-ds``). Types reproduced:

| reference type | here                          |
|----------------|-------------------------------|
| psql (Redshift)| ``jdbc`` — spark.read/write.jdbc (driver-gated) |
| s3             | ``s3`` — s3a:// URI builder; creds from env; any Hadoop URI works |
| file           | ``file`` — local/posix directory with glob/put/remove |
| sns            | ``sns`` — notification log stub (boto3 absent here) |
| generic        | ``generic`` — named python callables |
| sql (spark)    | ``spark`` — the engine warehouse itself |
"""

from __future__ import annotations

import fnmatch
import logging
import os
import shutil
from collections.abc import Callable
from typing import Any

from bricolage_spark.exception import ParameterError

logger = logging.getLogger("bricolage_spark.sources")


class DataSource:
    type_name = "base"

    def __init__(self, name: str, config: dict[str, Any]):
        self.name = name
        self.config = config


class SparkDataSource(DataSource):
    """The warehouse itself (reference 'sql' ds → Redshift; here Spark)."""

    type_name = "spark"

    def __init__(self, name: str, config: dict[str, Any], engine=None):
        super().__init__(name, config)
        self.engine = engine


class FileDataSource(DataSource):
    """A directory of files (filedatasource.rb)."""

    type_name = "file"

    @property
    def base_dir(self) -> str:
        return self.config.get("base_dir", ".")

    def path(self, rel: str) -> str:
        return os.path.join(self.base_dir, rel)

    def glob(self, pattern: str) -> list[str]:
        d, pat = os.path.split(self.path(pattern))
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if fnmatch.fnmatch(f, pat)
        )

    def put(self, src: str, rel_dest: str) -> str:
        dest = self.path(rel_dest)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy2(src, dest)
        return dest

    def remove(self, pattern: str) -> int:
        n = 0
        for p in self.glob(pattern):
            os.remove(p)
            n += 1
        return n


class S3DataSource(DataSource):
    """S3 bucket+prefix → s3a:// URIs (s3datasource.rb:114-140).

    Spark reads/writes these URIs directly when the hadoop-aws jars and
    credentials are present (cluster deployment); URI construction and
    traversal logic is environment-independent.
    """

    type_name = "s3"

    @property
    def bucket(self) -> str:
        b = self.config.get("bucket")
        if not b:
            raise ParameterError(f"s3 data source {self.name}: missing bucket")
        return b

    @property
    def prefix(self) -> str:
        return self.config.get("prefix", "").strip("/")

    def url(self, rel: str = "") -> str:
        key = "/".join(p for p in (self.prefix, rel.lstrip("/")) if p)
        return f"s3a://{self.bucket}/{key}"


class SNSDataSource(DataSource):
    """SNS topic (snsdatasource.rb:10-40): a real boto3 publish when boto3
    and a ``topic_arn`` are available (cluster deployment), otherwise a
    log-only fallback (this container has no AWS SDK).  ``write`` aliases
    ``publish`` so the source doubles as a logger device, as in the
    reference (snsdatasource.rb:33)."""

    type_name = "sns"

    def _client(self):
        """A boto3 SNS client, or None when boto3 or credentials are
        unavailable (then publish degrades to log-only — deterministic,
        not error-swallowing: with credentials present, delivery failures
        propagate as JobError like the reference's wrap)."""
        try:
            import boto3  # noqa: PLC0415 - optional dependency
        except ImportError:
            return None
        kw = {"region_name": self.config.get("region")}
        if self.config.get("access_key_id"):
            kw["aws_access_key_id"] = self.config["access_key_id"]
            kw["aws_secret_access_key"] = self.config.get("secret_access_key")
        session = boto3.session.Session(
            **{k: v for k, v in kw.items() if v}
        )
        if session.get_credentials() is None:
            return None
        return session.client("sns")

    def publish(self, message: str) -> None:
        client = self._client()
        arn = self.config.get("topic_arn")
        if client is not None and arn:
            try:
                client.publish(TopicArn=arn, Message=message)
            except Exception as err:  # snsdatasource.rb:25-29 wraps errors
                from bricolage_spark.exception import JobError

                raise JobError(
                    f"SNS publish failed (topic_arn={arn!r}): {err}"
                )
            return
        logger.info(
            "SNS[%s] publish (no credentials/topic_arn, log only): %s",
            arn or self.config.get("topic", "?"),
            message,
        )

    # IO-compatible logger-device methods (snsdatasource.rb:31-37)
    write = publish

    def close(self) -> None:
        pass


class GenericDataSource(DataSource):
    """Named python callables (genericdatasource.rb:119-138)."""

    type_name = "generic"

    def __init__(self, name: str, config: dict[str, Any]):
        super().__init__(name, config)
        self._actions: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable) -> None:
        self._actions[name] = fn

    def action(self, name: str) -> Callable:
        if name not in self._actions:
            raise ParameterError(f"generic ds {self.name}: unknown action {name}")
        return self._actions[name]


class JDBCDataSource(DataSource):
    """psql/Redshift parity via spark JDBC (needs a driver jar on the
    cluster classpath; constructing readers is environment-independent)."""

    type_name = "jdbc"

    @property
    def url(self) -> str:
        host = self.config.get("host", "localhost")
        port = self.config.get("port", 5432)
        db = self.config.get("database", "postgres")
        return f"jdbc:postgresql://{host}:{port}/{db}"

    def reader(self, spark, table: str):
        return (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("user", self.config.get("username", ""))
            .option("password", self.config.get("password", ""))
        )


_TYPES = {
    cls.type_name: cls
    for cls in (
        SparkDataSource,
        FileDataSource,
        S3DataSource,
        SNSDataSource,
        GenericDataSource,
        JDBCDataSource,
    )
}
# reference type aliases
_TYPES["psql"] = JDBCDataSource
_TYPES["sql"] = SparkDataSource


def create_datasource(name: str, config: dict[str, Any], engine=None) -> DataSource:
    t = str(config.get("type", "file"))
    cls = _TYPES.get(t)
    if cls is None:
        raise ParameterError(f"unknown data source type: {t} (ds {name})")
    if cls is SparkDataSource:
        return SparkDataSource(name, config, engine=engine)
    return cls(name, config)


def load_datasources(configs: dict[str, dict], engine=None) -> dict[str, DataSource]:
    return {
        name: create_datasource(name, cfg or {}, engine=engine)
        for name, cfg in (configs or {}).items()
    }
