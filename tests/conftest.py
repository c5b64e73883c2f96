from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bricolage_spark.engine import SparkEngine  # noqa: E402
from bricolage_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield s


@pytest.fixture()
def engine(spark, tmp_path):
    return SparkEngine(spark, str(tmp_path / "warehouse"))


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
