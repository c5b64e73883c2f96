"""Parameter-type tests — table-driven, mirroring reference
test_parameters.rb (SURVEY.md §5)."""

from __future__ import annotations

import datetime

import pytest

from bricolage_spark.engine import TableSpec
from bricolage_spark.exception import ParameterError
from bricolage_spark.parameters import (
    BoolParam,
    DataSourceParam,
    DateParam,
    EnumParam,
    KeyValueParam,
    ParamSchema,
    SrcTableParam,
    StringListParam,
    StringParam,
    TableParam,
)


def test_string_required_and_missing():
    p = StringParam("dest-table")
    assert p.parse("t1") == "t1"
    with pytest.raises(ParameterError, match="parameter not given: dest-table"):
        p.parse(None)


def test_optional_with_default():
    p = StringParam("grant", optional=True, default="nobody")
    assert p.parse(None) == "nobody"


@pytest.mark.parametrize(
    "raw,expected",
    [("true", True), ("Yes", True), ("on", True), ("1", True),
     ("false", False), ("No", False), ("0", False), (True, True), (False, False)],
)
def test_bool_coercions(raw, expected):
    assert BoolParam("truncate").parse(raw) is expected


def test_bool_garbage_raises():
    with pytest.raises(ParameterError, match="not a boolean"):
        BoolParam("truncate").parse("maybe")


def test_date_parse():
    assert DateParam("data-date").parse("2024-03-05") == datetime.date(2024, 3, 5)
    with pytest.raises(ParameterError, match="bad value for parameter data-date"):
        DateParam("data-date").parse("03/05/2024")


def test_enum_membership():
    p = EnumParam("format", values=("tsv", "csv", "json"))
    assert p.parse("csv") == "csv"
    with pytest.raises(ParameterError, match="'xml' not one of"):
        p.parse("xml")


def test_table_param():
    spec = TableParam("dest-table").parse("sales.daily")
    assert spec == TableSpec("sales", "daily")


@pytest.mark.parametrize(
    "raw,keys",
    [("t", ["t"]), (["a", "b"], ["a", "b"]), ({"x": "sch.t"}, ["x"])],
)
def test_src_tables_shapes(raw, keys):
    out = SrcTableParam("src-tables").parse(raw)
    assert sorted(out) == sorted(keys)
    assert all(isinstance(v, TableSpec) for v in out.values())


def test_string_list_split_or_list():
    p = StringListParam("args")
    assert p.parse("a b  c") == ["a", "b", "c"]
    assert p.parse(["x", 1]) == ["x", "1"]


def test_key_value():
    assert KeyValueParam("env").parse({"A": 1}) == {"A": 1}
    with pytest.raises(ParameterError, match="expected a mapping"):
        KeyValueParam("env").parse("nope")


def test_datasource_lookup():
    class Ctx:
        datasources = {"s3main": object()}

    p = DataSourceParam("src-ds")
    assert p.parse("s3main", Ctx()) is Ctx.datasources["s3main"]
    with pytest.raises(ParameterError, match="no such data source: nope"):
        p.parse("nope", Ctx())


def test_schema_parses_all():
    schema = ParamSchema(
        [
            TableParam("dest-table"),
            BoolParam("truncate", optional=True, default=False),
            EnumParam("format", values=("tsv", "json"), optional=True, default="tsv"),
        ]
    )
    out = schema.parse({"dest-table": "d", "truncate": "yes"})
    assert out["dest-table"] == TableSpec(None, "d")
    assert out["truncate"] is True
    assert out["format"] == "tsv"
