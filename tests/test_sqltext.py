"""Variable/templating tests — mirrors reference test_variables.rb and
test_parameters.rb shapes (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from bricolage_spark.exception import ParameterError
from bricolage_spark.sqltext import (
    Variables,
    auto_declarations,
    expand_string,
    list_variables,
    parse_program_job,
    parse_sql_job,
    render_template,
)


def test_expand_both_syntaxes():
    out = expand_string("select * from $t where x = ${v}", {"t": "users", "v": "1"}.__getitem__)
    assert out == "select * from users where x = 1"


def test_list_variables_order_and_unique():
    assert list_variables("$a ${b} $a $c") == ["a", "b", "c"]


def test_resolve_recursive():
    v = Variables({"a": "x_$b", "b": "y_$c", "c": "z"})
    r = v.resolve()
    assert r["a"] == "x_y_z"


def test_resolve_cycle_raises_with_chain():
    v = Variables({"a": "$b", "b": "$a"})
    with pytest.raises(ParameterError, match="recursive variable reference"):
        v.resolve()


def test_resolve_undefined_raises():
    v = Variables({"a": "$nope"})
    with pytest.raises(ParameterError, match=r"undefined variable.*\$nope"):
        v.resolve()


def test_union_precedence_low_to_high():
    # job.rb:99-120: later layers win
    merged = Variables.union({"x": "global"}, {"x": "job"}, {"x": "cmdline"})
    assert merged.resolve()["x"] == "cmdline"


def test_dash_normalized_to_underscore():
    v = Variables({"data-date": "2024-01-01"})
    assert v.resolve()["data_date"] == "2024-01-01"


def test_parse_sql_job_header_and_body():
    text = "/*\nclass: insert\ndest-table: d\nsrc-tables: {s: s}\n*/\n\nINSERT INTO $dest_table select * from $s;\n"
    values, sql = parse_sql_job(text)
    assert values["class"] == "insert"
    assert values["src-tables"] == {"s": "s"}
    assert "INSERT INTO $dest_table" in sql
    assert not sql.lstrip().startswith("/*")
    # line numbers preserved: body starts at the same line as original
    assert sql.count("\n", 0, sql.index("INSERT")) == text.count(
        "\n", 0, text.index("INSERT")
    )


def test_parse_sql_job_missing_header():
    with pytest.raises(ParameterError, match="missing embedded job definition"):
        parse_sql_job("select 1;")


def test_parse_program_job_skips_shebang():
    values = parse_program_job("#!/bin/sh\n# class: exec\n# args: echo hi\necho hi\n")
    assert values["class"] == "exec"


def test_auto_declarations():
    sql = "insert into $dest_table select * from $s where d = '$data_date'"
    decls = auto_declarations(sql, {"src-tables": {"s": "s"}})
    assert decls["dest_table"] is None
    assert decls["s"] is None
    assert decls["data_date"] == "data_date"  # defaults to own name


def test_render_template_helpers(tmp_path):
    assert render_template("<%= ymd(date('2024-03-05')) %>") == "2024-03-05"
    (tmp_path / "frag.sql").write_text("AND x = 1")
    out = render_template("WHERE 1=1 <%= read_file_if_exist('frag.sql') %>", base_dir=str(tmp_path))
    assert out == "WHERE 1=1 AND x = 1"


def test_render_template_bad_expr():
    with pytest.raises(ParameterError, match="template expression error"):
        render_template("<%= nope() %>")
