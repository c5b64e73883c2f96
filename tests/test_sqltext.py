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


# ---------------------------------------------------------------------------
# embedded-code helper API parity (embeddedcodeapi.rb:8-48)
# ---------------------------------------------------------------------------


def _make_app_home(tmp_path):
    sub = tmp_path / "subsys"
    sub.mkdir()
    (sub / "users.ct").write_text(
        "--dest-table: users\n--attributes: [daily, pii]\n\ncreate table $dest_table (id int);\n"
    )
    (sub / "events.ct").write_text(
        "--dest-table: events\n--attributes: daily\n\ncreate table $dest_table (x int);\n"
    )
    (sub / "misc.ct").write_text("create table misc (y int);\n")
    return tmp_path


def test_all_tables_and_attribute_tables(tmp_path):
    home = _make_app_home(tmp_path)
    out = render_template(
        "<%= ','.join(str(t) for t in all_tables()) %>", app_home=str(home)
    )
    assert out == "subsys.events,subsys.misc,subsys.users"
    daily = render_template(
        "<%= ' '.join(str(t) for t in attribute_tables('daily')) %>",
        app_home=str(home),
    )
    assert daily == "subsys.events subsys.users"
    assert render_template(
        "<%= len(attribute_tables('pii')) %>", app_home=str(home)
    ) == "1"


def test_path_helpers(tmp_path):
    import os

    assert render_template("<%= user_home %>") == os.path.expanduser("~")
    assert render_template(
        "<%= user_home_relative_path('.bricolage/pw') %>"
    ) == os.path.join(os.path.expanduser("~"), ".bricolage/pw")
    assert render_template(
        "<%= app_home_relative_path('config/x.yml') %>", app_home=str(tmp_path)
    ) == str(tmp_path / "config/x.yml")
    assert render_template(
        "<%= relative_path('frag.sql') %>", base_dir=str(tmp_path)
    ) == str(tmp_path / "frag.sql")


def test_app_home_helpers_require_app_home():
    import pytest as _pytest

    from bricolage_spark.exception import ParameterError

    with _pytest.raises(ParameterError):
        render_template("<%= all_tables() %>")


def test_load_job_file_defaults_app_home_to_grandparent(tmp_path):
    home = _make_app_home(tmp_path)
    job = home / "subsys" / "report.sql.job"
    job.write_text(
        "/*\nclass: sql\ndest-table: r\n*/\n"
        "-- tables: <%= ','.join(str(t) for t in attribute_tables('daily')) %>\n"
        "SELECT 1;\n"
    )
    from bricolage_spark.sqltext import load_job_file

    values, sql = load_job_file(str(job))
    assert "subsys.events,subsys.users" in sql
