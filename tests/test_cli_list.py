"""CLI list modes (application.rb:311-369 parity): list-declarations,
list-variables, list-global-variables — all metadata-only, no Spark."""

from __future__ import annotations

import pytest

from bricolage_spark.cli import main


@pytest.fixture()
def home(tmp_path):
    (tmp_path / "config").mkdir()
    (tmp_path / "config" / "variable.yml").write_text(
        "schema: prod\nreport_table: $schema.report\n"
    )
    sub = tmp_path / "subsys"
    sub.mkdir()
    (sub / "report.sql.job").write_text(
        "/*\n"
        "class: adhoc\n"
        "dest-table: out\n"
        "src-tables: [src1]\n"
        "*/\n"
        "INSERT INTO $dest_table SELECT * FROM $src1 WHERE dt = '$data_date';\n"
    )
    return tmp_path


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out.splitlines()


def test_list_declarations(home, capsys):
    lines = _run(
        capsys, ["--home", str(home), "list-declarations", "subsys/report.sql.job"]
    )
    # dest_table and src1 are auto-declared with no default; data_date
    # defaults to its own name (jobfile.rb:48-78).
    assert "dest_table" in lines
    assert "src1" in lines
    assert "data_date\t= 'data_date'" in lines


def test_list_variables_resolves_job_layers(home, capsys):
    lines = _run(
        capsys,
        [
            "--home", str(home),
            "list-variables", "subsys/report.sql.job",
            "-v", "data_date=2024-06-01",
        ],
    )
    kv = dict(line.split("=", 1) for line in lines)
    assert kv["dest_table"] == "'out'"
    assert kv["src1"] == "'src1'"
    assert kv["data_date"] == "'2024-06-01'"
    # global variable.yml layer is visible to the job, fully resolved
    assert kv["report_table"] == "'prod.report'"


def test_list_global_variables(home, capsys):
    lines = _run(capsys, ["--home", str(home), "list-global-variables"])
    kv = dict(line.split("=", 1) for line in lines)
    assert kv["schema"] == "'prod'"
    assert kv["report_table"] == "'prod.report'"  # $schema resolved
    assert kv["bricolage_env"] == "'development'"
    assert kv["bricolage_home"] == repr(str(home))


@pytest.fixture()
def nethome(tmp_path):
    sub = tmp_path / "subsys"
    sub.mkdir()
    (sub / "net1.jobnet").write_text("job1\n-> job2\n")
    for j in ("job1", "job2"):
        (sub / f"{j}.job").write_text(f"class: noop\nmessage: {j}\n")
    return tmp_path


def test_jobnet_list_jobs(nethome, capsys):
    lines = _run(
        capsys,
        ["--home", str(nethome), "jobnet", "subsys/net1.jobnet", "--list-jobs"],
    )
    assert lines == ["subsys/job1", "subsys/job2"]


def test_jobnet_check_only(nethome, capsys):
    lines = _run(
        capsys, ["--home", str(nethome), "jobnet", "subsys/net1.jobnet", "-c"]
    )
    assert lines == ["OK: 2 jobs compiled"]


def test_jobnet_check_only_reports_bad_job(nethome, capsys):
    (nethome / "subsys" / "job2.job").write_text("class: no-such-class\n")
    rc = main(["--home", str(nethome), "jobnet", "subsys/net1.jobnet", "-c"])
    assert rc != 0
    assert "no such job class" in capsys.readouterr().err


def test_job_check_only(nethome, capsys):
    lines = _run(capsys, ["--home", str(nethome), "job", "subsys/job1.job", "-c"])
    assert lines == ["OK"]


def test_list_job_class(capsys):
    lines = _run(capsys, ["list-job-class"])
    for expected in ("sql", "load", "unload", "insert", "rebuild-rename",
                     "streaming_load", "noop", "exec"):
        assert expected in lines, expected


def test_version(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0
    assert "0.1.0" in capsys.readouterr().out
