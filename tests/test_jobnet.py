"""Jobnet parsing/DAG tests — mirrors reference fixtures
test/home/subsys/net1.jobnet (``job1 -> *net2 -> job4``) and net2
(``job2 -> job3``)."""

from __future__ import annotations

import os

import pytest

from bricolage_spark.exception import ParameterError
from bricolage_spark.jobnet import JobNet, Ref, RootJobNet


def write(home, subsys, name, text):
    d = os.path.join(home, subsys)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        f.write(text)


def test_ref_parse():
    r = Ref.parse("subsys/job1")
    assert (r.subsystem, r.name, r.is_net) == ("subsys", "job1", False)
    n = Ref.parse("*net2", curr_subsys="s")
    assert (n.subsystem, n.name, n.is_net) == ("s", "net2", True)
    d = Ref.parse("@dummy", curr_subsys="s")
    assert d.is_dummy
    with pytest.raises(ParameterError, match="missing subsystem"):
        Ref.parse("job1")
    with pytest.raises(ParameterError, match="bad job name"):
        Ref.parse("a b")


def test_parse_edges_and_chain():
    net = JobNet.parse("job1 -> job2\n-> job3\n# comment\njob9\n", Ref("s", "n", True))
    strs = [(str(a), str(b)) for a, b in net.edges]
    assert ("s/job1", "s/job2") in strs
    assert ("s/job2", "s/job3") in strs  # '->' chains from previous dest
    assert ("s/@n@start", "s/job9") in strs


def test_dangling_arrow_raises():
    with pytest.raises(ParameterError, match="must follow any job"):
        JobNet.parse("-> job2\n", Ref("s", "n", True))


def test_nested_subnet_order(tmp_path):
    home = str(tmp_path)
    # exact reference fixture shape (test/home/subsys/net1.jobnet)
    write(home, "subsys", "net1.jobnet", "job1\n-> *net2\n-> job4\n")
    write(home, "subsys", "net2.jobnet", "job2\n-> job3\n")
    for j in ("job1", "job2", "job3", "job4"):
        write(home, "subsys", f"{j}.job", "class: noop\n")
    root = RootJobNet.load(home, os.path.join(home, "subsys", "net1.jobnet"))
    order = [r.name for r in root.sequential_jobs()]
    assert order == ["job1", "job2", "job3", "job4"]
    assert root.check_jobs() == []


def test_cross_subsystem_ref(tmp_path):
    home = str(tmp_path)
    write(home, "s1", "net.jobnet", "a -> s2/b\n")
    write(home, "s1", "a.job", "class: noop\n")
    write(home, "s2", "b.job", "class: noop\n")
    root = RootJobNet.load(home, os.path.join(home, "s1", "net.jobnet"))
    order = [str(r) for r in root.sequential_jobs()]
    assert order == ["s1/a", "s2/b"]


def test_cycle_detected(tmp_path):
    home = str(tmp_path)
    write(home, "s", "net.jobnet", "a -> b\nb -> a\n")
    root = RootJobNet.load(home, os.path.join(home, "s", "net.jobnet"))
    with pytest.raises(ParameterError, match="cycle"):
        root.sequential_jobs()


def test_missing_job_detected(tmp_path):
    home = str(tmp_path)
    write(home, "s", "net.jobnet", "a -> b\n")
    write(home, "s", "a.job", "class: noop\n")
    root = RootJobNet.load(home, os.path.join(home, "s", "net.jobnet"))
    assert root.check_jobs() == ["s/b"]


def test_subnet_cycle_detected(tmp_path):
    home = str(tmp_path)
    write(home, "s", "n1.jobnet", "*n2\n")
    write(home, "s", "n2.jobnet", "*n1\n")
    with pytest.raises(ParameterError, match="jobnet reference cycle"):
        RootJobNet.load(home, os.path.join(home, "s", "n1.jobnet"))
