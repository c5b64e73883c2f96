"""Jobnet files → dependency DAG → sequential execution order.

Text format parity with lib/bricolage/jobnet.rb:296-359:

    job1 -> job2        # edge
    -> job3             # chain from previous dest
    job4                # start node
    *subsys/net2        # sub-jobnet reference (spliced recursively)
    @dummy              # dummy node
    # comment

Names default to the current subsystem; ``subsys/name`` crosses
subsystems. Subnets are loaded recursively and sandwiched between
``@net@start``/``@net@end`` dummy nodes (jobnet.rb:256-281). The DAG is
topo-sorted into a **sequential** job order (reference runs strictly
sequentially, taskqueue.rb:31-37); cycles and orphan references raise
ParameterError.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from graphlib import CycleError, TopologicalSorter

from bricolage_spark.exception import ParameterError

_NAME = r"\w[\w\-]*"
_NODE_REF = rf"[@*]?(?:{_NAME}/)?{_NAME}"
START_RE = re.compile(rf"\A({_NODE_REF})\Z")
DEPEND_RE = re.compile(rf"\A({_NODE_REF})?\s*->\s*({_NODE_REF})\Z")
REF_RE = re.compile(rf"\A(\*)?(?:(\w[\w\-]*)/)?(@?\w[\w\-]*)\Z")


@dataclass(frozen=True)
class Ref:
    subsystem: str
    name: str
    is_net: bool = False

    @classmethod
    def parse(cls, s: str, curr_subsys: str | None = None) -> "Ref":
        m = REF_RE.match(s)
        if not m:
            raise ParameterError(f"bad job name: {s!r}")
        is_net, subsys, name = m.group(1), m.group(2), m.group(3)
        node_subsys = subsys or curr_subsys
        if not node_subsys:
            raise ParameterError(f"missing subsystem: {s}")
        return cls(subsystem=node_subsys, name=name, is_net=bool(is_net))

    @property
    def is_dummy(self) -> bool:
        return self.name.startswith("@")

    def __str__(self) -> str:
        star = "*" if self.is_net else ""
        return f"{star}{self.subsystem}/{self.name}"


class JobNet:
    def __init__(self, ref: Ref):
        self.ref = ref
        self.edges: list[tuple[Ref, Ref]] = []

    @property
    def start_ref(self) -> Ref:
        return Ref(self.ref.subsystem, f"@{self.ref.name}@start")

    @property
    def end_ref(self) -> Ref:
        return Ref(self.ref.subsystem, f"@{self.ref.name}@end")

    def add_edge(self, src: Ref, dest: Ref) -> None:
        self.edges.append((src, dest))

    @classmethod
    def parse(cls, text: str, ref: Ref) -> "JobNet":
        net = cls(ref)
        default_src: Ref | None = None
        for lineno, raw in enumerate(text.splitlines(), 1):
            line = re.sub(r"#.*", "", raw).strip()
            if not line:
                continue
            m = DEPEND_RE.match(line)
            if m:
                src = (
                    Ref.parse(m.group(1), ref.subsystem)
                    if m.group(1)
                    else default_src
                )
                if src is None:
                    raise ParameterError(
                        f"syntax error at line {lineno}: '->' must follow any job"
                    )
                dest = Ref.parse(m.group(2), ref.subsystem)
                net.add_edge(src, dest)
                default_src = dest
                continue
            m = START_RE.match(line)
            if m:
                dest = Ref.parse(m.group(1), ref.subsystem)
                net.add_edge(net.start_ref, dest)
                default_src = dest
                continue
            raise ParameterError(f"syntax error at line {lineno}: {raw.strip()!r}")
        return net


class RootJobNet:
    """Recursively loaded net with subnets spliced in (jobnet.rb:66-96)."""

    def __init__(self, home: str, root: JobNet, nets: dict[Ref, JobNet]):
        self.home = home
        self.root = root
        self.nets = nets

    @classmethod
    def load(cls, home: str, path: str) -> "RootJobNet":
        ref = cls._ref_for_path(home, path)
        nets: dict[Ref, JobNet] = {}
        root = cls._load_net(home, path, ref, nets, loading=())
        return cls(home, root, nets)

    @staticmethod
    def _ref_for_path(home: str, path: str) -> Ref:
        subsys = os.path.basename(os.path.dirname(os.path.abspath(path)))
        name = re.sub(r"\.jobnet\Z", "", os.path.basename(path))
        return Ref(subsys, name, is_net=True)

    @classmethod
    def _load_net(
        cls,
        home: str,
        path: str,
        ref: Ref,
        nets: dict[Ref, JobNet],
        loading: tuple[Ref, ...],
    ) -> JobNet:
        if ref in loading:
            chain = " -> ".join(str(r) for r in loading + (ref,))
            raise ParameterError(f"jobnet reference cycle: {chain}")
        if not os.path.exists(path):
            raise ParameterError(f"jobnet file not found: {path}")
        with open(path) as f:
            net = JobNet.parse(f.read(), ref)
        nets[ref] = net
        # recursively load referenced subnets (cycle check on the loading
        # chain, not on the cache — a diamond is fine, a loop is not)
        for src, dest in list(net.edges):
            for node in (src, dest):
                if not node.is_net:
                    continue
                if node in loading + (ref,):
                    chain = " -> ".join(str(r) for r in loading + (ref, node))
                    raise ParameterError(f"jobnet reference cycle: {chain}")
                if node not in nets:
                    sub_path = os.path.join(home, node.subsystem, f"{node.name}.jobnet")
                    cls._load_net(home, sub_path, node, nets, loading + (ref,))
        return net

    def _node_in(self, ref: Ref) -> Ref:
        return self.nets[ref].start_ref if ref.is_net else ref

    def _node_out(self, ref: Ref) -> Ref:
        return self.nets[ref].end_ref if ref.is_net else ref

    def dag_edges(self) -> list[tuple[Ref, Ref]]:
        """Flatten subnets: every ``*net`` node becomes its
        ``@net@start`` … ``@net@end`` sandwich (jobnet.rb:256-281,
        443-449): heads hang off start, tails flow into end."""
        edges: list[tuple[Ref, Ref]] = []
        for net in self.nets.values():
            nodes = {n for e in net.edges for n in e}
            dests = {d for _, d in net.edges}
            srcs = {s for s, _ in net.edges}
            for src, dest in net.edges:
                edges.append((self._node_out(src), self._node_in(dest)))
            for n in nodes:
                if n in (net.start_ref, net.end_ref):
                    continue
                if n not in dests:
                    edges.append((net.start_ref, self._node_in(n)))
                if n not in srcs:
                    edges.append((self._node_out(n), net.end_ref))
        return list(dict.fromkeys(edges))

    def sequential_jobs(self) -> list[Ref]:
        """Topological order of real jobs (dummies and start/end dropped),
        deterministic (ties broken by name)."""
        edges = self.dag_edges()
        graph: dict[Ref, set[Ref]] = {}
        for src, dest in edges:
            graph.setdefault(dest, set()).add(src)
            graph.setdefault(src, set())
        ts = TopologicalSorter(graph)
        try:
            ts.prepare()
        except CycleError as err:
            cycle = " -> ".join(str(r) for r in err.args[1])
            raise ParameterError(f"jobnet cycle detected: {cycle}")
        order: list[Ref] = []
        while ts.is_active():
            ready = sorted(ts.get_ready(), key=str)
            for node in ready:
                order.append(node)
                ts.done(node)
        return [r for r in order if not r.is_dummy and not r.is_net]

    def real_job_dependencies(self) -> dict[Ref, set[Ref]]:
        """Per real job, the set of real jobs that must finish first —
        pseudo nodes (``@dummy`` markers, subnet start/end sandwiches)
        collapsed away. This is the structure a PARALLEL runner
        schedules on: a job is ready when all its real dependencies have
        succeeded, regardless of how many dummy/subnet hops the jobnet
        file put between them.

        Forward pass in topological order: every pseudo node carries the
        union of its predecessors' frontiers; every real node records
        that union as its dependencies and becomes its own frontier.
        """
        edges = self.dag_edges()
        graph: dict[Ref, set[Ref]] = {}
        for src, dest in edges:
            graph.setdefault(dest, set()).add(src)
            graph.setdefault(src, set())
        ts = TopologicalSorter(graph)
        try:
            ts.prepare()
        except CycleError as err:
            cycle = " -> ".join(str(r) for r in err.args[1])
            raise ParameterError(f"jobnet cycle detected: {cycle}")
        frontier: dict[Ref, set[Ref]] = {}
        deps: dict[Ref, set[Ref]] = {}
        while ts.is_active():
            for node in sorted(ts.get_ready(), key=str):
                inherited: set[Ref] = set()
                for p in graph[node]:
                    inherited |= frontier[p]
                if node.is_dummy or node.is_net:
                    frontier[node] = inherited
                else:
                    deps[node] = inherited
                    frontier[node] = {node}
                ts.done(node)
        return deps

    def job_path(self, ref: Ref) -> str:
        """Locate the job file for a job ref (any recognized extension).

        Ambiguous matches (both ``x.job`` and ``x.sql.job``) error rather
        than silently picking one — debugging the wrong file is worse
        than renaming one.
        """
        base = os.path.join(self.home, ref.subsystem, ref.name)
        hits = [
            base + ext
            for ext in (".job", ".sql.job", ".py.job", ".sh.job")
            if os.path.exists(base + ext)
        ]
        if len(hits) > 1:
            raise ParameterError(
                f"ambiguous job files for {ref}: {', '.join(hits)}"
            )
        if not hits:
            raise ParameterError(f"job file not found for {ref} (searched {base}.*)")
        return hits[0]

    def check_jobs(self) -> list[str]:
        """Orphan check (jobnet.rb:157-165): every non-dummy job must have
        a job file. Returns missing paths."""
        missing = []
        for ref in self.sequential_jobs():
            try:
                self.job_path(ref)
            except ParameterError:
                missing.append(str(ref))
        return missing
