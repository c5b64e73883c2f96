"""Variable expansion + job-file templating.

Reproduces the observable semantics of the reference's most behavior-rich
subsystem (lib/bricolage/variables.rb, jobfile.rb, sqlstatement.rb,
configloader.rb, embeddedcodeapi.rb):

- ``$var`` / ``${var}`` expansion with the exact reference regex
  (variables.rb:182: ``\\$(\\w+)|\\$\\{(\\w+)\\}``)
- recursive resolution with cycle detection
  (variables.rb:73-96 — error message lists the cycle)
- layered precedence merge (job.rb:99-120)
- ``-`` → ``_`` variable-name normalization (sqlstatement.rb:156)
- ``.sql.job`` embedded YAML header in a leading ``/* ... */`` block,
  ``.py.job``/``.sh.job`` ``#``-comment headers (jobfile.rb:25-103)
- auto-declaration of ``$dest_table`` and src tables (jobfile.rb:48-78)
- a ``<%= ... %>`` template pre-pass standing in for ERB
  (configloader.rb:34-41) with the embedded-code helper API
  (embeddedcodeapi.rb: date/ymd/read_file_if_exist...)
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from collections.abc import Callable, Mapping
from typing import Any

import yaml

from bricolage_spark.exception import ParameterError

VAR_RE = re.compile(r"\$(\w+)|\$\{(\w+)\}")


def expand_string(s: str, lookup: Callable[[str], str]) -> str:
    """Replace every ``$var`` / ``${var}`` using ``lookup(name)``."""
    return VAR_RE.sub(lambda m: str(lookup(m.group(1) or m.group(2))), s)


def list_variables(s: str) -> list[str]:
    """Unique variable names referenced in ``s``, in first-seen order."""
    seen: dict[str, None] = {}
    for m in VAR_RE.finditer(s):
        seen.setdefault(m.group(1) or m.group(2))
    return list(seen)


def normalize_var_name(name: str) -> str:
    """Parameter names use ``-``; SQL variable names use ``_``."""
    return name.replace("-", "_")


class Variables:
    """An ordered, layered variable set with recursive resolution.

    ``union`` merges layers low→high precedence; ``resolve`` expands
    variable references inside values recursively, raising ParameterError
    on cycles (message lists the reference chain, as the reference does)
    or on undefined names.
    """

    def __init__(self, init: Mapping[str, Any] | None = None):
        self._vars: dict[str, Any] = {}
        if init:
            for k, v in init.items():
                self[k] = v

    def __setitem__(self, name: str, value: Any) -> None:
        self._vars[normalize_var_name(str(name))] = value

    def __getitem__(self, name: str) -> Any:
        return self._vars[normalize_var_name(name)]

    def __contains__(self, name: str) -> bool:
        return normalize_var_name(name) in self._vars

    def keys(self):
        return self._vars.keys()

    def items(self):
        return self._vars.items()

    def __repr__(self) -> str:  # pragma: no cover
        return f"Variables({self._vars!r})"

    @classmethod
    def union(cls, *layers: "Variables | Mapping[str, Any] | None") -> "Variables":
        """Merge layers; later layers (higher precedence) win."""
        out = cls()
        for layer in layers:
            if layer is None:
                continue
            items = layer.items() if hasattr(layer, "items") else dict(layer).items()
            for k, v in items:
                out[k] = v
        return out

    def resolve(self) -> "ResolvedVariables":
        resolved: dict[str, str] = {}

        def expand_var(name: str, seen: tuple[str, ...]) -> str:
            if name in seen:
                cycle = ", ".join(seen + (name,))
                raise ParameterError(
                    f"recursive variable reference: {name} ({cycle})"
                )
            if name in resolved:
                return resolved[name]
            if name not in self._vars:
                ctx = seen[-1] if seen else "?"
                raise ParameterError(
                    f"undefined variable in parameter {ctx}: ${name}"
                )
            value = expand_string(
                str(self._vars[name]), lambda n: expand_var(n, seen + (name,))
            )
            resolved[name] = value
            return value

        for name in list(self._vars):
            expand_var(name, ())
        return ResolvedVariables(resolved)


class ResolvedVariables:
    def __init__(self, values: dict[str, str]):
        self._values = dict(values)

    def __getitem__(self, name: str) -> str:
        key = normalize_var_name(name)
        if key not in self._values:
            raise ParameterError(f"undefined variable: ${name}")
        return self._values[key]

    def __contains__(self, name: str) -> bool:
        return normalize_var_name(name) in self._values

    def get(self, name: str, default: str | None = None) -> str | None:
        key = normalize_var_name(name)
        return self._values.get(key, default)

    def items(self):
        return self._values.items()

    def expand(self, text: str) -> str:
        """Bind $vars in SQL/param text (sqlstatement.rb:46-53)."""
        return expand_string(text, lambda n: self[n])


# ---------------------------------------------------------------------------
# <%= %> template pre-pass (ERB stand-in; configloader.rb:34-41)
# ---------------------------------------------------------------------------

ERB_RE = re.compile(r"<%=\s*(.*?)\s*%>", re.S)


class TableFile:
    """A ``.ct`` table declaration as seen by the embedded-code API
    (the reference wraps each as a SQLStatement — sqlstatement.rb:93-95
    exposes ``attributes`` from the ``--attributes:`` header)."""

    def __init__(self, path: str):
        self.path = path
        with open(path) as f:
            self.text = f.read()
        meta = parse_sql_metadata(self.text, path)
        attrs = meta.get("attributes") or []
        if isinstance(attrs, Mapping):
            attrs = list(attrs)
        elif isinstance(attrs, str):
            attrs = [attrs]
        self.attributes: list[str] = [str(a) for a in attrs]
        stem = os.path.basename(path)[: -len(".ct")]
        self.subsystem = os.path.basename(os.path.dirname(path))
        self.table = str(meta.get("dest-table") or stem)
        self.name = (
            self.table if "." in self.table else f"{self.subsystem}.{self.table}"
        )

    def __str__(self) -> str:
        return self.name

    def __repr__(self) -> str:  # pragma: no cover
        return f"TableFile({self.name!r}, attributes={self.attributes!r})"


def _helper_api(base_dir: str | None, app_home: str | None = None) -> dict[str, Any]:
    """The embedded-code helper API (embeddedcodeapi.rb:5-48)."""

    def date(s: str) -> _dt.date:
        return _dt.date.fromisoformat(str(s))

    def ymd(d: Any) -> str:
        if isinstance(d, str):
            d = date(d)
        return d.strftime("%Y-%m-%d")

    def read_file_if_exist(path: str) -> str | None:
        p = os.path.join(base_dir or ".", path)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()

    user_home = os.path.expanduser("~")

    def user_home_relative_path(rel: str) -> str:
        return os.path.join(user_home, rel)

    def _need_app_home() -> str:
        if not app_home:
            raise ParameterError("app_home is not set for this template")
        return app_home

    def app_home_relative_path(rel: str) -> str:
        return os.path.join(_need_app_home(), rel)

    def relative_path(rel: str) -> str:
        return os.path.join(base_dir or ".", rel)

    def all_tables() -> list[TableFile]:
        """Every ``<app_home>/*/*.ct`` declaration (embeddedcodeapi.rb:41-45),
        sorted by path for deterministic template output."""
        import glob as _glob

        return [
            TableFile(p)
            for p in sorted(_glob.glob(os.path.join(_need_app_home(), "*", "*.ct")))
        ]

    def attribute_tables(attr: str) -> list[TableFile]:
        return [t for t in all_tables() if attr in t.attributes]

    return {
        "date": date,
        "ymd": ymd,
        "read_file_if_exist": read_file_if_exist,
        "today": _dt.date.today,
        "user_home": user_home,
        "user_home_relative_path": user_home_relative_path,
        "app_home_relative_path": app_home_relative_path,
        "relative_path": relative_path,
        "all_tables": all_tables,
        "attribute_tables": attribute_tables,
    }


def render_template(
    text: str,
    base_dir: str | None = None,
    extra: dict | None = None,
    app_home: str | None = None,
) -> str:
    """Evaluate ``<%= expr %>`` spans (job files are trusted user code,
    exactly as the reference treats ERB)."""
    ns = _helper_api(base_dir, app_home)
    if extra:
        ns.update(extra)

    # job files are trusted user code (the reference gives ERB full Ruby);
    # common builtins are available for expressions like
    # ``','.join(str(t) for t in attribute_tables('daily'))``
    safe_builtins = {
        b.__name__ if callable(b) else b: b
        for b in (
            str, int, float, bool, len, list, dict, set, tuple, sorted,
            reversed, enumerate, zip, map, filter, min, max, sum, abs,
            round, range, repr, any, all,
        )
    }

    def repl(m: re.Match) -> str:
        try:
            return str(eval(m.group(1), {"__builtins__": safe_builtins}, ns))  # noqa: S307
        except Exception as err:
            raise ParameterError(f"template expression error: {m.group(1)!r}: {err}")

    return ERB_RE.sub(repl, text)


# ---------------------------------------------------------------------------
# job files (jobfile.rb)
# ---------------------------------------------------------------------------

_SQL_HEADER_RE = re.compile(r"\A/\*.*?^\*/", re.S | re.M)


def parse_sql_job(text: str, path: str = "<string>") -> tuple[dict, str]:
    """Parse a ``.sql.job``: leading ``/* YAML */`` block + SQL body.

    Returns (values, sql). The header is replaced by blank lines so error
    line numbers in the SQL are preserved (jobfile.rb:36).
    """
    m = _SQL_HEADER_RE.search(text)
    if not m:
        raise ParameterError(f"missing embedded job definition block: {path}")
    block = m.group(0)
    yaml_text = re.sub(r"^\*/\s*\Z", "", re.sub(r"\A/\*", "", block), flags=re.M)
    try:
        values = yaml.safe_load(yaml_text) or {}
    except yaml.YAMLError as err:
        raise ParameterError(
            f"{path}: embedded job definition syntax error: {err}"
        )
    sql = _SQL_HEADER_RE.sub("\n" * block.count("\n"), text, count=1)
    return values, sql


def parse_program_job(text: str, path: str = "<string>") -> dict:
    """Parse ``.py.job``/``.sh.job``: leading ``#`` comment lines as YAML
    (a ``#!`` first line is skipped) — jobfile.rb:82-103."""
    lines = text.splitlines(keepends=True)
    if not lines:
        return {}
    yaml_lines: list[str] = []
    start = 0
    if lines[0].startswith("#!"):
        start = 1
    for line in lines[start:]:
        if not line.startswith("#"):
            break
        yaml_lines.append(line[1:])
    try:
        return yaml.safe_load("".join(yaml_lines)) or {}
    except yaml.YAMLError as err:
        raise ParameterError(f"{path}: embedded job definition syntax error: {err}")


def auto_declarations(sql: str, values: Mapping[str, Any]) -> dict[str, str | None]:
    """Auto-declare SQL variables (jobfile.rb:48-78).

    - ``$dest_table`` is bound by the job class, declared with no default;
    - each src-tables key is declared (bound to the table name);
    - any other referenced variable defaults to its own name.
    """
    decls: dict[str, str | None] = {}
    vars_ = list_variables(sql)
    if "dest_table" in vars_:
        decls["dest_table"] = None
        vars_.remove("dest_table")
    srcs = values.get("src-tables")
    if srcs is not None:
        names = (
            [srcs] if isinstance(srcs, str) else list(srcs)
        )  # list or dict → keys
        for t in names:
            decls[t] = None
            if t in vars_:
                vars_.remove(t)
    for name in vars_:
        decls[name] = name
    return decls


_META_KEYS = ("dest-table", "src-tables", "params", "attributes")
_META_KEY_RE = re.compile(rf"\A--(?:{'|'.join(_META_KEYS)}):")
_ANY_KEY_RE = re.compile(r"\A--([\w\-]+):")


def parse_sql_metadata(sql: str, path: str = "<string>") -> dict:
    """Parse leading ``--dest-table:``/``--src-tables:``/``--params:``/
    ``--attributes:`` header comments of a plain ``.sql`` file as YAML
    (SQLMetaDataParser, sqlstatement.rb:242-300).

    Unknown ``--key:`` comments in the header error; plain ``--`` comments
    are skipped; the header ends at the first non-comment line.
    """
    collected: list[str] = []
    for line in sql.splitlines(keepends=True):
        if _META_KEY_RE.match(line):
            collected.append(line[2:])
        elif m := _ANY_KEY_RE.match(line):
            raise ParameterError(f"unknown SQL meta data: {path}: {m.group(1)}")
        elif line.startswith("--"):
            collected.append("\n")
        else:
            break
    if not collected:
        return {}
    try:
        return yaml.safe_load("".join(collected)) or {}
    except yaml.YAMLError as err:
        raise ParameterError(f"SQL meta data syntax error: {path}: {err}")


def load_job_file(path: str, app_home: str | None = None) -> tuple[dict, str | None]:
    """Load any job file → (values, sql_or_None).

    ``.sql.job`` → embedded header + SQL; ``.py.job``/``.sh.job`` →
    ``#`` header; anything else → plain YAML.  ``app_home`` (for the
    all_tables/attribute_tables helpers) defaults to the job's
    grandparent dir, matching the reference's ``home/subsys/job`` layout.
    """
    with open(path) as f:
        text = f.read()
    base_dir = os.path.dirname(os.path.abspath(path))
    if app_home is None:
        app_home = os.path.dirname(base_dir)
    text = render_template(text, base_dir=base_dir, app_home=app_home)
    if path.endswith(".sql.job"):
        values, sql = parse_sql_job(text, path)
        return values, sql
    if re.search(r"\.(?:rb|py|sh)\.job\Z", path):
        return parse_program_job(text, path), None
    try:
        return yaml.safe_load(text) or {}, None
    except yaml.YAMLError as err:
        raise ParameterError(f"{path}: job file syntax error: {err}")
