"""Declarative job-parameter types (lib/bricolage/parameters.rb:260-690).

The reference declares each job-class parameter with a typed class; values
arrive from the job file or ``-v`` options as strings/YAML scalars and are
coerced + validated at compile time. The twelve reference classes map to:

| reference        | here            | coercion |
|------------------|-----------------|----------|
| StringParam      | StringParam     | str, $var-expanded |
| OptionalBoolParam| BoolParam       | true/yes/on/1 (string or bool) |
| DateParam        | DateParam       | ISO date |
| EnumParam        | EnumParam       | membership check |
| DataSourceParam  | DataSourceParam | name looked up in context datasources |
| SQLFileParam     | SQLFileParam    | existing path |
| DestTableParam   | TableParam      | TableSpec |
| SrcTableParam    | SrcTableParam   | str/list/dict of TableSpec |
| DestFileParam    | FileParam       | path string |
| SrcFileParam     | FileParam       | path string (may be glob) |
| StringListParam  | StringListParam | list of str (or whitespace split) |
| KeyValuePairsParam| KeyValueParam  | dict |

Errors raise ParameterError naming the parameter (test_parameters.rb's
observable behavior).
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass, field
from typing import Any

from bricolage_spark.engine import TableSpec
from bricolage_spark.exception import ParameterError


@dataclass
class Param:
    name: str
    optional: bool = False
    default: Any = None

    def coerce(self, value: Any, ctx: Any = None) -> Any:
        return value

    def parse(self, value: Any, ctx: Any = None) -> Any:
        if value is None:
            if self.optional:
                return self.default
            raise ParameterError(f"parameter not given: {self.name}")
        try:
            return self.coerce(value, ctx)
        except ParameterError:
            raise
        except Exception as err:
            raise ParameterError(f"bad value for parameter {self.name}: {err}")


class StringParam(Param):
    def coerce(self, value, ctx=None):
        return str(value)


class BoolParam(Param):
    def coerce(self, value, ctx=None):
        if isinstance(value, bool):
            return value
        s = str(value).strip().lower()
        if s in ("true", "yes", "on", "1"):
            return True
        if s in ("false", "no", "off", "0"):
            return False
        raise ParameterError(f"parameter {self.name}: not a boolean: {value!r}")


class DateParam(Param):
    def coerce(self, value, ctx=None):
        if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
            return value
        return _dt.date.fromisoformat(str(value))


@dataclass
class EnumParam(Param):
    values: tuple[str, ...] = ()

    def coerce(self, value, ctx=None):
        s = str(value)
        if s not in self.values:
            raise ParameterError(
                f"parameter {self.name}: {s!r} not one of {list(self.values)}"
            )
        return s


class TableParam(Param):
    def coerce(self, value, ctx=None):
        return TableSpec.parse(str(value))


class SrcTableParam(Param):
    """str | list | {alias: table} → {alias: TableSpec}."""

    def coerce(self, value, ctx=None):
        if isinstance(value, str):
            return {value: TableSpec.parse(value)}
        if isinstance(value, list):
            return {str(t): TableSpec.parse(str(t)) for t in value}
        if isinstance(value, dict):
            return {str(a): TableSpec.parse(str(t)) for a, t in value.items()}
        raise ParameterError(
            f"parameter {self.name}: unknown src-tables value type: {type(value).__name__}"
        )


class SQLFileParam(Param):
    def coerce(self, value, ctx=None):
        path = str(value)
        base = getattr(ctx, "base_dir", None)
        full = path if os.path.isabs(path) else os.path.join(base or ".", path)
        if not os.path.exists(full):
            raise ParameterError(f"parameter {self.name}: file not found: {full}")
        return full


class FileParam(Param):
    def coerce(self, value, ctx=None):
        return str(value)


class StringListParam(Param):
    def coerce(self, value, ctx=None):
        if isinstance(value, list):
            return [str(v) for v in value]
        return str(value).split()


class KeyValueParam(Param):
    def coerce(self, value, ctx=None):
        if isinstance(value, dict):
            return {str(k): v for k, v in value.items()}
        raise ParameterError(f"parameter {self.name}: expected a mapping")


class DataSourceParam(Param):
    def coerce(self, value, ctx=None):
        name = str(value)
        dss = getattr(ctx, "datasources", None)
        if dss is None:
            return name
        if name not in dss:
            raise ParameterError(f"parameter {self.name}: no such data source: {name}")
        return dss[name]


@dataclass
class ParamSchema:
    params: list[Param] = field(default_factory=list)

    def parse(self, values: dict[str, Any], ctx: Any = None) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for p in self.params:
            out[p.name] = p.parse(values.get(p.name), ctx)
        return out
