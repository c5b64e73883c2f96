"""Application context: home directory, global variables, data sources,
event hooks.

Parity with lib/bricolage/context.rb: a *home* directory holds one
subdirectory per subsystem, each containing job/jobnet files; a global
``variable.yml`` supplies low-precedence variables (context.rb:54-59
loads prelude + configurations); built-in variables ``bricolage_env``,
``bricolage_home`` (context.rb:113-118) are always bound. Event hooks
(eventhandlers.rb:75-101) are before/after-job and after-all callbacks.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

import yaml

from bricolage_spark.engine import SparkEngine
from bricolage_spark.exception import ParameterError


@dataclass
class Hooks:
    before_job: list[Callable] = field(default_factory=list)
    after_job: list[Callable] = field(default_factory=list)
    after_all: list[Callable] = field(default_factory=list)

    def fire(self, kind: str, **kw: Any) -> None:
        for fn in getattr(self, kind):
            fn(**kw)


class Context:
    def __init__(
        self,
        engine: SparkEngine,
        home: str,
        env: str = "development",
        variables: dict[str, Any] | None = None,
    ):
        self.engine = engine
        self.home = os.path.abspath(home)
        self.env = env
        self.hooks = Hooks()
        self.global_variables: dict[str, Any] = {
            "bricolage_env": env,
            "bricolage_home": self.home,
        }
        self.global_variables.update(self._load_variable_yml())
        if variables:
            self.global_variables.update(variables)
        from bricolage_spark.sources import load_datasources

        self.datasources = load_datasources(self._load_datasource_yml(), engine=engine)

    def _load_variable_yml(self) -> dict[str, Any]:
        for candidate in (
            os.path.join(self.home, "config", self.env, "variable.yml"),
            os.path.join(self.home, "config", "variable.yml"),
            os.path.join(self.home, "variable.yml"),
        ):
            if os.path.exists(candidate):
                with open(candidate) as f:
                    data = yaml.safe_load(f) or {}
                if not isinstance(data, dict):
                    raise ParameterError(f"variable.yml must be a mapping: {candidate}")
                return data
        return {}

    def _load_datasource_yml(self) -> dict[str, dict]:
        for candidate in (
            os.path.join(self.home, "config", self.env, "datasource.yml"),
            os.path.join(self.home, "config", "datasource.yml"),
            os.path.join(self.home, "datasource.yml"),
        ):
            if os.path.exists(candidate):
                with open(candidate) as f:
                    return yaml.safe_load(f) or {}
        return {}

    def subsystem_dir(self, subsystem: str) -> str:
        return os.path.join(self.home, subsystem)

    def load_job(self, path: str, cmd_variables: dict | None = None):
        from bricolage_spark.jobs import Job

        return Job.load(
            self.engine,
            path,
            global_variables=self.global_variables,
            cmd_variables=cmd_variables,
        )
