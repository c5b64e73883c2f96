"""Physical-plan inspection utilities.

The scale contract of this engine is enforced, not hoped for: tests
assert that filters/projections reach the parquet scan, small dims
broadcast, top-k never becomes a global sort, and aggregations combine
map-side. These helpers parse ``explain('formatted')`` output so those
assertions read declaratively.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """Filter expressions that reached the parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(plan: str) -> list[list[str]]:
    """Column lists actually read from parquet (one per scan)."""
    out = []
    for m in re.finditer(r"ReadSchema:\s*struct<(.*?)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def is_take_ordered(plan: str) -> bool:
    """orderBy+limit planned as TakeOrderedAndProject (no global sort)."""
    return "TakeOrderedAndProject" in plan


def exchange_count(plan: str) -> int:
    """Number of shuffle exchanges (the thing to minimize)."""
    return len(re.findall(r"\bExchange\b|\(Exchange", plan)) or plan.count("Exchange")


def has_partial_aggregate(plan: str) -> bool:
    """Map-side combine before the shuffle (partial_… functions)."""
    return bool(re.search(r"Functions(?:.*?)partial_", plan, re.S)) or "partial_" in plan


def wholestage_codegen_ids(plan: str) -> list[str]:
    """Operator ids inside whole-stage codegen. ``explain('formatted')``
    marks codegen'd operators with a ``*`` prefix (e.g. ``* Project (3)``);
    other modes print ``WholeStageCodegen (n)`` blocks."""
    ids = re.findall(r"WholeStageCodegen \((\d+)\)", plan)
    ids += re.findall(r"\*(?:\s*\(\d+\))?\s+\w+.*?\((\d+)\)", plan)
    return ids
