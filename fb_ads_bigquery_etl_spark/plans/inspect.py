"""Physical-plan introspection: the ".explain and iterate" feedback loop.

These helpers turn `df.explain("formatted")` into assertable facts so
tests can pin the *shape* of a plan, not just its results: filters
reaching the parquet scan, small dims broadcast, self-join exchanges
reused, no accidental cartesian products. A plan regression (e.g. a
refactor that breaks pushdown) fails CI even though results stay
correct — at 100 TB the plan shape IS the performance contract.

AQE note: exchange reuse and join-strategy switches are applied at
RUNTIME; pass `execute=True` (or call `final_explain`) to run the query
first and inspect the final adaptive plan instead of the initial one.
"""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture df.explain(mode) output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def final_explain(df: DataFrame, mode: str = "formatted") -> str:
    """Execute the plan, then explain — under AQE this is the final
    adaptive plan (reused exchanges, runtime join switches, coalesced
    partitions), i.e. what actually ran."""
    df.count()
    return explain_str(df, mode)


def node_counts(df_or_plan: DataFrame | str, *, execute: bool = False) -> Counter:
    """Physical operator name -> count, from the formatted plan's detail
    section (`(<id>) <NodeName>` lines — each node exactly once)."""
    if isinstance(df_or_plan, str):
        plan = df_or_plan
    else:
        plan = final_explain(df_or_plan) if execute else explain_str(df_or_plan)
    return Counter(re.findall(r"^\(\d+\) (\w+)", plan, re.MULTILINE))


def exchange_count(df: DataFrame, *, execute: bool = False) -> int:
    """Distinct shuffle exchanges (BroadcastExchange/Reused excluded).

    Each is a full shuffle of its input — the dominant cost at scale."""
    return node_counts(df, execute=execute)["Exchange"]


def reused_exchange_count(df: DataFrame, *, execute: bool = False) -> int:
    """Shuffles answered from an existing exchange's files (the good kind)."""
    n = node_counts(df, execute=execute)
    return n["ReusedExchange"] + n["TableCacheQueryStage"]


def broadcast_join_count(df: DataFrame, *, execute: bool = False) -> int:
    n = node_counts(df, execute=execute)
    return n["BroadcastHashJoin"] + n["BroadcastNestedLoopJoin"]


def has_cartesian(df: DataFrame, *, execute: bool = False) -> bool:
    return node_counts(df, execute=execute)["CartesianProduct"] > 0


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better (more
    operators fused into single JVM loops)."""
    plan = explain_str(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
