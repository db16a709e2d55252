"""Helpers over ``df.explain('formatted')`` output.

The 100 TB discipline (SURVEY.md §4, project brief): filters must reach the
parquet scan (``PushedFilters``), projections must prune ``ReadSchema``,
small dimensions must broadcast, global top-k must be
``TakeOrderedAndProject``. These helpers make those properties assertable in
CI so a refactor that silently de-optimizes a plan fails a test, not a
production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (empty list = nothing pushed)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame, table_hint: str | None = None) -> set[str]:
    """Columns actually read from parquet (union over scans, or scans whose
    location mentions ``table_hint``)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for scan in re.finditer(
        r"Location: [^\n]*?([^\n]*)\n[^\n]*?ReadSchema: struct<([^>]*)>",
        plan,
    ):
        location, schema = scan.group(1), scan.group(2)
        if table_hint and table_hint not in location:
            continue
        for field in schema.split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
