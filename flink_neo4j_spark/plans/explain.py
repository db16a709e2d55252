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
    location mentions ``table_hint``). Parses per scan block, so the
    Location/ReadSchema lines may be separated by filter/pushdown lines."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    # formatted explain renders one "(n) Scan parquet" block per source;
    # blocks end at the next "(n) ..." node header or end of text.
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        if not re.match(r"\(\d+\) Scan parquet", block):
            continue
        loc = re.search(r"Location: ([^\n]*)", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if not schema:
            continue
        if table_hint and (loc is None or table_hint not in loc.group(1)):
            continue
        for field in schema.group(1).split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)
