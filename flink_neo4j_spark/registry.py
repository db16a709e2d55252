"""Central registry of conformance queries and their DuckDB oracles.

Aggregates ``QUERIES``/``ORACLE`` from every operator module. A query with no
oracle entry is checked rows-only by the driver (reserved for genuinely
non-SQL-expressible operators, e.g. LSH bucketing or streaming state).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from flink_neo4j_spark.operators import (
        dedup,
        graph_algos,
        multimodal,
        relational,
        similarity,
        skew,
        stream_batch,
        temporal,
        text,
    )

    return (
        relational,
        dedup,
        similarity,
        text,
        multimodal,
        stream_batch,
        graph_algos,
        skew,
        temporal,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged
