"""Bucketed (co-located) join support.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both sides
on the join key. Bucketing pre-partitions AND pre-sorts each table into
``n_buckets`` files per partition keyed by the join column, so a later
SortMergeJoin reads matching buckets directly — ``.explain`` shows
``Bucketed: true`` scans feeding the join with NO Exchange (verified in
tests/test_bucketing.py). The write pays one shuffle once; every subsequent
join on that key is shuffle-free, which is the right trade for tables joined
repeatedly (fact tables in a star schema, the edges table of a graph).

Bucketed tables live in the session catalog (``saveAsTable``) because bucket
metadata travels with the table, not the files; plain ``parquet(path)``
cannot record it. On a cluster the catalog is Hive/Glue/Unity; locally it is
the Derby-backed warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed+sorted by ``key``.

    ``n_buckets`` should match across tables that will be joined (equal
    bucket counts let Spark align bucket i with bucket i); pick it so one
    bucket of the largest table fits an executor core's working set.
    """
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys.

    Broadcast is disabled for this join via a hint-free mechanism: reading
    through the catalog keeps bucket metadata, and Spark plans a
    SortMergeJoin over aligned buckets with no Exchange on either side
    (assuming equal bucket counts). No configuration change is needed —
    if one side is small enough to broadcast, broadcasting is still the
    better plan and Spark will pick it.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
