"""table_for_compute: the conditional scan-rebalance + materialization
barrier behind the text/dedup/similarity operators.

Three contracts:

1. On an under-parallel scan (one local parquet file, 8 cores) the result
   is materialized with ``defaultParallelism`` partitions — so per-row
   compute AND pushed-down computed filters run on every core.
2. The result is session-memoized: two calls return the SAME DataFrame
   object (the projection is paid once per session).
3. On a scan that already fills the cores (>= defaultParallelism files)
   the table comes back un-materialized — the at-scale no-op that keeps
   predicate pushdown into the parallel scan intact.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import (
    documents_for_compute,
    load_table,
    table_for_compute,
)

from .conftest import SF_DIR


def test_under_parallel_scan_is_rebalanced_and_memoized(spark):
    d1 = table_for_compute(spark, SF_DIR, "documents")
    # 1 file < 8 cores -> materialized at defaultParallelism partitions
    assert (
        d1.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # same rows as the plain load
    assert d1.count() == load_table(spark, SF_DIR, "documents").count()
    # memoized: second call is the identical object
    assert table_for_compute(spark, SF_DIR, "documents") is d1
    assert documents_for_compute(spark, SF_DIR) is d1


def test_computed_filter_runs_above_the_barrier(spark):
    """The regression this helper exists for: a computed filter over text
    must NOT be pushed into the (single-task) file scan. Past the
    localCheckpoint barrier the plan has no FileScan at all, so the filter
    cannot sink into it."""
    d = documents_for_compute(spark, SF_DIR)
    q = d.filter(F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")) >= 2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert q.count() > 0


def test_parallel_scan_passthrough(spark, tmp_path):
    """A source that already fills the cores comes back un-materialized
    (same partition count as the scan, no checkpoint)."""
    target = spark.sparkContext.defaultParallelism
    src = os.path.join(str(tmp_path), "wide.parquet")
    (
        load_table(spark, SF_DIR, "documents")
        .repartition(target + 2)
        .write.mode("overwrite")
        .parquet(src)
    )
    sf_dir = str(tmp_path)
    # table_for_compute reads <sf_dir>/<name>.parquet — point a fake
    # catalog dir at the many-file copy under the name "wide"
    df = table_for_compute(spark, sf_dir, "wide")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan  # not checkpointed
    assert "FileScan" in plan or "Scan parquet" in plan
