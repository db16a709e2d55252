"""Sketch operators (q28): no cross-engine oracle exists by design — HLL++
and GK-quantile internals are engine-specific — so correctness is bounded
against the exact counterparts instead (the driver records q28 rows-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import load_table
from flink_neo4j_spark.operators.relational import q28_sketch_stats

from .conftest import SF_DIR


def test_sketches_bound_exact(spark):
    row = q28_sketch_stats(spark, SF_DIR).collect()[0]

    exact_distinct = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.count_distinct("text").alias("d"))
        .collect()[0]["d"]
    )
    # rsd=0.02 -> generous 3-sigma-ish bound
    assert abs(row["approx_distinct_docs"] - exact_distinct) <= max(
        3, 0.06 * exact_distinct
    )

    exact_p90 = (
        load_table(spark, SF_DIR, "lineitem")
        .agg(F.expr("percentile(l_extendedprice, 0.9)").alias("p"))
        .collect()[0]["p"]
    )
    # percentile_approx(accuracy=10000) rank error <= n/10000; translate to a
    # loose value tolerance of 1% of the exact p90
    assert abs(row["p90_price_approx"] - exact_p90) <= 0.01 * exact_p90


def test_cms_overestimates_only(spark):
    """Count-min property: the estimate NEVER undercounts; overcount is
    bounded by collisions (here, small relative to the table size)."""
    from flink_neo4j_spark.operators.relational import q58_cms_heavy_hitters

    from .conftest import SF_DIR

    rows = q58_cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"]
