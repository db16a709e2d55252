"""Bucketed co-located join: the join stage must be exchange-free and the
result must equal the plain shuffle join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from flink_neo4j_spark.bucketing import colocated_join, write_bucketed
from flink_neo4j_spark.catalog import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "t_bucket_orders", "o_orderkey", n_buckets=8)
    write_bucketed(l, "t_bucket_lineitem", "l_orderkey", n_buckets=8)
    yield "t_bucket_orders", "t_bucket_lineitem"
    spark.sql("DROP TABLE IF EXISTS t_bucket_orders")
    spark.sql("DROP TABLE IF EXISTS t_bucket_lineitem")


def _join_section_has_no_exchange(plan: str) -> bool:
    """True when no Exchange sits between the SortMergeJoin and its scans
    (an Exchange above the join, e.g. for a later agg, is fine)."""
    m = re.search(r"SortMergeJoin.*", plan, re.DOTALL)
    assert m, f"expected SortMergeJoin in plan:\n{plan}"
    return "Exchange" not in m.group(0)


def test_colocated_join_is_exchange_free(spark, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    # force the sort-merge path (lineitem/orders are both "fact" sides here;
    # at sf0.001 Spark would otherwise broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lineitem_t, orders_t, "l_orderkey", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert _join_section_has_no_exchange(plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_colocated_join_matches_shuffle_join(spark, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    j = colocated_join(spark, lineitem_t, orders_t, "l_orderkey", "o_orderkey")
    got = (
        j.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))
        .orderBy("o_orderpriority").collect()
    )
    o = load_table(spark, SF_DIR, "orders")
    l = load_table(spark, SF_DIR, "lineitem")
    want = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))
        .orderBy("o_orderpriority").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
