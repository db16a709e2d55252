"""SQL-API parity: a sample of the declared oracle SQL strings run
UNMODIFIED through spark.sql over the registered views and match DuckDB —
proving (1) users can drive this engine with plain ANSI SQL, and (2) the
oracles really are engine-portable, not DuckDB-flavored."""

from __future__ import annotations

import pytest

from flink_neo4j_spark.catalog import register_views
from flink_neo4j_spark.registry import all_oracles

from .conftest import SF_DIR, assert_matches_oracle

#: ANSI-portable subset (no DuckDB list comprehensions / recursive CTEs)
PORTABLE = [
    "q1_node_scan",
    "q2_edge_join",
    "q3_disjunction",
    "q4_null_semantics",
    "q5_join_update",
    "q7_grouped_count",
    "q8_multi_agg",
    "q9_date_filter",
    "q10_topk",
    "q11_time_bucket",
    "q12_distinct_docs",
    "q13_order_revenue_topk",
    "q14_local_supplier_revenue",
    "q16_window_rank",
    "q17_set_ops",
    "q19_rollup",
    "g1_two_hop",
    "g2_degree",
    "g5_cypher_frontend",
    "d1_exact_dedup",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF_DIR)


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark_sql(spark, oracle, name):
    sql = all_oracles()[name]
    assert_matches_oracle(spark.sql(sql), oracle, sql)
