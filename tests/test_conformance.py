"""Oracle-differential conformance suite (SURVEY.md §5 item 2): every
registered query with an oracle runs on Spark and DuckDB over the same
parquet inputs; results must match after normalization. This mirrors the
driver's t2 gate exactly (row-count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from flink_neo4j_spark.registry import all_oracles, all_queries

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES[name])


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k not in ORACLES))
def test_query_runs_rows_only(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_oracle_keys_subset():
    """Every oracle key must correspond to a registered query."""
    assert set(ORACLES) <= set(QUERIES)
