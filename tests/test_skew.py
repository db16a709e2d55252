"""Salted aggregation: equality with the single-stage plan under any salt
count and partitioning (B10 invariance, extended to the skew-safe shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import load_table
from flink_neo4j_spark.operators.skew import salted_aggregate

from .conftest import SF_DIR


@pytest.mark.parametrize("n_salts", [1, 4, 64])
def test_salted_equals_plain(spark, n_salts):
    l = load_table(spark, SF_DIR, "lineitem")
    plain = (
        l.groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"), F.max("l_quantity").alias("mx"))
        .collect()
    )
    salted = salted_aggregate(
        l, ["l_returnflag"], {"cnt": ("count", "*"), "mx": ("max", "l_quantity")},
        n_salts=n_salts,
    ).collect()
    key = lambda rows: sorted((r["l_returnflag"], r["cnt"], r["mx"]) for r in rows)
    assert key(salted) == key(plain)


def test_salted_invariant_under_repartition(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    a = salted_aggregate(l, ["l_returnflag"], {"cnt": ("count", "*")}).collect()
    b = salted_aggregate(
        l.repartition(13), ["l_returnflag"], {"cnt": ("count", "*")}
    ).collect()
    key = lambda rows: sorted((r["l_returnflag"], r["cnt"]) for r in rows)
    assert key(a) == key(b)


def test_rejects_non_distributive(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError, match="non-distributive"):
        salted_aggregate(l, ["l_returnflag"], {"a": ("avg", "l_quantity")})
