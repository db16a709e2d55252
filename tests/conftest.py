"""Shared fixtures: one SparkSession per test session, DuckDB oracle runner,
and a normalized result comparator mirroring the driver's hash check
(sort columns by name, sort rows, round floats)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_neo4j_spark.catalog import TABLES
from flink_neo4j_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink-neo4j-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(rows, ndigits=6):
    """Rows -> sorted list of tuples with column order by name and floats
    rounded, so Spark/DuckDB results compare order- and fp-insensitively."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, ndigits)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def assert_matches_oracle(df, con, sql):
    """Compare a Spark DataFrame against DuckDB output of `sql`."""
    cols = sorted(df.columns)
    spark_rows = [tuple(r[c] for c in cols) for r in df.collect()]
    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    assert sorted(o_cols) == cols, f"column mismatch: spark={cols} oracle={sorted(o_cols)}"
    idx = [o_cols.index(c) for c in cols]
    oracle_rows = [tuple(r[i] for i in idx) for r in res.fetchall()]
    # normalize temporal types: duckdb returns datetime.date/datetime, Spark too
    assert len(spark_rows) == len(oracle_rows), (
        f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    sn, on = normalize(spark_rows), normalize(oracle_rows)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
