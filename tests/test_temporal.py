"""Unit semantics for the temporal operators beyond the conformance corpus
(which has unique (key, ts) per side and so cannot exercise ties)."""

from __future__ import annotations

import datetime as dt

from flink_neo4j_spark.operators.temporal import asof_join, interval_join_bucketed


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_excludes_same_timestamp_right_rows(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(20))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 111.0), (2, _ts(5), 5.0), (2, _ts(20), 222.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = {r.user_id: r.asof_value for r in asof_join(left, right, "user_id").collect()}
    # user 1: only right row is the exact-tie -> strictly-earlier gives null
    assert rows[1] is None
    # user 2: tie at 20 ignored, strictly-earlier row at 5 wins
    assert rows[2] == 5.0


def test_asof_join_picks_latest_earlier(spark):
    left = spark.createDataFrame([(1, _ts(30))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0), (1, _ts(40), 4.0)],
        "user_id long, ts timestamp, value double",
    )
    (row,) = asof_join(left, right, "user_id").collect()
    assert row.asof_value == 2.0


def test_interval_join_bounds_are_half_open(spark):
    left = spark.createDataFrame([(1, 100, _ts(0))], "user_id long, err_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(1)), (1, _ts(30)), (1, _ts(31))],
        "user_id long, ts timestamp",
    )
    pairs = interval_join_bucketed(left, right, on="user_id", window_seconds=30)
    matched = sorted(r["ts"].second for r in pairs.select("r.ts").collect())
    assert matched == [1, 30]  # ts==left excluded, ts==left+window included
