"""Property-based boundary tests (hypothesis) for the temporal operators.

The conformance suite checks each operator against DuckDB on ONE fixed
dataset; these properties re-derive the semantics from scratch (pure-Python
brute force) on arbitrary small inputs, hammering exactly the edges a fixed
fixture can miss: as-of tie timestamps (strictly-earlier vs inclusive),
interval boundaries (open/closed ends), empty groups, and single-row keys.

Integer timestamps/values only — the properties assert EXACT equality, no
float tolerance. Right-hand (key, ts) pairs are deduplicated because any
as-of engine is order-ambiguous among duplicate right rows at one instant.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (key, ts, value) with a tiny key/ts space so collisions and ties are
#: common rather than rare.
ROW = st.tuples(
    st.integers(0, 2), st.integers(0, 20), st.integers(-5, 5)
)
ROWS = st.lists(ROW, min_size=0, max_size=12)


def _dedupe_key_ts(rows):
    seen, out = set(), []
    for k, t, v in rows:
        if (k, t) not in seen:
            seen.add((k, t))
            out.append((k, t, v))
    return out


def _df(spark, rows, cols=("user_id", "ts", "value")):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(cols[0], T.LongType()),
            T.StructField(cols[1], T.LongType()),
            T.StructField(cols[2], T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [tuple(int(x) for x in r) for r in rows], schema
    )


@given(left=ROWS, right=ROWS)
@SET
def test_asof_join_is_strictly_earlier_latest(spark, left, right):
    from flink_neo4j_spark.operators.temporal import asof_join

    right = _dedupe_key_ts(right)
    if not left:
        return
    out = asof_join(
        _df(spark, left), _df(spark, right), on="user_id"
    ).collect()
    # brute force: latest right value with rts < lts, same key
    got = sorted((r["user_id"], r["ts"], r["value"], r["asof_value"]) for r in out)
    expected = []
    for k, t, v in left:
        prior = [(rt, rv) for rk, rt, rv in right if rk == k and rt < t]
        expected.append((k, t, v, max(prior)[1] if prior else None))
    assert got == sorted(expected)


@given(facts=ROWS, changes=ROWS)
@SET
def test_scd2_lookup_is_inclusive_latest(spark, facts, changes):
    """SCD2 containment == INCLUSIVE as-of: a change AT the fact's
    timestamp is visible (the boundary that distinguishes it from a1)."""
    from flink_neo4j_spark.operators.temporal import scd2_build, scd2_lookup

    changes = _dedupe_key_ts(changes)
    if not facts:
        return
    dim = scd2_build(_df(spark, changes), key="user_id")
    out = scd2_lookup(
        _df(spark, facts), dim, on="user_id"
    ).collect()
    got = sorted((r["user_id"], r["ts"], r["dim_value"]) for r in out)
    expected = []
    for k, t, v in facts:
        ator = [(ct, cv) for ck, ct, cv in changes if ck == k and ct <= t]
        expected.append((k, t, max(ator)[1] if ator else None))
    assert got == sorted(expected)


@given(left=ROWS, right=ROWS, window=st.integers(1, 7))
@SET
def test_interval_join_bounds_are_open_closed(spark, left, right, window):
    """interval_join_bucketed pairs lts < rts <= lts + W, each true pair
    exactly once (the two-bucket explode must not double-count)."""
    from pyspark.sql import functions as F

    from flink_neo4j_spark.operators.temporal import interval_join_bucketed

    left = _dedupe_key_ts(left)
    if not left or not right:
        return
    l = _df(spark, left, cols=("user_id", "ts_int", "value")).select(
        "user_id",
        F.timestamp_seconds(F.col("ts_int")).alias("ts"),
        F.col("ts_int"),
        "value",
    )
    r = _df(spark, right, cols=("user_id", "ts_int", "value")).select(
        "user_id",
        F.timestamp_seconds(F.col("ts_int")).alias("ts"),
        F.col("ts_int").alias("rts_int"),
    )
    pairs = interval_join_bucketed(
        l, r, on="user_id", window_seconds=window
    ).select(F.col("l.ts_int"), F.col("l.user_id"), F.col("r.rts_int"))
    got = sorted(
        (p["user_id"], p["ts_int"], p["rts_int"]) for p in pairs.collect()
    )
    expected = sorted(
        (lk, lt, rt)
        for lk, lt, _ in left
        for rk, rt, _ in right
        if rk == lk and lt < rt <= lt + window
    )
    assert got == expected
