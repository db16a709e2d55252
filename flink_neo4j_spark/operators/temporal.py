"""Temporal operators over the ``events`` stream-shaped table: as-of join,
time-bucketed interval join, and JSON property extraction.

These are the batch forms of the operators a training-data/event pipeline
needs beyond plain relational algebra. None exist as Spark built-ins; each is
re-expressed as a composition of DataFrame ops chosen for its shuffle
behavior at 100 TB (rationale on each function). The JSON decode is the
native analogue of the reference's JSON-row-to-typed-field path
(Neo4jInputFormat.java:114-134) — there the JSON is the wire format and the
decode is positional; here JSON is a *column* and the decode is expression-
level (``get_json_object``), fully inside whole-stage codegen.

Determinism: the driver verified there are no duplicate (user_id, ts) pairs
in the synthetic events table, so strict-inequality as-of matching is unique
and hash-checkable against a DuckDB ``ASOF JOIN`` oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_neo4j_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """For each left row, attach the most recent *strictly earlier* right row
    with the same ``on`` key (columns ``asof_<value_col>``; null if none).

    Implementation is the union-and-scan formulation, not a join: tag both
    sides, union, and run ``last(col, ignorenulls)`` over a window partitioned
    by the key and ordered by time over *preceding rows only*. Cost: ONE
    shuffle on the key + a per-partition sort — the same price as a window
    function. The naive formulation (inequality theta-join + groupBy max) is
    a broadcast-nested-loop at best; at 100 TB the union-scan keeps the
    operator linear and never materializes candidate pairs.

    Cross-side timestamp ties are excluded STRUCTURALLY: left rows sort
    before right rows at the same timestamp (``__side``: left=0, right=1),
    so a left row's preceding frame can never contain a same-timestamp
    right row — strictly-earlier holds for any input, not just fixtures
    with unique (key, ts). (Duplicate right rows at the same timestamp
    remain order-ambiguous among themselves, as in any as-of engine.)
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(0))
    r = right.select(
        on,
        F.col(right_ts).alias(left_ts),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(1))
    unioned = l.unionByName(r.select(*r.columns), allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(left_ts, "__side")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned.select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("__side") == 0).select(
        *lcols, *[f"asof_{c}" for c in value_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Mirror of :func:`asof_join`: attach the EARLIEST *strictly later*
    right row per key (columns ``next_<value_col>``; null if none) — the
    time-to-next-event / forward-attribution primitive.

    Same union-and-scan shape and cost (one shuffle + per-partition sort).
    Strictly-later holds structurally: right rows sort BEFORE left rows at
    an equal timestamp (``__side``: right=0, left=1), so a left row's
    following frame never contains a same-timestamp right row. Duplicate
    right rows at one (key, ts) remain order-ambiguous among themselves —
    pre-aggregate the right side if that matters (a18 does).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        on,
        F.col(right_ts).alias(left_ts),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    unioned = l.unionByName(r.select(*r.columns), allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(left_ts, "__side")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = unioned.select(
        "*",
        *[
            F.first(f"__rv_{c}", ignorenulls=True).over(w).alias(f"next_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("__side") == 1).select(
        *lcols, *[f"next_{c}" for c in value_cols]
    )


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs (left, right) with the same key where
    ``left.ts < right.ts <= left.ts + window_seconds``.

    A raw inequality join degenerates to BroadcastNestedLoopJoin. Instead the
    time axis is bucketed at the window length: a left row's window spans at
    most two buckets, so the left side explodes into exactly 2 rows, the
    right side maps to 1 bucket, and the match becomes an EQUI-join on
    (key, bucket) + a residual range filter. Each true pair matches in
    exactly one bucket (no dedup pass), the join hash-shuffles both sides
    once, and AQE's skew split applies — the standard scale recipe for
    bounded-interval joins.
    """
    bucket = lambda ts: (F.unix_timestamp(F.col(ts)) / F.lit(window_seconds)).cast(
        "long"
    )  # noqa: E731
    l = left.withColumn(
        "__bucket", F.explode(F.array(bucket(left_ts), bucket(left_ts) + 1))
    )
    r = right.withColumn("__bucket", bucket(right_ts))
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col("l.__bucket") == F.col("r.__bucket"))
            & (rt > lt)
            & (rt <= lt + F.expr(f"INTERVAL {window_seconds} SECONDS")),
        )
        .drop("__bucket")
    )


# A1 — as-of join: each click event gets the value of the user's most recent
# strictly-prior view event. Oracle: DuckDB's native ASOF LEFT JOIN — a
# genuinely independent implementation of the same semantics.
def a1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return (
        asof_join(clicks, views, on="user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.col("asof_value").alias("prior_view_value"),
        )
        .orderBy("event_id")
    )


# A2 — bounded interval join: for every error event, how many non-error
# events the same user produced in the 10 minutes after it (zero-preserving).
def a2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", "ts"
    )
    others = e.filter(F.col("event_type") != "error").select("user_id", "ts")
    pairs = interval_join_bucketed(errors, others, on="user_id", window_seconds=600)
    counts = pairs.groupBy("err_id").agg(F.count("*").alias("cnt"))
    return (
        errors.join(counts, "err_id", "left")
        .select(
            "err_id", "user_id", F.coalesce("cnt", F.lit(0)).alias("follow_events")
        )
        .orderBy("err_id")
    )


# A3 — JSON property decode (the reference's Input:114-134 as an expression):
# pull the integer property `k` out of the props JSON column and aggregate.
def a3_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# A4 — first-touch conversion funnel (view -> click -> purchase, each step
# within FUNNEL_HORIZON of the previous): the canonical product-analytics /
# sessionized-conversion query. Each stage is one filtered scan + equi-join
# on user_id + min-timestamp partial agg; the candidate set SHRINKS every
# stage, so at 100 TB the later stages join against progressively smaller
# keyed sets (and the final output is three scalar counts — nothing wide
# ever reaches the driver). No window over the whole event stream, no
# inequality theta-join: the per-stage bound is a residual filter on an
# equi-join, which Catalyst keeps as a shuffled hash join.
FUNNEL_HORIZON_S = 3600


def a4_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    horizon = f"INTERVAL {FUNNEL_HORIZON_S} SECOND"
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t0")) & (F.col("ts") <= F.expr(f"t0 + {horizon}")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.expr(f"t1 + {horizon}")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
        .orderBy("stage")
    )


# A5 — day-cohort retention: group users by first-activity day, report how
# many are active again exactly 1 and 7 days later. One distinct over
# (user, day) + one min-day agg + one equi-join on user_id + one grouped
# conditional count-distinct — every step partial-aggregates; cohort
# cardinality (days) is tiny so the output agg never skews.
RETENTION_DAYS = (1, 7)


def a5_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = e.groupBy("user_id").agg(F.min("d").alias("d0"))
    active = e.distinct()
    joined = first.join(active, "user_id").withColumn(
        "k", F.datediff("d", "d0")
    )
    aggs = [F.count_distinct("user_id").alias("n_users")] + [
        F.count_distinct(F.when(F.col("k") == k, F.col("user_id"))).alias(
            f"n_d{k}"
        )
        for k in RETENTION_DAYS
    ]
    return (
        joined.groupBy(F.col("d0").alias("cohort_day"))
        .agg(*aggs)
        .orderBy("cohort_day")
    )


# A6 — per-event trailing-hour features: for every event, the count and
# value-sum of the SAME user's events in the preceding hour (inclusive) —
# the standard rate-limiting / velocity-feature / abuse-detection shape.
# This is a time-RANGE window frame, not a row frame: Spark plans one
# shuffle on user_id + a per-partition sort, then each frame is a sliding
# pointer pair over the sorted run (no self-join, no candidate-pair blowup).
# The frame bound is expressed on unix_micros(ts) because Spark's
# rangeBetween needs a numeric ordering key; the microsecond scale keeps the
# arithmetic exact (bigint), and ties (equal ts) are included in each
# other's frames by RANGE semantics in both engines identically.
TRAIL_S = 3600


def a6_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-TRAIL_S * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("val_1h"),
    ).orderBy("event_id")


# A7 — OHLC/session-boundary rollup: first/last/min/max value per user-day
# via min_by/max_by (argmin/argmax aggregates) — the canonical "opening and
# closing reading" shape (metrics, sensor readings, price candles). min_by
# partial-aggregates like any other agg (each partial keeps its best
# (key, value) witness), so the plan is one map-side-combined groupBy —
# no window, no sort, no self-join. The events fixture has no duplicate
# (user_id, ts) pairs (verified by the driver), so ts is a total
# per-group ordering key and argmin/argmax are unique cross-engine.
def a7_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts", "value"
    )
    return (
        e.groupBy("user_id", "day")
        .agg(
            F.expr("min_by(value, ts)").alias("open"),
            F.expr("max_by(value, ts)").alias("close"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id", "day")
    )


# A8 — time-series gap fill (resample-to-daily with zero-fill): generate
# each user's full date spine between first and last activity with
# sequence() + explode, left-join the observed daily rollup, zero-fill the
# holes — the standard prep before window features / forecasting, where a
# missing day must mean 0.0, not an absent row. The spine explode is narrow
# (per-user bounds from a tiny agg); the join is keyed (user_id, day) —
# both sides already clustered by the rollup shuffle. At 100 TB the spine
# size is bounded by users x days, independent of event count.
def a8_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    # localCheckpoint: daily feeds BOTH the spine bounds and the join probe
    # side, and Catalyst plans no ReusedExchange across them — without it
    # the events scan + rollup runs twice (4 scans observed). The
    # materialized frame is users x active-days, tiny vs the input.
    daily = e.groupBy("user_id", "day").agg(
        F.round(F.sum("value"), 2).alias("total")
    ).localCheckpoint()
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("total", F.lit(0.0)).alias("total"),
            F.col("total").isNotNull().alias("observed"),
        )
        .orderBy("user_id", "day")
    )


# A9 — per-user z-score anomaly flags: each event's value scored against its
# user's own mean/population-stddev — the standard per-entity anomaly /
# outlier-detection rollup (fraud velocity, sensor drift, metric spikes).
# Two passes over the keyed data, both cheap: one map-side-combined groupBy
# for the (mu, sigma) profile table (user-cardinality — broadcastable at
# any corpus size where users << events), then one broadcast join back onto
# the stream. The z-score is rounded to 2dp and the anomaly flag derived
# from the ROUNDED value, so cross-engine fp summation noise in mu/sigma
# can't flip a row near the threshold.
Z_THRESHOLD = 2.0


def a9_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    stats = e.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    # + 0.0 collapses IEEE -0.0 (a tiny-negative diff rounded to 2dp) to
    # +0.0 — DuckDB's ROUND keeps the sign, Spark's drops it, and a signed
    # zero is invisible numerically but flips the driver's value hash.
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 2) + F.lit(
        0.0
    )
    return (
        e.join(F.broadcast(stats), "user_id")
        .filter(F.col("sigma") > 0)
        .select(
            "event_id",
            "user_id",
            z.alias("z"),
            (F.abs(z) > Z_THRESHOLD).alias("is_anomaly"),
        )
        .orderBy("event_id")
    )


# A10 — cumulative-share curves: per user-day running total and its share
# of the user's lifetime total (spend pacing, quota burn-down, LTV curves).
# Both the running sum and the lifetime total are window aggregates over the
# SAME partitioning (user_id), so the daily rollup shuffles once and both
# frames evaluate in the same per-partition pass. Determinism: the daily
# value is rounded to 2dp BEFORE the cumulative sum, and a window cumsum
# evaluates in sorted day order — so both engines accumulate identical
# doubles in identical order (no partition-order noise reaches the curve).
def a10_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = e.groupBy("user_id", "day").agg(
        F.round(F.sum("value"), 2).alias("day_val")
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("user_id")
    return daily.select(
        "user_id",
        "day",
        "day_val",
        F.round(F.sum("day_val").over(w_cum), 2).alias("cum_val"),
        F.round(
            F.sum("day_val").over(w_cum) / F.sum("day_val").over(w_all), 4
        ).alias("cum_share"),
    ).orderBy("user_id", "day")


# A11 — trailing 7-day distinct active users per observed day (rolling MAU/
# WAU-style metric). Sliding COUNT(DISTINCT) is not window-expressible in
# Spark (no DISTINCT inside a range frame), and the naive day-range self-join
# is O(days × rows). Instead each distinct (user, day) pair is exploded to
# the <=7 cover days it contributes to — a BOUNDED ×7 narrow expansion — and
# the answer is a plain two-phase distinct-count per cover day. Shuffles:
# one for the (user, day) distinct, one for the final partial-agg count;
# both scale linearly, and the ×7 factor is constant regardless of data
# size. The tiny observed-day frame broadcasts to trim unobserved tail days.
def a11_trailing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    covered = pairs.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias(
            "cover_day"
        ),
    )
    observed = pairs.select(F.col("day").alias("cover_day")).distinct()
    return (
        covered.join(F.broadcast(observed), "cover_day")
        .groupBy("cover_day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.col("cover_day").alias("day"), "active_7d")
        .orderBy("day")
    )


def scd2_build(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from a change stream: one
    row per state change with ``valid_from`` = change time and ``valid_to`` =
    next change time for the same key (null on the open current interval).

    One window function over one shuffle on the key — the standard lead()
    formulation; no joins, no driver state.
    """
    w = Window.partitionBy(key).orderBy(ts)
    return df.select(
        key,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        *value_cols,
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Point-in-time join: each fact row gets the dimension state whose
    ``[valid_from, valid_to)`` interval contains its timestamp (null before
    the first change).

    SCD2 containment (``valid_from <= ts < valid_to``) needs only
    ``valid_from`` once intervals are contiguous per key, so the interval
    predicate collapses to an INCLUSIVE as-of: the latest change at-or-
    before the fact. Implementation is the same union-and-scan as
    :func:`asof_join` — tag, union, ``last(..., ignorenulls)`` over
    preceding rows — but with the tags flipped (dim=0, fact=1) so a change
    landing exactly at the fact's timestamp IS visible to it, matching the
    inclusive lower bound. One shuffle + one sort; never materializes the
    fact×interval candidate pairs a theta-join would.
    """
    fcols = facts.columns
    f_tag = facts.withColumn("__side", F.lit(1))
    d_tag = dim.select(
        on,
        F.col("valid_from").alias(fact_ts),
        F.col("valid_from").alias("__rv_valid_from"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    unioned = f_tag.unionByName(d_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(fact_ts, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.select(
        "*",
        F.last("__rv_valid_from", ignorenulls=True).over(w).alias("valid_from"),
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"dim_{c}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("__side") == 1).select(
        *fcols, "valid_from", *[f"dim_{c}" for c in value_cols]
    )


# A12 — SCD2 point-in-time enrichment: each user's purchase stream is the
# change log of a "current tier" dimension (value at last purchase); every
# click is enriched with the tier active AT click time, plus the interval
# start proving which version matched. Oracle is the independent formulation:
# build intervals with SQL lead(), then join on interval CONTAINMENT — if
# the collapse-to-asof rewrite were wrong on any boundary, the two would
# diverge.
def a12_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dim = scd2_build(
        e.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.round("value", 2).alias("tier")
        ),
        key="user_id",
        value_cols=("tier",),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return (
        scd2_lookup(clicks, dim, on="user_id", value_cols=("tier",))
        .select(
            "event_id",
            "user_id",
            F.unix_micros("valid_from").alias("valid_from_us"),
            F.col("dim_tier").alias("tier"),
        )
        .orderBy("event_id")
    )


# A13 — linear multi-touch attribution: every purchase splits one unit of
# conversion credit equally over the user's clicks in the preceding hour;
# each click reports its total earned credit across all purchases it
# touched (plus how many). The marketing-analytics workhorse that needs
# BOTH directions of the interval join's output: per-purchase touch counts
# (the denominator) re-joined onto the pairs to credit each click.
#
# Scale shape: ONE bucketed interval equi-join builds the pairs (a2's
# recipe — never a theta join), then two partial-aggable groupBys; the
# per-purchase count table is purchase-cardinality (small side) and joins
# back to pairs on buy_id. Zero-credit clicks are preserved via a left
# join against the click base — at scale that's the same shuffle key as
# the credit agg, so AQE coalesces the two exchanges.
def a13_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", "ts"
    )
    pairs = interval_join_bucketed(
        clicks, buys, on="user_id", window_seconds=3600
    ).select("click_id", "buy_id")
    per_buy = pairs.groupBy("buy_id").agg(F.count("*").alias("n_touches"))
    credit = (
        pairs.join(per_buy, "buy_id")
        .groupBy("click_id")
        .agg(
            F.count("*").alias("n_buys"),
            F.round(F.sum(F.lit(1.0) / F.col("n_touches")), 4).alias("credit"),
        )
    )
    return (
        clicks.join(credit, "click_id", "left")
        .select(
            "click_id",
            "user_id",
            F.coalesce("n_buys", F.lit(0)).alias("n_buys"),
            F.coalesce("credit", F.lit(0.0)).alias("credit"),
        )
        .orderBy("click_id")
    )


#: EWMA smoothing factor and bounded lookback (observations, not days).
EWMA_ALPHA = 0.3
EWMA_LOOKBACK = 10


# A14 — exponentially-weighted moving average over each user's daily series
# (the standard smoothing/trend feature next to a6's flat trailing windows).
# EWMA is a recurrence — not directly window-expressible — but with q=1-α
# the normalized form over a bounded lookback telescopes to a RATIO OF TWO
# WINDOW SUMS: ewma_t = Σ x_j q^(t-j) / Σ q^(t-j) = [Σ x_j q^(-j)] /
# [Σ q^(-j)] over the frame (the q^t factor cancels), so each term needs
# only the row's OWN index — one sort-based window pass, two sums over the
# same 10-row frame, no self-join and no per-user iteration. Within a
# frame the q^(-j) terms span only q^(-LOOKBACK), so the big-exponent
# scale cancels in the ratio and precision holds at any series length.
def a14_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = e.groupBy("user_id", "day").agg(
        F.round(F.sum("value"), 2).alias("day_val")
    )
    q = 1.0 - EWMA_ALPHA
    w_idx = Window.partitionBy("user_id").orderBy("day")
    idxed = daily.withColumn("j", F.row_number().over(w_idx)).select(
        "user_id",
        "day",
        "day_val",
        "j",
        (F.col("day_val") * F.pow(F.lit(1.0 / q), F.col("j"))).alias("g"),
        F.pow(F.lit(1.0 / q), F.col("j")).alias("wt"),
    )
    w_frame = (
        Window.partitionBy("user_id")
        .orderBy("j")
        .rowsBetween(-(EWMA_LOOKBACK - 1), 0)
    )
    return idxed.select(
        "user_id",
        "day",
        "day_val",
        F.round(
            F.sum("g").over(w_frame) / F.sum("wt").over(w_frame), 4
        ).alias("ewma"),
    ).orderBy("user_id", "day")


# A15 — time-weighted average (TWAP): within each user-day, each value is
# weighted by how long it was "current" (the gap to the user's next event
# that day) — the finance/metrics standard where plain AVG over-counts
# bursts. One window pass for lead(ts); all accumulation is INTEGER
# (cents × microseconds, ≤ ~1e17 per day — inside int64), so the result
# is bit-identical on any partition layout (the q43 lesson applied from
# the start). Days with a single event have no holding interval and are
# excluded (Σdt = 0).
def a15_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("us")
    gapped = e.withColumn(
        "dt", F.lead("us").over(w) - F.col("us")
    ).filter(F.col("dt").isNotNull())
    return (
        gapped.groupBy("user_id", "day")
        .agg(
            F.sum(F.col("cents") * F.col("dt")).alias("acc"),
            F.sum("dt").alias("dt_total"),
            F.count("*").alias("n_intervals"),
        )
        .select(
            "user_id",
            "day",
            "n_intervals",
            F.round(F.col("acc") / F.col("dt_total") / 100.0, 4).alias("twap"),
        )
        .orderBy("user_id", "day")
    )


#: a16: sliding two-sample window width (days each side) and the minimum
#: absolute before/after level shift (in value units) that flags a change.
CHANGE_W = 7
CHANGE_MIN_SHIFT = 50.0


# A16 — level-shift change-point detection over per-user daily series:
# for each day with a FULL window on both sides, compare the mean of the
# preceding W days against the mean of the current+following W-1 days and
# flag |shift| above a threshold (the sliding two-sample test — the
# window-expressible form of CUSUM; the recursive CUSUM statistic itself
# is not expressible without per-row recursion). One shuffle on user_id:
# the daily rollup and both window frames share the same partitioning.
# All accumulation is integer cents, so means are layout-independent;
# + 0.0 collapses signed zero on the rounded (possibly negative) shift.
def a16_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = e.groupBy("user_id", "day").agg(F.sum("cents").alias("day_cents"))
    w = Window.partitionBy("user_id").orderBy("day")
    pre = w.rowsBetween(-CHANGE_W, -1)
    post = w.rowsBetween(0, CHANGE_W - 1)
    scored = daily.select(
        "user_id",
        "day",
        F.count("*").over(pre).alias("n_pre"),
        F.count("*").over(post).alias("n_post"),
        (F.sum("day_cents").over(pre) / F.count("*").over(pre) / 100.0).alias(
            "pre_avg"
        ),
        (
            F.sum("day_cents").over(post) / F.count("*").over(post) / 100.0
        ).alias("post_avg"),
    )
    shift = F.col("post_avg") - F.col("pre_avg")
    return (
        scored.filter(
            (F.col("n_pre") == CHANGE_W)
            & (F.col("n_post") == CHANGE_W)
            & (F.abs(shift) > CHANGE_MIN_SHIFT)
        )
        .select(
            "user_id",
            "day",
            (F.round(F.col("pre_avg"), 2) + F.lit(0.0)).alias("pre_avg"),
            (F.round(F.col("post_avg"), 2) + F.lit(0.0)).alias("post_avg"),
            (F.round(shift, 2) + F.lit(0.0)).alias("shift"),
        )
        .orderBy("user_id", "day")
    )


# A17 — per-user correlation between two daily series (click activity vs
# purchase value): the feature-engineering "does engagement track spend"
# screen. The built-in corr() accumulates FLOAT co-moments in partition
# row order — not layout-independent — so the correlation is assembled
# from INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy², all
# int64-exact over cents) and the closed form evaluates once per user on
# identical integers in any layout/engine. One shuffle on (user, day) for
# the aligned pivot, one on user for the moments.
def a17_series_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = e.groupBy("user_id", "day").agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents")).otherwise(
                F.lit(0)
            )
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("cents")
            ).otherwise(F.lit(0))
        ).alias("y"),
    )
    m = daily.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((varx > 0) & (vary > 0) & (F.col("n") >= 5))
        .select(
            "user_id",
            "n",
            (
                F.round(
                    cov.cast("double")
                    / F.sqrt(varx.cast("double"))
                    / F.sqrt(vary.cast("double")),
                    4,
                )
                + F.lit(0.0)
            ).alias("click_purchase_corr"),
        )
        .orderBy("user_id")
    )


# A18 — FORWARD as-of join: each click attached to the user's next
# strictly-later purchase (time-to-conversion features; a1 is the backward
# twin). The right side pre-aggregates to one row per (user, ts) — min
# value — so the nearest-later pick is fully deterministic. Same
# union-and-scan plan as a1: one shuffle, no candidate pairs.
def a18_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("value"))
    )
    return (
        asof_join_forward(clicks, purchases, on="user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.col("next_value").alias("next_purchase_value"),
        )
        .orderBy("event_id")
    )


# A19 — business-day fulfillment lag (calendar-aware SLA reporting: the
# ship lag in WEEKDAYS, not raw days — the form ops teams actually
# contract on). The weekday count has a closed form on (total days,
# start weekday): full_weeks·5 plus a ≤6-element fold counting the
# remainder days that land Mon–Fri — pure codegen arithmetic, no
# calendar table, no UDF, identical expression in both engines (weekday
# normalized to 0=Monday on each side). Lags accumulate as exact
# integers; one shuffle on the priority rollup.
def a19_businessday_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("n"),
        F.expr("weekday(o_orderdate)").alias("w0"),
    ).filter(F.col("n") >= 0)
    # The tail count (weekdays among the n % 7 days after weekday w0) has
    # only 7 x 7 possible values, so it is a literal lookup table instead
    # of the earlier per-row interpreted aggregate(sequence(1, n % 7))
    # lambda (guide §4.1: built-in expressions over lambda folds — this
    # fold ran interpreted for every joined row). Integer-exact: the table
    # IS the fold's value for every (w0, r), including r = 0 -> 0, which
    # also retires the sequence(1, 0)-descends guard the lambda needed.
    tail = [
        sum(1 for k in range(1, r + 1) if (w0 + k) % 7 <= 4)
        for w0 in range(7)
        for r in range(7)
    ]
    bdays = F.expr(
        f"(n div 7) * 5 + element_at(array({', '.join(map(str, tail))}),"
        " CAST(w0 * 7 + n % 7 + 1 AS INT))"
    )
    return (
        j.select("o_orderpriority", bdays.alias("bd"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("bd") / F.count("*"), 2).alias("avg_bdays"),
            F.max("bd").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )


# A20 — LOCAL-time daily rollup: bucket each user's events by the user's
# own local midnight, not UTC (the subtle bug class behind every "daily
# actives dropped 30% in APAC" incident). The per-user offset here is a
# deterministic stand-in (user_id % 24 − 12) for a timezone dimension;
# the mechanics — shift event time by the offset BEFORE the date
# truncation, then aggregate on the local day — are exactly the
# production form, still one shuffle and fully codegen'd (no tz library
# in the hot path; a real deployment joins a broadcast tz-offset dim).
def a20_localtime_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        ((F.col("user_id") % 24) - 12).cast("int").alias("tz_off"),
    )
    local_day = F.to_date(
        F.col("ts") + F.make_interval(hours=F.col("tz_off"))
    )
    return (
        e.groupBy("user_id", local_day.alias("local_day"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("cents") / 100.0, 2).alias("total"),
        )
        .orderBy("user_id", "local_day")
    )


QUERIES: dict[str, QueryFn] = {
    "a20_localtime_rollup": a20_localtime_rollup,
    "a19_businessday_lag": a19_businessday_lag,
    "a18_asof_forward": a18_asof_forward,
    "a16_changepoints": a16_changepoints,
    "a17_series_corr": a17_series_corr,
    "a15_twap": a15_twap,
    "a14_ewma": a14_ewma,
    "a13_attribution": a13_attribution,
    "a11_trailing_distinct": a11_trailing_distinct,
    "a12_scd2_join": a12_scd2_join,
    "a1_asof_join": a1_asof_join,
    "a10_cumulative_share": a10_cumulative_share,
    "a9_zscore_anomaly": a9_zscore_anomaly,
    "a8_gap_fill": a8_gap_fill,
    "a2_interval_join": a2_interval_join,
    "a3_json_extract": a3_json_extract,
    "a4_funnel": a4_funnel,
    "a5_retention": a5_retention,
    "a6_trailing_features": a6_trailing_features,
    "a7_ohlc": a7_ohlc,
}

ORACLE: dict[str, str] = {
    "a20_localtime_rollup": """
        SELECT user_id,
               CAST(CAST(ts AS TIMESTAMP)
                    + to_hours(user_id % 24 - 12) AS DATE) AS local_day,
               COUNT(*) AS cnt,
               ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0, 2)
                 AS total
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "a19_businessday_lag": """
        WITH j AS (
          SELECT o_orderpriority,
                 datediff('day', o_orderdate, l_shipdate) AS n,
                 isodow(o_orderdate) - 1 AS w0
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate >= o_orderdate),
        b AS (
          SELECT o_orderpriority,
                 (n // 7) * 5 + COALESCE(list_sum([
                   CASE WHEN (w0 + k) % 7 <= 4 THEN 1 ELSE 0 END
                   for k in generate_series(1, n % 7)]), 0) AS bd
          FROM j)
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(CAST(SUM(bd) AS DOUBLE) / COUNT(*), 2) AS avg_bdays,
               CAST(MAX(bd) AS BIGINT) AS max_bdays
        FROM b GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "a18_asof_forward": """
        WITH c AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click'),
        p AS (
          SELECT user_id, ts, MIN(value) AS value FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts),
        j AS (
          SELECT c.event_id, p.value AS pval,
                 ROW_NUMBER() OVER (PARTITION BY c.event_id
                                    ORDER BY p.ts) AS rn
          FROM c JOIN p ON c.user_id = p.user_id AND p.ts > c.ts)
        SELECT c.event_id, c.user_id, c.value,
               j.pval AS next_purchase_value
        FROM c LEFT JOIN (SELECT event_id, pval FROM j WHERE rn = 1) j
          ON c.event_id = j.event_id
        ORDER BY c.event_id""",
    "a16_changepoints": f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents
          FROM events GROUP BY 1, 2),
        scored AS (
          SELECT user_id, day,
                 COUNT(*) OVER pre AS n_pre,
                 COUNT(*) OVER post AS n_post,
                 SUM(day_cents) OVER pre / CAST(COUNT(*) OVER pre AS DOUBLE)
                   / 100.0 AS pre_avg,
                 SUM(day_cents) OVER post / CAST(COUNT(*) OVER post AS DOUBLE)
                   / 100.0 AS post_avg
          FROM daily
          WINDOW pre AS (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN {CHANGE_W} PRECEDING AND 1 PRECEDING),
                 post AS (PARTITION BY user_id ORDER BY day
                          ROWS BETWEEN CURRENT ROW
                          AND {CHANGE_W - 1} FOLLOWING))
        SELECT user_id, day,
               ROUND(pre_avg, 2) + 0.0 AS pre_avg,
               ROUND(post_avg, 2) + 0.0 AS post_avg,
               ROUND(post_avg - pre_avg, 2) + 0.0 AS shift
        FROM scored
        WHERE n_pre = {CHANGE_W} AND n_post = {CHANGE_W}
          AND ABS(post_avg - pre_avg) > {CHANGE_MIN_SHIFT}
        ORDER BY user_id, day""",
    "a17_series_corr": """
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 SUM(CASE WHEN event_type = 'click'
                     THEN CAST(ROUND(value * 100) AS BIGINT)
                     ELSE 0 END) AS x,
                 SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(ROUND(value * 100) AS BIGINT)
                     ELSE 0 END) AS y
          FROM events GROUP BY 1, 2),
        m AS (
          SELECT user_id, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM daily GROUP BY user_id)
        SELECT user_id, n,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 4) + 0.0
                 AS click_purchase_corr
        FROM m
        WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 AND n >= 5
        ORDER BY user_id""",
    "a15_twap": """
        WITH e AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events),
        gapped AS (
          SELECT user_id, day, cents,
                 LEAD(us) OVER (PARTITION BY user_id, day ORDER BY us) - us
                   AS dt
          FROM e)
        SELECT user_id, day, COUNT(*) AS n_intervals,
               ROUND(CAST(SUM(cents * dt) AS DOUBLE)
                     / CAST(SUM(dt) AS DOUBLE) / 100.0, 4) AS twap
        FROM gapped WHERE dt IS NOT NULL
        GROUP BY user_id, day
        ORDER BY user_id, day""",
    "a14_ewma": f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 ROUND(SUM(value), 2) AS day_val
          FROM events GROUP BY 1, 2),
        idxed AS (
          SELECT user_id, day, day_val,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS j
          FROM daily)
        SELECT user_id, day, day_val,
               ROUND(
                 SUM(day_val * POWER({1.0 / (1.0 - EWMA_ALPHA)!r}, j)) OVER w
                 / SUM(POWER({1.0 / (1.0 - EWMA_ALPHA)!r}, j)) OVER w, 4)
                 AS ewma
        FROM idxed
        WINDOW w AS (PARTITION BY user_id ORDER BY j
                     ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING
                              AND CURRENT ROW)
        ORDER BY user_id, day""",
    "a13_attribution": """
        WITH clicks AS (
          SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS cts
          FROM events WHERE event_type = 'click'),
        buys AS (
          SELECT event_id AS buy_id, user_id, CAST(ts AS TIMESTAMP) AS bts
          FROM events WHERE event_type = 'purchase'),
        pairs AS (
          SELECT c.click_id, b.buy_id
          FROM clicks c JOIN buys b
            ON c.user_id = b.user_id
           AND b.bts > c.cts AND b.bts <= c.cts + INTERVAL 1 HOUR),
        pn AS (SELECT buy_id, COUNT(*) AS n FROM pairs GROUP BY buy_id),
        credit AS (
          SELECT p.click_id, CAST(COUNT(*) AS BIGINT) AS n_buys,
                 ROUND(SUM(CAST(1.0 AS DOUBLE) / pn.n), 4) AS credit
          FROM pairs p JOIN pn ON p.buy_id = pn.buy_id
          GROUP BY p.click_id)
        SELECT c.click_id, c.user_id,
               COALESCE(cr.n_buys, 0) AS n_buys,
               COALESCE(cr.credit, 0.0) AS credit
        FROM clicks c LEFT JOIN credit cr ON c.click_id = cr.click_id
        ORDER BY c.click_id""",
    "a11_trailing_distinct": """
        WITH pairs AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        days AS (SELECT DISTINCT day FROM pairs)
        SELECT d.day, COUNT(DISTINCT p.user_id) AS active_7d
        FROM days d
        JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
        ORDER BY d.day""",
    "a12_scd2_join": """
        WITH dim AS (
          SELECT user_id,
                 CAST(ts AS TIMESTAMP) AS valid_from,
                 LEAD(CAST(ts AS TIMESTAMP))
                   OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
                 ROUND(value, 2) AS tier
          FROM events WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id,
               epoch_us(d.valid_from) AS valid_from_us,
               d.tier
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'click') c
        LEFT JOIN dim d
          ON c.user_id = d.user_id
         AND c.ts >= d.valid_from
         AND (d.valid_to IS NULL OR c.ts < d.valid_to)
        ORDER BY c.event_id""",
    "a10_cumulative_share": """
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 ROUND(SUM(value), 2) AS day_val
          FROM events GROUP BY 1, 2)
        SELECT user_id, day, day_val,
               ROUND(SUM(day_val) OVER w_cum, 2) AS cum_val,
               ROUND(SUM(day_val) OVER w_cum
                     / SUM(day_val) OVER (PARTITION BY user_id), 4)
                 AS cum_share
        FROM daily
        WINDOW w_cum AS (PARTITION BY user_id ORDER BY day
                         ROWS UNBOUNDED PRECEDING)
        ORDER BY user_id, day""",
    "a9_zscore_anomaly": f"""
        WITH stats AS (
          SELECT user_id, AVG(value) AS mu, stddev_pop(value) AS sigma
          FROM events GROUP BY user_id)
        SELECT e.event_id, e.user_id,
               ROUND((e.value - s.mu) / s.sigma, 2) + 0.0 AS z,
               ABS(ROUND((e.value - s.mu) / s.sigma, 2)) > {Z_THRESHOLD}
                 AS is_anomaly
        FROM events e JOIN stats s ON e.user_id = s.user_id
        WHERE s.sigma > 0
        ORDER BY e.event_id""",
    "a8_gap_fill": """
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 ROUND(SUM(value), 2) AS total
          FROM events GROUP BY 1, 2),
        b AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
              FROM daily GROUP BY 1),
        spine AS (
          SELECT user_id, CAST(unnest(generate_series(
                   CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                   INTERVAL 1 DAY)) AS DATE) AS day
          FROM b)
        SELECT s.user_id, s.day,
               COALESCE(d.total, 0.0) AS total,
               d.total IS NOT NULL AS observed
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        ORDER BY 1, 2""",
    "a7_ohlc": """
        SELECT user_id, CAST(ts AS DATE) AS day,
               arg_min(value, ts) AS open, arg_max(value, ts) AS close,
               MIN(value) AS low, MAX(value) AS high, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "a6_trailing_features": f"""
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_1h,
               ROUND(SUM(value) OVER w, 2) AS val_1h
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL {TRAIL_S} SECOND PRECEDING
                               AND CURRENT ROW)
        ORDER BY event_id""",
    "a4_funnel": f"""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t0 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t1
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click'
            AND e.ts > v.t0 AND e.ts <= v.t0 + INTERVAL {FUNNEL_HORIZON_S} SECOND
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND e.ts > c.t1 AND e.ts <= c.t1 + INTERVAL {FUNNEL_HORIZON_S} SECOND
          GROUP BY e.user_id)
        SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        UNION ALL SELECT '2_click', COUNT(*) FROM c
        UNION ALL SELECT '3_purchase', COUNT(*) FROM p
        ORDER BY stage""",
    "a5_retention": f"""
        WITH e AS (
          SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        first AS (
          SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, d FROM e)
        SELECT f.d0 AS cohort_day,
               COUNT(DISTINCT f.user_id) AS n_users,
               {", ".join(
                   f"COUNT(DISTINCT CASE WHEN a.d - f.d0 = {k} "
                   f"THEN f.user_id END) AS n_d{k}"
                   for k in RETENTION_DAYS
               )}
        FROM first f JOIN active a ON f.user_id = a.user_id
        GROUP BY f.d0 ORDER BY cohort_day""",
    # DuckDB's ASOF JOIN picks the greatest right ts satisfying the
    # inequality — exactly the strictly-prior-view semantics.
    "a1_asof_join": """
        WITH clicks AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click'),
        views AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        SELECT c.event_id, c.user_id, c.value,
               v.value AS prior_view_value
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND v.ts < c.ts
        ORDER BY c.event_id""",
    # The oracle states the semantics directly as an inequality join; the
    # engine's bucketed plan must agree pair-for-pair.
    "a2_interval_join": """
        WITH errors AS (
          SELECT event_id AS err_id, user_id, ts FROM events
          WHERE event_type = 'error'),
        others AS (
          SELECT user_id, ts FROM events WHERE event_type <> 'error')
        SELECT e.err_id, e.user_id, COUNT(o.ts) AS follow_events
        FROM errors e LEFT JOIN others o
          ON o.user_id = e.user_id
         AND o.ts > e.ts AND o.ts <= e.ts + INTERVAL 10 MINUTE
        GROUP BY e.err_id, e.user_id
        ORDER BY e.err_id""",
    "a3_json_extract": """
        SELECT event_type, COUNT(k) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k,
               ROUND(AVG(k), 2) AS avg_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type ORDER BY event_type""",
}


#: a21: centered moving-average half-width (3 -> 7-day trend window) and the
#: fixed-point scale that makes the detrended series integer-exact: the
#: trend denominator is the frame row count (4..7 at the series edges), and
#: 420 = lcm(4,5,6,7), so 420/den is always integral.
SEASONAL_HALF = 3
SEASONAL_LCM = 420
SEASONAL_EPOCH = "1996-01-01"


# A21 — STL-lite seasonal decomposition of the corpus-wide daily event
# count: count_t = trend (centered 7-day moving average) + weekly seasonal
# (day-of-week mean of the detrended series) + residual — the standard
# first decomposition for traffic/ingest monitoring before any anomaly
# rule (a9/a16 operate on raw series; this separates "it's Sunday" from
# "something broke").
#
# Exactness discipline (the q43/a15 lesson): daily counts are integers, so
# detrended_fp = 420·n − trend_num·(420/trend_den) is an EXACT int64 in
# 1/420ths, the seasonal means aggregate integer sums, and every float
# division happens once at presentation — the result is bit-identical on
# any partition layout/engine. Day-of-week is (day − epoch) mod 7 (both
# engines agree; no locale-dependent dayofweek()).
#
# Scale shape: events partial-aggregate to one row per DAY before any
# window — the windowed series is calendar-bounded (~decades = thousands
# of rows), so the unpartitioned centered window is a deliberate tiny
# single-task stage, not a scale hazard; everything upstream shuffles
# once on the day key.
def a21_seasonal_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day")
    )
    daily = e.groupBy("day").agg(F.count("*").alias("n"))
    w = (
        Window.orderBy("day").rowsBetween(-SEASONAL_HALF, SEASONAL_HALF)
    )
    trended = daily.select(
        "day",
        "n",
        F.sum("n").over(w).alias("t_num"),
        F.count("n").over(w).alias("t_den"),
        F.expr(f"(datediff(day, DATE '{SEASONAL_EPOCH}') % 7 + 7) % 7").alias(
            "dow"
        ),
    ).withColumn(
        "det_fp",
        F.lit(SEASONAL_LCM) * F.col("n")
        - F.col("t_num") * (F.lit(SEASONAL_LCM) / F.col("t_den")).cast("long"),
    )
    seas = trended.groupBy("dow").agg(
        F.sum("det_fp").alias("s_num"), F.count("*").alias("s_den")
    )
    return (
        trended.join(F.broadcast(seas), "dow")
        .select(
            "day",
            "n",
            (F.round(F.col("t_num") / F.col("t_den"), 4) + F.lit(0.0)).alias(
                "trend"
            ),
            (
                F.round(
                    F.col("s_num")
                    / (F.col("s_den") * F.lit(float(SEASONAL_LCM))),
                    4,
                )
                + F.lit(0.0)
            ).alias("seasonal"),
            (
                F.round(
                    F.col("det_fp") / F.lit(float(SEASONAL_LCM))
                    - F.col("s_num")
                    / (F.col("s_den") * F.lit(float(SEASONAL_LCM))),
                    4,
                )
                + F.lit(0.0)
            ).alias("resid"),
        )
        .orderBy("day")
    )


QUERIES["a21_seasonal_decomp"] = a21_seasonal_decomp
ORACLE["a21_seasonal_decomp"] = f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ), trended AS (
      SELECT day, n,
             SUM(n) OVER w AS t_num,
             COUNT(n) OVER w AS t_den,
             ((day - DATE '{SEASONAL_EPOCH}') % 7 + 7) % 7 AS dow
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {SEASONAL_HALF} PRECEDING
                        AND {SEASONAL_HALF} FOLLOWING)
    ), det AS (
      SELECT *,
             {SEASONAL_LCM} * n
               - t_num * CAST({SEASONAL_LCM} / t_den AS BIGINT) AS det_fp
      FROM trended
    ), seas AS (
      SELECT dow, SUM(det_fp) AS s_num, COUNT(*) AS s_den
      FROM det GROUP BY dow
    )
    SELECT day, n,
           ROUND(t_num * 1.0 / t_den, 4) + 0.0 AS trend,
           ROUND(s_num / (s_den * {SEASONAL_LCM}.0), 4) + 0.0 AS seasonal,
           ROUND(det_fp / {SEASONAL_LCM}.0
                 - s_num / (s_den * {SEASONAL_LCM}.0), 4) + 0.0 AS resid
    FROM det JOIN seas USING (dow)
    ORDER BY day"""


# A22 — batch gaps-and-islands sessionization: the classic sessionize
# shape (a new session starts when the gap to the user's previous event
# exceeds the timeout), answered as the sessions-per-user DISTRIBUTION so
# the result is a small, layout-independent rollup. Plan: ONE window
# partitioned by user (lag → gap flag → running SUM = session id — the
# textbook cumulative-flag trick, a single shuffle on user_id), one
# session rollup, one distribution rollup — all partial-aggregated. The
# streaming twin is w2_sessionize; this is its batch restatement with an
# exact SQL oracle.
SESSION_GAP_MIN = 30


def a22_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # microsecond-exact integer timestamps on BOTH engines: a seconds
    # cast floors each endpoint before subtracting, while DuckDB's
    # epoch() subtracts fractional values first — a 1-second off-by-one
    # on ~half of all durations (hit live on this query's first run)
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "user_id")
    gap = F.col("us") - F.lag("us").over(w)
    flagged = e.withColumn(
        "new_s",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("us", "user_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        ((F.max("us") - F.min("us")) / F.lit(1_000_000))
        .cast("long")
        .alias("dur_s"),
    )
    per_user = per_session.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("dur_s").cast("long").alias("longest_s"),
    )
    return (
        per_user.groupBy("n_sessions")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("events"),
            F.max("longest_s").alias("max_session_s"),
        )
        .orderBy("n_sessions")
    )


QUERIES["a22_sessionize"] = a22_sessionize
ORACLE["a22_sessionize"] = f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
    flagged AS (
      SELECT user_id, us,
             CASE WHEN us - LAG(us) OVER
                    (PARTITION BY user_id ORDER BY us, user_id)
                    > {SESSION_GAP_MIN * 60 * 1_000_000}
                  OR LAG(us) OVER
                    (PARTITION BY user_id ORDER BY us, user_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM ev),
    sess AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, user_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    per_session AS (
      SELECT user_id, sid, COUNT(*) AS n_events,
             CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS dur_s
      FROM sess GROUP BY user_id, sid),
    per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             MAX(dur_s) AS longest_s
      FROM per_session GROUP BY user_id)
    SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS events,
           MAX(longest_s) AS max_session_s
    FROM per_user GROUP BY n_sessions ORDER BY n_sessions"""


# A23 — interval union / overlap merge: per supplier, each lineitem opens a
# transit window [ship_date, ship_date + quantity days]; overlapping or
# touching windows merge into maximal covered islands (the interval twin of
# a22's point-event sessionization — a22 splits on GAPS between instants,
# a23 unions true [start, end] spans). The canonical uses are calendar
# coverage (when was ANY shipment of this supplier in transit), SLA windows,
# and validity-interval flattening before an SCD2 build (a12).
#
# Plan shape (scale posture): one window pass partitioned by supplier — the
# running MAX(end) over preceding rows marks island starts (an interval
# starts a new island iff it begins strictly after everything before it has
# ended), a running SUM of those flags numbers the islands, then two hash
# aggs (island extent -> per-supplier report). One shuffle keyed by the
# high-cardinality supplier key, partial-agg absorbed; no self-join, no
# range join, nothing quadratic — the same plan at 100 TB. The window's
# ORDER BY carries (start, end, orderkey, linenumber) so row order is total
# and both engines see identical running maxima.
def a23_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supp"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lno"),
        F.to_date("l_shipdate").alias("start_d"),
        F.date_add(
            F.to_date("l_shipdate"), F.col("l_quantity").cast("int")
        ).alias("end_d"),
    )
    w = Window.partitionBy("supp").orderBy("start_d", "end_d", "okey", "lno")
    prev_max_end = F.max("end_d").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = li.withColumn(
        "new_i",
        F.when(
            prev_max_end.isNull() | (F.col("start_d") > prev_max_end),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "iid",
        F.sum("new_i").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("supp", "iid").agg(
        F.count("*").alias("n_raw"),
        F.min("start_d").alias("i_start"),
        F.max("end_d").alias("i_end"),
    )
    return (
        per_island.groupBy("supp")
        .agg(
            F.sum("n_raw").cast("long").alias("n_windows"),
            F.count("*").cast("long").alias("n_merged"),
            F.sum(F.datediff("i_end", "i_start"))
            .cast("long")
            .alias("covered_days"),
            F.max(F.datediff("i_end", "i_start"))
            .cast("long")
            .alias("longest_days"),
        )
        .orderBy("supp")
    )


QUERIES["a23_interval_merge"] = a23_interval_merge
ORACLE["a23_interval_merge"] = """
    WITH iv AS (
      SELECT l_suppkey AS supp, l_orderkey AS okey, l_linenumber AS lno,
             CAST(l_shipdate AS DATE) AS start_d,
             CAST(l_shipdate AS DATE) + CAST(l_quantity AS INTEGER) AS end_d
      FROM lineitem),
    flagged AS (
      SELECT supp, start_d, end_d,
             CASE WHEN MAX(end_d) OVER (
                    PARTITION BY supp ORDER BY start_d, end_d, okey, lno
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR start_d > MAX(end_d) OVER (
                    PARTITION BY supp ORDER BY start_d, end_d, okey, lno
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_i,
             okey, lno
      FROM iv),
    islands AS (
      SELECT supp, start_d, end_d,
             SUM(new_i) OVER (
               PARTITION BY supp ORDER BY start_d, end_d, okey, lno
               ROWS UNBOUNDED PRECEDING) AS iid
      FROM flagged),
    per_island AS (
      SELECT supp, iid, COUNT(*) AS n_raw, MIN(start_d) AS i_start,
             MAX(end_d) AS i_end
      FROM islands GROUP BY supp, iid)
    SELECT supp, CAST(SUM(n_raw) AS BIGINT) AS n_windows,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(date_diff('day', i_start, i_end)) AS BIGINT)
             AS covered_days,
           CAST(MAX(date_diff('day', i_start, i_end)) AS BIGINT)
             AS longest_days
    FROM per_island GROUP BY supp ORDER BY supp"""
