"""Streaming extension tests: batch/stream parity for the daily rollup,
append-mode watermark semantics, and sessionization sanity."""

from __future__ import annotations

import uuid

from flink_neo4j_spark.catalog import load_table
from flink_neo4j_spark.streaming.windows import (
    read_events_stream,
    run_daily_available_now,
    sessionize_batch,
    tumbling_daily,
)
from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_stream_daily_matches_batch(spark):
    streamed = run_daily_available_now(spark, SF_DIR)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_append_mode_watermark_emits_closed_windows_only(spark):
    """Append mode emits only windows the watermark has passed; on a finite
    replay the final window(s) stay open -> result is a subset of batch."""
    sink = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_daily(read_events_stream(spark, SF_DIR), watermark="1 hour")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    appended = {tuple(r) for r in spark.table(sink).collect()}
    batch = {
        tuple(r)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert appended <= batch
    assert len(appended) < len(batch)  # open tail windows withheld


def test_dedup_within_watermark_plumbing(spark):
    """At-scale dedup form: state-expiring dropDuplicatesWithinWatermark.
    On a finite replay every distinct key is emitted at least once, and the
    emitted count is bounded by [distinct, total] (late out-of-horizon
    duplicates may legitimately re-emit)."""
    from flink_neo4j_spark.streaming.windows import dedup_within_watermark

    sink = f"wmdedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_within_watermark(
            read_events_stream(spark, SF_DIR), ["user_id", "event_type"]
        )
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    emitted = [(r.user_id, r.event_type) for r in spark.table(sink).collect()]
    events = load_table(spark, SF_DIR, "events")
    distinct = {
        (r.user_id, r.event_type)
        for r in events.select("user_id", "event_type").distinct().collect()
    }
    assert set(emitted) == distinct
    assert len(distinct) <= len(emitted) <= events.count()


def test_sessionize_batch_properties(spark):
    events = load_table(spark, SF_DIR, "events")
    sessions = sessionize_batch(events, 30)
    total_events = sessions.agg(F.sum("n_events")).first()[0]
    assert total_events == events.count()  # partition of the event set
    per_user_events = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    per_user_sessions = {
        r["user_id"]: r["n"]
        for r in sessions.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for uid, n_sessions in per_user_sessions.items():
        assert 1 <= n_sessions <= per_user_events[uid]


def test_stateful_stream_sessionize_matches_batch_closed_sessions(spark):
    """applyInPandasWithState sessionizer: on a finite replay the emitted
    (closed) sessions are exactly the batch sessions minus each user's open
    tail session."""
    import uuid as _uuid

    from flink_neo4j_spark.streaming.windows import sessionize_stream

    sink = f"sess_{_uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(read_events_stream(spark, SF_DIR), 30)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    streamed = {tuple(r) for r in spark.table(sink).collect()}

    batch = sessionize_batch(load_table(spark, SF_DIR, "events"), 30)
    last = {
        r["user_id"]: r["m"]
        for r in batch.groupBy("user_id").agg(F.max("session_id").alias("m")).collect()
    }
    expected = {
        (r["user_id"], r["session_id"], r["n_events"], r["session_value"])
        for r in batch.collect()
        if r["session_id"] != last[r["user_id"]]
    }
    assert streamed == expected


def test_streaming_cypher_sink_spools_all_rows(spark, tmp_path):
    """The streaming Cypher sink (foreachBatch over the batch writer) must
    deliver every stream row through the transport exactly once on a clean
    AvailableNow run, with the same generated UNWIND template as batch."""
    from flink_neo4j_spark.sources.cypher import CypherSinkBuilder
    from flink_neo4j_spark.sources.transport import FileTransport
    from flink_neo4j_spark.streaming.windows import read_events_stream

    spool = str(tmp_path / "spool")
    stream = read_events_stream(spark, SF_DIR).select(
        "event_id", "user_id", "event_type"
    )
    start = (
        CypherSinkBuilder()
        .set_transport_factory(lambda: FileTransport(spool))
        .set_label("Event")
        .set_task_batch_size(500)
        .finish_streaming()
    )
    q = start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()

    stored = FileTransport(spool).batches()
    rows = [r for b in stored for r in b["rows"]]
    expected = load_table(spark, SF_DIR, "events").count()
    assert len(rows) == expected
    assert all(b["statement"].startswith("UNWIND $rows AS r") for b in stored)
    assert all(len(b["rows"]) <= 500 for b in stored)
    ids = sorted(r["event_id"] for r in rows)
    assert len(set(ids)) == expected  # no duplicates on a clean run


def test_builtin_session_window_matches_batch_closed_sessions(spark):
    """The built-in session_window operator must emit exactly the batch
    sessionizer's CLOSED sessions (same bounds and rollups); tail sessions
    stay open on a finite replay."""
    from flink_neo4j_spark.streaming.windows import (
        run_session_window_available_now,
    )

    streamed = {
        (r["user_id"], r["start"], r["n_events"], r["session_value"])
        for r in run_session_window_available_now(spark, SF_DIR).collect()
    }
    assert streamed, "no sessions emitted"

    # independent batch twin with session bounds: gap-flag cumsum windows
    batch = load_table(spark, SF_DIR, "events").selectExpr(
        "user_id", "ts", "event_id", "value"
    )
    batch.createOrReplaceTempView("ev")
    batch_sessions = spark.sql("""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL '30' MINUTE
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, value,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged)
        SELECT user_id, MIN(ts) AS start, MAX(ts) AS last_ts,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM sessions GROUP BY user_id, sid
    """)
    rows = batch_sessions.collect()
    allb = {
        (r["user_id"], r["start"], r["n_events"], r["session_value"]): r["last_ts"]
        for r in rows
    }
    assert streamed <= set(allb)
    # closure model: a session is emitted iff the final watermark (global
    # max event time - 1 day) has passed its end (last event + gap)
    import datetime

    max_ts = max(r["last_ts"] for r in rows)
    wm = max_ts - datetime.timedelta(days=1)
    gap = datetime.timedelta(minutes=30)
    closed = {k for k, last in allb.items() if last + gap < wm}
    missing = set(allb) - streamed
    # every emitted session is closed-by-watermark; every session the
    # watermark passed well clear of the boundary was emitted
    assert streamed <= {k for k, last in allb.items() if last + gap <= max_ts}
    assert closed <= streamed, f"closed-but-unemitted: {sorted(closed - streamed)[:3]}"
    assert all(allb[k] + gap >= wm for k in missing), (
        f"unemitted sessions outside the watermark tail: "
        f"{sorted(k for k in missing if allb[k] + gap < wm)[:3]}"
    )


def test_daily_distinct_two_stateful_operators(spark):
    """w13's exact-distinct topology must chain TWO stateful aggregations
    in one query (collapse-to-key, then count) and equal the batch
    COUNT(DISTINCT) for fully-final days."""
    from flink_neo4j_spark.catalog import load_table
    from flink_neo4j_spark.streaming.windows import (
        run_daily_distinct_available_now,
    )

    from .conftest import SF_DIR

    out = run_daily_distinct_available_now(spark, SF_DIR)
    rows = {r["day"]: (r["distinct_users"], r["n_events"]) for r in out.collect()}
    assert rows
    e = load_table(spark, SF_DIR, "events")
    import pyspark.sql.functions as F

    batch = {
        r["day"]: (r["du"], r["n"])
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("du"), F.count("*").alias("n")
        )
        .collect()
    }
    for day, vals in rows.items():
        assert batch[day] == vals


def test_rate_limit_quota_and_order(spark):
    """w14: no key exceeds the quota; admitted events are each key's
    earliest by (ts, event_id); admit_rank is dense 1..n."""
    from flink_neo4j_spark.catalog import load_table
    from flink_neo4j_spark.streaming.windows import (
        RATE_LIMIT_K,
        run_rate_limit_available_now,
    )

    from .conftest import SF_DIR

    out = run_rate_limit_available_now(spark, SF_DIR).collect()
    assert out
    per_key: dict = {}
    for r in out:
        per_key.setdefault((r["user_id"], r["day"]), []).append(
            (r["admit_rank"], r["event_id"])
        )
    import pyspark.sql.functions as F

    e = load_table(spark, SF_DIR, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts", "event_id"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    expect: dict = {}
    for r in (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= RATE_LIMIT_K)
        .collect()
    ):
        expect.setdefault((r["user_id"], r["day"]), []).append(
            (r["rn"], r["event_id"])
        )
    for key, rows in per_key.items():
        assert len(rows) <= RATE_LIMIT_K
        assert sorted(rows) == sorted(expect[key])
    assert set(per_key) == set(expect)


def test_anomaly_prefix_causality(spark):
    """w15 alerts must be scored on PRIOR history only: recomputing each
    flagged event's z from the batch prefix stats reproduces it exactly,
    and no alert exists with fewer than ANOM_MIN_N prior events."""
    from flink_neo4j_spark.catalog import load_table
    from flink_neo4j_spark.streaming.windows import (
        ANOM_MIN_N,
        ANOM_Z,
        run_anomaly_available_now,
    )

    from .conftest import SF_DIR

    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    out = {
        (r["user_id"], r["event_id"]): r["z"]
        for r in run_anomaly_available_now(spark, SF_DIR).collect()
    }
    assert out
    e = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = e.select(
        "user_id", "event_id", "c",
        F.count("*").over(w).alias("pn"),
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("ps"),
        F.coalesce(F.sum(F.col("c") * F.col("c")).over(w), F.lit(0)).alias("pss"),
    )
    z = (F.col("c") * F.col("pn") - F.col("ps")).cast("double") / F.sqrt(
        (F.col("pn") * F.col("pss") - F.col("ps") * F.col("ps")).cast("double")
    )
    expect = {
        (r["user_id"], r["event_id"]): r["z"]
        for r in pre.filter(
            (F.col("pn") >= ANOM_MIN_N)
            & (F.col("pn") * F.col("pss") - F.col("ps") * F.col("ps") > 0)
            & (F.abs(z) > ANOM_Z)
        )
        .select("user_id", "event_id", (F.round(z, 2) + F.lit(0.0)).alias("z"))
        .collect()
    }
    assert out == expect


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Exactly-once across restarts: run a streaming rollup to a file sink
    with AvailableNow, add NEW source files, restart the query from the
    SAME checkpoint — the second run must process only the new files (no
    re-emission of batch-0 state in append mode, no duplicated rows), and
    the union must equal the batch rollup over all files."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).write.mode("append").parquet(src)

    import datetime as dt

    day1 = dt.datetime(2024, 1, 1, 10, 0, 0)
    day2 = dt.datetime(2024, 1, 3, 10, 0, 0)  # past day1's watermark
    write_batch([(1, day1, 1.0), (1, day1, 2.0), (2, day1, 5.0)])

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(src)
            .withWatermark("ts", "1 day")
            .groupBy("user_id", F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
            .select("user_id", F.col("w.start").cast("date").alias("day"), "cnt", "total")
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    run_once()
    # second wave: new day advances the watermark past day1, finalizing it
    write_batch([(1, day2, 10.0), (2, day2, 20.0)])
    run_once()
    write_batch([(2, dt.datetime(2024, 1, 5, 10, 0, 0), 7.0)])
    run_once()

    got = {
        (r["user_id"], str(r["day"])): (r["cnt"], r["total"])
        for r in spark.read.parquet(out).collect()
    }
    # day1 and day2 are watermark-final; each appears EXACTLY once
    assert got[(1, "2024-01-01")] == (2, 3.0)
    assert got[(2, "2024-01-01")] == (1, 5.0)
    assert got[(1, "2024-01-03")] == (1, 10.0)
    assert got[(2, "2024-01-03")] == (1, 20.0)
    rows = spark.read.parquet(out).count()
    assert rows == len(got)  # no duplicated emissions across restarts


def test_rate_limit_carry_across_chunks():
    """The w14 admission kernel's cross-chunk state carry: a day's quota
    fills across two Arrow chunks/micro-batches; a new day resets; a LATE
    chunk for an already-passed day re-admits (documented arrival-order
    semantics — you cannot un-admit past events on a live stream)."""
    import datetime as dt

    import pandas as pd

    from flink_neo4j_spark.streaming.windows import _admit_chunk

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)

    def chunk(rows):
        return pd.DataFrame(
            [
                {
                    "user_id": 1,
                    "day": day,
                    "ts": pd.Timestamp(day) + pd.Timedelta(seconds=s),
                    "event_id": e,
                }
                for day, s, e in rows
            ]
        )

    k = 3
    # chunk 1: two events on d1 -> both admit, state carries n=2
    out, so, sn = _admit_chunk(chunk([(d1, 1, 10), (d1, 2, 11)]), k, -1, 0, 1)
    assert list(out["admit_rank"]) == [1, 2] and sn == 2
    # chunk 2: three more on d1 -> only ONE slot left (carry), then d2
    # resets and admits from rank 1
    out, so, sn = _admit_chunk(
        chunk([(d1, 3, 12), (d1, 4, 13), (d2, 1, 20)]), k, so, sn, 1
    )
    assert list(zip(out["event_id"], out["admit_rank"])) == [(12, 3), (20, 1)]
    assert sn == 1  # one admitted on the open day d2
    # chunk 3: late d1 arrival AFTER d2 opened -> d1's counter was reset
    # when the state moved on, and processing d1 rewinds the state day, so
    # the following d2 run ALSO restarts at rank 1 (the sequential
    # per-day loop this kernel replaces behaved identically: only the
    # single open day ever carries — arrival-order semantics)
    out, so, sn = _admit_chunk(chunk([(d1, 9, 14), (d2, 2, 21)]), k, so, sn, 1)
    assert list(zip(out["event_id"], out["admit_rank"])) == [(14, 1), (21, 1)]
    # mid-chunk day run equal to an OLD state day must not inherit carry:
    # state is on d2 with quota full
    out, so, sn = _admit_chunk(chunk([(d2, 3, 22)]), 1, so, 1, 1)
    assert out is None and sn == 1
