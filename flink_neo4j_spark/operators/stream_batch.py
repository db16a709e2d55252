"""Conformance wrappers for the streaming extension: each runs a REAL
Structured Streaming query (AvailableNow trigger) or the batch twin of a
stateful operator, with DuckDB oracles proving batch/stream parity."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

SESSION_GAP_MINUTES = 30


def w1_stream_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling-window rollup executed through Structured Streaming
    (foreachBatch parquet sink, complete mode); must equal the batch
    GROUP BY."""
    from flink_neo4j_spark.streaming.windows import run_daily_available_now

    return run_daily_available_now(spark, sf_dir)


def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via window functions (batch form of the
    stateful streaming sessionizer)."""
    from flink_neo4j_spark.streaming.windows import sessionize_batch

    return sessionize_batch(load_table(spark, sf_dir, "events"), SESSION_GAP_MINUTES)


def w3_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24h/12h sliding-window rollup through Structured Streaming; each
    event contributes to exactly two overlapping windows."""
    from flink_neo4j_spark.streaming.windows import run_sliding_available_now

    return run_sliding_available_now(spark, sf_dir)


def w4_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup over keyed state; must equal batch COUNT(DISTINCT)."""
    from flink_neo4j_spark.streaming.windows import run_dedup_available_now

    return run_dedup_available_now(spark, sf_dir)


def w5_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click->purchase attribution) with
    watermark-bounded state on both sides; must equal the batch interval
    join."""
    from flink_neo4j_spark.streaming.windows import run_interval_join_available_now

    return run_interval_join_available_now(spark, sf_dir)


def w6_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day trending top-k event types: streaming windowed counts +
    batch re-rank of the final complete-mode state."""
    from flink_neo4j_spark.streaming.windows import run_trending_available_now

    return run_trending_available_now(spark, sf_dir)


def w7_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (event stream x customer->nation dim) +
    per-nation daily rollup; must equal the batch three-way join."""
    from flink_neo4j_spark.streaming.windows import run_enrich_available_now

    return run_enrich_available_now(spark, sf_dir)


def w8_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: matched clicks emit eagerly,
    unmatched clicks emit null-padded once the watermark passes their match
    horizon. The oracle restates the watermark cutoff explicitly: an
    unmatched click appears iff click_ts + attribution horizon is strictly
    before the final global watermark (min of both sides' max event time,
    minus the watermark delay)."""
    from flink_neo4j_spark.streaming.windows import (
        run_interval_left_join_available_now,
    )

    return run_interval_left_join_available_now(spark, sf_dir)


def w9_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` sessionizer through a real append-mode
    streaming run: the state store merges per-event windows per user and
    the watermark closes (emits) a session once no event can extend it.
    Emission boundary verified exact at sf0.001/sf0.01: a session emits iff
    last_event + gap < final watermark (global max event time - 1 day) —
    the oracle restates that cutoff over the batch sessionization. Session
    start is compared as epoch micros (exact integers)."""
    from flink_neo4j_spark.streaming.windows import (
        run_session_window_available_now,
    )

    out = run_session_window_available_now(spark, sf_dir)
    return out.select(
        "user_id",
        F.unix_micros("start").alias("start_us"),
        "n_events",
        "session_value",
    ).orderBy("user_id", "start_us")


def w10_stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained streaming aggregation (hourly tumbling counts re-aggregated
    to daily inside ONE streaming query — two stateful operators) in
    append mode. Integer-only aggregates, so the two-level rollup equals
    the one-level batch GROUP BY exactly; the oracle restates the append
    cutoff (a day emits iff its end has been passed by the final
    watermark, max event time minus the 1h delay)."""
    from flink_neo4j_spark.streaming.windows import run_chained_available_now

    return run_chained_available_now(spark, sf_dir)


def w11_stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert materialization: the stream maintained as a keyed
    latest-state parquet snapshot, merged per micro-batch (ping-pong
    publish). Final state == batch argmax over the full log by
    (ts, event_id) — the micro-batching must not be observable."""
    from flink_neo4j_spark.streaming.windows import (
        run_cdc_upsert_available_now,
    )

    out = run_cdc_upsert_available_now(spark, sf_dir)
    return out.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
    ).orderBy("user_id")


def w12_stream_wm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-expiring streaming dedup (dropDuplicatesWithinWatermark) run
    end-to-end; per-type distinct-user counts over the sink must equal the
    batch COUNT(DISTINCT) (survivor-choice-invariant)."""
    from flink_neo4j_spark.streaming.windows import run_wm_dedup_available_now

    return run_wm_dedup_available_now(spark, sf_dir)


def w13_stream_daily_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT streaming COUNT(DISTINCT user) per day via two chained
    stateful aggregations (collapse-to-key then count) — must equal the
    batch COUNT(DISTINCT) for every day fully passed by the final
    watermark."""
    from flink_neo4j_spark.streaming.windows import (
        run_daily_distinct_available_now,
    )

    return run_daily_distinct_available_now(spark, sf_dir)


def w14_stream_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful quota kernel (applyInPandasWithState): admit at most
    K events per (user, day), earliest first; must equal the batch
    row_number() <= K selection on the finite replay."""
    from flink_neo4j_spark.streaming.windows import (
        run_rate_limit_available_now,
    )

    return run_rate_limit_available_now(spark, sf_dir)


def w15_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user anomaly alerts scored against prior history only
    (prefix mean/std from int64 sufficient statistics in state); must equal
    the batch prefix-window z-score on the finite replay."""
    from flink_neo4j_spark.streaming.windows import run_anomaly_available_now

    return run_anomaly_available_now(spark, sf_dir)


QUERIES: dict[str, QueryFn] = {
    "w15_stream_anomaly": w15_stream_anomaly,
    "w14_stream_rate_limit": w14_stream_rate_limit,
    "w13_stream_daily_distinct": w13_stream_daily_distinct,
    "w12_stream_wm_dedup": w12_stream_wm_dedup,
    "w11_stream_cdc_upsert": w11_stream_cdc_upsert,
    "w10_stream_chained_agg": w10_stream_chained_agg,
    "w1_stream_daily": w1_stream_daily,
    "w9_stream_session_window": w9_stream_session_window,
    "w8_stream_left_outer": w8_stream_left_outer,
    "w7_stream_static_enrich": w7_stream_static_enrich,
    "w2_sessionize": w2_sessionize,
    "w3_stream_sliding": w3_stream_sliding,
    "w4_stream_dedup": w4_stream_dedup,
    "w5_stream_interval_join": w5_stream_interval_join,
    "w6_stream_trending": w6_stream_trending,
}

ORACLE: dict[str, str] = {
    "w15_stream_anomaly": """
        WITH c AS (
          SELECT user_id, ts, event_id,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events),
        pre AS (
          SELECT user_id, event_id, cents,
                 COUNT(*) OVER w AS pn,
                 COALESCE(SUM(cents) OVER w, 0) AS ps,
                 COALESCE(SUM(cents * cents) OVER w, 0) AS pss
          FROM c
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT user_id, event_id,
               ROUND(CAST(cents * pn - ps AS DOUBLE)
                     / sqrt(CAST(pn * pss - ps * ps AS DOUBLE)), 2) + 0.0
                 AS z
        FROM pre
        WHERE pn >= 10 AND pn * pss - ps * ps > 0
          AND ABS(CAST(cents * pn - ps AS DOUBLE)
                  / sqrt(CAST(pn * pss - ps * ps AS DOUBLE))) > 3.0
        ORDER BY user_id, event_id""",
    "w14_stream_rate_limit": """
        SELECT user_id, CAST(ts AS DATE) AS day, event_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts, event_id) AS BIGINT) AS admit_rank
        FROM events
        QUALIFY admit_rank <= 5
        ORDER BY user_id, day, admit_rank""",
    "w13_stream_daily_distinct": """
        WITH mx AS (
          SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events)
        SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
               COUNT(DISTINCT e.user_id) AS distinct_users,
               COUNT(*) AS n_events
        FROM events e, mx
        WHERE date_trunc('day', CAST(e.ts AS TIMESTAMP)) + INTERVAL 1 DAY
              <= mx.m - INTERVAL 1 HOUR
        GROUP BY 1 ORDER BY 1""",
    "w12_stream_wm_dedup": """
        SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users
        FROM events GROUP BY event_type ORDER BY event_type""",
    "w11_stream_cdc_upsert": """
        WITH ranked AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                 event_id, event_type, ROUND(value, 2) AS value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, ts_us, event_id, event_type, value
        FROM ranked WHERE rn = 1 ORDER BY user_id""",
    "w10_stream_chained_agg": """
        WITH mx AS (
          SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events)
        SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
               e.event_type, COUNT(*) AS cnt
        FROM events e, mx
        WHERE date_trunc('day', CAST(e.ts AS TIMESTAMP)) + INTERVAL 1 DAY
              <= mx.m - INTERVAL 1 HOUR
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "w7_stream_static_enrich": """
        SELECT n_name AS nation_name, CAST(ts AS DATE) AS day,
               COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "w6_stream_trending": """
        WITH counts AS (
          SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT day, event_type, cnt,
                 ROW_NUMBER() OVER (PARTITION BY day
                                    ORDER BY cnt DESC, event_type) AS rnk
          FROM counts)
        SELECT day, event_type, cnt, rnk FROM ranked
        WHERE rnk <= 3 ORDER BY day, rnk""",
    "w1_stream_daily": """
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS total
        FROM events GROUP BY user_id, CAST(ts AS DATE)
        ORDER BY user_id, day""",
    "w2_sessionize": f"""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
          FROM events
        ), flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id))
                      > {SESSION_GAP_MINUTES} * 60 * 1000000
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                 THEN 1 ELSE 0 END AS is_new
          FROM e
        ), sessions AS (
          SELECT user_id, value,
                 -- CAST: DuckDB windowed SUM(INT) is HUGEINT -> pandas
                 -- float64, which breaks the driver value-hash vs bigint
                 CAST(SUM(is_new) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id""",
    # each event belongs to the two epoch-aligned 12h-grid window starts
    # whose 24h span covers it: floor_12h(ts) and floor_12h(ts) - 12h —
    # exactly Spark's window(ts, '1 day', '12 hours') assignment.
    "w3_stream_sliding": """
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        ), b AS (
          SELECT user_id, value,
                 (CAST(epoch(ts) AS BIGINT) // 43200) * 43200 AS bucket
          FROM e
        ), w AS (
          SELECT user_id, value,
                 unnest([bucket, bucket - 43200]) AS win_epoch
          FROM b
        )
        SELECT user_id,
               strftime(to_timestamp(win_epoch), '%Y-%m-%d %H:%M:%S') AS win_start,
               COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS total
        FROM w
        GROUP BY user_id, win_epoch
        ORDER BY user_id, win_start""",
    "w4_stream_dedup": """
        SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users
        FROM events GROUP BY event_type ORDER BY event_type""",
    "w9_stream_session_window": f"""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
          FROM events),
        flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {SESSION_GAP_MINUTES} * 60 * 1000000
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts, value,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged),
        rolled AS (
          SELECT user_id, MIN(ts) AS start, MAX(ts) AS last_ts,
                 COUNT(*) AS n_events,
                 ROUND(SUM(value), 2) AS session_value
          FROM sess GROUP BY user_id, sid),
        wm AS (SELECT MAX(ts) - INTERVAL 1 DAY AS final_wm FROM e)
        SELECT user_id, epoch_us(start) AS start_us,
               n_events, session_value
        FROM rolled, wm
        WHERE last_ts + INTERVAL {SESSION_GAP_MINUTES} MINUTE < final_wm
        ORDER BY user_id, start_us""",
    "w8_stream_left_outer": """
        WITH c AS (SELECT event_id AS click_id, user_id,
                          CAST(ts AS TIMESTAMP) AS click_ts
                   FROM events WHERE event_type = 'click'),
        b AS (SELECT event_id AS buy_id, user_id,
                     CAST(ts AS TIMESTAMP) AS buy_ts
              FROM events WHERE event_type = 'purchase'),
        wm AS (SELECT LEAST((SELECT MAX(click_ts) FROM c),
                            (SELECT MAX(buy_ts) FROM b))
                      - INTERVAL 2 HOUR AS final_wm)
        SELECT c.user_id AS user_id, click_id, buy_id,
               epoch_us(buy_ts) - epoch_us(click_ts) AS lag_us
        FROM c JOIN b ON c.user_id = b.user_id
         AND buy_ts >= click_ts AND buy_ts <= click_ts + INTERVAL 1 HOUR
        UNION ALL
        SELECT c.user_id, click_id, NULL, NULL
        FROM c CROSS JOIN wm
        WHERE NOT EXISTS (
            SELECT 1 FROM b WHERE b.user_id = c.user_id
              AND b.buy_ts >= c.click_ts
              AND b.buy_ts <= c.click_ts + INTERVAL 1 HOUR)
          AND c.click_ts + INTERVAL 1 HOUR < wm.final_wm
        ORDER BY user_id, click_id, buy_id""",
    "w5_stream_interval_join": """
        WITH c AS (SELECT event_id AS click_id, user_id,
                          CAST(ts AS TIMESTAMP) AS click_ts
                   FROM events WHERE event_type = 'click'),
        b AS (SELECT event_id AS buy_id, user_id,
                     CAST(ts AS TIMESTAMP) AS buy_ts
              FROM events WHERE event_type = 'purchase')
        SELECT c.user_id AS user_id, click_id, buy_id,
               epoch_us(buy_ts) - epoch_us(click_ts) AS lag_us
        FROM c JOIN b ON c.user_id = b.user_id
         AND buy_ts >= click_ts AND buy_ts <= click_ts + INTERVAL 1 HOUR
        ORDER BY c.user_id, click_id, buy_id""",
}


def w16_stream_batch_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda-architecture drift audit: the streaming daily rollup (real
    topology, parquet sink) full-outer-joined against its batch twin; the
    oracle states zero drift, so any stream/batch divergence is a red
    conformance row."""
    from flink_neo4j_spark.streaming.windows import (
        run_reconcile_available_now,
    )

    return run_reconcile_available_now(spark, sf_dir)


QUERIES["w16_stream_batch_reconcile"] = w16_stream_batch_reconcile
ORACLE["w16_stream_batch_reconcile"] = """
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(0 AS BIGINT) AS stream_only,
           CAST(0 AS BIGINT) AS batch_only
    FROM (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
          FROM events GROUP BY 1, 2)
    GROUP BY day ORDER BY day"""
