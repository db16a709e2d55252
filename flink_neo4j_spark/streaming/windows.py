"""Event-time windowing over the events stream.

Batch-parity design: every streaming aggregation here has a batch twin whose
results it must reproduce when run with ``Trigger.AvailableNow`` over the
same files (tested in ``tests/test_streaming.py``; the daily rollup is also a
conformance query with a DuckDB oracle). At scale the same topology runs
against a Kafka/file-drop source with watermark-bounded state instead of a
static directory — the code below only changes its ``readStream`` line.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_neo4j_spark.catalog import load_table, normalize_event_ts
from flink_neo4j_spark.session import apply_runtime_confs


def _events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Streaming file sources require an explicit schema (they never infer).
    The generator has stored ``ts`` as int64-nanos in one round and
    TIMESTAMP(MICROS, NTZ) in another, so the schema is taken from a
    driver-side batch footer read of the same file — a metadata-only
    operation — instead of being hard-coded to one unit. The stale
    hard-coded LongType schema was the root cause of the round-2 streaming
    failures: micros read as Long then div-1000 compressed event time 1000x.

    Memoized per (session, sf_dir) like ``catalog.load_table``'s plan cache:
    the footer read costs ~250 ms of JVM round-trips and the RAW (pre-
    normalization) schema cannot come from the batch cache, whose ``ts`` is
    already converted.
    """
    cache = spark.__dict__.setdefault("_fns_stream_schema_cache", {})
    key = os.path.abspath(sf_dir)
    schema = cache.get(key)
    if schema is None:
        schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
        cache[key] = schema
    return schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream, with ``ts`` normalized to a
    session-UTC ``timestamp`` by the same shared helper as the batch catalog
    (``catalog.normalize_event_ts``) so batch/stream parity holds by
    construction whatever unit the file stores."""
    apply_runtime_confs(spark)
    schema = _events_raw_schema(spark, sf_dir)
    # the file source requires a directory or glob (not a bare file path);
    # the glob also scopes basePath to sf_dir so only events files match
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(os.path.join(sf_dir, "events.parque[t]"))
    )
    # stash the data-derived state widths for _start_with_state_partitions
    # (the runners hold no sf_dir by the time the query starts); the
    # pykernel width serves the applyInPandasWithState topologies
    spark.__dict__["_fns_stream_state_width"] = _stream_state_partitions(
        spark, sf_dir
    )
    spark.__dict__["_fns_pykernel_state_width"] = _stream_state_partitions(
        spark, sf_dir, PYKERNEL_ROWS_PER_STATE_PARTITION
    )
    return normalize_event_ts(raw)


def tumbling_daily(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Per-user daily tumbling window: count + sum(value). The watermark
    bounds state for append-mode sinks; complete-mode parity runs ignore it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", "1 day").alias("win"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id", F.col("win.start").cast("date").alias("day"), "cnt", "total"
        )
    )


#: state sizing for streaming queries. The shuffle-partition conf in
#: force when a streaming query STARTS becomes its state-store partition
#: count for the checkpoint's lifetime, and every micro-batch commits one
#: delta file per partition per store (a stream-stream join keeps FOUR
#: stores per partition) — so the count must track the stream's data
#: volume, not the batch shuffle default (round 3 measured 7.8 s -> 2.6 s
#: on w5 from 32 -> 8; round 9 re-measured the fixed 8 against a
#: data-derived width: w10 12.8 -> 3.8 s, w13 7.1 -> 3.7 s, w1
#: 5.3 -> 2.1 s at sf0.1). The width is now DERIVED from the replayed
#: table's row count (~rows/2M, the same sizing rule as
#: ``tuning.iter_kernel``), floored at 2 and capped at the session width,
#: so a big replay gets wide state and the local bench is not charged 8
#: state-commit cycles for a 100k-row replay. Production topologies pick
#: the width deliberately per throughput and must keep it stable across
#: restarts of the same checkpoint — every run here starts a fresh
#: checkpoint, so deriving per run is restart-safe.
STREAM_ROWS_PER_STATE_PARTITION = 2_000_000
STREAM_MIN_STATE_PARTITIONS = 2

#: ``applyInPandasWithState`` topologies size differently: there the
#: shuffle width is ALSO the PYTHON-KERNEL parallelism — each partition's
#: groups cross the Arrow boundary and run the vectorized kernel
#: serially, so a state-commit-optimal width starves the kernel of cores
#: the moment the replay grows. Measured at derived sf1 (1M events): the
#: rows/2M rule gave width 2 and w14/w15 read 31/27 s solo vs 11/9 s at
#: the pre-round fixed width 8 — a pure parallelism loss, not state-store
#: cost. The width curve is monotone down to ~16k rows/partition at BOTH
#: measured decades (sf1 warm solo: w14 9.96 s at 125k/partition → 7.49 s
#: at 62.5k → 5.26 s at 31.25k [the 32-core cap] — w15 7.81 → 6.39 →
#: 4.07 s; sf0.1: w14 4.51 s at the width-2 floor → 2.83 s at width 4 →
#: 2.50 s at width 7, w15 3.94 → 2.43 → 2.11 s, flattening below ~31k),
#: so the constant targets kernel-core saturation, not shuffle bytes:
#: 15,625 rows/partition reaches a 32-core session's cap by a 500k-row
#: replay, leaves the sf0.001/0.01 conformance replays at the width-2
#: floor, and the session-width cap keeps the top end scale-adaptive.
PYKERNEL_ROWS_PER_STATE_PARTITION = 15_625


def _stream_state_partitions(
    spark: SparkSession,
    sf_dir: str,
    rows_per_partition: int = STREAM_ROWS_PER_STATE_PARTITION,
) -> int:
    from flink_neo4j_spark.catalog import load_table
    from flink_neo4j_spark.tuning import memoized_count

    n = memoized_count(
        spark,
        ("events", os.path.abspath(sf_dir)),
        load_table(spark, sf_dir, "events"),
    )
    try:
        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        cap = 200
    return max(
        STREAM_MIN_STATE_PARTITIONS,
        min(cap, -(-n // rows_per_partition)),
    )


#: Per-topology streaming progress of the LAST completed run, keyed by the
#: runner's sink name: the raw ``recentProgress`` dicts Spark reports
#: (micro-batch count, state operators, rows per batch). This is the
#: w-family's structural freeze surface — ``tests/test_stream_budgets.py``
#: pins micro-batch counts and state-operator topology per query, so a
#: refactor that silently adds a micro-batch or a state store fails a
#: budget test instead of showing up as an unexplained wall-time drift
#: (round-5's w1 1.12→1.84 s flag).
LAST_RUN_PROGRESS: dict[str, list] = {}


def _capture_progress(name: str, q) -> None:
    try:
        LAST_RUN_PROGRESS[name] = [dict(p) for p in q.recentProgress]
    except Exception:
        LAST_RUN_PROGRESS[name] = []


def _start_with_state_partitions(
    spark: SparkSession, start_fn, pykernel: bool = False
):
    """Start a streaming query with the state-sized shuffle-partition conf,
    restoring the batch setting afterwards (the value is captured at query
    start, so restoring immediately after is safe). ``pykernel=True``
    selects the applyInPandasWithState width (the shuffle width is the
    Python-kernel parallelism there — see
    ``PYKERNEL_ROWS_PER_STATE_PARTITION``)."""
    from flink_neo4j_spark.tuning import _CONF_SWAP_LOCK

    with _CONF_SWAP_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        key = (
            "_fns_pykernel_state_width" if pykernel else "_fns_stream_state_width"
        )
        width = spark.__dict__.get(key, STREAM_MIN_STATE_PARTITIONS)
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        try:
            return start_fn()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_complete_to_parquet(
    stream_df: DataFrame, spark: SparkSession, name: str
) -> DataFrame:
    """Execute a complete-mode streaming aggregation to a parquet directory
    and read the final result back as a batch DataFrame.

    This is the deployable parity bridge: a plain file sink rejects
    complete mode, so each micro-batch's full result is written by
    ``foreachBatch`` — executor-side parquet writes, overwrite-per-batch so
    the last (final) batch wins. No row ever passes through the driver,
    unlike a memory sink + collect(), which dies at scale. A checkpoint
    directory is configured the way a production topology would."""
    out_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", f"{name}_{uuid.uuid4().hex[:8]}"
    )

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_dir)

    q = _start_with_state_partitions(
        spark,
        lambda: (
            stream_df.writeStream.foreachBatch(write_batch)
            .outputMode("complete")
            .option("checkpointLocation", out_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        ),
    )
    try:
        q.awaitTermination()
    finally:
        _capture_progress(name, q)
        q.stop()
    return spark.read.parquet(out_dir)


def run_daily_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the daily rollup as a real streaming query (AvailableNow trigger,
    foreachBatch parquet sink, complete mode) and return the final result as
    a batch DataFrame. This is the engine's batch/stream parity bridge — the
    result must hash-match the batch oracle (conformance query w1)."""
    out = _run_complete_to_parquet(
        tumbling_daily(read_events_stream(spark, sf_dir)), spark, "daily"
    )
    return out.orderBy("user_id", "day")


def sliding_12h(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """24 h windows sliding every 12 h: each event lands in exactly two
    overlapping windows (Spark's ``window(ts, size, slide)`` plans one
    Expand + hash agg — no self-join). Batch twin: the DuckDB oracle
    enumerates the same two bucket starts per event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", "1 day", "12 hours").alias("win"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("win.start").alias("win_start"),
            "cnt",
            "total",
        )
    )


def run_sliding_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup as a real streaming query (complete mode,
    AvailableNow, foreachBatch parquet sink) — the w3 conformance query."""
    out = _run_complete_to_parquet(
        sliding_12h(read_events_stream(spark, sf_dir)), spark, "sliding"
    )
    # compare at second granularity (DuckDB timestamps are tz-naive UTC)
    return out.select(
        "user_id",
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "cnt",
        "total",
    ).orderBy("user_id", "win_start")


def _run_append_to_parquet(
    stream_df: DataFrame,
    spark: SparkSession,
    name: str,
    pykernel: bool = False,
) -> DataFrame:
    """Append-mode twin of :func:`_run_complete_to_parquet`: each micro-batch
    appends its newly-final rows to the parquet directory (the natural sink
    mode for stream-stream joins, whose inner results are emitted eagerly
    and never retracted)."""
    out_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", f"{name}_{uuid.uuid4().hex[:8]}"
    )

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = _start_with_state_partitions(
        spark,
        lambda: (
            stream_df.writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", out_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        ),
        pykernel=pykernel,
    )
    try:
        q.awaitTermination()
    finally:
        _capture_progress(name, q)
        q.stop()
    return spark.read.parquet(out_dir)


#: attribution horizon for the click->purchase interval join
ATTRIBUTION = "1 hour"


def interval_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every click
    by the same user within the preceding ATTRIBUTION hour.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can expire join state (clicks older than the
    horizon, purchases older than their match window) instead of buffering
    both streams forever — THE requirement for a deployable stream-stream
    join. Inner-join rows emit eagerly; the watermarks exist for state
    cleanup, which is why a finite AvailableNow replay reproduces the batch
    twin exactly."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("user_id").alias("buy_user"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    return clicks.join(
        buys,
        F.expr(
            f"click_user = buy_user AND buy_ts >= click_ts "
            f"AND buy_ts <= click_ts + interval {ATTRIBUTION}"
        ),
    ).select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "buy_id",
        F.expr("unix_micros(buy_ts) - unix_micros(click_ts)").alias("lag_us"),
    )


def run_interval_join_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase attribution as a real stream-stream join (w5)."""
    out = _run_append_to_parquet(
        interval_join_stream(read_events_stream(spark, sf_dir)),
        spark,
        "interval_join",
    )
    return out.orderBy("user_id", "click_id", "buy_id")


def interval_left_join_stream(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click emits — matched
    clicks eagerly with their purchase, unmatched clicks with nulls once the
    watermark passes their match horizon and their join state is evicted.

    This is the attribution topology where "no conversion" is itself the
    signal (abandonment analysis, negative sampling for CTR training). The
    null-side emission is WATERMARK-DRIVEN: an unmatched click row is only
    final when no future purchase can match it, i.e. when the global
    watermark (min over both sides of max-event-time minus the 2h delay)
    passes ``click_ts + ATTRIBUTION``. A finite AvailableNow replay
    therefore emits null rows for all but the tail of the stream — the
    batch twin states the same cutoff explicitly (w8's oracle), which is
    the honest parity statement for an outer stream join.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("user_id").alias("buy_user"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "2 hours")
    )
    return clicks.join(
        buys,
        F.expr(
            f"click_user = buy_user AND buy_ts >= click_ts "
            f"AND buy_ts <= click_ts + interval {ATTRIBUTION}"
        ),
        "left_outer",
    ).select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "buy_id",
        F.expr("unix_micros(buy_ts) - unix_micros(click_ts)").alias("lag_us"),
    )


def run_interval_left_join_available_now(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Left-outer click attribution as a real streaming query (w8)."""
    out = _run_append_to_parquet(
        interval_left_join_stream(read_events_stream(spark, sf_dir)),
        spark,
        "interval_left_join",
    )
    return out.orderBy("user_id", "click_id", "buy_id")


def run_dedup_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: ``dropDuplicates`` over (user_id, event_type)
    keyed state, then per-type unique-user counts (complete mode,
    AvailableNow). Batch twin: COUNT(DISTINCT user_id) per type.

    At scale the unbounded dedup state store is swapped for
    :func:`dedup_within_watermark` so state expires with the watermark;
    the topology is otherwise identical. The aggregate on top makes the
    result deterministic (which physical duplicate survives is not)."""
    agg = (
        read_events_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("uniq_users"))
    )
    return _run_complete_to_parquet(agg, spark, "dedup").orderBy("event_type")


def enrich_daily_by_nation(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the event stream against a broadcast
    dimension (user -> nation), then a per-nation daily tumbling rollup.

    The stream-static join is STATELESS — each micro-batch joins against the
    (broadcast) batch dimension with no state store involved, which is why
    it's the canonical way to attach slowly-changing reference data to a
    stream at scale (the alternative, a stream-stream join, would buffer the
    dimension in state forever). The aggregation on top is the only stateful
    operator."""
    return (
        events.join(F.broadcast(dim), "user_id")
        .withWatermark("ts", "1 day")
        .groupBy("nation_name", F.window("ts", "1 day").alias("win"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "nation_name",
            F.col("win.start").cast("date").alias("day"),
            "cnt",
            "total",
        )
    )


def run_enrich_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment rollup as a real streaming query (w7)."""
    from flink_neo4j_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation_name"),
    )
    dim = cust.join(nat, "c_nationkey").select("user_id", "nation_name")
    out = _run_complete_to_parquet(
        enrich_daily_by_nation(read_events_stream(spark, sf_dir), dim),
        spark,
        "enrich",
    )
    return out.orderBy("nation_name", "day")


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "1 day"
) -> DataFrame:
    """At-scale streaming dedup: ``dropDuplicatesWithinWatermark`` expires
    per-key state once the watermark passes, so state size tracks the
    watermark horizon instead of all keys ever seen.

    Semantics differ from exact ``dropDuplicates``: a duplicate arriving
    with event time older than the watermark horizon is NOT suppressed —
    acceptable for pipelines whose duplicates are bursty (retries,
    replays), which is why this is the production form and the exact form
    stays the conformance query (w4's oracle is a global COUNT DISTINCT).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def session_window_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN ``session_window`` —
    the declarative twin of :func:`sessionize_stream`'s custom
    ``applyInPandasWithState`` kernel. The state store merges overlapping
    per-event windows per key and the watermark closes (emits) a session
    once no event can extend it — append mode output, which is why a finite
    replay emits the batch sessionizer's CLOSED sessions (tail sessions
    stay open; the parity test asserts the subset relation on exact
    bounds/rollups). Prefer this form when the per-session logic IS the
    rollup; drop to the custom kernel only for state shapes
    ``session_window`` can't express."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            "n_events",
            "session_value",
        )
    )


def run_session_window_available_now(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Built-in session_window sessionizer as a real streaming query."""
    return _run_append_to_parquet(
        session_window_stream(read_events_stream(spark, sf_dir), gap_minutes),
        spark,
        "session_window",
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming sessionizer via ``applyInPandasWithState``.

    Per-user state = the open session (id, bounds, running count/sum); a new
    event past the gap CLOSES the open session (emitted) and opens the next.
    Tail sessions stay in state — on a finite replay the emitted set is
    exactly ``sessionize_batch`` minus each user's final session, which the
    parity test asserts. At scale the state store bounds memory per key and
    a real deployment adds a timeout to flush idle sessions.

    Arrow moves each user's micro-batch slice as one pandas frame; rows are
    re-sorted inside the group because file-source micro-batches guarantee
    no intra-group order.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_id long, n_events long, session_value double"
    )
    state_schema = "session_id long, last_us long, n long, val double"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            session_id, last_us, n, val = state.get
        else:
            session_id, last_us, n, val = 1, None, 0, 0.0
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, value in zip(pdf["ts"], pdf["value"]):
                us = ts.value // 1000  # pandas ns -> parquet us, exact
                if last_us is not None and us - last_us > gap_us:
                    closed.append((user_id, session_id, n, round(val, 2)))
                    session_id += 1
                    n, val = 0, 0.0
                n += 1
                val += float(value)
                last_us = us
        state.update((session_id, last_us, n, val))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "n_events", "session_value"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via window functions: a new session starts when
    the gap to the previous event of the same user exceeds ``gap_minutes``.
    Returns per-session rollups. One shuffle on user_id (the window
    partition key); at 100 TB this is the standard sort-within-partition
    sessionizer — no Python, no state store."""
    w = "(PARTITION BY user_id ORDER BY ts, event_id)"
    # interval arithmetic is type-agnostic (works for timestamp AND
    # timestamp_ntz inputs), unlike unix_micros which rejects NTZ — the
    # round-2 w2 crash that aborted the whole bench run
    return (
        events.selectExpr(
            "user_id",
            "ts",
            "event_id",
            "value",
            f"CASE WHEN ts - lag(ts) OVER {w} "
            f"> INTERVAL '{gap_minutes}' MINUTE OR lag(ts) OVER {w} IS NULL "
            f"THEN 1 ELSE 0 END AS is_new",
        )
        .selectExpr(
            "user_id", "ts", "event_id", "value",
            f"SUM(is_new) OVER {w} AS session_id",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


#: top-k size for the trending rollup
TRENDING_K = 3


def trending_types(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Per-day event-type counts — the streaming aggregation feeding a
    trending/top-k rollup. The top-k itself is NOT part of the streaming
    agg (rank-in-complete-mode would re-rank every window each batch); it
    runs as a batch window function over the final result, the standard
    two-stage trending topology."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").cast("date").alias("day"), "event_type", "cnt")
    )


def run_trending_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w6: per-day top-TRENDING_K event types by count — streaming counts
    (complete mode, AvailableNow, foreachBatch parquet sink) + batch
    row_number re-rank of the final state."""
    from pyspark.sql.window import Window

    out = _run_complete_to_parquet(
        trending_types(read_events_stream(spark, sf_dir)), spark, "trending"
    )
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), "event_type")
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TRENDING_K)
        .orderBy("day", "rnk")
    )


#: watermark delay for the chained (hourly -> daily) aggregation; the
#: append-mode cutoff the oracle restates is max(ts) - this delay.
CHAINED_DELAY = "1 hour"


def chained_hourly_daily(events: DataFrame) -> DataFrame:
    """CHAINED streaming aggregation: hourly tumbling counts per event type,
    re-aggregated into daily counts — two stateful operators in ONE streaming
    query (Spark's multiple-stateful-operator support), the standard
    coarsening-rollup topology that avoids re-reading the source for each
    granularity.

    The second level groups on ``window(window_time(hw), '1 day')`` so the
    engine derives the daily window from the hourly one and propagates the
    event-time watermark across the chain; a daily row becomes final (and is
    appended) only once the watermark passes its day end, by which point all
    its hourly inputs have already emitted. All aggregates are INTEGER counts
    — the two-level rollup is exactly equal to the one-level batch GROUP BY,
    no float-summation-order caveat.

    State cost: hourly state is |types| x 24 rows/day, daily |types| x 1 —
    both bounded by the watermark horizon, evicted as it advances.
    """
    hourly = (
        events.withWatermark("ts", CHAINED_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("hw"), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        hourly.groupBy(
            F.window(F.window_time("hw"), "1 day").alias("dw"), "event_type"
        )
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            F.col("dw.start").cast("date").alias("day"),
            "event_type",
            "cnt",
        )
    )


def run_chained_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w10: the chained rollup as a real append-mode streaming query. Only
    days fully passed by the final watermark (max event time minus
    CHAINED_DELAY) are emitted — the oracle restates that cutoff, as w8's
    does for its join horizon."""
    out = _run_append_to_parquet(
        chained_hourly_daily(read_events_stream(spark, sf_dir)),
        spark,
        "chained",
    )
    return out.orderBy("day", "event_type")


def run_cdc_upsert_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC-style UPSERT materialization: treat the event stream as
    a change log and maintain a keyed "latest state per user" table in
    parquet, merged on every micro-batch — the lakehouse merge-on-write
    topology (what a Delta/Iceberg MERGE sink does), built from primitives:

    per batch: (existing state ∪ batch-changes) → keep the row with the
    greatest (ts, event_id) per user → atomically publish the new snapshot
    (ping-pong directories + a pointer file, since plain parquet has no
    transaction log). The final table is independent of how the stream was
    micro-batched — max is associative — which is exactly what the oracle
    (a plain batch argmax over the full log) certifies.

    Scale: each merge shuffles only |keys| + |batch| rows on the key, and
    the snapshot write is partitioned; with a real table format the
    publish step becomes the format's atomic commit and the dedup a MERGE.
    """
    base = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", f"cdc_{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(base, exist_ok=True)
    pointer = os.path.join(base, "CURRENT")

    def _current() -> str | None:
        try:
            with open(pointer) as fh:
                return fh.read().strip() or None
        except OSError:
            return None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        changes = batch_df.select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        cur = _current()
        if cur is not None:
            changes = sp.read.parquet(cur).unionByName(changes)
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        nxt = os.path.join(base, f"snap_{batch_id}")
        latest.write.mode("overwrite").parquet(nxt)
        with open(pointer, "w") as fh:
            fh.write(nxt)

    from pyspark.sql.window import Window

    q = _start_with_state_partitions(
        spark,
        lambda: (
            read_events_stream(spark, sf_dir)
            .writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", base + "_ckpt")
            # several micro-batches, so the merge loop actually iterates
            .option("maxFilesPerTrigger", "1")
            .trigger(availableNow=True)
            .start()
        ),
    )
    try:
        q.awaitTermination()
    finally:
        _capture_progress("cdc", q)
        q.stop()
    cur = _current()
    assert cur is not None, "CDC sink produced no snapshot"
    return spark.read.parquet(cur)


def run_wm_dedup_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w12: the AT-SCALE streaming dedup — ``dropDuplicatesWithinWatermark``
    keyed on (user_id, event_type), run end-to-end through the append-mode
    parquet sink. Unlike w4's unbounded ``dropDuplicates`` state, this
    state expires as the watermark advances (the only dedup that survives
    an infinite stream); first-seen rows emit immediately, so every key
    appears exactly once in the sink. WHICH physical row survives is
    non-deterministic, so the conformance result is the per-type distinct
    user count over the sink — invariant to the survivor choice — equal to
    the batch COUNT(DISTINCT user_id).
    """
    deduped = dedup_within_watermark(
        read_events_stream(spark, sf_dir),
        keys=["user_id", "event_type"],
        watermark="1 day",
    ).select("user_id", "event_type")
    out = _run_append_to_parquet(deduped, spark, "wm_dedup")
    return (
        out.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("uniq_users"))
        .orderBy("event_type")
    )


#: w13: lateness horizon for the distinct-actives rollup.
DISTINCT_DELAY = "1 hour"


def daily_distinct_users(events: DataFrame) -> DataFrame:
    """EXACT streaming COUNT(DISTINCT) per day — two chained stateful
    aggregations (the w10 multiple-stateful-operator topology): level 1
    collapses to one row per (day-window, user); level 2 counts those rows
    per day. approx_count_distinct would be one operator, but the two-level
    exact form costs only |day × active-users| watermark-bounded state and
    returns the true number — the streaming twin of a11's batch rolling
    distinct. All aggregates are integer counts: no float caveats.
    """
    lvl1 = (
        events.withWatermark("ts", DISTINCT_DELAY)
        .groupBy(F.window("ts", "1 day").alias("dw"), "user_id")
        .agg(F.count("*").alias("c"))
    )
    return (
        lvl1.groupBy(F.window(F.window_time("dw"), "1 day").alias("dw2"))
        .agg(
            F.count("*").alias("distinct_users"),
            F.sum("c").alias("n_events"),
        )
        .select(
            F.col("dw2.start").cast("date").alias("day"),
            "distinct_users",
            "n_events",
        )
    )


def run_daily_distinct_available_now(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """w13: the exact-distinct rollup as a real append-mode streaming
    query; only days fully passed by the final watermark emit (the oracle
    restates the cutoff, as w10's does)."""
    out = _run_append_to_parquet(
        daily_distinct_users(read_events_stream(spark, sf_dir)),
        spark,
        "daily_distinct",
    )
    return out.orderBy("day")


#: w14: per-(user, day) event quota.
RATE_LIMIT_K = 5


def _admit_chunk(pdf, k: int, last_ord: int, last_n: int, user_id):
    """One vectorized quota-admission step over a (ts-sorted after this
    call) chunk of one user's events; returns ``(out_frame_or_None,
    new_last_ord, new_last_n)``.

    Day ranks come from ``searchsorted`` on the ts-sorted (hence
    day-sorted) chunk; the state carry can only apply to the FIRST day
    run — every later run follows a smaller day inside the same chunk,
    which resets its counter, exactly the contract of the sequential
    per-day loop this replaces. Day ordinals are days-since-epoch — NOTE
    this changed from ``datetime.date.toordinal()`` (round-4 vectorized
    rewrite): restored checkpoint state written by the old kernel would be
    silently misinterpreted (ordinal bases differ by 719162, so the carry
    never matches and the quota resets). Harmless for the availableNow
    topologies this ships (state lives and dies within one run); anyone
    enabling long-lived checkpointed state must bump the checkpoint dir —
    the state schema carries no version field to detect it (Spark's
    applyInPandasWithState schema-compat check won't catch a unit change
    inside an unchanged int64 column)."""
    import numpy as np
    import pandas as pd

    n = len(pdf)
    if not n:
        return None, last_ord, last_n
    pdf = pdf.sort_values(["ts", "event_id"])
    day_i8 = pdf["day"].to_numpy().astype("datetime64[D]").astype("int64")
    first_day = int(day_i8[0])
    carry = np.where(
        (day_i8 == first_day) & (first_day == last_ord), last_n, 0
    )
    rank = np.arange(n) - np.searchsorted(day_i8, day_i8, "left")
    slot = rank + carry
    admit = slot < k
    out = None
    if admit.any():
        sel = pdf[admit]
        out = pd.DataFrame(
            {
                "user_id": user_id,
                "day": sel["day"].to_numpy(),
                "event_id": sel["event_id"].to_numpy(),
                "admit_rank": slot[admit] + 1,
            }
        )
    last_day = int(day_i8[-1])
    base0 = last_n if (last_day == first_day == last_ord) else 0
    in_last = n - int(np.searchsorted(day_i8, last_day, "left"))
    return out, last_day, int(min(k, base0 + in_last))


def rate_limit_stream(events: DataFrame, k: int = RATE_LIMIT_K) -> DataFrame:
    """Per-key quota enforcement (abuse/rate limiting): emit at most ``k``
    events per (user, day), keeping the earliest by (ts, event_id) — the
    admission-control twin of the sessionizer's ``applyInPandasWithState``
    kernel. State per key is ONE counter; each micro-batch's group slice is
    sorted inside the kernel (file-source batches guarantee no intra-group
    order) and rows are admitted until the quota fills.

    Admission is exactly "first k by event time" when a key's rows arrive
    within one micro-batch (the AvailableNow single-file replay used by
    conformance); across batches (or across the ~10k-row Arrow chunks a
    huge group splits into) it is first-k in arrival order with
    time-order within each batch — the production semantics of any quota
    enforced on a live stream (you cannot un-admit an event because an
    earlier one arrives late).

    State keys on USER, not (user, day): the quota window is derived
    inside the kernel and only the LATEST open day's counter is carried
    (an event-time stream never legitimately reopens an old day past the
    watermark). Keying on the coarser entity cuts state-store groups —
    and their per-group Arrow/state round-trips — by the window
    cardinality: measured 21.8 s → ~3 s at sf0.1 (4,500 → 150 groups).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, day date, event_id long, admit_rank long"
    state_schema = "day_ord long, n long"

    def fn(key, pdfs, state: GroupState):
        # Fully vectorized admission: ONE output frame per Arrow chunk,
        # not one per (user, day). The per-day yield built ~30 tiny pandas
        # frames per user (~4,500 per batch at sf0.1) and their
        # construction+Arrow serialization dominated the query: measured
        # 5.5 s for the query vs 1.8 s for an identical-shape no-op
        # stateful kernel — the floor is kernel-side, not the state store
        # (vectorizing cut the query to 2.7 s at sf0.1).
        (user_id,) = key
        last_ord, last_n = state.get if state.exists else (-1, 0)
        for pdf in pdfs:
            out, last_ord, last_n = _admit_chunk(
                pdf, k, last_ord, last_n, user_id
            )
            if out is not None:
                yield out
        state.update((last_ord, last_n))

    ev = events.select(
        "user_id", F.to_date("ts").alias("day"), "ts", "event_id"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_rate_limit_available_now(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """w14: the quota kernel end-to-end through the append-mode parquet
    sink."""
    out = _run_append_to_parquet(
        rate_limit_stream(read_events_stream(spark, sf_dir)),
        spark,
        "rate_limit",
        pykernel=True,
    )
    return out.orderBy("user_id", "day", "admit_rank")


#: w15: minimum history before scoring, and the |z| alert threshold.
ANOM_MIN_N = 10
ANOM_Z = 3.0


def anomaly_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user anomaly alerting: each event is scored against
    the user's PRIOR history (prefix mean/std — the only causally valid
    baseline on a live stream; a9 is the offline full-series twin). State
    per user is three INT64 sufficient statistics (n, Σcents, Σcents²), so
    z = (c·n − Σc)/√(n·Σc² − (Σc)²) evaluates on exact integers — the
    emitted alerts are bit-identical to the batch prefix-window oracle
    regardless of layout. The kernel is vectorized numpy over each group
    slice (cumsums give every prefix at once; no per-row Python).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, event_id long, z double"
    state_schema = "n long, s long, ss long"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        n, s, ss = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            c = np.rint(pdf["value"].to_numpy() * 100).astype(np.int64)
            # prefix stats BEFORE each row: state + cumsum shifted by one
            pn = n + np.arange(len(c))
            ps = s + np.concatenate(([0], np.cumsum(c)[:-1]))
            pss = ss + np.concatenate(([0], np.cumsum(c * c)[:-1]))
            varnum = pn * pss - ps * ps
            ok = (pn >= ANOM_MIN_N) & (varnum > 0)
            z = np.zeros(len(c))
            z[ok] = (c[ok] * pn[ok] - ps[ok]) / np.sqrt(
                varnum[ok].astype(np.float64)
            )
            flag = ok & (np.abs(z) > ANOM_Z)
            if len(c):
                n = int(pn[-1] + 1)
                s = int(ps[-1] + c[-1])
                ss = int(pss[-1] + c[-1] * c[-1])
            if flag.any():
                yield pd.DataFrame(
                    {
                        "user_id": user_id,
                        "event_id": pdf["event_id"].to_numpy()[flag],
                        "z": np.round(z[flag], 2) + 0.0,
                    }
                )
        state.update((n, s, ss))

    ev = events.select("user_id", "ts", "event_id", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_anomaly_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w15: the anomaly kernel end-to-end through the append-mode sink."""
    out = _run_append_to_parquet(
        anomaly_stream(read_events_stream(spark, sf_dir)),
        spark,
        "anomaly",
        pykernel=True,
    )
    return out.orderBy("user_id", "event_id")


def run_reconcile_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w16: lambda-architecture reconciliation — run the daily rollup BOTH
    ways (the real Structured Streaming topology through its parquet sink,
    and the batch twin over the same source), full-outer join the two
    results, and emit the per-day drift audit every speed/batch-layer
    deployment runs before trusting the serving table.

    The audit counts keys only present on one side and keys whose
    aggregates disagree; counts compare exactly (int64), the rounded float
    totals with a half-ulp-of-2dp tolerance (|Δ| < 0.005) so a boundary
    rounding flip between the two layers' partition layouts cannot
    false-alarm. On a correct engine every key matches — which is exactly
    what the DuckDB oracle states, so any stream/batch divergence turns
    the conformance row red.
    """
    stream = run_daily_available_now(spark, sf_dir).selectExpr(
        "user_id", "day", "cnt AS s_cnt", "total AS s_total"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.window("ts", "1 day").alias("win"))
        .agg(
            F.count("*").alias("b_cnt"),
            F.round(F.sum("value"), 2).alias("b_total"),
        )
        .select(
            "user_id", F.col("win.start").cast("date").alias("day"),
            "b_cnt", "b_total",
        )
    )
    j = stream.join(batch, ["user_id", "day"], "full_outer")
    matched = (
        F.col("s_cnt").isNotNull()
        & F.col("b_cnt").isNotNull()
        & (F.col("s_cnt") == F.col("b_cnt"))
        & (F.abs(F.col("s_total") - F.col("b_total")) < 0.005)
    )
    return (
        j.groupBy("day")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(matched.cast("long")).alias("n_matched"),
            F.sum(F.col("b_cnt").isNull().cast("long")).alias("stream_only"),
            F.sum(F.col("s_cnt").isNull().cast("long")).alias("batch_only"),
        )
        .orderBy("day")
    )
