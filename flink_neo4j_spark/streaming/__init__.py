"""Structured Streaming extension (SURVEY.md §7 step 7): the events table as
a stream, with windowed aggregation, watermarking, and custom stateful
sessionization. Nothing in the reference is streaming (its `X-Stream: true`
is HTTP chunking, `Neo4jInputFormat.java:66`), so this is a north-star
extension with batch-parity guarantees."""

from flink_neo4j_spark.streaming.windows import (
    read_events_stream,
    run_daily_available_now,
    sessionize_batch,
    tumbling_daily,
)

__all__ = [
    "read_events_stream",
    "run_daily_available_now",
    "sessionize_batch",
    "tumbling_daily",
]
