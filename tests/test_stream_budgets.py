"""Structural budgets for the streaming (w-family) topologies.

The w-queries run real Structured Streaming jobs, so the d18-style plan
budgets (parquet scans / exchanges) don't apply — their structural
fingerprint is the streaming progress Spark reports per run: how many
micro-batches the AvailableNow trigger needed, and which state operators
the topology carries. Freezing both catches the regressions wall-time
can only hint at (round-5's unexplained w1 1.12→1.84 s drift): a
refactor that silently adds a micro-batch (extra state-store commit
cycle per partition) or swaps/duplicates a state operator fails here,
in-round, with a named cause.

Budgets measured at sf0.001 (single events file → AvailableNow plans 1
data batch; append-mode topologies add one finalization batch for the
watermark-closed tail). ``max_batches`` is an upper bound so a file-count
change can't false-fail; the state-operator list is EXACT — topology is
not allowed to drift silently.
"""

from __future__ import annotations

import pytest

from .conftest import SF_DIR

#: query name -> (runner sink name, max micro-batches, exact state ops)
STREAM_BUDGETS = {
    "w1_stream_daily": ("daily", 2, ["stateStoreSave"]),
    "w3_stream_sliding": ("sliding", 2, ["stateStoreSave"]),
    "w4_stream_dedup": ("dedup", 2, ["stateStoreSave", "dedupe"]),
    "w5_stream_interval_join": ("interval_join", 3, ["symmetricHashJoin"]),
    "w6_stream_trending": ("trending", 2, ["stateStoreSave"]),
    "w8_stream_left_outer": ("interval_left_join", 3, ["symmetricHashJoin"]),
    "w9_stream_session_window": (
        "session_window", 3, ["sessionWindowStateStoreSaveExec"],
    ),
    "w10_stream_chained_agg": (
        "chained", 3, ["stateStoreSave", "stateStoreSave"],
    ),
    "w12_stream_wm_dedup": ("wm_dedup", 3, ["dedupeWithinWatermark"]),
    "w13_stream_daily_distinct": (
        "daily_distinct", 3, ["stateStoreSave", "stateStoreSave"],
    ),
    "w14_stream_rate_limit": ("rate_limit", 2, ["applyInPandasWithState"]),
    "w15_stream_anomaly": ("anomaly", 2, ["applyInPandasWithState"]),
}


@pytest.mark.parametrize("name", sorted(STREAM_BUDGETS))
def test_stream_budget(spark, name):
    import flink_neo4j_spark.operators.stream_batch as sb
    from flink_neo4j_spark.streaming.windows import LAST_RUN_PROGRESS

    sink, max_batches, expected_ops = STREAM_BUDGETS[name]
    getattr(sb, name)(spark, SF_DIR).collect()
    prog = LAST_RUN_PROGRESS.get(sink)
    assert prog, f"{name}: no streaming progress captured for sink {sink!r}"
    assert len(prog) <= max_batches, (
        f"{name}: {len(prog)} micro-batches > budget {max_batches} — a "
        "batch was added to the topology (extra state-commit cycle per "
        "partition per batch)"
    )
    ops = [o.get("operatorName") for o in prog[-1].get("stateOperators", [])]
    assert ops == expected_ops, (
        f"{name}: state operators {ops} != frozen {expected_ops} — the "
        "streaming topology changed shape"
    )
