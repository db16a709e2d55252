"""Central registry of conformance queries and their DuckDB oracles.

Aggregates ``QUERIES``/``ORACLE`` from every operator module. A query with no
oracle entry is checked rows-only by the driver (reserved for genuinely
non-SQL-expressible operators, e.g. LSH bucketing or streaming state).

Ordering matters: the conformance driver records at most ~50 query rows per
run (round 1's CORRECTNESS file stopped at exactly 50 entries, cutting off
the registry tail), so ``all_queries`` yields queries in priority order,
derived from the committed ``CORRECTNESS_r*.json`` artifacts themselves:

- tier 0 — queries with NO green driver row in any previous round (never
  checked, checked-and-failed, or newly added) — these need the hard
  signal most;
- tier 1 — queries listed in ``_CHANGED_THIS_ROUND`` (implementation or
  oracle edited since their last green row, so the old green no longer
  vouches for them);
- tier 2 — everything else (green in some previous round and unchanged),
  in stable module order. If the driver cap cuts anything, it cuts here,
  and because tier 0 is recomputed from the artifacts each round, whatever
  the cap skipped automatically rotates to the front next round.

Local ``tests/test_conformance.py`` always checks the full set regardless.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Queries whose engine code or oracle changed this round: their previous
#: green rows no longer certify the current code. Update per round.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round 3: events.ts normalization fix (catalog.normalize_event_ts) —
    # every streaming query's input changed
    "w1_stream_daily",
    "w2_sessionize",  # + NTZ-safe interval arithmetic, session_id BIGINT cast
    "w3_stream_sliding",
    "w4_stream_dedup",
    "w5_stream_interval_join",
    "w6_stream_trending",
    # round 3: oracle HUGEINT->BIGINT casts (driver value-hash artifacts)
    "t8_pack_sequences",
    "m4_audio_windows",
    "g2_degree",
    "a3_json_extract",
    # round 3: plan changes after their round-2 green rows (localCheckpoint
    # materialization of multi-consumer projections; g14 also refactored
    # into the shared _copurchase_triangles helper)
    "g14_triangle_count",
    "g15_also_bought",
)


def _previously_green() -> set[str]:
    """Names with a fully-green row in any committed CORRECTNESS artifact.

    Green = no error AND row counts matched AND (value hash matched, or the
    query is rows-only so there is no hash to match). Failed/erred rows stay
    out, so they keep tier-0 priority until a green row lands.
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            if row.get("rows_match") and row.get("hash_match") in (True, None):
                green.add(name)
    return green


def _modules():
    from flink_neo4j_spark.operators import (
        dedup,
        graph_algos,
        multimodal,
        relational,
        sampling,
        similarity,
        skew,
        stream_batch,
        temporal,
        text,
    )

    return (
        relational,
        sampling,
        dedup,
        similarity,
        text,
        multimodal,
        stream_batch,
        graph_algos,
        skew,
        temporal,
    )


def _ordered(merged: dict) -> dict:
    """Reorder a merged name->value dict into tier order (see module doc)."""
    green = _previously_green()
    tier0 = [n for n in merged if n not in green and n not in _CHANGED_THIS_ROUND]
    tier1 = [n for n in _CHANGED_THIS_ROUND if n in merged]
    tier2 = [n for n in merged if n in green and n not in _CHANGED_THIS_ROUND]
    return {n: merged[n] for n in (*tier0, *tier1, *tier2)}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return _ordered(merged)


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged
