"""Central registry of conformance queries and their DuckDB oracles.

Aggregates ``QUERIES``/``ORACLE`` from every operator module. A query with no
oracle entry is checked rows-only by the driver (reserved for genuinely
non-SQL-expressible operators, e.g. LSH bucketing or streaming state).

Ordering matters: the conformance driver records at most ~50 query rows per
run (round 1's CORRECTNESS file stopped at exactly 50 entries, cutting off
the registry tail), so ``all_queries`` yields queries in an explicit
priority order rather than module order:

- tier 0 — queries with no driver row in the previous round (the round-1
  tail: q15, a1-a3, g1-g7, w1-w4) plus queries newly added this round;
- tier 1 — queries whose implementation or oracle changed this round and
  need re-verification (q23 oracle cast, s5 output shape, d5/d6/d7/d8
  scale guards);
- tier 2 — everything else, in stable module order (these were all green
  in round 1 and are unchanged; if the driver cap cuts anything, it cuts
  from here, and coverage rotates back next round).

Local ``tests/test_conformance.py`` always checks the full set regardless.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Queries the round-1 driver never recorded (registry tail) — check first.
_TIER0_PREVIOUSLY_UNCHECKED = (
    "g1_two_hop",
    "g2_degree",
    "g3_connected_components",
    "g4_pagerank",
    "g5_cypher_frontend",
    "g6_bfs_hops",
    "g7_cypher_agg",
    "q15_salted_agg",
    "a1_asof_join",
    "a2_interval_join",
    "a3_json_extract",
    "w1_stream_daily",
    "w2_sessionize",
    "w3_stream_sliding",
    "w4_stream_dedup",
)

#: Queries whose engine code or oracle changed this round.
_TIER1_CHANGED = (
    "q23_conditional_agg",
    "s5_label_centroids",
    "d5_ngram_jaccard",
    "d6_embedding_near_dup",
    "d7_dedup_clusters",
    "d8_edit_distance",
)


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
    """Reorder a merged name->value dict into tier order (see module doc).

    Tier-0 names absent from ``merged`` (e.g. oracles for rows-only queries)
    are skipped; names listed in no tier keep their module order at the end.
    New queries registered by a module but not in any tier list land in
    tier 0.5: ahead of tier 2, after the explicit lists — so a freshly added
    operator always gets a driver row on its first round.
    """
    explicit = set(_TIER0_PREVIOUSLY_UNCHECKED) | set(_TIER1_CHANGED)
    out = {}
    for name in (*_TIER0_PREVIOUSLY_UNCHECKED, *_TIER1_CHANGED):
        if name in merged:
            out[name] = merged[name]
    known_round1 = _ROUND1_CHECKED_GREEN | explicit
    for name, value in merged.items():  # new-this-round queries
        if name not in out and name not in known_round1:
            out[name] = value
    for name, value in merged.items():  # stable tail (green + unchanged)
        if name not in out:
            out[name] = value
    return out


#: Green in CORRECTNESS_r01.json and unchanged since — safe to rotate out if
#: the driver's per-run row cap cuts the tail.
_ROUND1_CHECKED_GREEN = {
    "q1_node_scan", "q2_edge_join", "q3_disjunction", "q4_null_semantics",
    "q5_join_update", "q6_batch_insert", "q7_grouped_count", "q8_multi_agg",
    "q9_date_filter", "q10_topk", "q11_time_bucket", "q12_distinct_docs",
    "q13_order_revenue_topk", "q14_local_supplier_revenue", "q16_window_rank",
    "q17_set_ops", "q18_percentiles", "q19_rollup", "q20_exists_semi",
    "q21_anti_scalar", "q22_groupwise_threshold", "q24_sample_split",
    "q25_pivot", "q26_disjunctive_join", "q27_nation_volume",
    "q28_sketch_stats", "q29_merge_upsert", "q30_distinct_exclusion",
    "d1_exact_dedup", "d2_minhash_signature", "d3_minhash_near_dup",
    "d4_simhash", "s1_cosine_topk", "s2_lsh_topk", "s3_cosine_topk_pandas",
    "s4_ivf_topk", "t1_token_count", "t2_lang_id", "t3_quality_score",
    "t4_fingerprint", "t5_top_terms", "m1_multimodal_meta",
    "m2_frame_sample", "m3_resize",
}


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
