"""Central registry of conformance queries and their DuckDB oracles.

Aggregates ``QUERIES``/``ORACLE`` from every operator module. A query with no
oracle entry is checked rows-only by the driver (reserved for genuinely
non-SQL-expressible operators, e.g. LSH bucketing or streaming state).

Ordering matters: the conformance driver records at most ~50 query rows per
run (round 1's CORRECTNESS file stopped at exactly 50 entries, cutting off
the registry tail), so ``all_queries`` yields queries in priority order,
derived from the committed ``CORRECTNESS_r*.json`` artifacts themselves:

- tier A — queries listed in ``_CHANGED_THIS_ROUND`` (previous driver row
  was red, or implementation/oracle edited since their last green row).
  FIRST because a failed row turning green is the round's most important
  hard signal, and the tier is small by construction;
- pinned backlog — ``_BACKLOG_PINNED``: explicitly listed never-checked
  queries that earlier rounds' tier-B family ordering repeatedly deferred;
  they outrank new additions so the backlog drains before it can grow;
- tier B — queries with NO driver row in any previous round (newly added),
  ordered by operator family novelty (streaming/temporal/multimodal first,
  the well-trodden relational shapes last) so a cap cuts the queries whose
  family already has many green rows;
- tier C — everything else (green — or rows-only-recorded ``no_oracle`` —
  in some previous round and unchanged), in stable module order. If the
  driver cap cuts anything, it cuts here, and because the tiers are
  recomputed from the artifacts each round, whatever the cap skipped
  automatically rotates to the front next round.

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
    # round 9 NEW conformance queries (round-8 verdict asks #4-#6):
    "g84_cypher_shortest_chain",       # shortestPath + comma clause
    "g85_cypher_shortest_multi_clause",  # shortestPath + MATCH chain
    "g86_cypher_call_agg_keyexpr",     # agg-CALL ORDER BY restated key
    "g87_cypher_composite_optional",   # X249 x X251 combo promotion
    "g88_cypher_varlength_count_subquery",  # X250 x X252 x X253 combo
    # round 9 code-changed (verdict ask #3): chunk dedup restructured to
    # id-only shuffles + one tokenization pass — its r2 green row no
    # longer certifies the plan:
    "d11_chunk_dedup",
    # round 9 code-changed (sf10 probe finding): d8's Levenshtein verify
    # step now adaptively re-hashes candidate pairs at pair-count-
    # proportional width when the exact per-task pair mass exceeds its
    # budget — the per-block single-task skew blew the sf10 probe's
    # 40-min timeout. Same output; its r8 green row no longer certifies
    # the new plan:
    "d8_edit_distance",
    # round 9 optimization-phase code change: d14's banded candidate
    # stage now pairs distinct signatures (group-weighted bucket guard,
    # hamming filter before the distinct, output-bound doc expansion) —
    # provably the same pair set, but its r8 green row certified the
    # doc-level plan. g69_fastrp also changed (per-dimension avg
    # aggregation) but is rows-only by design, so a repeat row adds
    # nothing (the g4/q28 rule below):
    "d14_simhash_hamming",
    # round 9 optimization-phase code change: q68's association dedup is
    # now broadcast-semi-prefiltered by the qualifying part keys before
    # the distinct's exchange (filter∘distinct ≡ distinct∘filter on key
    # columns) — same result set, new plan, so its r6 green row no longer
    # certifies it:
    "q68_parts_supplier",
    # round 9 optimization-phase code change (session 6): q56's five
    # per-candidate distinct/semi-join blocks melted into one tagged
    # union aggregated twice — same integers, new plan (70 → 6
    # Exchanges), so its r7 green row no longer certifies it:
    "q56_fk_discovery",
    # round 9 optimization-phase code change (session 6): the MERGE
    # write paths checkpoint the resolved match batch and allocate ids
    # off the pre-arm-projection table (graph.py merge_nodes /
    # merge_relationships) — provably identical results, but every
    # MERGE-riding conformance query's green row certified the old
    # lineage:
    "g74_cypher_rel_merge_arms",
    "g18_cypher_merge",
    "g43_cypher_merge_arms",
    "g35_cypher_rel_merge",
    "g51_cypher_rel_props",
    # round 9 optimization-phase code change (session 7): ordered collect
    # with key ≡ value compiles to natural sort_array instead of the
    # interpreted lambda comparator — provably the same list, but g53's
    # r6 green row certified the comparator plan:
    "g53_cypher_ordered_collect",
    # round 9 code-changed (verdict ask #2 adjudication): the shared
    # customer-part projection split into base + part-widthed variants —
    # g34's r8 sf1 drift was REAL (the part repartition taxed its
    # cust-keyed self-join; r7-code A/B 7.3 s vs 11.2 s, fixed to ~7.0 s):
    "g34_copurchase_pmi",
    "g15_also_bought",
    "g20_node_similarity",
    # round 9 backlog drain, part 2 of 2 (verdict ask #1): every
    # remaining r2 row + the oldest r3 rows (temporal + multimodal
    # families first — least-proven). g4_pagerank / q28_sketch_stats
    # (rows-only by design — a repeat row adds nothing) stay excluded.
    "a5_retention",
    "d9_decontaminate",
    "d10_lsh_banded",
    "g1_two_hop",
    "g3_connected_components",
    "g6_bfs_hops",
    "g11_detach_delete",
    "g13_weighted_sssp",
    "g14_triangle_count",
    "m5_sample_assembly",
    "q15_salted_agg",
    "q23_conditional_agg",
    "q31_stratified_sample",
    "q32_uniform_k_per_stratum",
    "q33_grouping_sets",
    "q34_source_mixing",
    "s6_quantized_topk",
    "s7_mmr_rerank",
    "t6_tfidf",
    "t7_pii_redact",
    "t9_lang_segments",
    "t10_repetition_filter",
    "t11_shuffle_shards",
    # oldest r3 rows (the full a-family + m-family stragglers):
    "a3_json_extract",
    "a6_trailing_features",
    "a7_ohlc",
    "a8_gap_fill",
    "a9_zscore_anomaly",
    "a10_cumulative_share",
    "a11_trailing_distinct",
    "a12_scd2_join",
    "a13_attribution",
    "a14_ewma",
    "a15_twap",
    "a16_changepoints",
    "a17_series_corr",
    "a18_asof_forward",
    "a19_businessday_lag",
    "a20_localtime_rollup",
    "a21_seasonal_decomp",
    # (the remaining r3 rows — g2, m4/m6-m9 [m4 swapped out for the
    # code-changed d8 under the 50-row cap; the whole m-family then
    # re-certifies together — m8's window-energy plan was reworked late
    # in round 9 (split-once char array) so its r3 row is stale and its
    # r10 pin is MANDATORY], the s-family, t8/t12 and the
    # w-family — roll to round 10: the driver records exactly 50 rows
    # per round, and the five NEW round-9 queries plus the
    # code-changed ones above must earn rows this round. This list is
    # now 59 deep (session 6 added q56 + the five MERGE-riding queries
    # whose write-path lineage changed; session 7 added g53), so its
    # LAST nine backlog entries (a13-a21 — green at r3, merely stale)
    # may miss the cap and roll to round 10 with the rest; the
    # code-changed entries sit ahead of the drain on purpose. The EIGHT
    # operators ADDED late in round 9 — s20_binary_topk, s21_rrf_fusion,
    # d20_dedup_qa, d21_curation_pipeline, a23_interval_merge, g89_hits,
    # g90_assortativity, t26_source_divergence — are deliberately NOT
    # listed here: they sit in never-green tier B behind this full
    # tier A, and round 10 must pin them in _CHANGED_THIS_ROUND
    # alongside the r3 backlog remainder (plus code-changed m8, see
    # above).)
)
# Round-8 tier-A entries all earned green rows in CORRECTNESS_r08.json,
# so they drop back to tier C here.

#: Round-5 pinned backlog (the judge's round-4 ask #1): the 29 q-series
#: relational shapes that have NEVER had a driver CORRECTNESS row because
#: three rounds of new-query additions jumped them in tier B (``q`` sorts
#: last in ``_FAMILY_PRIORITY``). Pinned EXPLICITLY between tier A and
#: tier B so round-5 additions cannot jump the queue again: 29 backlog +
#: a handful of new round-5 queries fits well inside the driver's ~50-row
#: cap. Once CORRECTNESS_r05.json lands, ``_previously_green`` absorbs
#: them into tier C and this pin becomes a no-op (it only lists names not
#: yet green, so it is safe to leave in place).
_BACKLOG_PINNED: tuple[str, ...] = (
    "q35_salted_join",
    "q36_histogram_percentile",
    "q37_unpivot",
    "q38_ntile_buckets",
    "q39_late_supplier",
    "q40_top_supplier",
    "q41_nation_share",
    "q42_negative_sampling",
    "q43_incremental_merge",
    "q44_order_count_distribution",
    "q45_profit_by_nation_year",
    "q46_dq_audit",
    "q47_snapshot_diff",
    "q48_bloom_semi_join",
    "q49_cheapest_supplier",
    "q50_market_share",
    "q51_surplus_suppliers",
    "q52_returned_top_customers",
    "q53_table_stats",
    "q54_erasure_cascade",
    "q55_incremental_join",
    "q56_fk_discovery",
    "q57_cdc_apply",
    "q59_lonely_late_supplier",
    "q60_revenue_scan",
    "q61_promo_share",
    "q62_large_orders",
    "q63_pricing_summary",
    "q64_brand_margin",
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
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                # rows-only query, already recorded — a repeat row can never
                # say more, so don't spend a capped driver slot on it again
                green.add(name)
                continue
            if row.get("err") is not None:
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


#: tier-B family order: least-proven operator families first (streaming,
#: temporal, multimodal), the heavily-green relational tail last.
_FAMILY_PRIORITY = {"w": 0, "a": 1, "m": 2, "s": 3, "g": 4, "d": 5, "t": 6, "q": 7}


def _ordered(merged: dict) -> dict:
    """Reorder a merged name->value dict into tier order (see module doc)."""
    green = _previously_green()
    tier_a = [n for n in _CHANGED_THIS_ROUND if n in merged]
    pinned = [
        n
        for n in _BACKLOG_PINNED
        if n in merged and n not in green and n not in _CHANGED_THIS_ROUND
    ]
    placed = set(tier_a) | set(pinned)
    tier_b = sorted(
        (n for n in merged if n not in green and n not in placed),
        key=lambda n: _FAMILY_PRIORITY.get(n[0], 9),
    )
    tier_c = [n for n in merged if n in green and n not in placed]
    return {n: merged[n] for n in (*tier_a, *pinned, *tier_b, *tier_c)}


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
