"""Physical-plan audit: for the N most expensive bench queries, digest the
executed plan into the scale-relevant facts (exchanges, broadcasts,
whole-stage-codegen spans, Python stages, scan pushdown) and write a
markdown table. This is the "is this the plan you'd want at 100 TB" check,
run after each bench so plan regressions (a broadcast flipping to a
sort-merge join, a filter falling off the scan) are diffable in review.

Usage: python plan_audit.py BENCH.json [N] > PLAN_AUDIT.md
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def digest(plan: str) -> dict[str, object]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "python": bool(re.search(r"Python|ArrowEval|MapInPandas|FlatMapsInPandas", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loops": len(re.findall(r"NestedLoop|CartesianProduct", plan)),
        "pushed": "PushedFilters: \\[[^]]" in plan or bool(re.search(r"PushedFilters: \[[A-Za-z]", plan)),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r02.json"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    with open(bench_path) as fh:
        bench = json.load(fh)
    timings = bench.get("queries", {})
    names = [k for k, _ in sorted(timings.items(), key=lambda kv: -kv[1])[:top_n]]

    from flink_neo4j_spark.plans import formatted_plan
    from flink_neo4j_spark.registry import all_queries
    from flink_neo4j_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    print("# Plan audit — top bench queries by wall time\n")
    print(f"Source: `{os.path.basename(bench_path)}` at sf={bench.get('sf')}. "
          "Columns: total exchanges (shuffles+broadcasts), broadcast exchanges, "
          "parquet scans, Python/Arrow stages, sort-merge joins, "
          "nested-loop/cartesian (1-row broadcast cross joins are the justified "
          "case — d5/t12's tot frame, Cypher MERGE's count frame), top-k operator.\n")
    print("| query | s | exch | bcast | scans | python | smj | nested | top-k |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            plan = formatted_plan(fn(spark, sf_dir))
        except Exception as exc:  # streaming wrappers execute eagerly; skip
            print(f"| {name} | {timings[name]:.2f} | — | — | — | — | — | — | "
                  f"(plan unavailable: {type(exc).__name__}) |")
            continue
        d = digest(plan)
        print(
            f"| {name} | {timings[name]:.2f} | {d['exchanges']} | "
            f"{d['broadcasts']} | {d['scans']} | "
            f"{'yes' if d['python'] else '—'} | {d['sort_merge_joins']} | "
            f"{d['nested_loops']} | {'yes' if d['take_ordered'] else '—'} |"
        )


if __name__ == "__main__":
    main()
