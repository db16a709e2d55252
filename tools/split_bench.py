"""Bench-style pass that splits each query's wall time into DataFrame
CONSTRUCTION (Python query-fn call: Cypher parse/compile, py4j expression
building) vs EXECUTION (noop write: analysis, optimization, run).

Usage::

    python tools/split_bench.py [out.json] [name ...]

Same warmup discipline as bench.py (full set at sf0.001 first), then one
timed pass at $SPARK_GRAFT_SF_DIR with the two components recorded
separately. Output: JSON {name: {"build": s, "exec": s}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/split_bench.json"
    names = sys.argv[2:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flink_neo4j_spark.registry import all_queries
    from flink_neo4j_spark.session import get_spark

    spark = get_spark("split-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    if names:
        queries = {n: queries[n] for n in names}

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in sorted(queries):
        try:
            queries[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"  warmup {name} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()

    def _warm_pool(batches):
        yield from batches

    spark.range(32 * 1000).repartition(32).mapInPandas(
        _warm_pool, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        out[name] = {"build": round(t1 - t0, 4), "exec": round(t2 - t1, 4)}
        print(
            f"  {name}: build {t1 - t0:.2f}s exec {t2 - t1:.2f}s",
            file=sys.stderr,
        )
        spark.catalog.clearCache()
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    tb = sum(v["build"] for v in out.values())
    te = sum(v["exec"] for v in out.values())
    print(
        json.dumps(
            {"n": len(out), "build_total": round(tb, 2), "exec_total": round(te, 2)}
        )
    )


if __name__ == "__main__":
    main()
