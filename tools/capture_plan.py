"""Capture ``.explain('formatted')`` output for named registry queries.

Usage::

    python tools/capture_plan.py <suffix> name [name ...]

Writes ``plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt`` (default
``plans/r10``) for each query (suffix is
``before`` / ``after``). Plans are captured against $SPARK_GRAFT_SF_DIR
(default sf0.1) with the same session the bench uses, so Exchange counts,
join strategies and PushedFilters match what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from flink_neo4j_spark.registry import all_queries
    from flink_neo4j_spark.session import get_spark

    spark = get_spark("capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
