"""Skew-mitigation operators.

At 100 TB a ``groupBy`` on a low-cardinality or Zipf-distributed key sends
entire hot keys to single reducers. AQE's skew-join splitting covers joins,
but skewed *aggregation* is handled by the classic two-stage salted shape:

  stage 1: group by (key, salt) — the hot key spreads over ``n_salts``
           reducers; each computes a distributive partial;
  stage 2: group by key — combines ``n_salts`` partial rows per key
           (tiny: n_salts x |keys| rows total).

Only distributive aggregates (count/sum/min/max) decompose this way;
avg is expressed as sum+count at the call site. The salt is
``spark_partition_id() % n_salts`` — zero extra column reads, deterministic
within an execution, and results are salt-invariant by construction (the
conformance oracle is the plain single-stage GROUP BY).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: aggregate name -> (stage-1 partial builder, stage-2 combiner builder)
_DISTRIBUTIVE = {
    "count": (lambda c: F.count("*" if c == "*" else c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column -> (fn, column) with fn in
    count/sum/min/max. Result equals ``df.groupBy(keys).agg(...)`` for any
    ``n_salts`` (partition-invariance is part of the conformance check).
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_DISTRIBUTIVE)
    if unknown:
        raise ValueError(
            f"non-distributive aggregates {sorted(unknown)}; supported: "
            f"{sorted(_DISTRIBUTIVE)} (express avg as sum+count)"
        )
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _DISTRIBUTIVE[fn][0](col).alias(f"_p_{out}")
            for out, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DISTRIBUTIVE[fn][1](f"_p_{out}").alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )


# Q15 — skew-safe aggregation over lineitem's 3-value returnflag (the
# canonical hot-key shape); oracle is the plain GROUP BY, proving
# salt-invariance.
def q15_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        l,
        ["l_returnflag"],
        {
            "cnt": ("count", "*"),
            "max_qty": ("max", "l_quantity"),
            "min_ship": ("min", "l_shipdate"),
        },
    )
    # sums of doubles are kept out of the hash-checked columns: a two-stage
    # fp sum changes association and ROUND(2) can't always absorb that at
    # 100 TB row counts; count/min/max are exact under any grouping.
    return out.select(
        "l_returnflag",
        "cnt",
        F.round("max_qty", 2).alias("max_qty"),
        F.col("min_ship").cast("date").alias("min_ship"),
    ).orderBy("l_returnflag")


QUERIES: dict[str, QueryFn] = {
    "q15_salted_agg": q15_salted_agg,
}

ORACLE: dict[str, str] = {
    "q15_salted_agg": """
        SELECT l_returnflag, COUNT(*) AS cnt,
               ROUND(MAX(l_quantity), 2) AS max_qty,
               CAST(MIN(l_shipdate) AS DATE) AS min_ship
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
}
