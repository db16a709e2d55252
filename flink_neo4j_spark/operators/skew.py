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


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-safe equi-join: the join-side twin of :func:`salted_aggregate`.

    The big (skewed) side gets a salt in 0..n_salts-1; the small side is
    replicated once per salt value (``explode`` of a literal range — an
    n_salts-times fan-out of the SMALL side only); the join key becomes
    (key, salt), so a hot key's rows spread over ``n_salts`` reducers
    instead of one. Results are salt-invariant by construction.

    Decision ladder at 100 TB: (1) if the small side fits in memory,
    ``F.broadcast`` — no shuffle at all, skew irrelevant; (2) if not, AQE's
    skew-join splitting handles MOST skew at runtime; (3) this operator is
    for the residual case — a medium dimension too big to broadcast joined
    on a pathologically hot key — and for engines/paths where AQE is off
    (e.g. inside a streaming foreachBatch). The salt is
    ``spark_partition_id() % n_salts``: free to compute, deterministic
    within an execution, and never read from data columns.
    """
    big_s = big.withColumn("_salt", F.spark_partition_id() % n_salts)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


# Q35 — salted join over lineitem's 3-value returnflag key: with only 3
# distinct join keys, an unsalted shuffle join uses exactly 3 reducers no
# matter the cluster size; the salted form uses 3 x n_salts. The oracle is
# the plain equi-join + GROUP BY, proving salt-invariance (as q15 does for
# aggregation).
def q35_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    dim = (
        l.select("l_returnflag")
        .distinct()
        .withColumn("flag_desc", F.concat(F.lit("flag_"), F.col("l_returnflag")))
    )
    joined = salted_join(l, dim, "l_returnflag", n_salts=8)
    return (
        joined.groupBy("flag_desc")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .orderBy("flag_desc")
    )


QUERIES: dict[str, QueryFn] = {
    "q15_salted_agg": q15_salted_agg,
    "q35_salted_join": q35_salted_join,
}

ORACLE: dict[str, str] = {
    "q15_salted_agg": """
        SELECT l_returnflag, COUNT(*) AS cnt,
               ROUND(MAX(l_quantity), 2) AS max_qty,
               CAST(MIN(l_shipdate) AS DATE) AS min_ship
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q35_salted_join": """
        WITH dim AS (
          SELECT DISTINCT l_returnflag,
                 'flag_' || l_returnflag AS flag_desc
          FROM lineitem)
        SELECT flag_desc, COUNT(*) AS cnt,
               ROUND(SUM(l_extendedprice), 2) AS rev
        FROM lineitem JOIN dim USING (l_returnflag)
        GROUP BY flag_desc ORDER BY flag_desc""",
}
