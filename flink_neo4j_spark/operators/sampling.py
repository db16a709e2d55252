"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB has two hard requirements the naive ``rand()`` forms
violate: (1) retry stability — a re-executed task must sample the SAME
rows, or speculative execution / stage retries silently corrupt the
sample; (2) reproducibility across engines and runs for audit. Both
operators therefore key off a content hash (md5 of the row key), the same
discipline as q24's train/test split, making them hash-checkable against
the DuckDB oracle like every other operator here.

- ``q31_stratified_sample`` — per-stratum Bernoulli sampling with
  per-stratum rates: a narrow map (one md5 + one compare per row), no
  shuffle at all beyond the final presentation ORDER BY. The rate
  comparison happens on the first two hex nibbles (256 buckets), so rates
  are granular to 1/256 — plenty for pipeline-level sampling.
- ``q32_uniform_k_per_stratum`` — exactly-k-per-stratum sampling (the
  deterministic twin of reservoir sampling): rank rows within each stratum
  by their content hash and keep the first k. One shuffle on the stratum
  key (the window partition); at scale strata are numerous so the shuffle
  is well spread, and a hot stratum costs one partition's sort, bounded by
  ``spark.sql.execution`` spill like any window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_neo4j_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

#: per-stratum Bernoulli rates, expressed as a 2-hex-digit threshold on the
#: md5 prefix: '33' ~ 0.20, '80' ~ 0.50 (first 256 buckets of the hash).
LOW_NATION_THRESHOLD = "33"
HIGH_NATION_THRESHOLD = "80"
#: nations below this key sample at the LOW rate, the rest at HIGH.
NATION_SPLIT = 10

#: exact per-stratum sample size for q32
K_PER_STRATUM = 5


def q31_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Bernoulli sample of customers at nation-dependent rates
    (~20% for nations < 10, ~50% otherwise), keyed on md5(c_custkey)."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
    threshold = F.when(
        F.col("c_nationkey") < NATION_SPLIT, F.lit(LOW_NATION_THRESHOLD)
    ).otherwise(F.lit(HIGH_NATION_THRESHOLD))
    return (
        c.filter(bucket < threshold)
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    )


def q32_uniform_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly K_PER_STRATUM customers per nation, chosen by content-hash
    rank — reservoir sampling's deterministic, retry-stable form."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_PER_STRATUM)
        .select("c_nationkey", F.col("rk").cast("long").alias("rk"), "c_custkey")
        .orderBy("c_nationkey", "rk")
    )


QUERIES: dict[str, QueryFn] = {
    "q31_stratified_sample": q31_stratified_sample,
    "q32_uniform_k_per_stratum": q32_uniform_k_per_stratum,
}

ORACLE: dict[str, str] = {
    "q31_stratified_sample": f"""
        SELECT c_custkey, c_nationkey FROM customer
        WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <
              CASE WHEN c_nationkey < {NATION_SPLIT}
                   THEN '{LOW_NATION_THRESHOLD}'
                   ELSE '{HIGH_NATION_THRESHOLD}' END
        ORDER BY c_custkey""",
    "q32_uniform_k_per_stratum": f"""
        SELECT c_nationkey, rk, c_custkey FROM (
          SELECT c_nationkey, c_custkey,
                 ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rk
          FROM customer)
        WHERE rk <= {K_PER_STRATUM}
        ORDER BY c_nationkey, rk""",
}
