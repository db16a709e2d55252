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


# -- q34: temperature-weighted source mixing -------------------------------
#
# The corpus-mixing pass of a pretraining pipeline: re-weight data sources
# to a target token budget with temperature alpha (alpha < 1 upsamples small
# sources relative to their raw share, the standard multilingual/multi-domain
# mixing rule). Per-source token totals are a partial-aggregated groupBy on
# `source` (tiny output); the 1-row corpus total crossJoins back broadcast,
# so the per-source RATE table never leaves the executors and the final
# Bernoulli keep is a broadcast-joined narrow map keyed on the same
# content-hash uniform as q31 (retry-stable, engine-reproducible). Rates are
# rounded to 6dp (half-nudged, see s5) so both engines compare u < rate on
# identical doubles; u has 24-bit granularity from the first 6 md5 nibbles.
MIX_ALPHA = 0.5
MIX_TARGET_FRAC = 0.5
_U24 = float(1 << 24)


def q34_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.functions import tokens_expr

    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        f"CAST(size({tokens_expr('text')}) AS BIGINT) AS n_tok",
    )
    src = d.groupBy("source").agg(F.sum("n_tok").alias("toks"))
    tot = src.agg(
        F.sum(F.pow("toks", F.lit(MIX_ALPHA))).alias("wsum"),
        F.sum("toks").alias("tot_toks"),
    )
    rates = src.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            F.round(
                F.least(
                    F.lit(1.0),
                    F.pow("toks", F.lit(MIX_ALPHA))
                    / F.col("wsum")
                    * (F.lit(MIX_TARGET_FRAC) * F.col("tot_toks"))
                    / F.col("toks"),
                )
                + F.lit(5e-10),
                6,
            )
            + F.lit(0.0)
        ).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 6),
            16,
            10,
        ).cast("double")
        / F.lit(_U24)
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "source", "rate")
        .orderBy("doc_id")
    )


# -- q42: deterministic negative sampling --------------------------------
#
# Link-prediction / recommender training needs (user, item) NEGATIVES —
# pairs that never co-occurred — sampled reproducibly so retries, backfills
# and incremental runs emit the same training set (rand() negatives differ
# per attempt and silently skew eval). Candidates come from a content-hash:
# NEG_CANDIDATES hashed part ids per customer (24-bit md5 nibbles mod the
# part-key space — the q34 uniform), deduped keeping the earliest slot,
# anti-joined against the observed positives, then the first NEG_KEEP
# survivors per customer by candidate index. Plan shape: the candidate side
# is a narrow explode of the customer dim (never of the fact table); the
# positives projection partial-aggregates to distinct pairs once; the
# anti-join shuffles on the (customer, part) pair key; the final per-customer
# rank windows over at most NEG_CANDIDATES rows.
NEG_CANDIDATES = 8
NEG_KEEP = 4


def q42_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    npart = load_table(spark, sf_dir, "part").agg(
        F.max("p_partkey").alias("np")
    )
    cand_part = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neg|"),
                        F.col("c_custkey").cast("string"),
                        F.lit("|"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        % F.col("np")
        + 1
    )
    cand = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .crossJoin(F.broadcast(npart))
        .select(
            "c_custkey",
            F.explode(F.sequence(F.lit(0), F.lit(NEG_CANDIDATES - 1))).alias("i"),
            "np",
        )
        .select("c_custkey", "i", cand_part.alias("cand_part"))
        .groupBy("c_custkey", "cand_part")
        .agg(F.min("i").alias("i"))
    )
    neg = cand.join(
        pos,
        (cand.c_custkey == pos.c) & (cand.cand_part == pos.p),
        "left_anti",
    )
    w = Window.partitionBy("c_custkey").orderBy("i")
    return (
        neg.withColumn("slot", F.row_number().over(w).cast("long"))
        .filter(F.col("slot") <= NEG_KEEP)
        .select("c_custkey", F.col("cand_part").alias("neg_partkey"), "slot")
        .orderBy("c_custkey", "slot")
    )


QUERIES: dict[str, QueryFn] = {
    "q31_stratified_sample": q31_stratified_sample,
    "q42_negative_sampling": q42_negative_sampling,
    "q32_uniform_k_per_stratum": q32_uniform_k_per_stratum,
    "q34_source_mixing": q34_source_mixing,
}

ORACLE: dict[str, str] = {
    "q42_negative_sampling": f"""
        WITH np AS (SELECT MAX(p_partkey) AS np FROM part),
        cand0 AS (
          SELECT c_custkey, i,
                 (('0x' || substring(md5('neg|' || CAST(c_custkey AS VARCHAR)
                    || '|' || CAST(i AS VARCHAR)), 1, 6))::BIGINT % np) + 1
                   AS cand_part
          FROM customer, np,
               generate_series(0, {NEG_CANDIDATES - 1}) AS t(i)),
        cand AS (
          SELECT c_custkey, cand_part, MIN(i) AS i
          FROM cand0 GROUP BY 1, 2),
        pos AS (
          SELECT DISTINCT o_custkey AS c, l_partkey AS p
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        neg AS (
          SELECT cand.* FROM cand
          WHERE NOT EXISTS (SELECT 1 FROM pos
                            WHERE pos.c = cand.c_custkey
                              AND pos.p = cand.cand_part)),
        r AS (
          SELECT c_custkey, cand_part,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY i)
                   AS slot
          FROM neg)
        SELECT c_custkey, cand_part AS neg_partkey, slot
        FROM r WHERE slot <= {NEG_KEEP}
        ORDER BY c_custkey, slot""",
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
    "q34_source_mixing": f"""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')) AS BIGINT)
                   AS n_tok
          FROM documents),
        src AS (SELECT source, SUM(n_tok) AS toks FROM d GROUP BY source),
        tot AS (SELECT SUM(pow(toks, {MIX_ALPHA})) AS wsum,
                       SUM(toks) AS tot_toks FROM src),
        rates AS (
          SELECT source,
                 round(least(1.0, pow(toks, {MIX_ALPHA}) / wsum
                                  * ({MIX_TARGET_FRAC} * tot_toks) / toks)
                       + 5e-10, 6) + 0.0 AS rate
          FROM src, tot)
        SELECT doc_id, source, rate
        FROM d JOIN rates USING (source)
        WHERE ('0x' || substring(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 6))
                ::BIGINT / {_U24} < rate
        ORDER BY doc_id""",
}
