"""Similarity search over the ``embeddings`` table (``array<float>`` column).

Three operators:

- ``s1_cosine_topk`` — brute-force cosine top-k against a query vector:
  the correctness baseline. JVM-side ``zip_with``/``aggregate`` fold (no
  Python), one broadcast of the 1-row query side, ``TakeOrderedAndProject``
  for the top-k (no global sort).
- ``s2_lsh_topk`` — sign-LSH (random-hyperplane) bucketed ANN: the 100 TB
  scale path. Hyperplanes are deterministic (md5-derived ±1 weights,
  precomputed here and embedded as literals in BOTH engines' queries, so
  even the approximate path is oracle-checkable). Candidates = vectors in
  the query's bucket only; exact cosine re-rank within the bucket.
- ``s3_cosine_topk_pandas`` — same semantics as s1 via a vectorized
  Arrow-batched pandas UDF (numpy dot) — the pattern for when the metric
  can't be expressed with built-ins. Must hash-match s1's oracle.

At 100 TB: s1 is a full scan per query (only for offline eval); s2's bucket
join touches 1/2^P of the data per query; both avoid driver collects.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_neo4j_spark.catalog import table_for_compute
from flink_neo4j_spark.functions import cosine_col as _cosine

QueryFn = Callable[[SparkSession, str], DataFrame]

TOP_K = 10
QUERY_VEC_ID = 0
DIM = 64

#: LSH plane-count self-scaling (round-8 verdict ask #2): the bucket COUNT
#: must grow with the corpus or per-bucket candidate pairs grow
#: quadratically in density (measured: fixed 16 buckets gave s8 a 1.69
#: scale exponent sf0.1→sf1; 128+ buckets cut sf1 from 23.1 s → 10.8 s).
#: k = clamp(ceil(log2(N / TARGET_BUCKET)), MIN, MAX) keeps the EXPECTED
#: bucket size ≈ TARGET_BUCKET rows regardless of N. The DuckDB oracles
#: compute the same formula from the same COUNT(*) (``_DUCK_NP``), so
#: engine and oracle always bucket identically and hashes match at every
#: sf. At 500–2000 rows (sf0.001–0.1) the clamp floor holds k at 4 — the
#: historical conformance setting — so small-sf results are unchanged.
TARGET_BUCKET = 128
MIN_PLANES = 4
MAX_PLANES = 16


def _planes() -> list[list[float]]:
    """Deterministic +-1 hyperplanes: plane p, dim d -> sign from the first
    hex nibble of md5(f"{p}|{d}"). Reproducible in any engine/language."""
    return [
        [
            1.0 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for d in range(DIM)
        ]
        for p in range(MAX_PLANES)
    ]


PLANES = _planes()


def derived_n_planes(n_rows: int) -> int:
    """Plane count for an ``n_rows``-vector corpus (formula above)."""
    import math

    return min(
        MAX_PLANES,
        max(MIN_PLANES, math.ceil(math.log2(max(n_rows, 1) / TARGET_BUCKET))),
    )


def emb_n_planes(sf_dir: str) -> int:
    """Derived plane count for the corpus at ``sf_dir`` — row count read
    from parquet FOOTER metadata (no Spark job, no data scan; the same
    statistic a lakehouse catalog serves). At 100 TB this is exactly how
    the knob is set: from table stats, never a count-star over the data."""
    import pyarrow.dataset as ds

    path = os.path.join(sf_dir, "embeddings.parquet")
    n = sum(
        frag.metadata.num_rows
        for frag in ds.dataset(path, format="parquet").get_fragments()
    )
    return derived_n_planes(n)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # table_for_compute: the local single-file scan is one task, and the
    # per-row dot-product `aggregate` expressions (and any computed filters
    # Catalyst pushes into the scan) would otherwise run on one core.
    return table_for_compute(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS emb"
    )


def _sig_expr(col: str, n_planes: int) -> F.Column:
    """LSH signature 0..2^k-1: bit p set iff dot(emb, plane_p) >= 0."""
    total = F.lit(0)
    for p, plane in enumerate(PLANES[:n_planes]):
        arr = f"array({', '.join(f'{w}D' for w in plane)})"
        dot = F.expr(
            f"aggregate(zip_with({col}, {arr}, (x, w) -> x * w), 0D, (acc, v) -> acc + v)"
        )
        total = total + F.when(dot >= 0, F.lit(1 << p)).otherwise(0)
    return total


def _emb_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, emb, sig, nrm) — the sign-LSH-bucketed embedding
    table every bucketed pair operator starts from (s2's ANN probe, s8's
    KNN self-join, s17's contrastive mining, d12's semantic dedup).
    Session-memoized + localCheckpoint like dedup's signature tables: the
    n_planes interpreted ``aggregate(zip_with(...))`` folds per row are
    the dominant per-query cost of the family and are byte-identical
    across the four consumers, so they are paid once per session (GDS
    analogue: one graph/index projection, many algorithms). ``sig`` and
    ``nrm`` are the exact expressions the consumers previously computed
    inline — same sequential fold over the same array — so every
    downstream rounded cosine is bitwise-unchanged."""

    def build() -> DataFrame:
        return (
            _emb(spark, sf_dir)
            .withColumn("sig", _sig_expr("emb", emb_n_planes(sf_dir)))
            .withColumn(
                "nrm",
                F.expr("sqrt(aggregate(emb, 0D, (acc, v) -> acc + v * v))"),
            )
            .localCheckpoint()
        )

    from flink_neo4j_spark.catalog import session_memo

    key = ("emb_sig", os.path.abspath(sf_dir))
    return session_memo(spark, key, build)


# S1 — brute-force cosine top-k (baseline; exact).
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("emb").alias("q_emb"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(_cosine("emb", "q_emb"), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


# S2 — LSH-bucketed ANN: candidates share the query's sign-signature bucket.
def s2_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_sig(spark, sf_dir)
    q = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("sig").alias("q_sig"), F.col("emb").alias("q_emb"))
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("sig") == F.col("q_sig"))
        .select("vec_id", F.round(_cosine("emb", "q_emb"), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


# S3 — brute-force top-k via vectorized pandas UDF (Arrow path). Semantics
# identical to S1; the UDF computes the cosine with numpy over Arrow batches.
def s3_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    e = _emb(spark, sf_dir)
    q_vec = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select("emb").first()["emb"]
    )  # 1 tiny row to the driver: the query vector itself, not the data
    q = np.asarray(q_vec, dtype="float64")
    qn = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def cos_to_query(embs: pd.Series) -> pd.Series:
        m = np.asarray(embs.tolist(), dtype="float64")  # (batch, dim)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", F.round(cos_to_query(F.col("emb")), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


#: IVF coarse quantizer: cells anchored at pivot vectors (vec_id 1..N_CELLS —
#: the FAISS-style "train on a sample" step made deterministic), probing the
#: N_PROBE nearest cells at query time.
N_CELLS = 4
N_PROBE = 2


# S4 — IVF-bucketed ANN: the other canonical scale path next to LSH (s2).
# Index build: one broadcast cross join against N_CELLS pivot vectors +
# arg-max cell per vector (partial agg; one pass over the data, no shuffle of
# embeddings besides the final groupBy). Query: rank cells against the query
# vector, probe the top N_PROBE, exact cosine re-rank inside those cells
# only — touching ~N_PROBE/N_CELLS of the data. Ties in cell assignment
# break deterministically on (cos, cell) descending in BOTH engines.
def s4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    pivots = e.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("emb").alias("p_emb"))

    scored = e.crossJoin(F.broadcast(pivots)).withColumn(
        "pcos", _cosine("emb", "p_emb")
    )
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max(F.struct("pcos", "cell")).alias("m"),
            F.first("emb").alias("emb"),
        )
        .select("vec_id", F.col("m.cell").alias("cell"), "emb")
    )
    probe_cells = (
        scored.filter(F.col("vec_id") == QUERY_VEC_ID)
        .orderBy(F.col("pcos").desc(), F.col("cell").desc())
        .limit(N_PROBE)
        .select("cell")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("emb").alias("q_emb"))
    return (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(_cosine("emb", "q_emb"), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


# S5 — per-label centroids: the distributed mean of a vector column, the
# building block for IVF index training / k-means steps / class prototypes.
# posexplode fans each row into (label, pos, x) triples, but the per-(label,
# pos) average partial-aggregates map-side, so the shuffle carries only
# n_labels x DIM rows per task regardless of input size. The result is
# emitted as scalar (label, pos, c) rows — one per centroid component —
# rather than re-assembled arrays, so any downstream comparator (including
# the driver's sort-based canonicalizer) can treat every column as a scalar.
# No driver collect, no UDF.
def s5_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    exploded = e.select("label", F.posexplode("emb").alias("pos", "x"))
    # Components quantize to EMB_SCALE fixed-point BEFORE the sum (the
    # _int_centroids discipline): the multi-partition embeddings scan makes
    # a float AVG's accumulation order layout-dependent, and an exact int64
    # sum is not. The mean is then an exact rational (s / n / SCALE) and
    # the single float division + round is deterministic on any layout and
    # engine. +5e-10 moves exact x.xxxx5 rationals off the half-rounding
    # boundary (Spark decimal HALF_UP vs binary half-away engines); the
    # trailing + 0.0 collapses IEEE -0.0 to +0.0 (Spark's BigDecimal round
    # drops the zero sign, DuckDB's keeps it — string-sorting comparators
    # see "-0.0" != "0.0"). Same expressions in the oracle.
    return (
        exploded.groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.sum(F.round(F.col("x") * EMB_SCALE).cast("long")).alias("s"),
            F.count("*").alias("n_vectors"),
        )
        .select(
            "label",
            "pos",
            (
                F.round(
                    F.col("s") / (F.col("n_vectors") * float(EMB_SCALE))
                    + F.lit(5e-10),
                    4,
                )
                + F.lit(0.0)
            ).alias("c"),
            "n_vectors",
        )
        .orderBy("label", "pos")
    )


# S6 — scalar-quantized (int8-style) top-k: the FAISS SQ8 pattern. Pass 1
# computes per-dimension min/max (posexplode + partial agg: 64 rows out of
# any input size, assembled back into two array literals WITHOUT a driver
# collect — array_sort(collect_list(struct))). Pass 2 quantizes every vector
# to integer codes 0..255 and scores candidates with an exact INTEGER dot
# product against the quantized query — at 100 TB this is the point: codes
# are 4x smaller than float32 (scan + shuffle bytes), the candidate scan is
# integer SIMD, and floats only appear for the CAND-row exact re-rank.
# floor() (not round()) keeps the code assignment bit-identical across
# engines — no half-tie or signed-zero traps (see s5) — and integer scoring
# is exact, so even the approximate stage is hash-checkable.
SQ_CAND = 30


def s6_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    stats = (
        e.select(F.posexplode("emb").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .groupBy()
        .agg(
            F.expr(
                "transform(array_sort(collect_list(named_struct('pos', pos, 'v', mn))), "
                "s -> s.v)"
            ).alias("mn_arr"),
            F.expr(
                "transform(array_sort(collect_list(named_struct('pos', pos, 'v', mx - mn))), "
                "s -> s.v)"
            ).alias("sc_arr"),
        )
    )
    qz = (
        e.crossJoin(F.broadcast(stats))
        .selectExpr(
            "vec_id",
            "emb",
            "zip_with(zip_with(emb, mn_arr, (x, m) -> x - m), sc_arr, "
            "  (d, s) -> IF(s = 0D, CAST(0 AS BIGINT), "
            "               CAST(floor(d * 255.0D / s) AS BIGINT))) AS q",
        )
    )
    qq = qz.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qv"), F.col("emb").alias("q_emb")
    )
    cand = (
        qz.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qq))
        .selectExpr(
            "vec_id",
            "emb",
            "q_emb",
            "aggregate(zip_with(q, qv, (a, b) -> a * b), CAST(0 AS BIGINT), "
            "          (acc, v) -> acc + v) AS qdot",
        )
        .orderBy(F.col("qdot").desc(), F.col("vec_id"))
        .limit(SQ_CAND)
    )
    return (
        cand.select(
            "vec_id", "qdot", F.round(_cosine("emb", "q_emb"), 6).alias("cos")
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


# S8 — KNN self-join: every vector's TOP-K nearest neighbors in one pass —
# the batch workhorse behind semantic dedup, embedding-cluster curation and
# retrieval-index QA (contrast s1/s2: ONE query vector vs the whole table).
# Scale shape: candidates are generated by an LSH-bucket equi-join (same
# deterministic sign-signature as s2), so the join shuffles on `sig` and each
# bucket is processed independently — never an all-pairs cross join. The
# per-vector top-k is a row_number window over (cos DESC, b_id), which AQE
# executes as a partial top-k per partition; ranking on the ROUNDED cosine
# makes the ordering (and thus the result set) bit-identical across engines.
# The plane count self-scales with the corpus (``derived_n_planes``:
# expected bucket ≈ TARGET_BUCKET rows at any N, identically in the
# oracle), so buckets stay bounded as data grows; add band rotation for
# recall at extreme scale and the plan is unchanged — one bucketed
# self-join + one windowed top-k.
KNN_K = 5


def s8_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # norms precomputed ONCE per vector, not once per pair (each vector
    # appears in ~bucket_size pairs); bitwise-identical to inline norms —
    # same sequential fold over the same array — so the oracle hash is
    # unaffected, but the pair-scan drops two O(d) folds per row
    e = _emb_sig(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"), "sig",
    )
    b = e.select(
        F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"), "sig",
    )
    dot = F.expr(
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    scored = (
        a.join(b, "sig")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(dot / (F.col("a_nrm") * F.col("b_nrm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .orderBy("a_id", "rnk")
    )


# S7 — MMR (maximal-marginal-relevance) diversity re-rank: the standard
# greedy pass that turns a similarity top-N into a RELEVANT-BUT-DIVERSE
# top-k (retrieval result diversification; dataset curation "pick diverse
# exemplars"). Pick argmax of
#   MMR_LAMBDA * cos(q, d)  -  MMR_MU * max_{s in selected} cos(d, s)
# k times. Plan shape: the candidate pool is a TakeOrderedAndProject top-N
# (JVM-side fold cosine, as s1), and the greedy k-step kernel runs inside
# ONE applyInPandas group keyed by the query id — per-query parallelism at
# scale (thousands of queries = thousands of independent groups), never a
# driver-side loop. The kernel is O(pool * k) with numpy pairwise sims.
# MMR_MU is written 0.3 literally (not 1 - MMR_LAMBDA): 1 - 0.7 is
# 0.30000000000000004 in IEEE double and the oracle says 0.3.
MMR_LAMBDA = 0.7
MMR_MU = 0.3
MMR_POOL = 20


def s7_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("q_emb")
    )
    cand = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", "emb", _cosine("emb", "q_emb").alias("cos"))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(MMR_POOL)
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.stack(pdf["emb"].to_numpy())
        norms = np.linalg.norm(V, axis=1)
        S = (V @ V.T) / np.outer(norms, norms)
        cos = pdf["cos"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        scores: list[float] = []
        for _ in range(min(TOP_K, n)):
            best, best_s = -1, None
            for i in range(n):
                if i in selected:
                    continue
                pen = max(S[i][j] for j in selected) if selected else 0.0
                s = MMR_LAMBDA * cos[i] - MMR_MU * pen
                # strict > keeps the lowest vec_id on ties (rows are
                # vec_id-sorted), matching the oracle's ORDER BY vec_id
                if best_s is None or s > best_s:
                    best, best_s = i, s
            selected.append(best)
            scores.append(float(best_s))
        return pd.DataFrame(
            {
                "rank": range(1, len(selected) + 1),
                "vec_id": pdf["vec_id"].iloc[selected].to_numpy(),
                "score": [round(s, 6) for s in scores],
            }
        )

    return (
        cand.withColumn("qid", F.lit(QUERY_VEC_ID))
        .groupBy("qid")
        .applyInPandas(greedy, schema="rank long, vec_id long, score double")
        .orderBy("rank")
    )


# S9 — distributed Gram matrix (X^T X over the embedding table): the
# covariance/PCA/whitening building block of embedding analytics. The
# classic two-phase tree aggregation: each partition accumulates its local
# d x d Gram with one numpy GEMM over Arrow batches (O(d^2) state per
# partition, independent of row count), emits the upper triangle as
# (i, j, partial) rows, and one groupBy(i, j) sums partials — the shuffle
# carries d(d+1)/2 rows PER PARTITION, never anything proportional to N.
# At 100 TB this is exactly how a driver-side-free covariance is built; the
# fp-rounding discipline (half-nudge + signed-zero collapse) matches s5.
def _gram_partials(e: DataFrame) -> DataFrame:
    """Per-partition upper-triangle Gram partials over an ``emb`` column:
    each task's state AND emission are exactly d(d+1)/2 rows, independent
    of how many input rows the partition holds — the hot-partition bound
    `tests/test_dedup_guards.py` pins (a skewed split can concentrate
    rows, never state)."""
    import numpy as np

    def gram(batches):
        acc = np.zeros((DIM, DIM))
        for pdf in batches:
            if len(pdf):
                X = np.asarray(pdf["emb"].tolist(), dtype="float64")
                acc += X.T @ X
        iu = np.triu_indices(DIM)
        yield pd.DataFrame(
            {"i": iu[0].astype("int64"), "j": iu[1].astype("int64"),
             "partial": acc[iu]}
        )

    return e.select("emb").mapInPandas(gram, schema="i long, j long, partial double")


def s9_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = _gram_partials(_emb(spark, sf_dir))
    return (
        parts.groupBy("i", "j")
        .agg(
            (F.round(F.sum("partial") + F.lit(5e-10), 4) + F.lit(0.0)).alias("g")
        )
        .orderBy("i", "j")
    )


# s10 — embedding L2-norm outlier report: per-vector norms scored against
# the corpus mean/population-stddev. Degenerate embeddings (all-zero, fp
# blowups, truncated inference outputs) show up as norm outliers, making
# this the standard first screen before any similarity/clustering pass.
# The norm is a JVM codegen'd sequential fold over the array (deterministic
# element order, double accumulator — bitwise-identical cross-engine).
# The corpus mean/variance derive from EXACT integer sufficient statistics:
# each norm quantizes to 1e9 fixed-point (the corpus is unit-normalized,
# so the signal IS the ~1e-8 per-vector float32 quantization residue — a
# corrupted vector deviates by orders of magnitude more; 1e6 resolution
# would collapse the variance to zero), Σx is int64 and Σx² a
# decimal(38,0) (int64 would overflow at ~1e19 — DuckDB mirrors with
# HUGEINT), so mu and sigma are identical functions of exact integers on
# any partition layout — a float AVG/STDDEV over the multi-partition scan
# would be accumulation-order-dependent at the 2dp ROUND boundary. The
# z-score rounds to 2dp and the flag derives from the rounded value.
NORM_Z_THRESHOLD = 2.0
NORM_SCALE = 1_000_000_000


def s10_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table_for_compute(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.expr(
            "aggregate(embedding, cast(0.0 as double), "
            "(acc, x) -> acc + cast(x as double) * cast(x as double))"
        )
    )
    norms = (
        e.select("vec_id", norm.alias("nrm"))
        .withColumn(
            "nfp", F.round(F.col("nrm") * NORM_SCALE).cast("long")
        )
        .localCheckpoint()
    )
    stats = norms.agg(
        F.count("*").alias("n"),
        F.sum("nfp").alias("s1"),
        F.sum(
            F.col("nfp").cast("decimal(38,0)") * F.col("nfp")
        ).alias("s2"),
        F.max(F.abs(F.col("nfp"))).alias("nfp_max"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    # Variance numerator n·Σx² − (Σx)² held EXACTLY in decimal(38,0)
    # (~1e23 at this scale): the naive E[x²]−E[x]² float subtraction on
    # values centered at ~1e9 with a ~10-unit spread cancels ~7% of sigma
    # (measured 1408 vs exact 1318 at sf0.01) and can even go ≤0 → NaN z.
    # One double rounding happens only AFTER the exact subtraction, so
    # sigma is correct to ulp.
    #
    # HARD BOUND: both n·Σx² and (Σx)² are ≤ (n·max|nfp|)², so the exact
    # path requires 2·(log10 n + log10 max|nfp|) < 38 — at nfp≈1e9
    # (NORM_SCALE × unit-ish norms) that is n ≲ 1e10 rows. Past it Spark
    # decimal overflow yields a silent null sigma (null z), so the bound
    # is enforced with a runtime assertion rather than trusted: the guard
    # is folded into the variance expression (a pruned check column would
    # never evaluate) and raises loudly instead of mis-answering; shrink
    # NORM_SCALE to trade precision for headroom at larger n.
    var_num = (
        F.col("s2") * F.col("n").cast("decimal(38,0)")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1").cast("decimal(38,0)")
    )
    guard_ok = (
        F.log10(F.col("n").cast("double"))
        + F.log10(F.greatest(F.col("nfp_max").cast("double"), F.lit(1.0)))
    ) * 2 < F.lit(37.9)
    guard_zero = F.coalesce(
        F.assert_true(
            guard_ok,
            F.lit(
                "s10_norm_outliers: n*max(nfp)^2 exceeds decimal(38,0) — "
                "shrink NORM_SCALE"
            ),
        ).cast("double"),
        F.lit(0.0),
    )
    var = var_num.cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    ) + guard_zero
    # + 0.0 collapses IEEE -0.0 to +0.0 (DuckDB ROUND keeps the sign,
    # Spark drops it; a signed zero flips the driver's value hash).
    z = F.round((F.col("nfp") - mu) / F.sqrt(var), 2) + F.lit(0.0)
    return (
        norms.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            F.round("nrm", 4).alias("l2_norm"),
            z.alias("z"),
            (F.abs(z) > NORM_Z_THRESHOLD).alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


# s11 — one Lloyd (k-means) refinement step: assign every vector to its
# nearest pivot cell (s4's deterministic coarse quantizer), then recompute
# each cell's centroid as the member mean — the index-training iteration
# FAISS/IVF pipelines run repeatedly. Assignment is a broadcast cross join
# against N_CELLS pivots + an argmax partial agg (one pass, embeddings
# shuffle once on vec_id); the centroid recompute is s5's posexplode →
# per-(cell, pos) partial-agg mean, emitted as scalar rows. The full
# k-means loop iterates THIS operator with the new centroids as pivots —
# each round has identical plan shape and cost.
def s11_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    pivots = e.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("emb").alias("p_emb"))
    scored = e.crossJoin(F.broadcast(pivots)).withColumn(
        "pcos", _cosine("emb", "p_emb")
    )
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max(F.struct("pcos", "cell")).alias("m"),
            F.first("emb").alias("emb"),
        )
        .select(F.col("m.cell").alias("cell"), "emb")
    )
    exploded = assigned.select("cell", F.posexplode("emb").alias("pos", "x"))
    # int64 fixed-point sums for the same reason as s5: a float AVG over
    # the multi-partition scan is accumulation-order-dependent.
    return (
        exploded.groupBy("cell", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.sum(F.round(F.col("x") * EMB_SCALE).cast("long")).alias("s"),
            F.count("*").alias("n_members"),
        )
        .select(
            "cell",
            "pos",
            (
                F.round(
                    F.col("s") / (F.col("n_members") * float(EMB_SCALE))
                    + F.lit(5e-10),
                    4,
                )
                + F.lit(0.0)
            ).alias("c"),
            "n_members",
        )
        .orderBy("cell", "pos")
    )


#: multi-query batch for s12 range search.
RANGE_QUERY_IDS = (0, 1, 2, 3, 4)
#: cosine radius for s12 (synthetic corpus max pairwise cos ~0.47).
RANGE_THRESHOLD = 0.25


# S12 — batched RANGE search (radius query): all corpus vectors within a
# cosine radius of EACH of a small batch of query vectors — the "find every
# near neighbor above θ" primitive behind semantic retrieval-augmented
# filtering, where top-k truncation is wrong because the answer set size is
# data-dependent.
#
# Scale shape: the query batch is dimension-sized, so the right plan is a
# BROADCAST nested-loop of corpus × Q (linear in corpus size, Q a small
# constant) with the radius filter evaluated inside codegen — confirmed by
# the plan test: no shuffle of the corpus side at all. For a LARGE query
# batch this flips to the LSH formulation (bucket both sides on the s2
# signature and equi-join) — same recipe as d10's banded self-join.
def s12_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    ids = ", ".join(str(i) for i in RANGE_QUERY_IDS)
    q = e.filter(F.expr(f"vec_id IN ({ids})")).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(_cosine("emb", "q_emb"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= RANGE_THRESHOLD)
        .orderBy("q_id", "vec_id")
    )


#: product-quantization geometry: M subspaces of SUB dims (M*SUB == DIM),
#: K centroids per subspace. Codebook = subvectors of the first K corpus
#: vectors — deterministic, so even the quantizer is oracle-checkable
#: (production trains it with k-means; the encode/ADC dataflow is identical).
PQ_M = 8
PQ_SUB = DIM // PQ_M
PQ_K = 16


# S13 — product-quantization top-k (the FAISS IndexPQ shape): vectors are
# compressed to M 4-bit codes (argmin centroid per subspace); queries score
# candidates with the ASYMMETRIC distance (ADC) — exact query-subvector to
# centroid distances, summed via code lookup. This is the memory-bound ANN
# regime: 64-dim float vectors (256 B) become M=8 codes (8 B, 32x), so at
# 100 TB the scan reads codes, not vectors, and the per-query work is an
# M×K lookup-table build plus one gather+sum per candidate.
#
# Spark shape: the codebook is K bounded rows (collected like the IVF
# pivots — dimension-sized metadata, not data); encode + ADC run in ONE
# Arrow-vectorized mapInPandas pass (batched numpy einsum-free argmin),
# then TakeOrderedAndProject for the top-k. No shuffle at all until the
# final k rows. np's axis sums are sequential below the 128-element
# pairwise threshold, so they accumulate in the same order as the
# oracle's list_sum — the 6dp round absorbs the residual ulps.
def s13_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    e = _emb(spark, sf_dir)
    cb_rows = (
        e.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").select("emb").collect()
    )
    codebook = np.array([r["emb"] for r in cb_rows]).reshape(PQ_K, PQ_M, PQ_SUB)
    codebook = np.transpose(codebook, (1, 0, 2))  # [M, K, SUB]
    q_emb = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select("emb").first()["emb"]
    )
    qsub = np.array(q_emb).reshape(PQ_M, PQ_SUB)
    qd = ((qsub[:, None, :] - codebook) ** 2).sum(-1)  # [M, K] ADC table

    def run(batches):
        for pdf in batches:
            x = np.array(pdf["emb"].tolist()).reshape(-1, PQ_M, PQ_SUB)
            # [n, M, K] subspace distances -> 4-bit codes
            d = ((x[:, :, None, :] - codebook[None]) ** 2).sum(-1)
            codes = d.argmin(-1)  # ties -> smallest k, same as the oracle
            dist = qd[np.arange(PQ_M)[None, :], codes].sum(-1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "dist": np.round(dist, 6)}
            )

    import pandas as pd

    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "emb")
        .mapInPandas(run, schema="vec_id long, dist double")
        .orderBy("dist", "vec_id")
        .limit(TOP_K)
    )


#: s14: unrolled Lloyd iterations (each round = s11's single step).
KMEANS_ROUNDS = 2
#: s15: unrolled power-iteration steps for the dominant eigenvector.
POWER_STEPS = 12
#: fixed-point scale for integer-exact embedding accumulation (6dp covers
#: float32 mantissa precision for unit-scale components).
EMB_SCALE = 1_000_000


def _int_centroids(assigned: DataFrame) -> DataFrame:
    """(cell, pos) -> (s, n): INT64-exact component sums over members.

    Float means depend on partition summation order; scaling each
    component to an integer first makes the centroid an exact rational
    (s / SCALE / n) — bit-identical on any layout and in any engine.
    """
    return (
        assigned.select("cell", F.posexplode("emb").alias("pos", "x"))
        .groupBy("cell", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.sum(F.round(F.col("x") * EMB_SCALE).cast("long")).alias("s"),
            F.count("*").alias("n"),
        )
    )


def _assign(e: DataFrame, pivots: DataFrame) -> DataFrame:
    """Nearest-pivot assignment by cosine, deterministic tie-break (max
    cell among equal scores — the s11 contract)."""
    scored = e.crossJoin(F.broadcast(pivots)).withColumn(
        "pcos", _cosine("emb", "p_emb")
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max(F.struct("pcos", "cell")).alias("m"),
            F.first("emb").alias("emb"),
        )
        .select(F.col("m.cell").alias("cell"), "emb")
    )


# S14 — k-means via UNROLLED Lloyd rounds (the full training loop whose
# single step is s11): assign → integer-exact centroid → re-assign →
# final centroid. Each round is one broadcast crossJoin against K
# centroids + one argmax partial agg + one posexplode partial agg — the
# per-round cost is a constant number of fact-sized narrow passes, so the
# loop scales to any corpus (FAISS coarse-quantizer training shape).
# Intermediate centroids are exact rationals from int64 component sums
# (float means are partition-order-dependent; integers are not), which is
# what makes an ITERATIVE float algorithm hash-checkable across engines.
def s14_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    pivots = e.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("emb").alias("p_emb"))
    cent = _int_centroids(_assign(e, pivots))
    for _ in range(KMEANS_ROUNDS - 1):
        rebuilt = (
            cent.withColumn(
                "c", F.col("s") / float(EMB_SCALE) / F.col("n")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("p_emb")
            )
        )
        cent = _int_centroids(_assign(e, rebuilt.localCheckpoint()))
    return cent.select(
        "cell",
        "pos",
        (
            F.round(
                F.col("s") / float(EMB_SCALE) / F.col("n") + F.lit(5e-10), 4
            )
            + F.lit(0.0)
        ).alias("c"),
        F.col("n").alias("n_members"),
    ).orderBy("cell", "pos")


# S15 — PCA first principal component by power iteration on the Gram
# matrix (the covariance/whitening building block on top of s9). The Gram
# accumulates INT64-exact scaled products distributed (one narrow pass +
# one tiny shuffle; only the 64×64 integer matrix reaches the driver —
# bounded metadata, same class as a label list). The 12 unrolled
# iterations then run in plain sequential Python — 64×64 flops, and
# sequential order is the point: DuckDB's list_sum folds sequentially, so
# both engines execute the IDENTICAL IEEE operation sequence and the
# final per-vector projections (a fold over zip, also sequential) are
# bit-identical. numpy is deliberately NOT used here: its pairwise
# summation reorders additions.
def s15_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    xi = e.select(
        "vec_id",
        F.transform(
            F.col("emb"), lambda x: F.round(x * EMB_SCALE).cast("long")
        ).alias("xi"),
    )
    pairs = xi.select(
        F.posexplode("xi").alias("i", "a"), F.col("xi").alias("xi")
    ).select("i", "a", F.posexplode("xi").alias("j", "b"))
    g_int = (
        pairs.groupBy("i", "j")
        .agg(F.sum(F.col("a") * F.col("b")).alias("gi"))
        .collect()
    )
    g = [[0.0] * DIM for _ in range(DIM)]
    for r in g_int:
        g[r["i"]][r["j"]] = r["gi"] / float(EMB_SCALE) / float(EMB_SCALE)
    v = [1.0] * DIM
    for _ in range(POWER_STEPS):
        w = []
        for i in range(DIM):
            acc = 0.0
            for j in range(DIM):
                acc += g[i][j] * v[j]
            w.append(acc)
        nrm2 = 0.0
        for x in w:
            nrm2 += x * x
        nrm = nrm2 ** 0.5
        v = [x / nrm for x in w]
    arr = "array(" + ", ".join(repr(x) + "D" for x in v) + ")"
    proj = F.expr(
        f"aggregate(zip_with(emb, {arr}, (x, y) -> x * y), 0D, "
        "(acc, p) -> acc + p)"
    )
    return e.select(
        "vec_id",
        (F.round(proj + F.lit(5e-10), 4) + F.lit(0.0)).alias("pc1"),
    ).orderBy("vec_id")


#: s16 two-stage retrieval: candidate prefix width, candidate pool size.
TRUNC_DIM = 16
TRUNC_CAND = 50


# S16 — truncated-dimension two-stage retrieval (the Matryoshka/MRL
# serving pattern): stage 1 scores every vector on only the FIRST
# TRUNC_DIM components (4x less arithmetic and — with a prefix-sliced
# column layout — 4x less IO) and keeps a TRUNC_CAND candidate pool via
# TakeOrderedAndProject; stage 2 re-ranks just the pool with the full-
# dimension cosine. Recall loss is bounded by the pool size; the plan
# never materializes a global sort and the full-width vectors of
# non-candidates are never touched in stage 2.
def s16_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.slice("emb", 1, TRUNC_DIM).alias("q16"),
        F.col("emb").alias("q_emb"),
    )
    scored16 = (
        e.select("vec_id", F.slice("emb", 1, TRUNC_DIM).alias("e16"), "emb")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("cos16", _cosine("e16", "q16"))
    )
    cands = scored16.orderBy(F.desc("cos16"), "vec_id").limit(TRUNC_CAND)
    return (
        cands.select(
            "vec_id", F.round(_cosine("emb", "q_emb"), 6).alias("cos")
        )
        .orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
    )


# S17 — contrastive-pair mining (the training-data op behind every
# embedding model: for each anchor, the most similar SAME-label vector is
# the positive, the most similar DIFFERENT-label vector is the hard
# negative — "hard" because a random negative teaches nothing). Candidate
# space is the LSH sign-bucket equi-join (d12's), never all pairs; both
# argmaxes come from ONE grouped pass over the candidate pairs via
# conditional struct-max (no second join-back), with (cos desc, id asc)
# tie-breaks. At 100 TB the bucket count self-scales (derived_n_planes) as
# d12 documents.
def s17_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_sig(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
        "sig",
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
        "sig",
    )
    dot = F.expr(
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> x * y), 0D, "
        "(acc, v) -> acc + v)"
    )
    scored = (
        a.join(b, "sig")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (F.col("a_label") == F.col("b_label")).alias("same"),
            F.round(dot / (F.col("a_nrm") * F.col("b_nrm")), 6).alias("cos"),
        )
    )
    m = scored.groupBy("a_id").agg(
        F.max(
            F.when(F.col("same"), F.struct("cos", (-F.col("b_id")).alias("nb")))
        ).alias("p"),
        F.max(
            F.when(~F.col("same"), F.struct("cos", (-F.col("b_id")).alias("nb")))
        ).alias("n"),
    )
    return (
        m.filter(F.col("p").isNotNull() & F.col("n").isNotNull())
        .select(
            "a_id",
            (-F.col("p.nb")).alias("pos_id"),
            F.col("p.cos").alias("pos_cos"),
            (-F.col("n.nb")).alias("neg_id"),
            F.col("n.cos").alias("neg_cos"),
        )
        .orderBy("a_id")
    )


# S18 — ANN recall evaluation as a first-class operator (retrieval QA:
# every production ANN index ships with a recall@k monitor against the
# exact answer on a sample). Composes s1 (exact) and s2 (LSH) and scores
# |exact ∩ ann| / k — both sides are existing TakeOrdered plans, the
# intersection is a 10-row semi-join, and the whole check costs two
# corpus scans regardless of SF. Deterministic by construction since both
# inputs are (the s2 planes are fixed).
def s18_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = s1_cosine_topk(spark, sf_dir).select("vec_id")
    ann = s2_lsh_topk(spark, sf_dir).select(F.col("vec_id").alias("a_id"))
    hits = exact.join(ann, exact.vec_id == F.col("a_id"), "left_semi")
    return hits.agg(F.count("*").cast("long").alias("n_hits")).select(
        F.lit(TOP_K).alias("k"),
        "n_hits",
        F.round(F.col("n_hits") / TOP_K, 4).alias("recall_at_k"),
    )


QUERIES: dict[str, QueryFn] = {
    "s18_ann_recall": s18_ann_recall,
    "s17_hard_negatives": s17_hard_negatives,
    "s16_truncated_rerank": s16_truncated_rerank,
    "s14_kmeans_lloyd": s14_kmeans_lloyd,
    "s15_pca_power": s15_pca_power,
    "s13_pq_topk": s13_pq_topk,
    "s12_range_search": s12_range_search,
    "s1_cosine_topk": s1_cosine_topk,
    "s10_norm_outliers": s10_norm_outliers,
    "s11_kmeans_step": s11_kmeans_step,
    "s9_gram_matrix": s9_gram_matrix,
    "s2_lsh_topk": s2_lsh_topk,
    "s3_cosine_topk_pandas": s3_cosine_topk_pandas,
    "s4_ivf_topk": s4_ivf_topk,
    "s5_label_centroids": s5_label_centroids,
    "s6_quantized_topk": s6_quantized_topk,
    "s7_mmr_rerank": s7_mmr_rerank,
    "s8_knn_join": s8_knn_join,
}


def _duck_planes_sql() -> str:
    """DuckDB literal for the planes: list of DOUBLE lists."""
    rows = ", ".join(
        "[" + ", ".join(str(w) for w in plane) + "]" for plane in PLANES
    )
    return f"[{rows}]"


def _duck_cos(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2])) / "
        f"(sqrt(list_sum([x * x for x in {a}])) * sqrt(list_sum([x * x for x in {b}])))"
    )


_DUCK_COS = _duck_cos("e.emb", "q.q_emb")

#: SQL twin of :func:`derived_n_planes` — same clamp(ceil(log2(N/target)))
#: over the same corpus COUNT(*), so the oracle buckets exactly as the
#: engine does at every scale factor (LOG2 of a small-int ratio is the
#: same IEEE double in DuckDB and CPython; ceil can only disagree at exact
#: powers of two, where LOG2 is exact in both).
_DUCK_NP = (
    f"(SELECT LEAST({MAX_PLANES}, GREATEST({MIN_PLANES}, "
    f"CAST(CEIL(LOG2(COUNT(*) / {TARGET_BUCKET}.0)) AS INT))) FROM embeddings)"
)

_DUCK_SIG = " + ".join(
    f"(CASE WHEN {p} < {_DUCK_NP} AND "
    f"list_sum(list_transform(list_zip(emb, {_duck_planes_sql()}[{p + 1}]), "
    f"p -> p[1] * p[2])) >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(MAX_PLANES)
)

def _duck_mmr_sql() -> str:
    """Greedy MMR as TOP_K unrolled CTE steps (SQL has no loops; the step
    count is a small compile-time constant, so unrolling IS the declarative
    statement of the greedy recurrence). Step i picks the argmax of
    lambda*cos - mu*max(sim to selected) over the not-yet-selected pool."""

    def prev_union(i: int) -> str:
        return " UNION ALL ".join(
            f"SELECT vec_id FROM sel{j}" for j in range(1, i)
        )

    steps = []
    for i in range(2, TOP_K + 1):
        p = prev_union(i)
        steps.append(
            f"""sel{i} AS MATERIALIZED (
          SELECT {i} AS "rank", c.vec_id,
                 {MMR_LAMBDA} * c.cos - {MMR_MU} * MAX(p.s) AS score
          FROM cand c
          JOIN pair p ON p.a_id = c.vec_id
          JOIN ({p}) sel ON p.b_id = sel.vec_id
          WHERE c.vec_id NOT IN ({p})
          GROUP BY c.vec_id, c.cos
          ORDER BY score DESC, c.vec_id LIMIT 1)"""
        )
    union_all = " UNION ALL ".join(
        f'SELECT "rank", vec_id, score FROM sel{i}' for i in range(1, TOP_K + 1)
    )
    steps_sql = ",\n        ".join(steps)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID}),
        cand AS MATERIALIZED (
          SELECT e.vec_id, e.emb, {_duck_cos("e.emb", "q.q_emb")} AS cos
          FROM e, q WHERE e.vec_id != {QUERY_VEC_ID}
          ORDER BY cos DESC, e.vec_id LIMIT {MMR_POOL}),
        pair AS MATERIALIZED (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 {_duck_cos("a.emb", "b.emb")} AS s
          FROM cand a JOIN cand b ON a.vec_id != b.vec_id),
        sel1 AS MATERIALIZED (
          SELECT 1 AS "rank", vec_id, {MMR_LAMBDA} * cos AS score FROM cand
          ORDER BY score DESC, vec_id LIMIT 1),
        {steps_sql}
        SELECT "rank", vec_id, ROUND(score, 6) AS score
        FROM ({union_all}) ORDER BY "rank" """


def _duck_kmeans_sql() -> str:
    """s14 oracle: the identical two Lloyd rounds, unrolled. Intermediate
    centroids are the same exact rationals (int64 component sums / scale /
    n) the engine uses, so round 2 assigns against bit-identical pivots."""

    def assign(src: str, piv: str) -> str:
        return f"""(
          SELECT cell, emb FROM (
            SELECT e.emb, p.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_duck_cos('e.emb', 'p.p_emb')}
                                        DESC, p.cell DESC) AS rn
            FROM {src} e CROSS JOIN {piv} p) WHERE rn = 1)"""

    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        p0 AS (SELECT vec_id AS cell, emb AS p_emb FROM e
               WHERE vec_id BETWEEN 1 AND {N_CELLS}),
        a0 AS MATERIALIZED {assign('e', 'p0')},
        c0 AS MATERIALIZED (
          SELECT cell, g.pos - 1 AS pos,
                 SUM(CAST(ROUND(emb[g.pos] * {EMB_SCALE}) AS BIGINT)) AS s,
                 COUNT(*) AS n
          FROM a0, generate_series(1, {DIM}) AS g(pos)
          GROUP BY 1, 2),
        p1 AS (SELECT cell,
                      list(s / {EMB_SCALE}.0 / n ORDER BY pos) AS p_emb
               FROM c0 GROUP BY cell),
        a1 AS MATERIALIZED {assign('e', 'p1')},
        c1 AS (
          SELECT cell, g.pos - 1 AS pos,
                 SUM(CAST(ROUND(emb[g.pos] * {EMB_SCALE}) AS BIGINT)) AS s,
                 COUNT(*) AS n
          FROM a1, generate_series(1, {DIM}) AS g(pos)
          GROUP BY 1, 2)
        SELECT cell, pos,
               ROUND(s / {EMB_SCALE}.0 / n + 5e-10, 4) + 0.0 AS c,
               n AS n_members
        FROM c1 ORDER BY cell, pos"""


def _duck_pca_sql() -> str:
    """s15 oracle: int64-exact Gram, then the SAME 12 sequential power
    iterations. Every float op is a sequential list fold (list_sum /
    list_transform), mirroring the engine's plain-Python loops — numpy's
    pairwise summation would NOT match, which is why neither side uses a
    BLAS. v stays a single-row LIST through the CTE chain."""
    its = []
    prev = "v0"
    for k in range(POWER_STEPS):
        its.append(
            f"""w{k} AS MATERIALIZED (
          SELECT list(list_sum(list_transform(list_zip(grow, v),
                        p -> p[1] * p[2])) ORDER BY i) AS w
          FROM grows, {prev}),
        v{k + 1} AS MATERIALIZED (
          SELECT list_transform(w, x -> x /
                   sqrt(list_sum(list_transform(w, y -> y * y)))) AS v
          FROM w{k})"""
        )
        prev = f"v{k + 1}"
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        xi AS (SELECT vec_id,
                      list_transform(emb,
                        x -> CAST(ROUND(x * {EMB_SCALE}) AS BIGINT)) AS xi
               FROM e),
        g_int AS MATERIALIZED (
          SELECT i.i AS i, j.j AS j,
                 SUM(xi[i.i + 1] * xi[j.j + 1]) AS gi
          FROM xi, generate_series(0, {DIM - 1}) AS i(i),
               generate_series(0, {DIM - 1}) AS j(j)
          GROUP BY 1, 2),
        grows AS MATERIALIZED (
          SELECT i, list(gi / {EMB_SCALE}.0 / {EMB_SCALE}.0 ORDER BY j)
                   AS grow
          FROM g_int GROUP BY i),
        v0 AS (SELECT list_transform(range(0, {DIM}), x -> 1.0) AS v),
        {", ".join(its)}
        SELECT e.vec_id,
               ROUND(list_sum(list_transform(list_zip(e.emb, {prev}.v),
                       p -> p[1] * p[2])) + 5e-10, 4) + 0.0 AS pc1
        FROM e, {prev}
        ORDER BY e.vec_id"""


ORACLE: dict[str, str] = {
    "s17_hard_negatives": f"""
        WITH e0 AS (SELECT vec_id, label,
                           embedding::DOUBLE[] AS emb FROM embeddings),
        e AS (SELECT vec_id, label, emb, {_DUCK_SIG} AS sig,
                     sqrt(list_sum([x * x for x in emb])) AS nrm
              FROM e0),
        scored AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 a.label = b.label AS same,
                 ROUND(list_sum(list_transform(list_zip(a.emb, b.emb),
                         p -> p[1] * p[2])) / (a.nrm * b.nrm), 6) AS cos
          FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id, same
                                       ORDER BY cos DESC, b_id) AS rn
          FROM scored)
        SELECT p.a_id, p.b_id AS pos_id, p.cos AS pos_cos,
               n.b_id AS neg_id, n.cos AS neg_cos
        FROM ranked p
        JOIN ranked n ON n.a_id = p.a_id AND NOT n.same AND n.rn = 1
        WHERE p.same AND p.rn = 1
        ORDER BY p.a_id""",
    "s16_truncated_rerank": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        q AS (SELECT emb[1:{TRUNC_DIM}] AS q16, emb AS q_emb FROM e
              WHERE vec_id = {QUERY_VEC_ID}),
        cands AS (
          SELECT e.vec_id, e.emb, q.q_emb,
                 {_duck_cos(f'e.emb[1:{TRUNC_DIM}]', 'q.q16')} AS cos16
          FROM e CROSS JOIN q
          WHERE e.vec_id <> {QUERY_VEC_ID}
          ORDER BY cos16 DESC, e.vec_id LIMIT {TRUNC_CAND})
        SELECT vec_id, ROUND({_duck_cos('emb', 'q_emb')}, 6) AS cos
        FROM cands
        ORDER BY cos DESC, vec_id LIMIT {TOP_K}""",
    "s14_kmeans_lloyd": _duck_kmeans_sql(),
    "s15_pca_power": _duck_pca_sql(),
    "s13_pq_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        cb AS (SELECT vec_id AS k, emb FROM e WHERE vec_id < {PQ_K}),
        sub AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s),
        dists AS (
          SELECT x.vec_id, sub.s, c.k,
                 list_sum([ (x.emb[sub.s * {PQ_SUB} + d]
                             - c.emb[sub.s * {PQ_SUB} + d]) ^ 2
                            for d in generate_series(1, {PQ_SUB})]) AS d2
          FROM e x, sub, cb c),
        enc AS (
          SELECT vec_id, s, k AS code FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                         ORDER BY d2, k) AS rn
            FROM dists) WHERE rn = 1),
        qd AS (
          SELECT sub.s, c.k,
                 list_sum([ (q.emb[sub.s * {PQ_SUB} + d]
                             - c.emb[sub.s * {PQ_SUB} + d]) ^ 2
                            for d in generate_series(1, {PQ_SUB})]) AS d2
          FROM (SELECT emb FROM e WHERE vec_id = {QUERY_VEC_ID}) q, sub, cb c),
        adc AS (
          SELECT enc.vec_id, ROUND(SUM(qd.d2), 6) AS dist
          FROM enc JOIN qd ON enc.s = qd.s AND enc.code = qd.k
          WHERE enc.vec_id <> {QUERY_VEC_ID}
          GROUP BY enc.vec_id)
        SELECT vec_id, dist FROM adc
        ORDER BY dist, vec_id LIMIT {TOP_K}""",
    "s12_range_search": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e
              WHERE vec_id IN ({", ".join(str(i) for i in RANGE_QUERY_IDS)}))
        SELECT q.q_id, e.vec_id,
               ROUND({_duck_cos("e.emb", "q.q_emb")}, 6) AS cos
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.q_id
          AND ROUND({_duck_cos("e.emb", "q.q_emb")}, 6) >= {RANGE_THRESHOLD}
        ORDER BY q.q_id, e.vec_id""",
    "s10_norm_outliers": f"""
        WITH norms AS (
          SELECT vec_id,
                 sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM embeddings),
        nf AS (
          SELECT vec_id, nrm,
                 CAST(ROUND(nrm * {NORM_SCALE}) AS BIGINT) AS nfp
          FROM norms),
        stats AS (
          SELECT COUNT(*) AS n, SUM(nfp) AS s1,
                 SUM(CAST(nfp AS HUGEINT) * nfp) AS s2
          FROM nf),
        -- variance numerator n*s2 - s1^2 exact in HUGEINT (mirrors the
        -- engine's decimal(38,0)); one double rounding only after the
        -- exact subtraction, so sigma is cancellation-free
        st AS (
          SELECT CAST(s1 AS DOUBLE) / n AS mu,
                 sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                           AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma
          FROM stats)
        SELECT vec_id, ROUND(nrm, 4) AS l2_norm,
               ROUND((nfp - mu) / sigma, 2) + 0.0 AS z,
               ABS(ROUND((nfp - mu) / sigma, 2))
                 > {NORM_Z_THRESHOLD} AS is_outlier
        FROM nf CROSS JOIN st
        ORDER BY vec_id""",
    "s7_mmr_rerank": _duck_mmr_sql(),
    "s9_gram_matrix": f"""
        SELECT i.i AS i, j.j AS j,
               ROUND(SUM(emb[i.i + 1] * emb[j.j + 1]) + 5e-10, 4) + 0.0 AS g
        FROM (SELECT embedding::DOUBLE[] AS emb FROM embeddings),
             generate_series(0, {DIM - 1}) AS i(i),
             generate_series(0, {DIM - 1}) AS j(j)
        WHERE i.i <= j.j
        GROUP BY i.i, j.j
        ORDER BY i, j""",
    "s8_knn_join": f"""
        WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        e AS (SELECT vec_id, emb, {_DUCK_SIG} AS sig FROM e0),
        pairs AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 ROUND({_duck_cos("a.emb", "b.emb")}, 6) AS cos
          FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id != b.vec_id),
        ranked AS (
          SELECT a_id, b_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY a_id
                                         ORDER BY cos DESC, b_id) AS INT)
                   AS rnk
          FROM pairs)
        SELECT a_id, b_id, cos, rnk FROM ranked WHERE rnk <= {KNN_K}
        ORDER BY a_id, rnk""",
    "s1_cosine_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, ROUND({_DUCK_COS}, 6) AS cos
        FROM e, q WHERE e.vec_id != {QUERY_VEC_ID}
        ORDER BY cos DESC, e.vec_id LIMIT {TOP_K}""",
    "s2_lsh_topk": f"""
        WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        e AS (SELECT vec_id, emb, {_DUCK_SIG} AS sig FROM e0),
        q AS (SELECT sig AS q_sig, emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, ROUND({_DUCK_COS}, 6) AS cos
        FROM e, q WHERE e.vec_id != {QUERY_VEC_ID} AND e.sig = q.q_sig
        ORDER BY cos DESC, e.vec_id LIMIT {TOP_K}""",
    "s3_cosine_topk_pandas": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT e.vec_id, ROUND({_DUCK_COS}, 6) AS cos
        FROM e, q WHERE e.vec_id != {QUERY_VEC_ID}
        ORDER BY cos DESC, e.vec_id LIMIT {TOP_K}""",
    "s11_kmeans_step": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        p AS (SELECT vec_id AS cell, emb AS p_emb FROM e
              WHERE vec_id BETWEEN 1 AND {N_CELLS}),
        scored AS (
          SELECT e.vec_id, e.emb, p.cell,
                 {_duck_cos("e.emb", "p.p_emb")} AS pcos
          FROM e CROSS JOIN p),
        assigned AS (
          SELECT emb, cell FROM (
            SELECT emb, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY pcos DESC, cell DESC) AS rn
            FROM scored) WHERE rn = 1)
        SELECT cell, g.pos - 1 AS pos,
               ROUND(SUM(CAST(ROUND(emb[g.pos] * {EMB_SCALE}) AS BIGINT))
                     / (COUNT(*) * {EMB_SCALE}.0) + 5e-10, 4) + 0.0 AS c,
               COUNT(*) AS n_members
        FROM assigned, generate_series(1, {DIM}) AS g(pos)
        GROUP BY cell, g.pos
        ORDER BY cell, pos""",
    "s4_ivf_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        p AS (SELECT vec_id AS cell, emb AS p_emb FROM e
              WHERE vec_id BETWEEN 1 AND {N_CELLS}),
        scored AS (
          SELECT e.vec_id, e.emb, p.cell, {_duck_cos("e.emb", "p.p_emb")} AS pcos
          FROM e CROSS JOIN p),
        assigned AS (
          SELECT vec_id, emb, cell FROM (
            SELECT vec_id, emb, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY pcos DESC, cell DESC) AS rn
            FROM scored) WHERE rn = 1),
        probe AS (SELECT cell FROM scored WHERE vec_id = {QUERY_VEC_ID}
                  ORDER BY pcos DESC, cell DESC LIMIT {N_PROBE}),
        q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID})
        SELECT a.vec_id, ROUND({_duck_cos("a.emb", "q.q_emb")}, 6) AS cos
        FROM assigned a JOIN probe USING (cell), q
        WHERE a.vec_id != {QUERY_VEC_ID}
        ORDER BY cos DESC, a.vec_id LIMIT {TOP_K}""",
    "s6_quantized_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        stats AS (
          SELECT g.pos AS pos, MIN(emb[g.pos]) AS mn, MAX(emb[g.pos]) AS mx
          FROM e, generate_series(1, {DIM}) AS g(pos) GROUP BY g.pos),
        arrs AS (
          SELECT list(mn ORDER BY pos) AS mn_arr,
                 list(mx - mn ORDER BY pos) AS sc_arr
          FROM stats),
        qz AS (
          SELECT vec_id, emb,
                 [CASE WHEN sc_arr[i] = 0 THEN 0
                       ELSE CAST(floor((emb[i] - mn_arr[i]) * 255.0 / sc_arr[i])
                                 AS BIGINT) END
                  for i in generate_series(1, {DIM})] AS q
          FROM e, arrs),
        qq AS (SELECT q AS qv, emb AS q_emb FROM qz
               WHERE vec_id = {QUERY_VEC_ID}),
        cand AS (
          SELECT z.vec_id, z.emb, qq.q_emb,
                 CAST(list_sum(list_transform(list_zip(z.q, qq.qv),
                                              p -> p[1] * p[2])) AS BIGINT) AS qdot
          FROM qz z, qq WHERE z.vec_id != {QUERY_VEC_ID}
          ORDER BY qdot DESC, z.vec_id LIMIT {SQ_CAND})
        SELECT vec_id, qdot,
               ROUND({_duck_cos("emb", "q_emb")}, 6) AS cos
        FROM cand
        ORDER BY cos DESC, vec_id LIMIT {TOP_K}""",
    "s5_label_centroids": f"""
        SELECT label, g.pos - 1 AS pos,
               ROUND(SUM(CAST(ROUND(emb[g.pos] * {EMB_SCALE}) AS BIGINT))
                     / (COUNT(*) * {EMB_SCALE}.0) + 5e-10, 4) + 0.0 AS c,
               COUNT(*) AS n_vectors
        FROM (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
             generate_series(1, {DIM}) AS g(pos)
        GROUP BY label, g.pos
        ORDER BY label, pos""",
}

# s18 composes the two existing oracles verbatim — the recall check is
# definitionally "these two queries' intersection".
ORACLE["s18_ann_recall"] = f"""
    SELECT {TOP_K} AS k, CAST(COUNT(*) AS BIGINT) AS n_hits,
           ROUND(COUNT(*) / {TOP_K}.0, 4) AS recall_at_k
    FROM ({ORACLE['s1_cosine_topk']}) x
    WHERE x.vec_id IN (SELECT vec_id FROM ({ORACLE['s2_lsh_topk']}) y)"""


# S19 — IVF-PQ composite ANN (the FAISS IndexIVFPQ shape — THE
# billion-scale ANN architecture): coarse inverted-file cells prune the
# candidate set to the N_PROBE nearest cells (s4's pivot assignment),
# then product-quantized asymmetric-distance (ADC) scoring ranks ONLY
# the surviving candidates (s13's codes) — so query cost is
# ~N_PROBE/N_CELLS of the corpus at PQ_M bytes/vector of distance work,
# the exact memory/compute trade a 100 TB vector store needs. Both
# stages reuse the proven deterministic tie-breaks (max cell on pivot
# ties, min code on subspace ties), so the full composite has an exact
# DuckDB twin. The codebook and query tables are metadata-sized driver
# collects (PQ_K and 1 rows); the corpus path is one broadcast-pruned
# join + one Arrow-batched mapInPandas.
def s19_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = _emb(spark, sf_dir)
    pivots = e.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("emb").alias("p_emb"))
    scored = e.crossJoin(F.broadcast(pivots)).withColumn(
        "pcos", _cosine("emb", "p_emb")
    )
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max(F.struct("pcos", "cell")).alias("m"),
            F.first("emb").alias("emb"),
        )
        .select("vec_id", F.col("m.cell").alias("cell"), "emb")
    )
    probe_cells = (
        scored.filter(F.col("vec_id") == QUERY_VEC_ID)
        .orderBy(F.col("pcos").desc(), F.col("cell").desc())
        .limit(N_PROBE)
        .select("cell")
    )
    cb_rows = (
        e.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").select("emb").collect()
    )
    codebook = np.array([r["emb"] for r in cb_rows]).reshape(PQ_K, PQ_M, PQ_SUB)
    codebook = np.transpose(codebook, (1, 0, 2))  # [M, K, SUB]
    q_emb = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select("emb").first()["emb"]
    )
    qsub = np.array(q_emb).reshape(PQ_M, PQ_SUB)
    qd = ((qsub[:, None, :] - codebook) ** 2).sum(-1)  # [M, K]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["emb"].tolist()).reshape(-1, PQ_M, PQ_SUB)
            d = ((x[:, :, None, :] - codebook[None]) ** 2).sum(-1)
            codes = d.argmin(-1)  # ties -> smallest k, same as the oracle
            dist = qd[np.arange(PQ_M)[None, :], codes].sum(-1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "dist": np.round(dist, 6)}
            )

    return (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "emb")
        .mapInPandas(run, schema="vec_id long, dist double")
        .orderBy("dist", "vec_id")
        .limit(TOP_K)
    )


QUERIES["s19_ivfpq_topk"] = s19_ivfpq_topk
ORACLE["s19_ivfpq_topk"] = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    p AS (SELECT vec_id AS cell, emb AS p_emb FROM e
          WHERE vec_id BETWEEN 1 AND {N_CELLS}),
    cscored AS (
      SELECT e.vec_id, e.emb, p.cell, {_duck_cos("e.emb", "p.p_emb")} AS pcos
      FROM e CROSS JOIN p),
    assigned AS (
      SELECT vec_id, emb, cell FROM (
        SELECT vec_id, emb, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY pcos DESC, cell DESC) AS rn
        FROM cscored) WHERE rn = 1),
    probe AS (SELECT cell FROM cscored WHERE vec_id = {QUERY_VEC_ID}
              ORDER BY pcos DESC, cell DESC LIMIT {N_PROBE}),
    cand AS (
      SELECT a.vec_id, a.emb FROM assigned a JOIN probe USING (cell)
      WHERE a.vec_id != {QUERY_VEC_ID}),
    cb AS (SELECT vec_id AS k, emb FROM e WHERE vec_id < {PQ_K}),
    sub AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s),
    dists AS (
      SELECT x.vec_id, sub.s, c.k,
             list_sum([ (x.emb[sub.s * {PQ_SUB} + d]
                         - c.emb[sub.s * {PQ_SUB} + d]) ^ 2
                        for d in generate_series(1, {PQ_SUB})]) AS d2
      FROM cand x, sub, cb c),
    enc AS (
      SELECT vec_id, s, k AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                     ORDER BY d2, k) AS rn
        FROM dists) WHERE rn = 1),
    qd AS (
      SELECT sub.s, c.k,
             list_sum([ (q.emb[sub.s * {PQ_SUB} + d]
                         - c.emb[sub.s * {PQ_SUB} + d]) ^ 2
                        for d in generate_series(1, {PQ_SUB})]) AS d2
      FROM (SELECT emb FROM e WHERE vec_id = {QUERY_VEC_ID}) q, sub, cb c),
    adc AS (
      SELECT enc.vec_id, ROUND(SUM(qd.d2), 6) AS dist
      FROM enc JOIN qd ON enc.s = qd.s AND enc.code = qd.k
      GROUP BY enc.vec_id)
    SELECT vec_id, dist FROM adc
    ORDER BY dist, vec_id LIMIT {TOP_K}"""


# S20 — binary (sign-bit) quantized top-k: the 1-bit twin of s6's SQ8 and
# the modern "binary quantization" serving pattern (e.g. 32x-compressed
# first-stage retrieval with exact re-rank). Each vector compresses to one
# sign per dimension; candidates rank by Hamming distance to the query's
# sign vector (integer XOR/popcount work — here an exact +-1 dot product,
# the algebraic equivalent: ham = (DIM - dot)/2), and floats appear only
# for the BQ_CAND-row exact cosine re-rank. At 100 TB the candidate scan
# reads 1 bit/dim instead of 32 — the scan+shuffle saving IS the operator;
# both stages are deterministic integer math, so the full pipeline is
# hash-checkable against DuckDB. Reference contract: opaque query
# pass-through (Neo4jFormatBase.java:48) — this is an X-extension.
BQ_CAND = 30


def s20_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).selectExpr(
        "vec_id",
        "emb",
        "transform(emb, x -> IF(x >= 0D, 1, -1)) AS s",
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("s").alias("qs"), F.col("emb").alias("q_emb")
    )
    sdot = F.expr(
        "aggregate(zip_with(s, qs, (a, b) -> a * b), 0, (acc, v) -> acc + v)"
    )
    cand = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "emb",
            "q_emb",
            ((F.lit(DIM) - sdot) / F.lit(2)).cast("long").alias("ham"),
        )
        .orderBy("ham", "vec_id")
        .limit(BQ_CAND)
    )
    return (
        cand.select(
            "vec_id", "ham", F.round(_cosine("emb", "q_emb"), 6).alias("cos")
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(TOP_K)
    )


QUERIES["s20_binary_topk"] = s20_binary_topk
ORACLE["s20_binary_topk"] = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                      list_transform(embedding::DOUBLE[],
                                     x -> CASE WHEN x >= 0 THEN 1 ELSE -1 END) AS s
               FROM embeddings),
    q AS (SELECT s AS qs, emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID}),
    cand AS (
      SELECT e.vec_id, e.emb, q.q_emb,
             CAST(({DIM} - list_sum(list_transform(list_zip(e.s, q.qs),
                                                   p -> p[1] * p[2]))) / 2
                  AS BIGINT) AS ham
      FROM e CROSS JOIN q WHERE e.vec_id != {QUERY_VEC_ID}
      ORDER BY ham, e.vec_id LIMIT {BQ_CAND})
    SELECT vec_id, ham, ROUND({_duck_cos("emb", "q_emb")}, 6) AS cos
    FROM cand ORDER BY cos DESC, vec_id LIMIT {TOP_K}"""


# S21 — reciprocal-rank fusion of a LEXICAL ranking (t24's BM25 over the
# document text) and a SEMANTIC ranking (cosine to the query vector over
# the aligned embedding table) — the standard hybrid-retrieval merge
# (RRF, Cormack et al.): score(d) = sum over rankers of 1/(K + rank_d).
# Plan shape: each ranker is its own top-RRF_POOL pool (BM25 is the
# broadcast-stats scan t24 documents; the dense side is one broadcast
# query vector against the embedding scan), the pools are tiny
# (RRF_POOL rows), and the fusion is a full-outer join of the two pools
# — at 100 TB the corpus is scanned once per ranker and the fusion cost
# is O(pool), not O(corpus). Ranks come from row_number over the RAW
# BM25 double (bit-identical across engines, see bm25_raw_scored) and
# the 6dp-rounded cosine (the proven s-family convention), both
# tie-broken on doc_id, so the fused ordering is hash-stable.
RRF_K = 60
RRF_POOL = 50
RRF_TOP = 20


def s21_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_neo4j_spark.operators.text import bm25_raw_scored

    # top-RRF_POOL FIRST via orderBy().limit() — Spark plans a distributed
    # TakeOrderedAndProject (per-partition top-k + driver merge of POOL-row
    # heads), then the row_number window ranks only the POOL-row pool. A
    # global window over the corpus would collapse it into one partition.
    lex = (
        bm25_raw_scored(spark, sf_dir)
        .orderBy(F.col("bm25_raw").desc(), F.col("doc_id"))
        .limit(RRF_POOL)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.orderBy(F.col("bm25_raw").desc(), F.col("doc_id"))
            ).cast("long"),
        )
        .select("doc_id", "lex_rank")
    )
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("q_emb")
    )
    sem = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(_cosine("emb", "q_emb"), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("doc_id"))
        .limit(RRF_POOL)
        .withColumn(
            "sem_rank",
            F.row_number().over(
                Window.orderBy(F.col("cos").desc(), F.col("doc_id"))
            ).cast("long"),
        )
        .select("doc_id", "sem_rank")
    )
    rrf = (
        F.when(
            F.col("lex_rank").isNotNull(),
            F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("sem_rank").isNotNull(),
            F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")),
        ).otherwise(F.lit(0.0))
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (F.round(rrf + F.lit(5e-10), 6) + F.lit(0.0)).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_TOP)
    )


QUERIES["s21_rrf_fusion"] = s21_rrf_fusion


def _rrf_oracle() -> str:
    # leaf module, NOT operators.text: text -> dedup -> similarity already
    # import each other's oracle fragments at module init, so importing
    # text back from here would close an import cycle
    from flink_neo4j_spark.operators._bm25 import (
        BM25_ORACLE_CTES,
        BM25_ORACLE_PARTS,
    )

    return f"""
    WITH {BM25_ORACLE_CTES},
    lex AS (
      SELECT doc_id, lex_rank FROM (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY {BM25_ORACLE_PARTS} DESC,
                                       doc_id) AS BIGINT) AS lex_rank
        FROM per CROSS JOIN st)
      WHERE lex_rank <= {RRF_POOL}),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    q AS (SELECT emb AS q_emb FROM e WHERE vec_id = {QUERY_VEC_ID}),
    sem AS (
      SELECT doc_id, sem_rank FROM (
        SELECT e.vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY ROUND({_duck_cos("e.emb", "q.q_emb")}, 6) DESC,
                          e.vec_id) AS BIGINT) AS sem_rank
        FROM e CROSS JOIN q WHERE e.vec_id != {QUERY_VEC_ID})
      WHERE sem_rank <= {RRF_POOL})
    SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
           lex_rank, sem_rank,
           ROUND(COALESCE(1.0 / ({RRF_K} + lex_rank), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + sem_rank), 0.0) + 5e-10, 6)
             + 0.0 AS rrf
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}"""


ORACLE["s21_rrf_fusion"] = _rrf_oracle()
