"""Text-analysis operators over the ``documents`` table: token counting,
language ID (stopword-voting heuristic), quality scoring, and document
fingerprinting. All JVM-side expressions (regex + array built-ins) so the
hot path stays inside whole-stage codegen; each has a DuckDB oracle running
the identical algorithm.

Scale: every operator is a narrow map over documents — no shuffle at all
except the final ORDER BY (which exists only for hash-determinism in the
conformance harness; pipelines would drop it).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import math
import os

from flink_neo4j_spark.catalog import (
    documents_for_compute,
    load_table,
    session_memo,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Tiny stopword lists per language for the voting heuristic. Order matters:
#: ties resolve to the first language listed (en).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "los", "las", "y", "es", "una"),
}

#: BPE-ish token regex: runs of letters, runs of digits, or single
#: non-alphanumeric non-space symbols (same semantics in Java & RE2 regex).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

from flink_neo4j_spark.operators._bm25 import (  # noqa: E402
    BM25_B,
    BM25_K1,
    BM25_ORACLE_CTES,
    BM25_ORACLE_PARTS,
    BM25_TERMS,
    BM25_TOP,
    DUCK_TOKENS,
)

TOKENS = "split(trim(regexp_replace(lower(text), ' +', ' ')), ' ')"


def _exploded_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) corpus token stream — the shared first stage of t5
    (top terms), t6 (TF-IDF, which consumes it twice: tf and df) and t13
    (vocab induction). Session-memoized + localCheckpoint so the
    tokenize+explode map is paid once per session; per-query length filters
    apply on top of the materialized stream (a cheap in-memory scan).
    Plain ``explode`` (not _outer): t13 wants token-bearing docs only, and
    t5/t6's length filters drop null terms anyway, so the variants agree
    post-filter."""

    def build() -> DataFrame:
        d = documents_for_compute(spark, sf_dir)
        return d.selectExpr(
            "doc_id", f"explode({TOKENS}) AS term"
        ).localCheckpoint()

    key = ("exploded_tokens", os.path.abspath(sf_dir))
    return session_memo(spark, key, build)


def _arr(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _duck_arr(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# T1 — token counting: whitespace tokens + BPE-ish regex tokens.
def t1_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    return d.selectExpr(
        "doc_id",
        f"size({TOKENS}) AS ws_tokens",
        f"size(regexp_extract_all(lower(text), '{BPE_RE}', 0)) AS bpe_tokens",
    ).orderBy("doc_id")


# T2 — language ID by stopword voting: hits per language, argmax with
# declaration-order tiebreak. (Corpus `lang` labels are synthetic; the
# operator contract is the deterministic heuristic itself.)
def t2_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    hits = d.selectExpr(
        "doc_id",
        f"{TOKENS} AS toks",
        *[
            f"size(array_intersect({TOKENS}, {_arr(w)})) AS {lang}_hits"
            for lang, w in STOPWORDS.items()
        ],
    )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"{lang}_hits") for lang in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in langs:
        pred = pred.when(F.col(f"{lang}_hits") == best, F.lit(lang))
    return hits.select(
        "doc_id", *[f"{lang}_hits" for lang in langs], pred.alias("pred_lang")
    ).orderBy("doc_id")


# T3 — quality scoring: length/word-shape/stopword-ratio features + a
# composite score. Pure arithmetic; rounded for cross-engine hashing.
def t3_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    en = _arr(STOPWORDS["en"])
    return d.selectExpr(
        "doc_id",
        "n_chars",
        f"size({TOKENS}) AS n_words",
        f"ROUND(n_chars * 1.0D / size({TOKENS}), 4) AS avg_word_len",
        f"ROUND(size(filter({TOKENS}, t -> array_contains({en}, t))) * 1.0D "
        f"/ size({TOKENS}), 4) AS stop_ratio",
        f"ROUND(size(filter({TOKENS}, t -> t rlike '^[0-9]+$')) * 1.0D "
        f"/ size({TOKENS}), 4) AS digit_ratio",
    ).selectExpr(
        "doc_id",
        "n_words",
        "avg_word_len",
        "stop_ratio",
        "digit_ratio",
        # heuristic composite: favor mid-length words, some stopwords, few digits
        "ROUND(LEAST(n_words / 100.0D, 1.0D) * (1.0D - digit_ratio) * "
        "(0.5D + LEAST(stop_ratio * 5.0D, 0.5D)), 4) AS quality",
    ).orderBy("doc_id")


# T4 — document fingerprinting: md5 of normalized text (exact fp) + the
# minimum char-5-gram hash (a 1-hash winnowing sketch, stable under small
# appends — the rolling-hash analogue expressed set-wise).
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # winnowing computes one md5 per 5-gram position — CPU-bound enough to
    # warrant rebalancing the single-row-group local scan across cores.
    d = documents_for_compute(spark, sf_dir)
    return d.selectExpr(
        "doc_id",
        "trim(regexp_replace(lower(text), ' +', ' ')) AS norm",
    ).selectExpr(
        "doc_id",
        "md5(norm) AS fp",
        """CASE WHEN length(norm) >= 5 THEN
             array_min(transform(sequence(1, length(norm) - 4),
                                 i -> md5(substring(norm, i, 5))))
           ELSE md5(norm) END AS winnow""",
    ).orderBy("doc_id")


# T5 — corpus term frequencies: explode tokens, count, global top-k. The
# aggregation is map-side partial (each task pre-counts its tokens) so the
# shuffle carries one row per distinct term per task, not one per token —
# the only formulation that survives a 100 TB corpus. Final top-k is
# TakeOrderedAndProject, never a full sort.
def t5_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _exploded_tokens(spark, sf_dir)
        .filter(F.length("term") >= 3)
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(20)
    )


# T6 — TF-IDF top terms per document: the classic corpus-weighting operator.
# Three aggregations, all map-side partial: tf per (doc, term), df per term,
# then a broadcast-join of the (small) per-term df table back onto the tf
# table and a per-doc window top-k. The idf uses the smoothed form
# ln((N + 1) / (df + 1)); scores round to 4dp with the half-boundary nudge
# (see s5) so both engines agree bit-for-bit after rounding.
TFIDF_TOP_K = 3
MIN_TERM_LEN = 3


def t6_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = _exploded_tokens(spark, sf_dir).filter(
        F.length("term") >= MIN_TERM_LEN
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    n_docs = d.select("doc_id").distinct().count()  # scalar metadata, one job
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + F.lit(5e-10),
            4,
        )
        + F.lit(0.0),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", F.col("rk").cast("long").alias("rk"), "term", "tfidf")
        .orderBy("doc_id", "rk")
    )


# T7 — PII-style redaction: digit runs and email-shaped tokens replaced by
# placeholder tags, with a per-doc redaction count. Pure JVM regex — the
# shape of every scrub/normalize pass in a training-data pipeline. The
# redacted text is fingerprinted (md5) rather than hauled around whole.
# [.] instead of \. : the pattern strings embed in SQL literals on BOTH
# engines, and backslash-escape handling differs between them — a character
# class is escape-free and identical everywhere.
EMAIL_RE = "[a-zA-Z0-9_]+@[a-zA-Z0-9_]+[.][a-zA-Z]+"
DIGIT_RE = "[0-9]+"


def t7_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    return d.selectExpr(
        "doc_id",
        f"regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>'), "
        f"'{DIGIT_RE}', '<NUM>') AS red",
        f"size(regexp_extract_all(text, '{EMAIL_RE}', 0)) AS n_emails",
        f"size(regexp_extract_all(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>'), "
        f"'{DIGIT_RE}', 0)) AS n_numbers",
    ).selectExpr(
        "doc_id", "md5(red) AS redacted_fp", "n_emails", "n_numbers"
    ).orderBy("doc_id")


# T8 — sequence packing: assign documents to fixed token-budget context
# windows (the concat-and-chunk packing every LLM pretraining pipeline runs
# before tokenized shard writing). The naive form — one global cumulative
# sum — is a single-partition window, a guaranteed scale-killer at 100 TB.
# Instead the stream is SHARDED by a hash nibble of the doc key and packed
# independently per shard: Window.partitionBy(shard) keeps every cumulative
# sum inside one ordinary shuffle partition, so 1000 executors pack 1000+
# shards concurrently and a bin is globally identified by (shard, bin).
# Order within a shard is the content hash — deterministic, retry-stable,
# and engine-independent, so the whole assignment is oracle-checkable.
PACK_BUDGET = 2048
PACK_SHARDS = 16  # testing value; at 100 TB use ~4 nibbles (65k shards)
_HEX = "0123456789abcdef"


def t8_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = documents_for_compute(spark, sf_dir)
    base = d.selectExpr(
        "doc_id",
        f"CAST(size({TOKENS}) AS BIGINT) AS n_tok",
        "md5(CAST(doc_id AS STRING)) AS okey",
    ).selectExpr(
        "doc_id",
        "n_tok",
        "okey",
        f"CAST(locate(substring(okey, 1, 1), '{_HEX}') - 1 AS BIGINT) AS shard",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start")
    return (
        base.select("doc_id", "n_tok", "shard", start)
        .select(
            "doc_id",
            "n_tok",
            "shard",
            F.floor(F.col("start") / PACK_BUDGET).cast("long").alias("bin"),
            (F.col("start") % PACK_BUDGET).alias("bin_offset"),
        )
        .orderBy("doc_id")
    )


# T9 — language segmentation: chunk each document into fixed token windows
# and language-ID every chunk independently — the doc-level pass that splits
# mixed-language documents before per-language routing (the corpus has no
# sentence punctuation, so the segmenter is the fixed-window form; swapping
# the chunk key for a sentence id changes one expression). Plan: posexplode
# tokens (narrow), derive seg = pos DIV SEG_TOKENS, one partial-aggregated
# groupBy(doc_id, seg) with per-language conditional occurrence counts, and
# the same greatest/CASE winner vote as t2. Zero Python; one shuffle keyed
# by (doc_id, seg) — high cardinality, skew-free by construction.
SEG_TOKENS = 20


def t9_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    ex = d.selectExpr("doc_id", f"posexplode_outer({TOKENS}) AS (pos, term)")
    hits = [
        F.sum(
            F.when(F.col("term").isin(*words), 1).otherwise(0)
        ).alias(f"{lang}_hits")
        for lang, words in STOPWORDS.items()
    ]
    best = F.greatest(*[F.col(f"{lang}_hits") for lang in STOPWORDS])
    pred = F.when(best == 0, "unknown")
    for lang in STOPWORDS:
        pred = pred.when(F.col(f"{lang}_hits") == best, lang)
    return (
        ex.groupBy(
            "doc_id", F.expr(f"CAST(pos DIV {SEG_TOKENS} AS BIGINT)").alias("seg")
        )
        .agg(F.count("*").alias("n_terms"), *hits)
        .select(
            "doc_id",
            "seg",
            "n_terms",
            *[f"{lang}_hits" for lang in STOPWORDS],
            pred.alias("seg_lang"),
        )
        .orderBy("doc_id", "seg")
    )


# T10 — repetition filter (the Gopher-rules family): flag documents whose
# text is dominated by repeated n-grams or a single token. Three features:
# duplicate-word-bigram fraction (1 - distinct/total bigrams), top-token
# fraction (count of the modal token / token count), and symbol ratio
# (non-alphanumeric chars / chars). The bigram + symbol features are narrow
# per-row expressions; the modal token needs a per-(doc, term) count — two
# partial-aggregated shuffles keyed by high-cardinality (doc_id, term) then
# doc_id, joined back to the per-row features on doc_id. Thresholds are
# corpus-tuned so the keep flag splits the synthetic corpus non-trivially
# (production uses Gopher's published constants).
DUP_BIGRAM_MAX = 0.05
TOP_TOK_MAX = 0.13
SYMBOL_MAX = 0.1


def t10_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    toks = d.selectExpr("doc_id", f"{TOKENS} AS tok")
    # duplicate-bigram fraction: total bigrams is n_tok - 1 (positional), so
    # only the DISTINCT bigram array is materialized (rule-1 projection
    # split: tok is a real column, the transform runs once per row).
    feats = toks.selectExpr(
        "doc_id",
        "CAST(size(tok) AS BIGINT) AS n_tok",
        """CASE WHEN size(tok) >= 2 THEN
             round(1.0D - size(array_distinct(transform(
                 sequence(1, size(tok) - 1),
                 i -> concat_ws(' ', element_at(tok, i), element_at(tok, i + 1)))))
               * 1.0D / (size(tok) - 1), 4)
           ELSE 0.0D END AS dup_bigram_frac""",
    )
    sym = d.selectExpr(
        "doc_id",
        "round(size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0)) * 1.0D "
        "/ length(text), 4) AS symbol_ratio",
    )
    mode = (
        toks.selectExpr("doc_id", "explode_outer(tok) AS term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c"), 4
            ).alias("top_tok_frac")
        )
    )
    return (
        feats.join(mode, "doc_id")
        .join(sym, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            "dup_bigram_frac",
            "top_tok_frac",
            "symbol_ratio",
            (
                (F.col("dup_bigram_frac") <= DUP_BIGRAM_MAX)
                & (F.col("top_tok_frac") <= TOP_TOK_MAX)
                & (F.col("symbol_ratio") <= SYMBOL_MAX)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


# T11 — deterministic training-order shuffle: the global-shuffle-before-
# sharding pass every pretraining run needs, WITHOUT a global sort. Each doc
# gets a seed-keyed content hash; the first hex nibble routes it to a shard
# and row_number within the shard (ordered by the hash) is its position —
# so ordering work is one partitioned window, never a single-partition
# global ORDER BY. Changing SHUF_SEED reshuffles every epoch while staying
# retry-stable and engine-reproducible (same discipline as q31/q32).
SHUF_SEED = "epoch0"


def t11_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    base = d.selectExpr(
        "doc_id",
        f"md5(concat('{SHUF_SEED}|', CAST(doc_id AS STRING))) AS okey",
    ).selectExpr(
        "doc_id",
        "okey",
        f"CAST(locate(substring(okey, 1, 1), '{_HEX}') - 1 AS BIGINT) AS shard",
    )
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return (
        base.select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


# T12 — corpus-statistics perplexity proxy: a char-bigram language model
# fitted on the WHOLE corpus (add-one smoothing), then every document scored
# by its average negative log-likelihood under that model — the statistical
# quality score that separates fluent text from gibberish/boilerplate, the
# two-pass ("fit then score") shape of a real KenLM-style perplexity filter.
#
# Pass 1 (fit) is a narrow map + partial-agg count over bigrams; the model
# is at most ~27^2 rows regardless of corpus size, so pass 2 (score) joins
# it back BROADCAST — at 100 TB the corpus is read twice and shuffled never
# (the per-doc agg re-shuffles only (doc_id, ln p) pairs, partial-aggregated
# map-side). All expressions are JVM built-ins: bigram generation is a
# codegen'd transform(sequence(...)) — no Python in either pass.
def t12_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    norm = d.selectExpr(
        "doc_id", "regexp_replace(lower(text), '[^a-z ]', '') AS t"
    ).filter(F.length("t") >= 2)
    # bigrams via a MATERIALIZED char array + O(1) element_at, not
    # substring(t, i, 2): substring re-seeks from the string head per
    # lambda index (O(n^2) per doc — unbounded doc length kills it), and
    # split() must be a separate projection, never inlined in the lambda
    # (re-evaluated per iteration: measured 40 s vs 1.0 s at sf0.1).
    chars = norm.selectExpr(
        "doc_id", "split(t, '') AS ch", "length(t) AS n"
    )
    bg = chars.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, n - 1),"
                " i -> concat(element_at(ch, i), element_at(ch, i + 1)))"
            )
        ).alias("b"),
    )
    # Collapse to per-(doc, bigram) counts FIRST: the alphabet is tiny
    # (<= 27^2 bigrams), so this map-side-combining agg shrinks the corpus
    # explode to <= 729 rows/doc, and everything downstream (model build +
    # scoring join) runs over the collapsed frame — ONE pass over the raw
    # text instead of two (the previous shape re-derived the explode for
    # scoring; at 100 TB that's a second full corpus scan). Persisted
    # because model and scoring both consume it.
    bgc = bg.groupBy("doc_id", "b").agg(F.count("*").alias("k")).persist()
    model = bgc.groupBy("b").agg(F.sum("k").alias("c"))
    tot = model.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    )  # 1-row frame; crossJoin broadcasts it
    scored = (
        bgc.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "k",
            (F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v")))).alias(
                "lp"
            ),
        )
    )
    # weighted mean == the per-occurrence mean, with the weighted summation
    # mirrored in the oracle so both engines add the same terms
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("k") * F.col("lp")) / F.sum("k"), 4
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# T13 — vocabulary induction: corpus-level term + document frequencies with
# a min-document-frequency cutoff — the first pass of tokenizer/vocab
# training and of stopword/OOV analysis. Plan: one explode (narrow) + ONE
# shuffle keyed by term. COUNT(tf) partial-aggregates map-side;
# COUNT(DISTINCT doc_id) Spark plans as the standard two-phase expand-agg —
# both skew-safe because the key space (terms) is large and Zipf-heavy keys
# still partial-aggregate. The ORDER BY tf DESC presents the Zipf head
# first; rank ties break on the term itself so the full ordering is total
# and hash-stable.
VOCAB_MIN_DF = 5


def t13_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _exploded_tokens(spark, sf_dir)
    return (
        ex.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") >= VOCAB_MIN_DF)
        .orderBy(F.desc("tf"), "term")
    )


# T14 — cross-source overlap matrix: for every source pair, how many
# distinct word-shingles they share and the containment fraction
# shared/min(|A|,|B|) — the corpus-governance report behind "source B is a
# scrape of source A" and licensing/contamination review. Plan: one
# (source, shingle) distinct projection (shuffle keyed by the pair),
# materialized once and reused by the totals agg and BOTH sides of the
# shingle-keyed self-join; per-shingle pair fan-out is bounded by
# C(n_sources, 2), so no degenerate-bucket guard is needed until sources
# number in the thousands (then add d9's max-df filter).
def t14_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.operators.dedup import _shingled

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # explode_outer + materialize-right-after-explode, exactly as d9: plain
    # explode triggers InferFiltersFromGenerate, which pushes the quadratic
    # shingle expression (inlined twice) into the scan filter — measured
    # 63 s vs 1.7 s for the same projection at sf0.1
    ex = (
        _shingled(spark, sf_dir)
        .select("doc_id", F.explode_outer("sh").alias("sg"))
        .localCheckpoint()
    )
    sg_src = (
        ex.filter(F.col("sg").isNotNull())
        .join(docs, "doc_id")
        .filter(F.col("source").isNotNull())
        .select("source", "sg")
    )
    # `source` is a small categorical (20 values in this corpus), so every
    # per-source-pair statistic is a function of each shingle's SOURCE SET,
    # representable as one 64-bit mask: ONE shuffle keyed on the shingle
    # with map-side-partial bit_or replaces the distinct (source, sg)
    # shuffle + the sg-keyed SortMergeJoin self-join (two more full
    # exchanges of the shingle strings) + four rescans of that set. The
    # bit_or dedups (source, sg) inherently; totals and shared counts are
    # exact integer sums over the tiny mask histogram, identical to the
    # old pair-join counts. Falls back to the pair self-join if the source
    # dimension ever outgrows a long's bits.
    srcs = sorted(
        r[0] for r in docs.select("source").distinct().collect() if r[0] is not None
    )
    if len(srcs) > 62:
        ss = sg_src.distinct().localCheckpoint()
        totals = ss.groupBy("source").agg(F.count("*").alias("tot"))
        pairs = (
            ss.alias("a")
            .join(
                ss.alias("b"),
                (F.col("a.sg") == F.col("b.sg"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("src_a"),
                F.col("b.source").alias("src_b"),
            )
            .agg(F.count("*").alias("shared"))
        )
        return (
            pairs.join(
                F.broadcast(
                    totals.selectExpr("source AS src_a", "tot AS tot_a")
                ),
                "src_a",
            )
            .join(
                F.broadcast(
                    totals.selectExpr("source AS src_b", "tot AS tot_b")
                ),
                "src_b",
            )
            .select(
                "src_a",
                "src_b",
                "shared",
                (
                    F.round(
                        F.col("shared") / F.least("tot_a", "tot_b")
                        + F.lit(5e-10),
                        4,
                    )
                    + F.lit(0.0)
                ).alias("containment"),
            )
            .orderBy("src_a", "src_b")
        )
    n = len(srcs)
    bit_of = F.create_map(
        *[x for i, s in enumerate(srcs) for x in (F.lit(s), F.lit(i))]
    )
    name_of = F.array(*[F.lit(s) for s in srcs])
    hist = (
        sg_src.select(
            "sg", F.element_at(bit_of, F.col("source")).alias("bit")
        )
        .select("sg", F.expr("shiftleft(1L, bit)").alias("m"))
        .groupBy("sg")
        .agg(F.bit_or("m").alias("mask"))
        .groupBy("mask")
        .agg(F.count("*").alias("cnt"))
        # the histogram is bounded by min(2^n_sources, distinct shingles)
        # and feeds both totals and the pair expansion
        .withColumn(
            "bits",
            F.expr(f"filter(sequence(0, {n - 1}), b -> ((mask >> b) & 1) = 1)"),
        )
        .localCheckpoint()
    )
    totals = (
        hist.select(F.explode("bits").alias("b"), "cnt")
        .groupBy("b")
        .agg(F.sum("cnt").alias("tot"))
    )
    shared = (
        hist.select("cnt", "bits", F.posexplode("bits").alias("i", "ba"))
        .select(
            "cnt",
            "ba",
            F.explode(F.expr("slice(bits, i + 2, size(bits))")).alias("bb"),
        )
        .groupBy("ba", "bb")
        .agg(F.sum("cnt").alias("shared"))
    )
    return (
        shared.join(
            F.broadcast(totals.selectExpr("b AS ba", "tot AS tot_a")), "ba"
        )
        .join(F.broadcast(totals.selectExpr("b AS bb", "tot AS tot_b")), "bb")
        .select(
            F.element_at(name_of, F.col("ba") + 1).alias("src_a"),
            F.element_at(name_of, F.col("bb") + 1).alias("src_b"),
            "shared",
            (
                F.round(
                    F.col("shared") / F.least("tot_a", "tot_b") + F.lit(5e-10),
                    4,
                )
                + F.lit(0.0)
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


# T15 — per-source length-distribution report (the dataset-card staple):
# fixed power-of-two byte-length buckets with count/mean/min/max per
# (source, bucket). Bucket edges are INTEGER comparisons (CASE), never
# floor(log2(len)) — log2 differs by an ulp across engines near exact
# powers of two, which flips the floor. One partial-aggregated groupBy.
LEN_EDGES = (512, 1024, 2048, 4096)


def _len_bucket(col: str) -> F.Column:
    expr = F.when(F.length(col) < LEN_EDGES[0], f"0000-{LEN_EDGES[0] - 1}")
    for lo, hi in zip(LEN_EDGES, LEN_EDGES[1:]):
        expr = expr.when(F.length(col) < hi, f"{lo:04d}-{hi - 1}")
    return expr.otherwise(f"{LEN_EDGES[-1]:04d}+")


def t15_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", _len_bucket("text").alias("bucket"),
                 F.length("text").alias("len"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("len"), 2).alias("mean_len"),
            F.min("len").alias("min_len"),
            F.max("len").alias("max_len"),
        )
        .orderBy("source", "bucket")
    )


# T16 — lexical-diversity report: per-doc type-token ratio + hapax-legomena
# count (tokens occurring exactly once). Low TTR flags templated/spammy
# text; a high hapax fraction flags OCR noise and codeswitching — both
# standard corpus-quality features next to t3/t10. Shape: ONE explode of
# the token array into a (doc, token) count (map-side partial agg absorbs
# repeated tokens before the shuffle), then a per-doc re-aggregation where
# n_tokens/n_types/hapax are all conditional counts over the same run —
# the corpus is never scanned twice and nothing is quadratic in doc length.
def t16_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    tok = d.select(
        "doc_id", F.explode_outer(F.expr(TOKENS)).alias("tok")
    )
    per_tok = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.count(F.when(F.col("c") == 1, 1)).alias("hapax"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_types",
            "hapax",
            F.round(F.col("n_types") / F.col("n_tokens"), 4).alias("ttr"),
        )
        .orderBy("doc_id")
    )


# T17 — character-level Shannon entropy per document (bits/char) — the
# classic cheap screen for binary junk, base64 blobs (high entropy) and
# template/repeated filler (low entropy) in crawled corpora.
#
# H = log2(T) - (Σ c·ln c)/(T·ln 2) over per-char counts c needs only TWO
# partial-aggregable sums, so the plan is explode → partial-agg on
# (doc, char) → partial-agg on doc — all map-side combinable, one shuffle
# per level, zero Python. Rounded to 3dp so cross-partition float summation
# order can't leak into the hash (same discipline as s5/g19).
def t17_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    chars = d.select(
        "doc_id", F.explode_outer(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    return (
        freq.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("t"),
            F.sum(F.col("cnt") * F.log("cnt")).alias("s"),
        )
        .select(
            "doc_id",
            F.col("t").alias("n_chars_counted"),
            F.round(
                (F.log("t") - F.col("s") / F.col("t")) / F.log(F.lit(2.0)), 3
            ).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


# T18 — BPE merge induction: the first K merge rounds of byte-pair
# encoding over the letters-only corpus — the core primitive of tokenizer
# training (Sennrich et al.; GPT/Llama vocabularies are built exactly
# this way at corpus scale). Each round: (1) count adjacent symbol pairs
# corpus-wide (explode + partial-agg — map-side combinable, one shuffle on
# the pair key), (2) take the argmax pair with a deterministic (count
# DESC, pair ASC) tie-break — a 1-row frame, NEVER a driver collect:
# the winner is broadcast-crossJoined back so the merge application stays
# fully distributed, (3) apply the merge with one corpus-wide replace()
# (left-to-right non-overlapping in both engines, matching BPE's greedy
# left scan). The corpus is re-materialized per round (localCheckpoint) so
# round r+1's plan does not re-execute rounds 1..r; rounds are a fixed
# unrolled schedule, so the DuckDB oracle states the identical computation
# as K materialized CTE blocks (the g22 pattern).
#
# Scale shape per round: one corpus map (replace) + one explode/agg. K
# rounds = K linear passes, no driver-side data, pair-key shuffle is
# alphabet-bounded (symbols grow by 1/round). Word-boundary markers and
# pair-index caching (the production refinements) change the symbol
# alphabet, not the plan shape.
BPE_MERGE_ROUNDS = 4


def t18_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # documents_for_compute materializes the round-robin repartition BEFORE
    # the regex work: Catalyst pushes the `length(regexp_replace(...)) >= 2`
    # filter below the exchange into the scan stage, and the local testdata
    # scan is one task — without that barrier the whole letters-only
    # normalization regex runs on a single core (measured 3.3 s -> 2.0 s
    # at sf0.1).
    d = documents_for_compute(spark, sf_dir)
    # letters-only normalization, then one space between adjacent symbols
    # (concat_ws over a char split — linear, no per-char regex captures);
    # docs with < 2 symbols carry no pairs and are dropped up front.
    cur = (
        d.selectExpr(
            "doc_id", "regexp_replace(lower(text), '[^a-z]', '') AS raw"
        )
        .filter(F.length("raw") >= 2)
        .selectExpr("doc_id", "concat_ws(' ', split(raw, '')) AS s")
        .localCheckpoint()
    )
    merges = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        # split-then-project (never inline the split in the lambda — t12's
        # re-evaluation trap), pairs via O(1) element_at
        syms = cur.selectExpr("split(s, ' ') AS a").selectExpr(
            "a", "size(a) AS n"
        )
        pairs = syms.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, n - 1),"
                    " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
                )
            ).alias("p")
        )
        win = (
            pairs.groupBy("p")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "p")
            .limit(1)
            .selectExpr(
                f"CAST({rnd} AS BIGINT) AS merge_rank",
                "p AS pair",
                "replace(p, ' ', '') AS merged",
                "cnt",
            )
            .localCheckpoint()  # tiny; consumed by output AND next round
        )
        merges.append(win)
        if rnd < BPE_MERGE_ROUNDS:
            cur = (
                cur.crossJoin(F.broadcast(win.select("pair", "merged")))
                .selectExpr("doc_id", "replace(s, pair, merged) AS s")
                .localCheckpoint()
            )
    out = merges[0]
    for w in merges[1:]:
        out = out.unionByName(w)
    return out.orderBy("merge_rank")


def _t18_oracle() -> str:
    """Unrolled K-round BPE oracle — every CTE MATERIALIZED (the g22
    rule: DuckDB's default inlining re-expands each round's references to
    the previous round exponentially)."""
    ctes = [
        """d0 AS MATERIALIZED (
          SELECT doc_id,
                 trim(regexp_replace(raw, '(.)', '\\1 ', 'g')) AS s
          FROM (SELECT doc_id,
                       regexp_replace(lower(text), '[^a-z]', '', 'g') AS raw
                FROM documents)
          WHERE length(raw) >= 2)"""
    ]
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        prev = f"d{r - 1}"
        ctes.append(
            f"""p{r} AS MATERIALIZED (
              SELECT p, COUNT(*) AS cnt FROM (
                SELECT unnest([a[i] || ' ' || a[i + 1]
                               for i in generate_series(1, len(a) - 1)]) AS p
                FROM (SELECT string_split(s, ' ') AS a FROM {prev}))
              GROUP BY p)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
              SELECT CAST({r} AS BIGINT) AS merge_rank, p AS pair,
                     replace(p, ' ', '') AS merged, cnt
              FROM p{r} ORDER BY cnt DESC, p LIMIT 1)"""
        )
        if r < BPE_MERGE_ROUNDS:
            ctes.append(
                f"""d{r} AS MATERIALIZED (
                  SELECT doc_id,
                         replace(s, (SELECT pair FROM w{r}),
                                 (SELECT merged FROM w{r})) AS s
                  FROM {prev})"""
            )
    unions = " UNION ALL ".join(
        f"SELECT * FROM w{r}" for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + f" {unions} ORDER BY merge_rank"


# T19 — sentence segmentation + per-document sentence statistics (the
# unit-of-work split before sentence-level dedup, quality filtering, and
# sequence packing). Split on terminal punctuation + whitespace with a
# lookbehind-free pattern (DuckDB's RE2 twin has no lookbehind), drop
# blank fragments, and aggregate count/avg/max sentence length. The split
# is a narrow per-row map (no explode materialization needed for the
# stats — size/aggregate run on the array in place), so the only shuffle
# is the presentation sort; char sums are integers, the mean divides once
# at the end.
def t19_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    sents = F.filter(
        F.transform(
            F.split(F.col("text"), r"[.!?]\s+"), lambda s: F.trim(s)
        ),
        lambda s: F.length(s) > 0,
    )
    return (
        d.select("doc_id", sents.alias("sents"))
        .select(
            "doc_id",
            F.size("sents").alias("n_sents"),
            F.aggregate(
                "sents",
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(s),
            ).alias("sum_chars"),
            F.aggregate(
                "sents",
                F.lit(0),
                lambda acc, s: F.greatest(acc, F.length(s)),
            ).alias("max_sent_chars"),
        )
        .filter(F.col("n_sents") > 0)
        .select(
            "doc_id",
            "n_sents",
            F.round(F.col("sum_chars") / F.col("n_sents"), 2).alias(
                "avg_sent_chars"
            ),
            "max_sent_chars",
        )
        .orderBy("doc_id")
    )


#: t20: rank depth of the Zipf fit (the head is where the law holds and
#: where every engine has identical exact counts).
ZIPF_TOP = 100
#: fixed-point scale for the log-coordinate sums: ln() may differ between
#: libm implementations in the last ulp, so coordinates are rounded to 6dp
#: and summed as exact integers — the regression is then bit-identical
#: given identical rounded coordinates. 6dp keeps Σx·y well inside int64
#: (ln values ≤ ~30 → products ≤ ~1e15·R).
ZIPF_SCALE = 1_000_000


# T20 — Zipf-slope corpus diagnostic: fit log(frequency) ~ log(rank) over
# the top-R terms. A healthy natural-language corpus sits near slope -1;
# templated/spammy corpora flatten, truncated-vocab ones steepen — the
# one-number "does this look like language" screen next to t17's entropy.
# Plan: the shared token stream -> term counts (one shuffle) -> top-R via
# TakeOrderedAndProject (never a global sort) -> ONE tiny row of integer
# sufficient statistics -> closed-form slope/intercept (a17's discipline:
# integer sums make the float regression layout-independent).
def t20_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _exploded_tokens(spark, sf_dir)
    top = (
        tok.groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), "term")
        .limit(ZIPF_TOP)
    )
    w = Window.orderBy(F.desc("tf"), "term")
    xy = top.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * ZIPF_SCALE)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("tf").cast("double")) * ZIPF_SCALE)
        .cast("long")
        .alias("y"),
    )
    m = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy).cast("double") / (
        (n * sxx - sx * sx).cast("double")
    )
    intercept = (
        sy.cast("double") / n.cast("double")
        - slope * sx.cast("double") / n.cast("double")
    ) / ZIPF_SCALE
    return m.select(
        n.alias("n_terms"),
        (F.round(slope, 4) + F.lit(0.0)).alias("slope"),
        (F.round(intercept, 4) + F.lit(0.0)).alias("intercept"),
    )


QUERIES: dict[str, QueryFn] = {
    "t20_zipf_slope": t20_zipf_slope,
    "t19_sentences": t19_sentences,
    "t18_bpe_merges": t18_bpe_merges,
    "t17_char_entropy": t17_char_entropy,
    "t1_token_count": t1_token_count,
    "t16_type_token_ratio": t16_type_token_ratio,
    "t13_vocab": t13_vocab,
    "t14_source_overlap": t14_source_overlap,
    "t15_length_histogram": t15_length_histogram,
    "t2_lang_id": t2_lang_id,
    "t3_quality_score": t3_quality_score,
    "t4_fingerprint": t4_fingerprint,
    "t5_top_terms": t5_top_terms,
    "t6_tfidf": t6_tfidf,
    "t7_pii_redact": t7_pii_redact,
    "t8_pack_sequences": t8_pack_sequences,
    "t9_lang_segments": t9_lang_segments,
    "t10_repetition_filter": t10_repetition_filter,
    "t11_shuffle_shards": t11_shuffle_shards,
    "t12_bigram_lm": t12_bigram_lm,
}

_DUCK_LANG_HITS = ", ".join(
    f"len(list_intersect({DUCK_TOKENS}, {_duck_arr(w)})) AS {lang}_hits"
    for lang, w in STOPWORDS.items()
)
_DUCK_BEST = "greatest(" + ", ".join(f"{lang}_hits" for lang in STOPWORDS) + ")"
_DUCK_PRED = (
    "CASE WHEN " + _DUCK_BEST + " = 0 THEN 'unknown' "
    + " ".join(
        f"WHEN {lang}_hits = {_DUCK_BEST} THEN '{lang}'" for lang in STOPWORDS
    )
    + " END"
)

def _t14_oracle() -> str:
    from flink_neo4j_spark.operators.dedup import _DUCK_SHINGLED

    return f"""
        {_DUCK_SHINGLED},
        src AS (
          SELECT DISTINCT d.source, u.sg
          FROM (SELECT doc_id, unnest(sh) AS sg FROM s) u
          JOIN documents d ON u.doc_id = d.doc_id),
        tot AS (SELECT source, COUNT(*) AS tot FROM src GROUP BY 1),
        p AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
          FROM src a JOIN src b ON a.sg = b.sg AND a.source < b.source
          GROUP BY 1, 2)
        SELECT src_a, src_b, shared,
               ROUND(shared * 1.0 / LEAST(ta.tot, tb.tot) + 5e-10, 4) + 0.0
                 AS containment
        FROM p
        JOIN tot ta ON p.src_a = ta.source
        JOIN tot tb ON p.src_b = tb.source
        ORDER BY src_a, src_b"""


def _t15_bucket_sql() -> str:
    parts = [f"WHEN length(text) < {LEN_EDGES[0]} THEN '0000-{LEN_EDGES[0] - 1}'"]
    for lo, hi in zip(LEN_EDGES, LEN_EDGES[1:]):
        parts.append(f"WHEN length(text) < {hi} THEN '{lo:04d}-{hi - 1}'")
    return "CASE " + " ".join(parts) + f" ELSE '{LEN_EDGES[-1]:04d}+' END"


ORACLE: dict[str, str] = {
    "t20_zipf_slope": f"""
        WITH tok AS (
          SELECT unnest({DUCK_TOKENS}) AS term FROM documents),
        top AS (
          SELECT term, COUNT(*) AS tf FROM tok
          GROUP BY term ORDER BY tf DESC, term LIMIT {ZIPF_TOP}),
        xy AS (
          SELECT CAST(ROUND(ln(CAST(ROW_NUMBER() OVER
                   (ORDER BY tf DESC, term) AS DOUBLE)) * {ZIPF_SCALE})
                 AS BIGINT) AS x,
                 CAST(ROUND(ln(CAST(tf AS DOUBLE)) * {ZIPF_SCALE})
                 AS BIGINT) AS y
          FROM top),
        m AS (
          SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM xy)
        SELECT n AS n_terms,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 4) + 0.0 AS slope,
               ROUND((CAST(sy AS DOUBLE) / n
                      - CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(sx AS DOUBLE) / n) / {ZIPF_SCALE}, 4) + 0.0
                 AS intercept
        FROM m""",
    "t19_sentences": r"""
        WITH s AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(regexp_split_to_array(text, '[.!?]\s+'),
                                  x -> trim(x)),
                   x -> length(x) > 0) AS sents
          FROM documents)
        SELECT doc_id,
               CAST(len(sents) AS INT) AS n_sents,
               ROUND(list_sum(list_transform(sents, x -> length(x)))
                     / CAST(len(sents) AS DOUBLE), 2) AS avg_sent_chars,
               CAST(list_max(list_transform(sents, x -> length(x))) AS INT)
                 AS max_sent_chars
        FROM s WHERE len(sents) > 0
        ORDER BY doc_id""",
    "t18_bpe_merges": _t18_oracle(),
    "t17_char_entropy": """
        WITH ch AS (
          SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        f AS (
          SELECT doc_id, c, COUNT(*) AS cnt FROM ch
          WHERE c <> '' GROUP BY doc_id, c),
        agg AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS t,
                 SUM(cnt * ln(cnt)) AS s
          FROM f GROUP BY doc_id)
        SELECT doc_id, t AS n_chars_counted,
               ROUND((ln(t) - s / t) / ln(2), 3) AS entropy_bits
        FROM agg ORDER BY doc_id""",
    "t15_length_histogram": f"""
        SELECT source, {_t15_bucket_sql()} AS bucket,
               COUNT(*) AS n,
               ROUND(AVG(length(text)), 2) AS mean_len,
               MIN(length(text)) AS min_len,
               MAX(length(text)) AS max_len
        FROM documents
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "t14_source_overlap": _t14_oracle(),
    "t13_vocab": f"""
        SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest({DUCK_TOKENS}) AS term FROM documents)
        GROUP BY term HAVING COUNT(DISTINCT doc_id) >= {VOCAB_MIN_DF}
        ORDER BY tf DESC, term""",
    # same two-pass fit/score; DuckDB generates bigrams with a lateral
    # UNNEST(range(...)) where the engine uses transform(sequence(...)).
    "t12_bigram_lm": """
        WITH d AS (
          SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
          FROM documents),
        bg AS (
          SELECT doc_id, substring(t, CAST(i AS INT), 2) AS b
          FROM d, UNNEST(range(1, length(t))) AS u(i)
          WHERE length(t) >= 2),
        bgc AS (SELECT doc_id, b, COUNT(*) AS k FROM bg GROUP BY doc_id, b),
        model AS (SELECT b, CAST(SUM(k) AS BIGINT) AS c FROM bgc GROUP BY b),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM model)
        SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
               ROUND(-SUM(k * LN((m.c + 1.0) / (tot.n + tot.v))) / SUM(k), 4)
                 AS avg_nll
        FROM bgc JOIN model m USING (b) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id""",
    "t1_token_count": f"""
        SELECT doc_id,
               len({DUCK_TOKENS}) AS ws_tokens,
               len(regexp_extract_all(lower(text), '{BPE_RE}')) AS bpe_tokens
        FROM documents ORDER BY doc_id""",
    "t16_type_token_ratio": f"""
        WITH tok AS (
          SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents),
        pt AS (
          SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_types,
               CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS hapax,
               ROUND(COUNT(*) * 1.0 / SUM(c), 4) AS ttr
        FROM pt GROUP BY doc_id ORDER BY doc_id""",
    "t2_lang_id": f"""
        WITH hits AS (SELECT doc_id, {_DUCK_LANG_HITS} FROM documents)
        SELECT doc_id, {", ".join(f"{lang}_hits" for lang in STOPWORDS)},
               {_DUCK_PRED} AS pred_lang
        FROM hits ORDER BY doc_id""",
    "t3_quality_score": f"""
        WITH f AS (
          SELECT doc_id,
                 len({DUCK_TOKENS}) AS n_words,
                 ROUND(n_chars * 1.0 / len({DUCK_TOKENS}), 4) AS avg_word_len,
                 ROUND(len(list_filter({DUCK_TOKENS},
                       t -> list_contains({_duck_arr(STOPWORDS["en"])}, t))) * 1.0
                       / len({DUCK_TOKENS}), 4) AS stop_ratio,
                 ROUND(len(list_filter({DUCK_TOKENS},
                       t -> regexp_matches(t, '^[0-9]+$'))) * 1.0
                       / len({DUCK_TOKENS}), 4) AS digit_ratio
          FROM documents
        )
        SELECT doc_id, n_words, avg_word_len, stop_ratio, digit_ratio,
               ROUND(LEAST(n_words / 100.0, 1.0) * (1.0 - digit_ratio) *
                     (0.5 + LEAST(stop_ratio * 5.0, 0.5)), 4) AS quality
        FROM f ORDER BY doc_id""",
    "t4_fingerprint": """
        WITH n AS (
          SELECT doc_id, trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS norm
          FROM documents
        )
        SELECT doc_id, md5(norm) AS fp,
               CASE WHEN length(norm) >= 5 THEN
                 list_min([md5(substring(norm, i, 5))
                           for i in generate_series(1, length(norm) - 4)])
               ELSE md5(norm) END AS winnow
        FROM n ORDER BY doc_id""",
    "t5_top_terms": f"""
        SELECT term, COUNT(*) AS cnt
        FROM (SELECT unnest({DUCK_TOKENS}) AS term FROM documents)
        WHERE length(term) >= 3
        GROUP BY term ORDER BY cnt DESC, term LIMIT 20""",
    "t6_tfidf": f"""
        WITH f AS (
          SELECT doc_id, term
          FROM (SELECT doc_id, unnest({DUCK_TOKENS}) AS term FROM documents)
          WHERE length(term) >= {MIN_TERM_LEN}
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM f GROUP BY doc_id, term),
        idf AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM f GROUP BY term),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ROUND(tf.tf * ln((n.n + 1.0) / (idf.df + 1.0)) + 5e-10, 4) + 0.0
                   AS tfidf
          FROM tf JOIN idf USING (term), n),
        ranked AS (
          SELECT doc_id, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rk
          FROM scored)
        SELECT doc_id, rk, term, tfidf FROM ranked
        WHERE rk <= {TFIDF_TOP_K} ORDER BY doc_id, rk""",
    "t7_pii_redact": f"""
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{DIGIT_RE}', '<NUM>', 'g')) AS redacted_fp,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(
                     regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{DIGIT_RE}')) AS n_numbers
        FROM documents ORDER BY doc_id""",
    "t8_pack_sequences": f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tok,
                 md5(CAST(doc_id AS VARCHAR)) AS okey
          FROM documents),
        sharded AS (
          SELECT doc_id, n_tok, okey,
                 CAST(strpos('{_HEX}', substring(okey, 1, 1)) - 1 AS BIGINT)
                   AS shard
          FROM base),
        packed AS (
          SELECT doc_id, n_tok, shard,
                 -- CAST: DuckDB windowed SUM(BIGINT) yields HUGEINT, which
                 -- pandas materializes as float64 and the driver value-hash
                 -- then diverges from Spark's bigint (round-2 t8 hash fail)
                 CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY okey, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT)
                   AS start
          FROM sharded)
        SELECT doc_id, n_tok, shard,
               CAST(FLOOR(start * 1.0 / {PACK_BUDGET}) AS BIGINT) AS bin,
               start % {PACK_BUDGET} AS bin_offset
        FROM packed ORDER BY doc_id""",
    "t10_repetition_filter": f"""
        WITH tokd AS (SELECT doc_id, text, {DUCK_TOKENS} AS tok FROM documents),
        feats AS (
          SELECT doc_id,
                 CAST(len(tok) AS BIGINT) AS n_tok,
                 CASE WHEN len(tok) >= 2 THEN
                   round(1.0 - len(list_distinct(
                       [tok[i] || ' ' || tok[i+1]
                        for i in generate_series(1, len(tok) - 1)]))
                     * 1.0 / (len(tok) - 1), 4)
                 ELSE 0.0 END AS dup_bigram_frac,
                 round(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                       * 1.0 / length(text), 4) AS symbol_ratio
          FROM tokd),
        mode AS (
          SELECT doc_id, round(MAX(c) * 1.0 / SUM(c), 4) AS top_tok_frac
          FROM (SELECT doc_id, term, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(tok) AS term FROM tokd)
                GROUP BY doc_id, term)
          GROUP BY doc_id)
        SELECT doc_id, n_tok, dup_bigram_frac, top_tok_frac, symbol_ratio,
               (dup_bigram_frac <= {DUP_BIGRAM_MAX}
                AND top_tok_frac <= {TOP_TOK_MAX}
                AND symbol_ratio <= {SYMBOL_MAX}) AS keep
        FROM feats JOIN mode USING (doc_id)
        ORDER BY doc_id""",
    "t11_shuffle_shards": f"""
        WITH base AS (
          SELECT doc_id,
                 md5('{SHUF_SEED}|' || CAST(doc_id AS VARCHAR)) AS okey
          FROM documents),
        sharded AS (
          SELECT doc_id, okey,
                 CAST(strpos('{_HEX}', substring(okey, 1, 1)) - 1 AS BIGINT)
                   AS shard
          FROM base)
        SELECT doc_id, shard,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, doc_id)
                 AS pos
        FROM sharded ORDER BY shard, pos""",
    "t9_lang_segments": f"""
        WITH tokd AS (SELECT doc_id, {DUCK_TOKENS} AS tok FROM documents),
        ex AS (
          SELECT doc_id,
                 unnest([{{'seg': CAST((i - 1) // {SEG_TOKENS} AS BIGINT),
                           'term': tok[i]}}
                         for i in generate_series(1, len(tok))],
                        recursive := true)
          FROM tokd),
        agged AS (
          SELECT doc_id, seg, COUNT(*) AS n_terms,
                 {", ".join(
                     f"CAST(SUM(CASE WHEN list_contains({_duck_arr(w)}, term) "
                     f"THEN 1 ELSE 0 END) AS BIGINT) AS {lang}_hits"
                     for lang, w in STOPWORDS.items()
                 )}
          FROM ex GROUP BY doc_id, seg)
        SELECT doc_id, seg, n_terms,
               {", ".join(f"{lang}_hits" for lang in STOPWORDS)},
               CASE WHEN greatest({", ".join(f"{lang}_hits" for lang in STOPWORDS)}) = 0
                    THEN 'unknown'
                    {" ".join(
                        f"WHEN {lang}_hits = greatest("
                        + ", ".join(f"{l2}_hits" for l2 in STOPWORDS)
                        + f") THEN '{lang}'"
                        for lang in STOPWORDS
                    )}
               END AS seg_lang
        FROM agged ORDER BY doc_id, seg""",
}


#: t21 scorecard thresholds (C4/Gopher-style rule stack).
SCORE_MIN_QUALITY = 0.3
SCORE_ENTROPY_LO = 2.5
SCORE_ENTROPY_HI = 6.5


def t21_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality-filter scorecard — the C4-style rule stack as ONE
    decision table: repetition screens (t10), quality score (t3), char
    entropy (t17) and language id (t2) joined per doc, with the FIRST
    failing rule as the reject reason (ordered: repetitive → low_quality
    → entropy). Composition is plain DataFrame joins over the registered
    operators, so every rule's semantics stays defined in exactly one
    place; Catalyst fuses the shared ``documents`` scans where the
    intermediates allow. This is the op a curation pipeline actually
    runs: one pass, one verdict, full provenance of why."""
    lang = t2_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    qual = t3_quality_score(spark, sf_dir).select("doc_id", "quality")
    rep = t10_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    ent = t17_char_entropy(spark, sf_dir).select("doc_id", "entropy_bits")
    reason = (
        F.when(~F.col("rep_keep"), F.lit("repetitive"))
        .when(F.col("quality") < SCORE_MIN_QUALITY, F.lit("low_quality"))
        .when(
            (F.col("entropy_bits") < SCORE_ENTROPY_LO)
            | (F.col("entropy_bits") > SCORE_ENTROPY_HI),
            F.lit("entropy"),
        )
        .otherwise(F.lit("pass"))
    )
    return (
        lang.join(qual, "doc_id")
        .join(rep, "doc_id")
        .join(ent, "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            "quality",
            "entropy_bits",
            reason.alias("reason"),
            (reason == "pass").alias("keep"),
        )
        .orderBy("doc_id")
    )


QUERIES["t21_scorecard"] = t21_scorecard
ORACLE["t21_scorecard"] = f"""
    WITH lang AS (SELECT doc_id, pred_lang FROM ({ORACLE['t2_lang_id']}) x),
    qual AS (SELECT doc_id, quality FROM ({ORACLE['t3_quality_score']}) x),
    rep AS (SELECT doc_id, keep AS rep_keep
            FROM ({ORACLE['t10_repetition_filter']}) x),
    ent AS (SELECT doc_id, entropy_bits
            FROM ({ORACLE['t17_char_entropy']}) x),
    j AS (
      SELECT lang.doc_id, pred_lang, quality, entropy_bits,
             CASE WHEN NOT rep_keep THEN 'repetitive'
                  WHEN quality < {SCORE_MIN_QUALITY} THEN 'low_quality'
                  WHEN entropy_bits < {SCORE_ENTROPY_LO}
                    OR entropy_bits > {SCORE_ENTROPY_HI} THEN 'entropy'
                  ELSE 'pass' END AS reason
      FROM lang JOIN qual USING (doc_id)
      JOIN rep USING (doc_id) JOIN ent USING (doc_id))
    SELECT doc_id, pred_lang, quality, entropy_bits, reason,
           reason = 'pass' AS keep
    FROM j ORDER BY doc_id"""


def t22_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over t8's sequence packing (the QA table
    behind "are our training batches actually full?"): per shard — docs,
    tokens, bins consumed, fill rate against the token budget, and how
    many documents straddle a bin boundary (each straddle is a truncation
    or a wasted pad in the loader). Pure composition over the registered
    t8 operator: its packing semantics stay defined in one place."""
    p = t8_pack_sequences(spark, sf_dir)
    straddle = (F.col("bin_offset") + F.col("n_tok") > PACK_BUDGET).cast(
        "long"
    )
    return (
        p.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            (F.max("bin") + 1).alias("n_bins"),
            F.round(
                F.sum("n_tok") / ((F.max("bin") + 1) * float(PACK_BUDGET)),
                4,
            ).alias("fill_rate"),
            F.sum(straddle).alias("n_straddles"),
        )
        .orderBy("shard")
    )


QUERIES["t22_packing_efficiency"] = t22_packing_efficiency
ORACLE["t22_packing_efficiency"] = f"""
    WITH p AS ({ORACLE['t8_pack_sequences']})
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
           ROUND(SUM(n_tok) / ((MAX(bin) + 1) * {float(PACK_BUDGET)}), 4)
             AS fill_rate,
           CAST(SUM(CASE WHEN bin_offset + n_tok > {PACK_BUDGET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddles
    FROM p GROUP BY shard ORDER BY shard"""


#: t23 DSIR importance weighting: hashed-feature buckets + the target slice.
DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"
#: fixed-point scale for per-bucket log-ratios (a17/g33/t20 discipline:
#: integer accumulation makes the per-doc sum layout-independent).
DSIR_SCALE = 1_000_000


# T23 — DSIR-style importance weights (Xie et al., "Data Selection for
# Language Models via Importance Resampling"): score every document by how
# much more likely its hashed-feature profile is under a target domain
# (here the `lang = 'en'` slice) than under the raw corpus. This is the
# standard pretraining-mixture re-weighting op: weights feed importance
# resampling, so a web-scale raw crawl can be tilted toward a target
# distribution without training a classifier.
#
# Features are hashed word unigrams (md5 -> one of DSIR_BUCKETS buckets —
# the hash is engine-reproducible, same trick as d4's simhash bits). The
# bucket model is two add-one-smoothed count vectors; their per-bucket
# log-ratio is quantized to integer micro-units BEFORE the per-doc
# aggregation, so the Σ over a document's tokens is an exact int64 sum —
# immune to float summation order across partitions/engines — and divides
# back to the rounded per-token average at the very end.
#
# Scale shape: one token explode (narrow) -> per-bucket counts (64 rows,
# partial-agg; ONE shuffle of bucket keys) -> broadcast the 64-row model
# back -> per-doc sum (second shuffle, keyed by doc_id). The corpus is
# scanned once; nothing is collected; the model is O(DSIR_BUCKETS).
def t23_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    # localCheckpoint: toks feeds BOTH the bucket-count aggregation and the
    # per-doc scoring join; without the barrier Catalyst re-executes the
    # tokenize+md5 pipeline (the query's dominant cost) once per consumer.
    toks = (
        d.selectExpr("doc_id", "lang", f"explode({TOKENS}) AS tok")
        .selectExpr(
            "doc_id",
            "lang",
            f"CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS INT)"
            f" % {DSIR_BUCKETS} AS b",
        )
        .localCheckpoint()
    )
    cnt = toks.groupBy("b").agg(
        F.count("*").alias("raw_c"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("tgt_c"),
    )
    tot = cnt.agg(
        F.sum("raw_c").alias("raw_n"), F.sum("tgt_c").alias("tgt_n")
    )
    model = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log(
                    (F.col("tgt_c") + F.lit(1.0))
                    / (F.col("tgt_n") + F.lit(float(DSIR_BUCKETS)))
                )
                - F.log(
                    (F.col("raw_c") + F.lit(1.0))
                    / (F.col("raw_n") + F.lit(float(DSIR_BUCKETS)))
                )
            )
            * DSIR_SCALE
        )
        .cast("long")
        .alias("lr_fp"),
    )
    return (
        toks.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            (
                F.round(
                    F.sum("lr_fp")
                    / (F.count("*") * F.lit(float(DSIR_SCALE))),
                    4,
                )
                + F.lit(0.0)
            ).alias("dsir_logw"),
        )
        .orderBy("doc_id")
    )


QUERIES["t23_dsir_weights"] = t23_dsir_weights
ORACLE["t23_dsir_weights"] = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, lang,
             CAST('0x' || substring(md5(tok), 1, 4) AS INT) % {DSIR_BUCKETS}
               AS b
      FROM (SELECT doc_id, lang, unnest({DUCK_TOKENS}) AS tok
            FROM documents)
    ), cnt AS (
      SELECT b, COUNT(*) AS raw_c,
             SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
               AS tgt_c
      FROM toks GROUP BY b
    ), tot AS (
      SELECT SUM(raw_c) AS raw_n, SUM(tgt_c) AS tgt_n FROM cnt
    ), model AS (
      SELECT b,
             CAST(ROUND((ln((tgt_c + 1.0) / (tgt_n + {DSIR_BUCKETS}.0))
                       - ln((raw_c + 1.0) / (raw_n + {DSIR_BUCKETS}.0)))
                  * {DSIR_SCALE}) AS BIGINT) AS lr_fp
      FROM cnt CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           ROUND(SUM(lr_fp) / (COUNT(*) * {DSIR_SCALE}.0), 4) + 0.0
             AS dsir_logw
    FROM toks JOIN model USING (b)
    GROUP BY doc_id ORDER BY doc_id"""


# T24 — BM25 relevance scoring against a fixed query-term set: the
# classic retrieval/quality-ranking primitive a training-data pipeline
# uses to mine topical documents. Okapi BM25 with the Lucene idf form
# ln(1 + (N − df + 0.5)/(df + 0.5)).
#
# Scale shape: per-term tf is size(filter(tokens, …)) — a JVM
# higher-order expression over the one tokenize pass, NO explode and NO
# per-term shuffle; the corpus statistics (N, Σdl, per-term df) reduce to
# ONE 1-row aggregate that broadcast-joins back, so the whole query is
# two scans of the memoized token projection + one broadcast. The stats
# are exact int64 sums (avgdl materializes as dl·N/Σdl inside the score),
# so the ranking is layout-independent; both engines evaluate the same
# literal expression tree left-to-right → bit-identical doubles.
# Constants + oracle pieces live in operators/_bm25.py (leaf module shared
# with the s21 RRF fusion — see the import-cycle note there).


def bm25_raw_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc's raw (unrounded) BM25 score vs ``BM25_TERMS``.

    Shared by t24 (top-``BM25_TOP`` report) and the s21 RRF fusion
    (rank-pool input): both engines evaluate the same literal expression
    tree left-to-right, so the raw doubles are bit-identical and safe to
    ORDER BY across engines (see the t24 scale note below).
    """
    d = documents_for_compute(spark, sf_dir).selectExpr(
        "doc_id", f"{TOKENS} AS toks"
    )
    per = d.selectExpr(
        "doc_id",
        "size(toks) AS dl",
        *[
            f"size(filter(toks, x -> x = '{t}')) AS tf_{i}"
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = per.join(F.broadcast(stats))
    score = None
    for i in range(len(BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}")
        norm = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B)
            * F.col("dl")
            * F.col("n_docs")
            / F.col("sum_dl")
        )
        part = idf * tf * F.lit(BM25_K1 + 1.0) / norm
        score = part if score is None else score + part
    return scored.withColumn("bm25_raw", score).select("doc_id", "bm25_raw")


def t24_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        bm25_raw_scored(spark, sf_dir)
        .orderBy(F.col("bm25_raw").desc(), "doc_id")
        .limit(BM25_TOP)
        .selectExpr("doc_id", "ROUND(bm25_raw, 4) + 0.0 AS bm25")
    )


QUERIES["t24_bm25_scoring"] = t24_bm25_scoring


ORACLE["t24_bm25_scoring"] = f"""
    WITH {BM25_ORACLE_CTES}
    SELECT doc_id, ROUND({BM25_ORACLE_PARTS}, 4) + 0.0 AS bm25
    FROM per CROSS JOIN st
    ORDER BY {BM25_ORACLE_PARTS} DESC, doc_id LIMIT {BM25_TOP}"""


# T25 — sliding-window document chunking: the standard RAG / long-context
# pretraining step (fixed token windows with overlap so no boundary
# context is lost). Token positions come from one whitespace split; chunk
# starts stride by STRIDE with the last window allowed to be short; the
# chunk count per doc is integer-exact (1 + max(0, ⌈(n-CHUNK)/STRIDE⌉),
# computed with `div` so both engines agree on every boundary). Plan:
# split → posexplode over a per-row sequence (output rows bounded by
# 1 + n/STRIDE per doc — linear, no joins) → slice + array_join, all JVM
# array expressions inside codegen. At 100 TB this is a pure map stage:
# no shuffle at all until a downstream consumer groups.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def t25_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.split("text", " ").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    n_chunks = 1 + F.greatest(
        F.lit(0),
        F.expr(f"(n - {CHUNK_TOKENS - CHUNK_STRIDE + 1}) div {CHUNK_STRIDE}"),
    )
    return (
        toks.select(
            "doc_id",
            "toks",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "chunk_id", "start"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(
                F.col("toks"),
                F.col("start") * CHUNK_STRIDE + 1,
                CHUNK_TOKENS,
            ).alias("ctoks"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("ctoks").cast("long").alias("n_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


QUERIES["t25_chunking"] = t25_chunking
ORACLE["t25_chunking"] = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    spans AS (
      SELECT doc_id, toks,
             1 + GREATEST(0, (n - {CHUNK_TOKENS - CHUNK_STRIDE + 1})
                             // {CHUNK_STRIDE}) AS n_chunks
      FROM toks),
    idx AS (
      SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id
      FROM spans),
    chunks AS (
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
             toks[CAST(chunk_id * {CHUNK_STRIDE} + 1 AS INT) :
                  CAST(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS INT)]
               AS ctoks
      FROM idx)
    SELECT doc_id, chunk_id,
           CAST(len(ctoks) AS BIGINT) AS n_tokens,
           array_to_string(ctoks, ' ') AS chunk_text
    FROM chunks
    ORDER BY doc_id, chunk_id"""


# T26 — per-source distribution drift: Jensen-Shannon divergence (in bits)
# of each source's unigram distribution against the corpus-wide
# distribution over the top-JS_VOCAB vocabulary. The dataset-card drift
# monitor every multi-source pretraining mix runs: a source whose JS jumps
# between crawls changed its content mix. Counts are exact integers
# end-to-end; floats appear only in the per-token contribution and the
# final reduction, and BOTH engines (a) compute the contribution from the
# IDENTICAL SQL expression text and (b) sum the contributions in the
# IDENTICAL token-ascending order (array_sort + left-fold aggregate on
# Spark, list(... ORDER BY tok) + list_sum in DuckDB), so the IEEE
# addition sequence — not just the value set — matches and the rounded
# result is hash-stable (the t24/t17 ln() precedent).
#
# Plan shape: one explode pass -> one (source, tok) partial agg; the
# vocabulary is a 200-row broadcast (top-k by global count, tie-broken by
# token); the source x vocab grid is |sources| x 200 rows — constant-size
# downstream state no matter the corpus size, so the only data-
# proportional work is the token count agg. 100 TB-sane by construction.
JS_VOCAB = 200

_JS_CONTRIB_SQL = (
    "CASE WHEN c0 > 0 THEN 0.5 * (CAST(c0 AS DOUBLE) / t_s) * "
    "ln((CAST(c0 AS DOUBLE) / t_s) / "
    "((CAST(c0 AS DOUBLE) / t_s + CAST(g AS DOUBLE) / gt) / 2)) "
    "ELSE 0.0 END + "
    "0.5 * (CAST(g AS DOUBLE) / gt) * "
    "ln((CAST(g AS DOUBLE) / gt) / "
    "((CAST(c0 AS DOUBLE) / t_s + CAST(g AS DOUBLE) / gt) / 2))"
)


def t26_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = documents_for_compute(spark, sf_dir)
    tok = d.select(
        "source", F.explode(F.expr(TOKENS)).alias("tok")
    ).filter(F.col("tok") != "")
    # localCheckpoint: `counts` feeds FOUR subplans (the grid join, the
    # vocab top-k, the source list and — via vocab — the global total) and
    # Catalyst plans no ReusedExchange across them, so without
    # materialization the tokenize+explode scan executes four times
    # (plans/r09/t26_source_divergence_probe.txt: 4 Generate subtrees).
    # The frame is |sources|×|distinct tokens| — aggregate-sized, far
    # smaller than the token stream it replaces.
    counts = (
        tok.groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    vocab = (
        counts.groupBy("tok")
        .agg(F.sum("c").alias("g"))
        .orderBy(F.desc("g"), "tok")
        .limit(JS_VOCAB)
    )
    gtot = vocab.agg(F.sum("g").cast("long").alias("gt"))
    srcs = counts.select("source").distinct()
    grid = (
        srcs.crossJoin(F.broadcast(vocab))
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            "g",
            F.coalesce(F.col("c"), F.lit(0)).alias("c0"),
        )
        .withColumn(
            "t_s",
            F.sum("c0").over(Window.partitionBy("source")).cast("long"),
        )
        .crossJoin(F.broadcast(gtot))
        .withColumn("contrib", F.expr(_JS_CONTRIB_SQL))
    )
    per = grid.groupBy("source").agg(
        F.first("t_s").alias("vocab_tokens"),
        F.array_sort(F.collect_list(F.struct("tok", "contrib"))).alias(
            "arr"
        ),
    )
    js_nats = F.aggregate(
        "arr", F.lit(0.0), lambda acc, s: acc + s.getField("contrib")
    )
    return per.select(
        "source",
        "vocab_tokens",
        (F.round(js_nats / float(math.log(2.0)) + F.lit(5e-10), 6) + F.lit(0.0)).alias(
            "js_bits"
        ),
    ).orderBy("source")


QUERIES["t26_source_divergence"] = t26_source_divergence
ORACLE["t26_source_divergence"] = f"""
    WITH tokd AS (
      SELECT source, unnest({DUCK_TOKENS}) AS tok FROM documents),
    tok AS (SELECT source, tok FROM tokd WHERE tok <> ''),
    counts AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2),
    vocab AS (
      SELECT tok, CAST(SUM(c) AS BIGINT) AS g FROM counts
      GROUP BY tok ORDER BY g DESC, tok LIMIT {JS_VOCAB}),
    gtot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt FROM vocab),
    srcs AS (SELECT DISTINCT source FROM counts),
    grid AS (
      SELECT s.source, v.tok, v.g, COALESCE(c.c, 0) AS c0
      FROM srcs s CROSS JOIN vocab v
      LEFT JOIN counts c ON c.source = s.source AND c.tok = v.tok),
    gridt AS (
      SELECT source, tok, g, c0,
             CAST(SUM(c0) OVER (PARTITION BY source) AS BIGINT) AS t_s,
             (SELECT gt FROM gtot) AS gt
      FROM grid),
    contribs AS (
      SELECT source, tok, t_s,
             {_JS_CONTRIB_SQL} AS contrib
      FROM gridt),
    per AS (
      SELECT source, MIN(t_s) AS vocab_tokens,
             list_sum(list(contrib ORDER BY tok)) AS js_nats
      FROM contribs GROUP BY source)
    SELECT source, CAST(vocab_tokens AS BIGINT) AS vocab_tokens,
           ROUND(js_nats / ln(2) + 5e-10, 6) + 0.0 AS js_bits
    FROM per ORDER BY source"""
