"""Scale-guard tests for the dedup family: degenerate buckets must be
dropped (d5, d8) and hot labels split into bounded GEMM sub-blocks (d6)
without changing the pair set. These guard the 100 TB posture — a
boilerplate-heavy corpus or one hot cluster label must not go quadratic
on a single key or OOM one executor."""

from __future__ import annotations

import pytest

from flink_neo4j_spark.operators import dedup


@pytest.fixture()
def synth_dir(spark, tmp_path):
    """A corpus with one degenerate block: 5 documents sharing text (same
    minhash bucket AND same 16-char prefix), plus 2 benign near-identical
    docs that must still pair up."""
    docs = [
        # degenerate clones (identical normalized text)
        *[(i, "the same boilerplate header text repeated everywhere") for i in range(5)],
        # benign near-dup pair, distinct block from the clones
        (10, "zebra quokka walks the narrow bridge tonight"),
        (11, "zebra quokka walks the narrow bridge today"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    embs = [
        (i, 1, [float(i % 3 == 0)] * 4 + [1.0] * 4) for i in range(20)
    ]  # one hot label with 20 vectors
    spark.createDataFrame(
        embs, "vec_id long, label int, embedding array<float>"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_d5_degenerate_bucket_dropped(spark, synth_dir, monkeypatch):
    monkeypatch.setattr(dedup, "NEAR_DUP_MAX_BUCKET", 4)
    rows = dedup.d5_ngram_jaccard(spark, synth_dir).collect()
    ids = {(r.a_id, r.b_id) for r in rows}
    # the 5 clones (10 quadratic pairs) are gone; the benign pair survives
    assert all(a >= 10 for a, _ in ids), f"clone pairs leaked: {ids}"
    assert (10, 11) in ids


def test_d8_degenerate_prefix_dropped(spark, synth_dir, monkeypatch):
    monkeypatch.setattr(dedup, "NEAR_DUP_MAX_BUCKET", 4)
    rows = dedup.d8_edit_distance(spark, synth_dir).collect()
    ids = {(r.a_id, r.b_id) for r in rows}
    assert all(a >= 10 for a, _ in ids), f"clone pairs leaked: {ids}"
    assert (10, 11) in ids


def test_d5_guard_off_keeps_pairs(spark, synth_dir):
    # default cap (1000) far above the fixture: clones pair quadratically
    rows = dedup.d5_ngram_jaccard(spark, synth_dir).collect()
    clone_pairs = {(r.a_id, r.b_id) for r in rows if r.a_id < 5 and r.b_id < 5}
    assert len(clone_pairs) == 10  # C(5,2)


def test_duckdb_tokenizer_matches_spark_on_whitespace_runs(spark):
    """Oracle-parity guard: normalization collapsing 'a, b' to 'a  b' must
    tokenize identically in both engines (no empty-string tokens)."""
    import duckdb

    from flink_neo4j_spark.functions import tokens_expr

    texts = ["a, b", "x  --  y!", " lead trail ", "comma,separated,words"]
    spark_toks = [
        r.t
        for r in spark.createDataFrame([(t,) for t in texts], "text string")
        .selectExpr(f"{tokens_expr('text')} AS t")
        .collect()
    ]
    con = duckdb.connect()
    duck_toks = [
        con.execute(f"SELECT {dedup.DUCK_TOKENS} FROM (SELECT ? AS text)", [t]).fetchone()[0]
        for t in texts
    ]
    assert spark_toks == duck_toks


def test_d6_subblock_decomposition_is_exact(spark, synth_dir, monkeypatch):
    """Forcing 20 vectors through 8-row sub-blocks (3 sub-blocks, 6 GEMM
    tasks) must yield exactly the single-block pair set."""
    whole = dedup.d6_embedding_near_dup(spark, synth_dir).collect()
    monkeypatch.setattr(dedup, "MAX_GEMM_BLOCK", 8)
    split = dedup.d6_embedding_near_dup(spark, synth_dir).collect()
    as_set = lambda rows: {(r.a_id, r.b_id, r.cos) for r in rows}
    assert as_set(whole) == as_set(split)
    assert len(whole) > 0  # fixture produces real near-dups
