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


def test_d6_hot_label_task_bound_and_exact_pairs(spark, tmp_path, monkeypatch):
    """One label holding ~10x MAX_GEMM_BLOCK rows: (a) no GEMM task may
    receive more than 2x MAX_GEMM_BLOCK rows (the hot-label OOM guard),
    (b) every within-label pair is covered exactly once, and (c) the
    emitted pair set equals the brute-force reference."""
    import itertools

    import numpy as np
    from pyspark.sql import functions as F

    block = 8
    hot_n, cold_n = 83, 5  # hot label ~10.4x block
    rng = np.random.default_rng(7)
    rows = [
        (int(i), 1, [float(x) for x in rng.standard_normal(4)])
        for i in range(hot_n)
    ] + [
        (int(100 + i), 2, [float(x) for x in rng.standard_normal(4)])
        for i in range(cold_n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).repartition(4).write.parquet(str(tmp_path / "embeddings.parquet"))

    e = (
        spark.read.parquet(str(tmp_path / "embeddings.parquet"))
        .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
    )
    tasks = dedup._gemm_tasks(e, block)

    # (a) bounded tasks
    sizes = tasks.groupBy("label", "i", "j").count().collect()
    assert max(r["count"] for r in sizes) <= 2 * block
    # diagonal tasks hold one sub-block, off-diagonal exactly two
    for r in sizes:
        assert r["count"] <= (block if r["i"] == r["j"] else 2 * block)

    # (b) exact single coverage of every within-label pair
    assign = tasks.select("label", "vec_id", "s", "i", "j").collect()
    by_task: dict = {}
    for r in assign:
        by_task.setdefault((r["label"], r["i"], r["j"]), []).append((r["vec_id"], r["s"]))
    covered: dict = {}
    for (label, i, j), members in by_task.items():
        left = [v for v, s in members if s == i]
        right = [v for v, s in members if s == j]
        pairs = (
            itertools.combinations(sorted(left), 2)
            if i == j
            else ((a, b) for a in left for b in right)
        )
        for a, b in pairs:
            key = (label, min(a, b), max(a, b))
            covered[key] = covered.get(key, 0) + 1
    n_expected = hot_n * (hot_n - 1) // 2 + cold_n * (cold_n - 1) // 2
    assert len(covered) == n_expected
    assert set(covered.values()) == {1}  # each pair exactly once

    # (c) emitted pairs equal the unblocked brute-force reference
    monkeypatch.setattr(dedup, "MAX_GEMM_BLOCK", block)
    got = {
        (r.a_id, r.b_id, r.cos)
        for r in dedup.d6_embedding_near_dup(spark, str(tmp_path)).collect()
    }
    vecs = {int(v): np.asarray(emb) for v, _, emb in rows}
    want = set()
    for label, ids in ((1, range(hot_n)), (2, range(100, 100 + cold_n))):
        for a, b in itertools.combinations(ids, 2):
            va, vb = vecs[a], vecs[b]
            cos = round(
                float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4
            )
            if cos >= dedup.COSINE_THRESHOLD:
                want.add((a, b, cos))
    assert got == want and len(want) > 0
