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


def test_s9_gram_state_bound_and_layout_independence(spark, tmp_path):
    """s9's per-partition GEMM: (a) every task emits exactly d(d+1)/2
    partial rows no matter how many input rows it holds (a hot/skewed
    partition concentrates ROWS, never state or shuffle volume), and
    (b) the summed Gram is identical across partition layouts and equals
    the numpy reference."""
    import numpy as np

    from flink_neo4j_spark.operators import similarity

    n, d = 40, similarity.DIM
    rng = np.random.default_rng(11)
    X = rng.standard_normal((n, d))
    rows = [(int(i), 0, [float(x) for x in X[i]]) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    tri = d * (d + 1) // 2
    e1 = spark.read.parquet(str(tmp_path / "embeddings.parquet")).selectExpr(
        "CAST(embedding AS ARRAY<DOUBLE>) AS emb"
    )
    # (a) skewed layout: everything in ONE partition of a 7-way split
    # still emits exactly tri rows per non-empty partition
    skewed = e1.repartition(7)
    parts = similarity._gram_partials(skewed).collect()
    n_nonempty = 7  # round-robin: every partition holds rows for n=40
    assert len(parts) == n_nonempty * tri

    # (b) layout independence + numpy parity of the final query
    results = []
    for nparts in (1, 7):
        df = (
            spark.read.parquet(str(tmp_path / "embeddings.parquet"))
            .repartition(nparts)
        )
        df.write.mode("overwrite").parquet(str(tmp_path / f"sf_{nparts}" / "embeddings.parquet"))
        out = similarity.s9_gram_matrix(spark, str(tmp_path / f"sf_{nparts}"))
        results.append({(r.i, r.j): r.g for r in out.collect()})
    assert results[0] == results[1]
    G = X.T @ X
    iu = np.triu_indices(d)
    want = {
        (int(i), int(j)): round(float(G[i, j]) + 5e-10, 4) + 0.0
        for i, j in zip(*iu)
    }
    assert results[0] == want


def test_d17_hot_term_excluded_before_join(spark, tmp_path, monkeypatch):
    """d17's df window: a boilerplate term present in EVERY document must
    be excluded BEFORE the posting-list self-join (never generating its
    O(df^2) pair fragments), and the surviving pair set + quantized
    cosines must match the integer-formula reference over the windowed
    vocabulary."""
    import math

    monkeypatch.setattr(dedup, "SPARSE_MAXDF_FRAC", 0.5)
    monkeypatch.setattr(dedup, "SPARSE_MAXDF_ABS", 10)
    monkeypatch.setattr(dedup, "SPARSE_COS", 0.2)

    n_docs = 30
    texts = {}
    for i in range(n_docs):
        texts[i] = f"boilerplate header unique{i} filler{i}"
    texts[0] += " zebra quokka narrow bridge"
    texts[1] += " zebra quokka narrow bridge"
    texts[2] += " crimson harbor lantern night"
    texts[3] += " crimson harbor lantern night"

    def write(docs: dict, dest: str):
        spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        ).coalesce(1).write.parquet(str(tmp_path / dest / "documents.parquet"))

    write(texts, "with_hot")
    stripped = {
        i: t.replace("boilerplate header ", "") for i, t in texts.items()
    }
    write(stripped, "without_hot")

    got = {
        (r.a_id, r.b_id): r.cos
        for r in dedup.d17_sparse_cosine(spark, str(tmp_path / "with_hot")).collect()
    }
    # behavioral exclusion proof: stripping the boilerplate terms from the
    # corpus changes nothing — they never reached the join
    got_stripped = {
        (r.a_id, r.b_id): r.cos
        for r in dedup.d17_sparse_cosine(
            spark, str(tmp_path / "without_hot")
        ).collect()
    }
    assert got == got_stripped
    assert set(got) == {(0, 1), (2, 3)}

    # integer-formula parity on the surviving slice: shared terms have
    # tf=1, df=2; per-doc vocab inside the window is the 4 shared terms
    # plus the two unique df=1 terms (dropped by SPARSE_MIN_DF)
    wq = round((1.0 + math.log(1.0)) * math.log(n_docs / 2) * dedup.SPARSE_SCALE)
    dot = 4 * wq * wq
    n2 = 4 * wq * wq
    cos = round(dot / (math.sqrt(n2) * math.sqrt(n2)), 4) + 0.0
    assert got[(0, 1)] == cos == 1.0
    assert got[(2, 3)] == cos
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


@pytest.mark.parametrize("hot_path", [False, True])
def test_d8_adaptive_paths_identical(spark, tmp_path, monkeypatch, hot_path):
    """d8's two execution paths (inline scoring vs pair re-hash when a
    join task would exceed the pair budget) must produce the identical
    pair set with the exact distances; far pairs that share a block are
    excluded on both."""
    if hot_path:  # force the re-hash path even on a 3-doc block
        monkeypatch.setattr(dedup, "D8_PAIRS_PER_TASK", 1)
    prefix = "shared sixteen c"  # 16 chars -> one block
    docs = [
        (1, prefix + "lose variant alpha text"),
        (2, prefix + "lose variant alphX text"),  # 1 edit from doc 1
        # same block, wildly different tail (> 40 edits from both)
        (3, prefix + "z" * 150),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = dedup.d8_edit_distance(spark, str(tmp_path)).collect()
    got = {(r.a_id, r.b_id): r.dist for r in rows}
    assert set(got) == {(1, 2)}, f"far pairs leaked or near pair lost: {got}"
    assert got[(1, 2)] == 1
