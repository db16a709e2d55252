"""BM25 constants + DuckDB oracle pieces, shared by t24 (operators/text.py)
and the s21 RRF fusion (operators/similarity.py).

A LEAF module on purpose: the operator modules import each other's oracle
fragments at import time (text -> dedup -> similarity), so similarity must
not import text back — both take the BM25 surface from here instead.
"""

from __future__ import annotations

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("dup", "hash", "join", "stream")
BM25_TOP = 25

#: whitespace-run tokenizer over `text` — DuckDB twin of text.py's TOKENS
#: (string_split on single spaces after run-collapse, so both engines see
#: identical token arrays including empty-text behavior).
DUCK_TOKENS = "string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' ')"


def _bm25_oracle_pieces() -> tuple[str, str]:
    """(CTE prefix defining per/st, raw-score expression). Both engines
    evaluate the same literal expression tree left-to-right, so the raw
    doubles are bit-identical and safe to ORDER BY across engines."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    parts = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {BM25_K1 + 1.0}"
        f" / (tf_{i} + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}"
        f" * dl * n_docs / sum_dl)))"
        for i in range(len(BM25_TERMS))
    )
    ctes = f"""per AS MATERIALIZED (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents)
    ), st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {df_cols}
      FROM per
    )"""
    return ctes, parts


BM25_ORACLE_CTES, BM25_ORACLE_PARTS = _bm25_oracle_pieces()
