"""Engine-neutral expression builders.

These encode the hard-won performance rules from the dedup/similarity/text
operators (measured at sf0.01/sf0.1, see operator docstrings):

1. An expression referenced inside a ``transform``/``filter`` lambda is
   re-evaluated PER ELEMENT — builders that consume arrays therefore take a
   *column name* and require the caller to materialize the array in its own
   projection first (``tokens_expr`` then ``shingles_from_tokens_expr``).
2. Filters on array results (``size(arr) > 0``) get pushdown-inlined at the
   scan with the whole array expression substituted — filter on the cheap
   linear precondition instead (token count, string length).
3. ``explode`` triggers InferFiltersFromGenerate which reintroduces (2);
   use ``explode_outer`` when emptiness is already guaranteed upstream.

The md5-based hash primitive is deliberate: a lexicographic min over md5 hex
strings is a valid min-hash and is bit-identical in Spark, DuckDB, and any
engine with a standard md5 — which is what makes the approximate operators
oracle-checkable (SURVEY.md §2.3 determinism rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_expr(text_col: str = "text") -> str:
    """Normalized token array: lowercase, strip non-alphanumerics, split on
    whitespace runs. One regex + one split per row — linear."""
    return f"split(trim(regexp_replace(lower({text_col}), '[^a-z0-9 ]', ' ')), ' +')"


def shingles_from_tokens_expr(tok_col: str = "tok", k: int = 3) -> str:
    """Distinct word k-shingles over a MATERIALIZED token-array column.

    ``tok_col`` must be a real column (rule 1 above), never an inline
    expression. Guarded for <k tokens because ``sequence(1, n)`` descends
    when n < 1.
    """
    parts = ", ".join(f"element_at({tok_col}, i + {j})" for j in range(k))
    return f"""
    CASE WHEN size({tok_col}) >= {k} THEN
      array_distinct(transform(
        sequence(1, size({tok_col}) - {k - 1}),
        i -> concat_ws(' ', {parts})))
    ELSE array() END
    """


def char_grams_expr(norm_col: str = "norm", n: int = 5) -> str:
    """Distinct character n-grams over a MATERIALIZED normalized-string
    column (rule 1 above)."""
    return f"""
    CASE WHEN length({norm_col}) >= {n} THEN
      array_distinct(transform(sequence(1, length({norm_col}) - {n - 1}),
                               i -> substring({norm_col}, i, {n})))
    ELSE array() END
    """


def minhash_expr(arr_col: str, seed: str) -> str:
    """Min-hash of a string-array column under one md5 'permutation' keyed
    by ``seed``. Engine-neutral: identical value in DuckDB via
    ``list_min([md5(seed || '|' || x) for x in arr])``."""
    return f"array_min(transform({arr_col}, x -> md5(concat('{seed}|', x))))"


def cosine_col(a: str, b: str) -> Column:
    """Cosine similarity between two double-array columns via sequential
    folds (deterministic order, matches DuckDB's list_sum twin).

    NOTE: interpreted per element — right for one broadcast query vector
    against a scan (s1/s2), wrong for dense pair tables: there, use the
    per-block numpy GEMM pattern (dedup.d6) — lambda HOFs measured 20x
    slower than BLAS on pair workloads, and flat expanded expressions
    exceed HotSpot's JIT method limit.
    """
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )
    na = F.expr(f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))")
    nb = F.expr(f"sqrt(aggregate({b}, 0D, (acc, v) -> acc + v * v))")
    return dot / (na * nb)
