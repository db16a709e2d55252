"""Scalar/array expression function library shared by the operator modules.

All builders return SQL expression strings or Columns composed purely of
built-in functions (JVM-side, whole-stage codegen) and are written to be
engine-neutral: each has a DuckDB twin so conformance oracles state the same
algorithm (see the ``DUCK_*`` constants next to each builder's users).
"""

from flink_neo4j_spark.functions.expressions import (
    char_grams_expr,
    cosine_col,
    minhash_expr,
    shingles_from_tokens_expr,
    tokens_expr,
)

__all__ = [
    "char_grams_expr",
    "cosine_col",
    "minhash_expr",
    "shingles_from_tokens_expr",
    "tokens_expr",
]
