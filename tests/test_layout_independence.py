"""Layout independence of rounded-float results.

Float addition is not associative, so a SUM of doubles can change at the
ROUND boundary when the partition layout changes (the q43 lesson: a result
that hash-matched in one session flipped in a fresh session with a
different shuffle-partition count). Queries whose per-group accumulations
are integer fixed-point by design must produce BIT-IDENTICAL rounded
output under any layout — this test re-runs them with a different
``spark.sql.shuffle.partitions`` and compares canonical hashes.
"""

from __future__ import annotations

import hashlib

import pytest

from flink_neo4j_spark.registry import all_queries

from .conftest import SF_DIR

#: queries whose docstrings promise layout-independent accumulation
FIXED_POINT_QUERIES = [
    "s5_label_centroids",
    "s10_norm_outliers",
    "s11_kmeans_step",
    "t23_dsir_weights",
    "a21_seasonal_decomp",
    "g34_copurchase_pmi",
    "t20_zipf_slope",
    "a15_twap",
    "a17_series_corr",
]


def _canonical_hash(df) -> str:
    cols = sorted(df.columns)
    pdf = df.toPandas()[cols]
    rows = sorted(
        "|".join(repr(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def _clear_projection_memo(spark):
    """Drop session-memoized projections so the second layout rebuilds them
    from scratch — otherwise every shuffle inside a memoized prefix (the
    documents/cust-part checkpoints) runs only under the FIRST layout and
    the test exercises nothing upstream of the memo."""
    spark.__dict__.get("_fns_projection_memo", {}).clear()


@pytest.mark.parametrize("name", FIXED_POINT_QUERIES)
def test_result_is_identical_across_shuffle_layouts(spark, name):
    fn = all_queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        _clear_projection_memo(spark)
        h3 = _canonical_hash(fn(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        _clear_projection_memo(spark)
        h17 = _canonical_hash(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        _clear_projection_memo(spark)
    assert h3 == h17, f"{name} result depends on partition layout"
