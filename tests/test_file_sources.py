"""File-format I/O: schema-explicit JSONL/CSV round-trips and malformed-row
routing (the file analogue of the reference's typed JSON decode + its error
branch, Neo4jInputFormat.java:114-134)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import load_table
from flink_neo4j_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

from .conftest import SF_DIR

CUSTOMER_DDL = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)


def _customer(spark):
    return load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("c_custkey").collect()]


def test_jsonl_round_trip(spark, tmp_path):
    src = _customer(spark)
    path = str(tmp_path / "cust_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, CUSTOMER_DDL).drop(CORRUPT_COL)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_round_trip(spark, tmp_path):
    src = _customer(spark)
    path = str(tmp_path / "cust_csv")
    write_csv(src, path)
    back = read_csv(spark, path, CUSTOMER_DDL).drop(CORRUPT_COL)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_jsonl_permissive_routes_corrupt_rows(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"a": 1, "b": "x"}\n'
        "this is not json\n"
        '{"a": 2, "b": "y"}\n'
    )
    df = read_jsonl(spark, str(p), "a long, b string").cache()
    good = df.filter(F.col(CORRUPT_COL).isNull())
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    assert sorted((r["a"], r["b"]) for r in good.collect()) == [(1, "x"), (2, "y")]
    assert bad.count() == 1
    assert bad.collect()[0][CORRUPT_COL] == "this is not json"


def test_jsonl_failfast_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nnot json\n')
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, str(p), "a long", mode="FAILFAST").collect()


def test_csv_type_mismatch_routed_not_fatal(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,x\nnot_a_number,y\n")
    # cache: Spark disallows a query whose referenced columns are ONLY the
    # internal corrupt-record column on a raw CSV/JSON scan
    df = read_csv(spark, str(p), "a long, b string").cache()
    good = df.filter(F.col(CORRUPT_COL).isNull())
    assert [(r["a"], r["b"]) for r in good.collect()] == [(1, "x")]
    assert df.filter(F.col(CORRUPT_COL).isNotNull()).count() == 1


def test_write_compacted_file_counts(spark, tmp_path):
    import glob

    from flink_neo4j_spark.sources.files import write_compacted

    df = spark.range(1000).repartition(16)  # 16 small input partitions
    out = str(tmp_path / "compacted")
    write_compacted(df, out, target_rows_per_file=300)
    files = glob.glob(f"{out}/part-*")
    assert len(files) == 4  # ceil(1000/300), not 16 tiny files
    assert spark.read.parquet(out).count() == 1000

    # oversized single partition gets split by the per-file cap
    out2 = str(tmp_path / "split")
    write_compacted(df.coalesce(1), out2, target_rows_per_file=300, total_rows=1000)
    files2 = glob.glob(f"{out2}/part-*")
    assert len(files2) == 4
    assert spark.read.parquet(out2).count() == 1000


def test_orc_round_trip(spark, tmp_path):
    from flink_neo4j_spark.sources.files import read_orc, write_orc

    src = _customer(spark)
    path = str(tmp_path / "cust_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(src)
    # schema-as-projection: read just two columns through the schema arg
    two = read_orc(spark, path, "c_custkey long, c_name string")
    assert two.columns == ["c_custkey", "c_name"]
    assert two.count() == src.count()


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    import os

    from flink_neo4j_spark.sources.files import write_partitioned

    src = _customer(spark)
    path = str(tmp_path / "cust_part")
    write_partitioned(
        src, path, partition_cols=("c_mktsegment",), sort_cols=("c_custkey",)
    )
    # hive-style dirs exist, one per segment value
    segs = {r[0] for r in src.select("c_mktsegment").distinct().collect()}
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("c_mktsegment=")
    }
    assert dirs == segs
    back = spark.read.parquet(path)
    one = back.filter(F.col("c_mktsegment") == sorted(segs)[0])
    # partition pruning visible in the plan: the pushed partition filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "c_mktsegment" in plan
    expected = src.filter(F.col("c_mktsegment") == sorted(segs)[0]).count()
    assert one.count() == expected
    # round-trip equality on the full set (partition col is restored)
    assert back.count() == src.count()


def test_zorder_layout_skips_files_on_both_dims(spark, tmp_path):
    """Z-order clustering must give file-skipping on BOTH dimensions:
    for a narrow predicate on either column, the fraction of files whose
    parquet [min,max] footer range intersects must be well below 1.0 —
    whereas a single-column sort only skips on its own column."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from flink_neo4j_spark.catalog import load_table
    from flink_neo4j_spark.sources.files import write_zordered

    from .conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events").select("user_id", "value")
    zpath = str(tmp_path / "z")
    write_zordered(e, zpath, ("user_id", "value"), n_files=16)

    def overlap_fraction(path, col, lo, hi):
        files = sorted(_glob.glob(path + "/*.parquet"))
        assert len(files) >= 8
        hit = 0
        for f in files:
            md = _pq.read_metadata(f)
            mns, mxs = [], []
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    if c.path_in_schema == col:
                        mns.append(c.statistics.min)
                        mxs.append(c.statistics.max)
            if max(mxs) >= lo and min(mns) <= hi:
                hit += 1
        return hit / len(files)

    stats = e.agg(
        F.expr("percentile(user_id, 0.5)").alias("mu"),
        F.expr("percentile(value, 0.5)").alias("mv"),
        F.expr("percentile(user_id, 0.55)").alias("mu2"),
        F.expr("percentile(value, 0.55)").alias("mv2"),
    ).first()
    fu = overlap_fraction(zpath, "user_id", stats["mu"], stats["mu2"])
    fv = overlap_fraction(zpath, "value", stats["mv"], stats["mv2"])
    # both dimensions skip: a narrow band touches a minority of files
    assert fu <= 0.75 and fv <= 0.75, (fu, fv)

    # contrast: user_id-sorted layout skips on user_id but NOT on value
    spath = str(tmp_path / "s")
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    fv_sorted = overlap_fraction(spath, "value", stats["mv"], stats["mv2"])
    assert fv_sorted >= 0.9  # value band hits ~every file in sorted layout
    assert fv < fv_sorted


def test_dynamic_partition_overwrite_preserves_others(spark, tmp_path):
    """Backfilling one partition must not truncate the rest (the static-
    mode trap); the rewritten partition's content is replaced."""
    from flink_neo4j_spark.sources.files import (
        overwrite_partitions_dynamic,
        write_partitioned,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-02", 2, 20.0)],
        "day string, k long, v double",
    )
    write_partitioned(base, path, ("day",))
    repair = spark.createDataFrame(
        [("2024-01-02", 2, 99.0), ("2024-01-02", 3, 1.0)],
        "day string, k long, v double",
    )
    overwrite_partitions_dynamic(repair, path, ("day",))
    # partition values type-infer to DATE on read; compare as strings
    got = {
        (str(r["day"]), r["k"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1): 10.0,  # untouched partition survives
        ("2024-01-02", 2): 99.0,  # replaced
        ("2024-01-02", 3): 1.0,
    }
    # conf restored to the safer default afterwards
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )
