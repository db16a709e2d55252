"""The connector as a registered PySpark DataSource: ``spark.read.format
("cypher")`` / ``df.write.format("cypher")`` end-to-end through executors,
against the spool transport and the fake HTTP transactional endpoint."""

from __future__ import annotations

import pytest

from flink_neo4j_spark.sources.datasource import (
    CypherDataSource,
    CypherReader,
)
from pyspark.sql import types as T

from .test_http_transport import fake_server  # noqa: F401 - fixture reuse


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(CypherDataSource)
    return spark


def test_write_then_read_spool(registered, tmp_path):
    spark = registered
    spool = str(tmp_path / "spool")
    df = spark.createDataFrame(
        [("Alice", 1984), ("Bob", 1983), ("Eve", 1984)],
        "name string, born long",
    ).repartition(2)
    (
        df.write.format("cypher")
        .option("transport", "file")
        .option("spool_dir", spool)
        .option("label", "User")
        .option("batch_size", "2")
        .mode("append")
        .save()
    )
    out = (
        spark.read.format("cypher")
        .option("transport", "file")
        .option("spool_dir", spool)
        .option("query", "MATCH (n:User) RETURN n.name AS name, n.born AS born")
        .option("schema", "name string, born long")
        .load()
    )
    assert sorted((r.name, r.born) for r in out.collect()) == [
        ("Alice", 1984),
        ("Bob", 1983),
        ("Eve", 1984),
    ]


def test_round_trip_http(registered, fake_server):  # noqa: F811
    spark = registered
    df = spark.createDataFrame(
        [("Ann", 1990), ("Ben", 1991)], "name string, born long"
    )
    (
        df.write.format("cypher")
        .option("transport", "http")
        .option("rest_uri", fake_server.rest_uri)
        .option("label", "User")
        .mode("append")
        .save()
    )
    assert sorted(r["name"] for r in fake_server.store) == ["Ann", "Ben"]
    out = (
        spark.read.format("cypher")
        .option("transport", "http")
        .option("rest_uri", fake_server.rest_uri)
        .option("query", "MATCH (n:User) RETURN n.name AS name, n.born AS born")
        .option("schema", "name string, born long")
        .load()
    )
    assert sorted((r.name, r.born) for r in out.collect()) == [
        ("Ann", 1990),
        ("Ben", 1991),
    ]


def test_merge_upsert_template(registered, fake_server):  # noqa: F811
    spark = registered
    df = spark.createDataFrame([(1, "x")], "id long, val string")
    (
        df.write.format("cypher")
        .option("transport", "http")
        .option("rest_uri", fake_server.rest_uri)
        .option("label", "Item")
        .option("merge_key", "id")
        .mode("append")
        .save()
    )
    stmt = fake_server.requests[-1]["statement"]["statement"]
    assert stmt.startswith("UNWIND $rows AS r MERGE (n:Item {id: r.id})")
    assert "SET n.val = r.val" in stmt


def test_partition_planning_contract():
    schema = T.StructType.fromDDL("name string")
    r = CypherReader(
        schema,
        {
            "query": "MATCH (n) RETURN n.name AS name",
            "num_partitions": "3",
            "partition_template": (
                "MATCH (n) WHERE id(n) % {n} = {i} RETURN n.name AS name"
            ),
        },
    )
    parts = r.partitions()
    assert [p.query for p in parts] == [
        f"MATCH (n) WHERE id(n) % 3 = {i} RETURN n.name AS name"
        for i in range(3)
    ]
    with pytest.raises(ValueError, match="partition_template"):
        CypherReader(
            schema, {"query": "q", "num_partitions": "2"}
        ).partitions()


def test_schema_required(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception, match="schema"):
        (
            spark.read.format("cypher")
            .option("transport", "file")
            .option("spool_dir", str(tmp_path))
            .option("query", "MATCH (n) RETURN n")
            .load()
        )


def test_overwrite_rejected(registered, tmp_path):
    spark = registered
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception, match="append/upsert-only"):
        (
            df.write.format("cypher")
            .option("transport", "file")
            .option("spool_dir", str(tmp_path))
            .option("label", "X")
            .mode("overwrite")
            .save()
        )
