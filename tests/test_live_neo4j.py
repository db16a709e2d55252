"""Live-server verification (docs/LIVE_VERIFICATION.md): the same
contracts the golden wire fixtures pin, exercised against a REAL Neo4j.

Collected but SKIPPED unless ``NEO4J_LIVE_HTTP_URI`` is set — the build
sandbox has no server, so these convert the standing live-protocol-drift
risk into a one-command out-of-sandbox checklist item:

    docker run --rm -d -p 7474:7474 -p 7687:7687 \
      -e NEO4J_AUTH=neo4j/graftpass neo4j:5
    NEO4J_LIVE_HTTP_URI=http://localhost:7474/db/neo4j/tx/ \
      NEO4J_LIVE_USER=neo4j NEO4J_LIVE_PASSWORD=graftpass \
      python -m pytest tests/ -m live -v
"""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = [
    pytest.mark.live,
    pytest.mark.skipif(
        not os.environ.get("NEO4J_LIVE_HTTP_URI"),
        reason="live Neo4j not configured (set NEO4J_LIVE_HTTP_URI; "
        "see docs/LIVE_VERIFICATION.md)",
    ),
]


def _http_transport():
    from flink_neo4j_spark.sources.transport import HttpTransport

    return HttpTransport(
        os.environ["NEO4J_LIVE_HTTP_URI"],
        username=os.environ.get("NEO4J_LIVE_USER"),
        password=os.environ.get("NEO4J_LIVE_PASSWORD"),
        connect_timeout_s=5.0,
        read_timeout_s=10.0,
    )


@pytest.fixture()
def live_label():
    """A unique throwaway label per test, deleted on teardown."""
    label = f"GraftLive{uuid.uuid4().hex[:12]}"
    yield label
    t = _http_transport()
    try:
        t.run(f"MATCH (n:{label}) DETACH DELETE n")
    finally:
        t.close()


def test_http_write_read_roundtrip(live_label):
    # the golden-fixture write/read contract against a real endpoint
    t = _http_transport()
    try:
        t.run(
            f"UNWIND $rows AS r CREATE (n:{live_label} "
            "{name: r.name, born: r.born, height: r.height, trust: r.trust})",
            rows=[
                {"name": "Alice", "born": 1984, "height": 1.72, "trust": True},
                {"name": "Bob", "born": 1983, "height": 1.81, "trust": False},
            ],
        )
        rows = t.run(
            f"MATCH (n:{live_label}) RETURN n.name AS name, n.born AS born, "
            "n.height AS height, n.trust AS trust ORDER BY name"
        )
    finally:
        t.close()
    assert [tuple(r.values()) for r in rows] == [
        ("Alice", 1984, 1.72, True),
        ("Bob", 1983, 1.81, False),
    ]


def test_http_error_body_parity(live_label):
    # the 200-with-errors fixture contract: a server-side Cypher failure
    # must raise the typed IOError, never silently pass
    t = _http_transport()
    try:
        with pytest.raises(IOError, match="Neo.ClientError"):
            t.run("THIS IS NOT CYPHER AT ALL")
    finally:
        t.close()


def test_connector_end_to_end(spark, live_label):
    # write_cypher batches -> server -> read_cypher partitioned read
    from flink_neo4j_spark.sources.cypher import read_cypher, write_cypher

    df = spark.createDataFrame(
        [(f"u{i}", i) for i in range(20)], "name string, rank long"
    )
    write_cypher(df, _http_transport, label=live_label, batch_size=7)
    back = read_cypher(
        spark,
        _http_transport,
        f"MATCH (n:{live_label}) RETURN n.name AS name, n.rank AS rank",
        "name string, rank long",
        num_partitions=2,
        partition_template=(
            f"MATCH (n:{live_label}) WHERE n.rank % {{n}} = {{i}} "
            "RETURN n.name AS name, n.rank AS rank"
        ),
    )
    got = sorted((r["name"], r["rank"]) for r in back.collect())
    assert got == [(f"u{i}", i) for i in sorted(range(20), key=lambda x: f"u{x}")]


def test_bolt_roundtrip_if_driver_present(live_label):
    pytest.importorskip("neo4j")
    if not os.environ.get("NEO4J_LIVE_BOLT_URI"):
        pytest.skip("NEO4J_LIVE_BOLT_URI not set")
    from flink_neo4j_spark.sources.transport import BoltTransport

    t = BoltTransport(
        os.environ["NEO4J_LIVE_BOLT_URI"],
        username=os.environ.get("NEO4J_LIVE_USER"),
        password=os.environ.get("NEO4J_LIVE_PASSWORD"),
        connect_timeout_s=5.0,
    )
    try:
        t.run(
            f"UNWIND $rows AS r CREATE (n:{live_label} {{name: r.name}})",
            rows=[{"name": "Carol"}],
        )
        rows = t.run(f"MATCH (n:{live_label}) RETURN n.name AS name")
        assert [r["name"] for r in rows] == ["Carol"]
        with pytest.raises(IOError, match="Cypher transaction failed"):
            t.run("ALSO NOT CYPHER")
    finally:
        t.close()
