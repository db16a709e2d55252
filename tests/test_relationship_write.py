"""Relationship CREATE/MERGE: the edge-write half of the batch sink
(`UNWIND $rows AS r MATCH (a), (b) MERGE (a)-[:T]->(b)`), node endpoints
resolved by key, MERGE idempotent on (src, dst, rel_type)."""

from __future__ import annotations

import pytest

from flink_neo4j_spark.cypher_frontend import CypherSyntaxError, cypher_write
from flink_neo4j_spark.graph import PropertyGraph

MERGE_Q = (
    "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
    " MERGE (a)-[:KNOWS]->(b)"
)
CREATE_Q = MERGE_Q.replace("MERGE", "CREATE", 1)


@pytest.fixture()
def fixture_graph(spark):
    return PropertyGraph.from_rows(
        spark,
        [(1, "User", "alice"), (2, "User", "bob"), (3, "User", "carol")],
        "id long, label string, name string",
        [(10, 1, 2, "KNOWS")],
        "id long, src long, dst long, rel_type string",
    )


def test_merge_is_idempotent_and_drops_missing_endpoints(spark, fixture_graph):
    rows = [
        {"src": "alice", "dst": "bob"},    # already exists -> no-op
        {"src": "bob", "dst": "carol"},    # new
        {"src": "alice", "dst": "ghost"},  # unmatched endpoint -> dropped
    ]
    g2 = cypher_write(fixture_graph, MERGE_Q, {"rows": rows})
    assert sorted(
        (r.src, r.dst, r.rel_type) for r in g2.edges.collect()
    ) == [(1, 2, "KNOWS"), (2, 3, "KNOWS")]
    # retry-safety: re-running the same batch changes nothing
    g3 = cypher_write(g2, MERGE_Q, {"rows": rows})
    assert g3.edges.count() == 2


def test_create_inserts_duplicates_with_fresh_ids(spark, fixture_graph):
    g2 = cypher_write(
        fixture_graph, CREATE_Q, {"rows": [{"src": "alice", "dst": "bob"}]}
    )
    assert g2.edges.count() == 2  # duplicate edge allowed under CREATE
    assert g2.edges.select("id").distinct().count() == 2


def test_merge_with_properties_joins_match_key(spark, fixture_graph):
    """Edge property maps: MERGE matches on (endpoints, props) — replay
    of an identical row is a no-op, a different property value inserts a
    NEW edge (Cypher semantics); CREATE writes props unconditionally."""
    from flink_neo4j_spark.cypher_frontend import cypher_write

    stmt = (
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), "
        "(b:User {name: r.dst}) MERGE (a)-[:LIKES {w: r.w}]->(b)"
    )
    rows = {"rows": [{"src": "alice", "dst": "bob", "w": 5}]}
    g2 = cypher_write(fixture_graph, stmt, rows)
    assert g2.edges.filter("rel_type = 'LIKES'").count() == 1
    g3 = cypher_write(g2, stmt, rows)  # identical replay: no-op
    assert g3.edges.filter("rel_type = 'LIKES'").count() == 1
    g4 = cypher_write(
        g3, stmt, {"rows": [{"src": "alice", "dst": "bob", "w": 9}]}
    )
    ws = sorted(
        r["w"] for r in g4.edges.filter("rel_type = 'LIKES'").collect()
    )
    assert ws == [5, 9]


def test_rejects_malformed_relationship_writes(spark, fixture_graph):
    bad = [
        # unlabeled endpoint
        "UNWIND $rows AS r MATCH (a {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[:KNOWS]->(b)",
        # untyped edge
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[]->(b)",
        # an endpoint variable that is not one of the two MATCHed nodes
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[:KNOWS]->(c)",
        # neither MERGE nor CREATE after the two-node MATCH
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " SET a.x = r.src",
        # trailing clause the grammar does not support must RAISE, never be
        # silently dropped (a swallowed SET would be invisible data loss)
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[:KNOWS]->(b) SET a.seen = r.src",
        "UNWIND $rows AS r MATCH (n:User {name: r.src}) DELETE n RETURN n",
    ]
    for q in bad:
        with pytest.raises(CypherSyntaxError):
            cypher_write(
                fixture_graph, q, {"rows": [{"src": "alice", "dst": "bob"}]}
            )


def test_reversed_endpoint_roles_store_reversed_direction(spark, fixture_graph):
    """MERGE (b)-[:T]->(a) is legal Cypher (round 4 — previously rejected
    as out-of-order): the stored direction follows the pattern, not the
    MATCH clause order."""
    g2 = cypher_write(
        fixture_graph,
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), "
        "(b:User {name: r.dst}) MERGE (b)-[:LIKES]->(a)",
        {"rows": [{"src": "alice", "dst": "carol"}]},
    )
    likes = [
        (r.src, r.dst) for r in g2.edges.collect() if r.rel_type == "LIKES"
    ]
    assert likes == [(3, 1)]  # carol -> alice


DELETE_Q = "UNWIND $rows AS r MATCH (n:User {name: r.name}) DELETE n"
DETACH_Q = DELETE_Q.replace("DELETE", "DETACH DELETE", 1)


def test_detach_delete_by_key_drops_vertices_and_incident_edges(
    spark, fixture_graph
):
    g2 = cypher_write(
        fixture_graph, DETACH_Q,
        {"rows": [{"name": "alice"}, {"name": "ghost"}]},  # ghost: no match
    )
    assert sorted(r.name for r in g2.vertices.collect()) == ["bob", "carol"]
    assert g2.edges.count() == 0


def test_plain_delete_keeps_neo4j_incident_edge_contract(spark, fixture_graph):
    with pytest.raises(ValueError, match="incident"):
        cypher_write(fixture_graph, DELETE_Q, {"rows": [{"name": "alice"}]})
    g2 = cypher_write(fixture_graph, DELETE_Q, {"rows": [{"name": "carol"}]})
    assert sorted(r.name for r in g2.vertices.collect()) == ["alice", "bob"]
    assert g2.edges.count() == 1


# --- relationship MERGE ON CREATE / ON MATCH arms (round 7) ---

ARM_Q = (
    "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
    " MERGE (a)-[e:KNOWS]->(b)"
    " ON CREATE SET e.first = r.yr, e.origin = 'created'"
    " ON MATCH SET e.again = r.yr, e.origin = 'matched'"
)


def _edge_props(g):
    return {
        (r["src"], r["dst"]): (
            r["first"] if "first" in r.__fields__ else None,
            r["again"] if "again" in r.__fields__ else None,
            r["origin"] if "origin" in r.__fields__ else None,
        )
        for r in g.edges.collect()
    }


def test_merge_arms_split_create_and_match(spark, fixture_graph):
    # (alice->bob) exists: ON MATCH fires; (bob->carol) is new: ON CREATE
    g2 = cypher_write(
        fixture_graph, ARM_Q,
        {"rows": [
            {"src": "alice", "dst": "bob", "yr": 2020},
            {"src": "bob", "dst": "carol", "yr": 2021},
        ]},
    )
    props = _edge_props(g2)
    assert props[(1, 2)] == (None, 2020, "matched")
    assert props[(2, 3)] == (2021, None, "created")
    assert g2.edges.count() == 2
    # re-run: idempotent edge set; ON MATCH re-applies to both
    g3 = cypher_write(
        g2, ARM_Q,
        {"rows": [
            {"src": "alice", "dst": "bob", "yr": 2030},
            {"src": "bob", "dst": "carol", "yr": 2031},
        ]},
    )
    props3 = _edge_props(g3)
    assert props3[(1, 2)] == (None, 2030, "matched")
    assert props3[(2, 3)] == (2021, 2031, "matched")
    assert g3.edges.count() == 2


def test_merge_arm_only_on_create_leaves_matched_untouched(
    spark, fixture_graph
):
    g2 = cypher_write(
        fixture_graph,
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), "
        "(b:User {name: r.dst}) MERGE (a)-[e:KNOWS]->(b) "
        "ON CREATE SET e.first = r.yr",
        {"rows": [{"src": "alice", "dst": "bob", "yr": 2020}]},
    )
    # no new rows; the matched edge reads the (schema-widened) create-arm
    # column as null — B5 missing-property semantics
    assert g2.edges.count() == 1
    assert g2.edges.collect()[0]["first"] is None


def test_merge_arm_rejections(spark, fixture_graph):
    bad = [
        # arms on CREATE (not MERGE)
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " CREATE (a)-[e:KNOWS]->(b) ON CREATE SET e.x = 1",
        # arms without an edge variable
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[:KNOWS]->(b) ON MATCH SET e.x = 1",
        # arm reassigns a match-map property
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[e:KNOWS {w: 1}]->(b) ON CREATE SET e.w = 2",
        # reserved structure column
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[e:KNOWS]->(b) ON MATCH SET e.src = 9",
        # duplicate arm
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[e:KNOWS]->(b) ON MATCH SET e.x = 1 ON MATCH SET e.y = 2",
        # property assigned twice within one arm
        "UNWIND $rows AS r MATCH (a:User {name: r.src}), (b:User {name: r.dst})"
        " MERGE (a)-[e:KNOWS]->(b) ON CREATE SET e.x = 1, e.x = 2",
    ]
    for q in bad:
        with pytest.raises(CypherSyntaxError):
            cypher_write(
                fixture_graph, q, {"rows": [{"src": "alice", "dst": "bob"}]}
            )


def test_merge_arm_conflicting_create_values_still_one_edge(
    spark, fixture_graph
):
    """Two batch rows with the same match key but DIFFERENT arm values
    must MERGE exactly one edge (arm sources are not part of the match
    key). Values collapse to the per-column MAX — the documented
    set-not-sequence divergence from Neo4j's row-sequential apply."""
    g2 = cypher_write(
        fixture_graph, ARM_Q,
        {"rows": [
            {"src": "bob", "dst": "carol", "yr": 2021},
            {"src": "bob", "dst": "carol", "yr": 2022},
        ]},
    )
    assert g2.edges.filter("src = 2 AND dst = 3").count() == 1
    props = _edge_props(g2)
    assert props[(2, 3)] == (2022, None, "created")
    # same shape through the ON MATCH arm on an existing edge
    g3 = cypher_write(
        fixture_graph, ARM_Q,
        {"rows": [
            {"src": "alice", "dst": "bob", "yr": 2030},
            {"src": "alice", "dst": "bob", "yr": 2029},
        ]},
    )
    assert g3.edges.count() == 1
    assert _edge_props(g3)[(1, 2)] == (None, 2030, "matched")
