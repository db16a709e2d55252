"""Graph pattern matching and iterative graph algorithms over
:class:`~flink_neo4j_spark.graph.PropertyGraph`.

The reference's users run graph queries through Cypher (node scans, edge
patterns — `README.md:20`, `Neo4jInputTest.java:26,46`); this module owns the
next capability tier natively: multi-hop patterns, degree analytics, and the
two canonical iterative algorithms (connected components, PageRank) expressed
as DataFrame join/agg loops — no GraphX, no RDDs, no driver-side iteration
over rows.

The conformance graph is built from the TPC-H-ish tables so every query has a
deterministic DuckDB oracle:

- vertices: Customer (1e6 + c_custkey), Supplier (2e6 + s_suppkey),
  Nation (3e6 + n_nationkey), Region (4e6 + r_regionkey), each with a
  ``name`` property;
- edges: (Customer)-[:IN_NATION]->(Nation), (Supplier)-[:IN_NATION]->(Nation),
  (Nation)-[:IN_REGION]->(Region).

Scale notes (100 TB posture):

- pattern hops are equi-joins on vertex ids — Catalyst broadcasts the small
  side (Nation/Region are dimension-sized) and AQE handles skew;
- iterative algorithms truncate lineage each round with ``localCheckpoint``
  (reliable ``checkpoint`` on a cluster) so the plan does not grow with the
  iteration count, and the per-round state is one (vid, value) row per
  vertex — the minimal shuffle payload;
- iteration counts are fixed by graph diameter (CC) or convergence budget
  (PageRank), never by driver-side inspection of row data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_neo4j_spark.catalog import load_table
from flink_neo4j_spark.graph import PropertyGraph

QueryFn = Callable[[SparkSession, str], DataFrame]

#: id-space offsets keeping the four vertex classes disjoint
CUSTOMER_BASE = 1_000_000
SUPPLIER_BASE = 2_000_000
NATION_BASE = 3_000_000
REGION_BASE = 4_000_000


def tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Property graph over customer/supplier/nation/region.

    The edge list is derived from foreign keys — the same modeling step a
    reference user performs when loading relational data into Neo4j.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    v = (
        c.selectExpr(
            f"c_custkey + {CUSTOMER_BASE} AS id",
            "'Customer' AS label",
            "c_name AS name",
        )
        .unionByName(
            s.selectExpr(
                f"s_suppkey + {SUPPLIER_BASE} AS id",
                "'Supplier' AS label",
                "s_name AS name",
            )
        )
        .unionByName(
            n.selectExpr(
                f"n_nationkey + {NATION_BASE} AS id",
                "'Nation' AS label",
                "n_name AS name",
            )
        )
        .unionByName(
            r.selectExpr(
                f"r_regionkey + {REGION_BASE} AS id",
                "'Region' AS label",
                "r_name AS name",
            )
        )
    )
    # `w` is a deterministic small edge property (source key mod 7) so
    # relationship-property predicates (g10) have something to filter on —
    # the analogue of an edge weight/since property in a real graph.
    e = (
        c.selectExpr(
            f"c_custkey + {CUSTOMER_BASE} AS id",
            f"c_custkey + {CUSTOMER_BASE} AS src",
            f"c_nationkey + {NATION_BASE} AS dst",
            "'IN_NATION' AS rel_type",
            "c_custkey % 7 AS w",
        )
        .unionByName(
            s.selectExpr(
                f"s_suppkey + {SUPPLIER_BASE} AS id",
                f"s_suppkey + {SUPPLIER_BASE} AS src",
                f"s_nationkey + {NATION_BASE} AS dst",
                "'IN_NATION' AS rel_type",
                "s_suppkey % 7 AS w",
            )
        )
        .unionByName(
            n.selectExpr(
                f"n_nationkey + {NATION_BASE} AS id",
                f"n_nationkey + {NATION_BASE} AS src",
                f"n_regionkey + {REGION_BASE} AS dst",
                "'IN_REGION' AS rel_type",
                "n_nationkey % 7 AS w",
            )
        )
    )
    return PropertyGraph(v, e)


# G1 — two-hop pattern match:
#   MATCH (c:Customer)-[:IN_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
#   RETURN id(c), n.name, r.name
# Two equi-joins; Nation and Region are dimension-sized, so both hops
# broadcast — zero shuffles of the customer side.
def g1_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    hop1 = g.expand("Customer", "IN_NATION", "Nation").select(
        F.col("a_id").alias("c_id"), F.col("b_id").alias("n_id"),
        F.col("b_name").alias("nation_name"),
    )
    hop2 = g.expand("Nation", "IN_REGION", "Region").select(
        F.col("a_id").alias("n_id"), F.col("b_name").alias("region_name")
    )
    return hop1.join(hop2, "n_id").select(
        "c_id", "nation_name", "region_name"
    ).orderBy("c_id")


# G2 — labeled in-degree: degree analytics joined back to vertex properties.
def g2_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    nations = g.nodes("Nation").select(
        F.col("id").alias("vid"), F.col("name").alias("nation_name")
    )
    return (
        g.degrees("in")
        .join(nations, "vid")
        .select("vid", "nation_name", "degree")
        .orderBy("vid")
    )


#: CC iteration count: graph diameter is 4 (customer -> nation -> region ->
#: nation -> customer), so the min label reaches every vertex in 4 rounds;
#: one extra round of margin.
CC_ITERATIONS = 5
#: lineage-truncation cadence for iterative loops: every round is wasteful
#: (one materialization job per round), unbounded is a plan blowup; 3 keeps
#: the optimizer input shallow while amortizing the checkpoint cost.
CHECKPOINT_EVERY = 3


# G3 — connected components by iterative min-label propagation (HashMin).
# Alternating join/agg rounds over (vid, comp) state; the declared oracle is
# closed-form because the fixture topology is known (components == regions),
# while the implementation is the general algorithm.
def g3_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    undirected = g.edges.select("src", "dst").unionAll(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    undirected = undirected.persist()  # reused every round
    comp = g.vertices.select(F.col("id").alias("vid"), F.col("id").alias("comp"))
    for i in range(CC_ITERATIONS):
        msgs = (
            undirected.join(comp.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"), "comp")
        )
        comp = comp.unionByName(msgs).groupBy("vid").agg(F.min("comp").alias("comp"))
        # truncate lineage every CHECKPOINT_EVERY rounds so the plan stays
        # bounded without paying one materialization job per round; on a
        # real cluster use setCheckpointDir + reliable .checkpoint()
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == CC_ITERATIONS - 1:
            comp = comp.localCheckpoint()
    return comp.orderBy("vid")


#: PageRank: damping, an iteration *budget* (hard cap), and the L1-residual
#: tolerance that terminates early once the recurrence has converged. The
#: residual check costs one extra (cheap, scalar-returning) job per
#: CHECKPOINT_EVERY rounds but saves every round past the fixed point —
#: on an acyclic graph the recurrence converges exactly after
#: longest-path-length + 1 rounds, far under the budget.
PR_DAMPING = 0.85
PR_ITERATIONS = 12
PR_TOLERANCE = 1e-6


# G4 — PageRank as DataFrame join/agg rounds. No DuckDB oracle by design:
# float accumulation across partitions makes exact cross-engine hashing
# brittle (driver records the rows-only check; SURVEY §2.3 ROUND discipline
# covers aggregates, not 12-round fp recurrences).
def g4_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    # the (vid) universe is re-probed every round for dangling-vertex
    # re-attachment — persist it once instead of re-scanning the 4-table
    # vertex union per iteration
    vids = g.vertices.select(F.col("id").alias("vid")).persist()
    n_vertices = vids.count()
    out_deg = g.edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    links = (
        g.edges.select("src", "dst")
        .join(out_deg.withColumnRenamed("vid", "src"), "src")
        .persist()  # reused every round
    )
    ranks = vids.select("vid", F.lit(1.0 / n_vertices).alias("rank"))
    base = (1.0 - PR_DAMPING) / n_vertices
    prev = ranks.localCheckpoint()
    ranks = prev
    for i in range(PR_ITERATIONS):
        contribs = (
            links.join(ranks.withColumnRenamed("vid", "src"), "src")
            .select(
                F.col("dst").alias("vid"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
        )
        ranks = (
            vids.join(contribs.groupBy("vid").agg(F.sum("contrib").alias("s")), "vid", "left")
            .select(
                "vid",
                (F.lit(base) + F.lit(PR_DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == PR_ITERATIONS - 1:
            ranks = ranks.localCheckpoint()  # lineage truncation, as in CC
            # convergence test on the checkpoint cadence: the residual is a
            # single scalar aggregated distributed-side (no row collect)
            residual = (
                ranks.join(prev.withColumnRenamed("rank", "prev_rank"), "vid")
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("r"))
                .first()["r"]
            )
            if residual is not None and residual < PR_TOLERANCE:
                break
            prev = ranks
    return ranks.select("vid", F.round("rank", 6).alias("rank")).orderBy("vid")


# G5 — the mini-Cypher front end under the conformance gate: the edge-pattern
# query shape from Neo4jInputTest.java:46, parsed and executed natively.
def g5_cypher_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.cypher_frontend import cypher_read

    g = tpch_graph(spark, sf_dir)
    df = cypher_read(
        g,
        "MATCH (c:Customer)-[e:IN_NATION]->(n:Nation) "
        "RETURN id(c) AS c_id, n.name AS nation_name",
    )
    return df.orderBy("c_id")


#: BFS depth budget = fixture graph diameter (customer -> nation -> region
#: -> nation -> customer).
BFS_MAX_HOPS = 4
#: BFS source: region 0 ('AFRICA' in TPC-H ordering).
BFS_SOURCE = REGION_BASE + 0


# G6 — single-source BFS (minimum hop count to every reachable vertex) as
# join/agg rounds over the undirected edge set: each round expands the
# current distance table by one hop and re-minimizes. State is one (vid,
# hops) row per reached vertex; the edge table is persisted and re-probed
# per round; lineage truncates on the CC cadence. The oracle is a DuckDB
# RECURSIVE CTE — a genuinely different evaluation strategy (tuple-at-a-time
# semi-naive recursion) that must produce identical hop counts.
def g6_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    undirected = (
        g.edges.select("src", "dst")
        .unionAll(g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist()
    )
    dist = (
        g.vertices.filter(F.col("id") == BFS_SOURCE)
        .select(F.col("id").alias("vid"), F.lit(0).alias("hops"))
    )
    for i in range(BFS_MAX_HOPS):
        reached = (
            undirected.join(dist.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(reached).groupBy("vid").agg(F.min("hops").alias("hops"))
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == BFS_MAX_HOPS - 1:
            dist = dist.localCheckpoint()
    return dist.orderBy("vid")


# G7 — the front end's read-side extensions under the conformance gate:
# implicit grouping + count aggregate + ORDER BY/LIMIT, parsed from Cypher
# and planned by Catalyst (hash agg + TakeOrderedAndProject).
def g7_cypher_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.cypher_frontend import cypher_read

    g = tpch_graph(spark, sf_dir)
    return cypher_read(
        g,
        "MATCH (c:Customer)-[e:IN_NATION]->(n:Nation) "
        "RETURN n.name AS nation_name, count(*) AS n_customers "
        "ORDER BY n_customers DESC, nation_name LIMIT 5",
    )


# G8 — OPTIONAL MATCH through the front end: suppliers keep their row even
# when the optional FRANCE-nation pattern fails (left equi-join; the
# optional-side WHERE filters BEFORE the join — Cypher null-extension
# semantics, never row loss).
def g8_cypher_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.cypher_frontend import cypher_read

    g = tpch_graph(spark, sf_dir)
    return cypher_read(
        g,
        "MATCH (s:Supplier) OPTIONAL MATCH (s)-[e:IN_NATION]->(n:Nation) "
        "WHERE n.name = 'FRANCE' "
        "RETURN s.name AS supplier_name, n.name AS nation_name "
        "ORDER BY supplier_name",
    )


# G9 — bounded variable-length path through the front end: every 1- and
# 2-hop destination from each customer (union of fixed-length edge-join
# chains, one row per path — Cypher multiplicity).
def g9_cypher_varlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.cypher_frontend import cypher_read

    g = tpch_graph(spark, sf_dir)
    return cypher_read(
        g,
        "MATCH (c:Customer)-[*1..2]->(x) "
        "RETURN id(c) AS c_id, id(x) AS x_id ORDER BY c_id, x_id",
    )


# G10 — relationship-property WHERE through the front end: the edge
# predicate lands as a plain column filter on the expanded pattern
# (pushable by Catalyst), not a post-hoc row filter in Python.
def g10_cypher_relprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.cypher_frontend import cypher_read

    g = tpch_graph(spark, sf_dir)
    return cypher_read(
        g,
        "MATCH (c:Customer)-[e:IN_NATION]->(n:Nation) WHERE e.w >= 5 "
        "RETURN id(c) AS c_id, e.w AS w, n.name AS nation_name ORDER BY c_id",
    )


# G12 — multi-clause MATCH chain through the front end: two MATCH clauses
# unify on the shared `n` variable (name-based join), with a WHERE on the
# second clause's endpoint. Plans as customer⋈nation⋈region equi-joins with
# the region filter pushed — identical shape to writing the joins by hand.
def g12_match_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_neo4j_spark.cypher_frontend import cypher_read

    g = tpch_graph(spark, sf_dir)
    return cypher_read(
        g,
        "MATCH (c:Customer)-[e1:IN_NATION]->(n:Nation) "
        "MATCH (n)-[e2:IN_REGION]->(r:Region) WHERE r.name = 'ASIA' "
        "RETURN id(c) AS c_id, n.name AS nation_name, r.name AS region_name "
        "ORDER BY c_id",
    )


# G11 — DETACH DELETE under the conformance gate: delete every Nation vertex
# in region 0 (the doomed set is derived FROM the graph — an edge scan, not
# a literal list), then audit what remains as per-label vertex counts and
# per-rel_type edge counts in one frame. The delete itself is three
# anti-joins keyed on vertex id (PropertyGraph.delete_nodes); nothing is
# collected, so the doomed set could be 10^9 rows and the plan shape holds.
def g11_detach_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    doomed = (
        g.edges.filter(
            (F.col("rel_type") == "IN_REGION")
            & (F.col("dst") == REGION_BASE + 0)
        ).select(F.col("src").alias("id"))
    )
    g2 = g.delete_nodes(doomed, detach=True)
    v_counts = g2.vertices.groupBy("label").agg(F.count("*").alias("cnt")).select(
        F.lit("V").alias("kind"), F.col("label").alias("name"), "cnt"
    )
    e_counts = g2.edges.groupBy("rel_type").agg(F.count("*").alias("cnt")).select(
        F.lit("E").alias("kind"), F.col("rel_type").alias("name"), "cnt"
    )
    return v_counts.unionByName(e_counts).orderBy("kind", "name")


# G13 — single-source WEIGHTED shortest path (Bellman-Ford relaxation as
# DataFrame join/agg rounds): like g6's BFS but each hop adds the edge
# property `w` instead of 1, and the per-round re-minimization is over path
# cost. The round budget equals the hop bound: after k rounds `dist` holds
# the cheapest path using <= k edges, which is the true shortest-path cost
# whenever the graph's weighted shortest paths use at most k edges (here the
# fixture is a tree, so every path is unique and k = diameter is exact; on a
# general graph raise the budget or iterate to a fixed point as g4 does).
# The oracle is a DuckDB RECURSIVE CTE bounded by the same hop budget —
# tuple-at-a-time semi-naive recursion vs bulk-synchronous relaxation must
# produce identical costs.
def g13_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    undirected = (
        g.edges.select("src", "dst", "w")
        .unionAll(
            g.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .persist()
    )
    dist = (
        g.vertices.filter(F.col("id") == BFS_SOURCE)
        .select(F.col("id").alias("vid"), F.lit(0).cast("long").alias("dist"))
    )
    for i in range(BFS_MAX_HOPS):
        relaxed = (
            undirected.join(dist.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed).groupBy("vid").agg(F.min("dist").alias("dist"))
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 or i == BFS_MAX_HOPS - 1:
            dist = dist.localCheckpoint()
    return dist.orderBy("vid")


QUERIES: dict[str, QueryFn] = {
    "g1_two_hop": g1_two_hop,
    "g2_degree": g2_degree,
    "g3_connected_components": g3_connected_components,
    "g4_pagerank": g4_pagerank,
    "g5_cypher_frontend": g5_cypher_frontend,
    "g6_bfs_hops": g6_bfs_hops,
    "g7_cypher_agg": g7_cypher_agg,
    "g8_cypher_optional": g8_cypher_optional,
    "g9_cypher_varlength": g9_cypher_varlength,
    "g10_cypher_relprop": g10_cypher_relprop,
    "g11_detach_delete": g11_detach_delete,
    "g12_match_chain": g12_match_chain,
    "g13_weighted_sssp": g13_weighted_sssp,
}

ORACLE: dict[str, str] = {
    "g12_match_chain": f"""
        SELECT c_custkey + {CUSTOMER_BASE} AS c_id,
               n_name AS nation_name, r_name AS region_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        ORDER BY c_id""",
    "g11_detach_delete": """
        SELECT 'V' AS kind, 'Customer' AS name,
               (SELECT COUNT(*) FROM customer) AS cnt
        UNION ALL SELECT 'V', 'Supplier', (SELECT COUNT(*) FROM supplier)
        UNION ALL SELECT 'V', 'Nation',
               (SELECT COUNT(*) FROM nation WHERE n_regionkey <> 0)
        UNION ALL SELECT 'V', 'Region', (SELECT COUNT(*) FROM region)
        UNION ALL SELECT 'E', 'IN_NATION',
               (SELECT COUNT(*) FROM customer JOIN nation
                  ON c_nationkey = n_nationkey WHERE n_regionkey <> 0)
             + (SELECT COUNT(*) FROM supplier JOIN nation
                  ON s_nationkey = n_nationkey WHERE n_regionkey <> 0)
        UNION ALL SELECT 'E', 'IN_REGION',
               (SELECT COUNT(*) FROM nation WHERE n_regionkey <> 0)
        ORDER BY kind, name""",
    # weighted twin of g6's recursion: states are (vid, dist, hops), the
    # hop counter bounds recursion depth to the same budget as the engine's
    # relaxation rounds, and UNION dedups repeated states.
    "g13_weighted_sssp": f"""
        WITH RECURSIVE und AS (
          SELECT c_custkey + {CUSTOMER_BASE} AS src,
                 c_nationkey + {NATION_BASE} AS dst, c_custkey % 7 AS w
          FROM customer
          UNION ALL SELECT c_nationkey + {NATION_BASE},
                 c_custkey + {CUSTOMER_BASE}, c_custkey % 7
          FROM customer
          UNION ALL SELECT s_suppkey + {SUPPLIER_BASE},
                 s_nationkey + {NATION_BASE}, s_suppkey % 7
          FROM supplier
          UNION ALL SELECT s_nationkey + {NATION_BASE},
                 s_suppkey + {SUPPLIER_BASE}, s_suppkey % 7
          FROM supplier
          UNION ALL SELECT n_nationkey + {NATION_BASE},
                 n_regionkey + {REGION_BASE}, n_nationkey % 7
          FROM nation
          UNION ALL SELECT n_regionkey + {REGION_BASE},
                 n_nationkey + {NATION_BASE}, n_nationkey % 7
          FROM nation
        ),
        r AS (
          SELECT {BFS_SOURCE} AS vid, CAST(0 AS BIGINT) AS dist, 0 AS hops
          UNION
          SELECT u.dst, r.dist + u.w, r.hops + 1
          FROM r JOIN und u ON u.src = r.vid
          WHERE r.hops < {BFS_MAX_HOPS}
        )
        SELECT vid, MIN(dist) AS dist FROM r GROUP BY vid ORDER BY vid""",
    # semi-naive recursion over the same undirected edge set; UNION (not
    # UNION ALL) dedups (vid, hops) states so the recursion stays linear.
    "g6_bfs_hops": f"""
        WITH RECURSIVE und AS (
          SELECT c_custkey + {CUSTOMER_BASE} AS src, c_nationkey + {NATION_BASE} AS dst
          FROM customer
          UNION ALL SELECT c_nationkey + {NATION_BASE}, c_custkey + {CUSTOMER_BASE}
          FROM customer
          UNION ALL SELECT s_suppkey + {SUPPLIER_BASE}, s_nationkey + {NATION_BASE}
          FROM supplier
          UNION ALL SELECT s_nationkey + {NATION_BASE}, s_suppkey + {SUPPLIER_BASE}
          FROM supplier
          UNION ALL SELECT n_nationkey + {NATION_BASE}, n_regionkey + {REGION_BASE}
          FROM nation
          UNION ALL SELECT n_regionkey + {REGION_BASE}, n_nationkey + {NATION_BASE}
          FROM nation
        ),
        r AS (
          SELECT {BFS_SOURCE} AS vid, 0 AS hops
          UNION
          SELECT u.dst, r.hops + 1
          FROM r JOIN und u ON u.src = r.vid
          WHERE r.hops < {BFS_MAX_HOPS}
        )
        SELECT vid, MIN(hops) AS hops FROM r GROUP BY vid ORDER BY vid""",
    "g7_cypher_agg": """
        SELECT n_name AS nation_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_customers DESC, nation_name LIMIT 5""",
    "g1_two_hop": f"""
        SELECT c_custkey + {CUSTOMER_BASE} AS c_id,
               n_name AS nation_name,
               r_name AS region_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        ORDER BY c_id""",
    "g2_degree": f"""
        WITH d AS (
          SELECT c_nationkey AS nk, COUNT(*) AS cnt FROM customer GROUP BY 1
          UNION ALL
          SELECT s_nationkey, COUNT(*) FROM supplier GROUP BY 1
        )
        SELECT n_nationkey + {NATION_BASE} AS vid,
               n_name AS nation_name,
               SUM(cnt) AS degree
        FROM d JOIN nation ON nk = n_nationkey
        GROUP BY 1, 2
        ORDER BY vid""",
    # closed-form CC oracle: every vertex's component is the minimum vertex
    # id sharing its region (the fixture graph is a forest of region stars).
    "g3_connected_components": f"""
        WITH v AS (
          SELECT c_custkey + {CUSTOMER_BASE} AS vid, n_regionkey AS rk
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          UNION ALL
          SELECT s_suppkey + {SUPPLIER_BASE}, n_regionkey
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          UNION ALL
          SELECT n_nationkey + {NATION_BASE}, n_regionkey FROM nation
          UNION ALL
          SELECT r_regionkey + {REGION_BASE}, r_regionkey FROM region
        )
        SELECT vid, MIN(vid) OVER (PARTITION BY rk) AS comp
        FROM v ORDER BY vid""",
    "g5_cypher_frontend": f"""
        SELECT c_custkey + {CUSTOMER_BASE} AS c_id, n_name AS nation_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        ORDER BY c_id""",
    # left join with the optional predicate in the ON clause — the SQL
    # statement of Cypher's OPTIONAL MATCH null-extension semantics.
    "g8_cypher_optional": """
        SELECT s_name AS supplier_name, n_name AS nation_name
        FROM supplier LEFT JOIN nation
          ON s_nationkey = n_nationkey AND n_name = 'FRANCE'
        ORDER BY supplier_name""",
    # one row per path: 1-hop (customer->nation) plus 2-hop
    # (customer->nation->region), stated as an explicit union.
    "g9_cypher_varlength": f"""
        SELECT c_custkey + {CUSTOMER_BASE} AS c_id,
               c_nationkey + {NATION_BASE} AS x_id
        FROM customer
        UNION ALL
        SELECT c_custkey + {CUSTOMER_BASE}, n_regionkey + {REGION_BASE}
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        ORDER BY c_id, x_id""",
    "g10_cypher_relprop": f"""
        SELECT c_custkey + {CUSTOMER_BASE} AS c_id,
               c_custkey % 7 AS w,
               n_name AS nation_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey % 7 >= 5
        ORDER BY c_id""",
}
