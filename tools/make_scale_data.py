"""Deterministic sf1 scale-up of the driver's sf0.1 testdata (round-6
verdict ask #1: one measured decade of scaling for the top cost centers).

The driver only ships sf{0.001,0.01,0.1}; this tool derives an sf1-shaped
dataset from sf0.1 by COPY-WITH-KEY-SHIFT — ten disjoint key universes,
copy 0 byte-identical to the original — so every per-key distribution
(orders per customer, lineitems per order, events per user, parts per
co-purchase basket) is EXACTLY preserved while all table row counts grow
10x. Join keys shift consistently across tables (copy-k orders reference
copy-k customers), so referential integrity and join selectivities hold.

Content columns that drive similarity/dedup workloads are DECORRELATED
across copies, because naive replication would create an artificial 10x
dup cluster per row (quadratic candidate blow-up — a different workload,
not a bigger one):

- documents.text: copy k > 0 interleaves a copy marker token after every
  3 words. Within a copy, every doc gets the same cadence, so the
  ORIGINAL near-dup structure is preserved per copy (pair count scales
  ~10x, linear); across copies most shingles contain the marker, so
  cross-copy Jaccard collapses below every near-dup threshold.
- embeddings.embedding: copy k circular-shifts the vector by k positions.
  Shifts preserve norms and all WITHIN-copy dot products exactly (both
  operands shift), so per-copy neighborhood structure is identical to the
  original; cross-copy dots decorrelate like random projections.

nation/region are fixed dimensions and copy through unchanged.

Output: /root/repo/.scaledata/sf1/*.parquet (gitignored — ~170 MB derived
data; this GENERATOR is the committed artifact). Pure DuckDB, no JVM.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SCALE_DST",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scaledata", "sf1"),
)
COPIES = int(os.environ.get("SCALE_COPIES", "10"))

#: per-table key columns that shift by copy * (max_key + 1); every column
#: listed shifts by ITS OWN table's key span so FKs stay aligned with the
#: referenced table's shift.
SPANS = {
    "c": "SELECT MAX(c_custkey) + 1 FROM read_parquet('{src}/customer.parquet')",
    "o": "SELECT MAX(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')",
    "p": "SELECT MAX(p_partkey) + 1 FROM read_parquet('{src}/part.parquet')",
    "s": "SELECT MAX(s_suppkey) + 1 FROM read_parquet('{src}/supplier.parquet')",
    "e": "SELECT MAX(event_id) + 1 FROM read_parquet('{src}/events.parquet')",
    "u": "SELECT MAX(user_id) + 1 FROM read_parquet('{src}/events.parquet')",
    "d": "SELECT MAX(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')",
    "v": "SELECT MAX(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')",
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    span = {
        k: con.execute(q.format(src=SRC)).fetchone()[0]
        for k, q in SPANS.items()
    }
    print(f"key spans: {span}", file=sys.stderr)
    con.execute(
        f"CREATE TABLE copies AS SELECT unnest(range({COPIES})) AS k"
    )

    def emit(table: str, select: str) -> None:
        out = os.path.join(DST, f"{table}.parquet")
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {out}", file=sys.stderr)

    src = SRC
    for t in ("nation", "region"):
        emit(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    emit("customer", f"""
        SELECT * EXCLUDE (k) REPLACE (c_custkey + k * {span['c']} AS c_custkey)
        FROM read_parquet('{src}/customer.parquet'), copies""")
    emit("supplier", f"""
        SELECT * EXCLUDE (k) REPLACE (s_suppkey + k * {span['s']} AS s_suppkey)
        FROM read_parquet('{src}/supplier.parquet'), copies""")
    emit("part", f"""
        SELECT * EXCLUDE (k) REPLACE (p_partkey + k * {span['p']} AS p_partkey)
        FROM read_parquet('{src}/part.parquet'), copies""")
    emit("orders", f"""
        SELECT * EXCLUDE (k) REPLACE (o_orderkey + k * {span['o']} AS o_orderkey,
                          o_custkey + k * {span['c']} AS o_custkey)
        FROM read_parquet('{src}/orders.parquet'), copies""")
    emit("lineitem", f"""
        SELECT * EXCLUDE (k) REPLACE (l_orderkey + k * {span['o']} AS l_orderkey,
                          l_partkey + k * {span['p']} AS l_partkey,
                          l_suppkey + k * {span['s']} AS l_suppkey)
        FROM read_parquet('{src}/lineitem.parquet'), copies""")
    emit("events", f"""
        SELECT * EXCLUDE (k) REPLACE (event_id + k * {span['e']} AS event_id,
                          user_id + k * {span['u']} AS user_id)
        FROM read_parquet('{src}/events.parquet'), copies""")
    emit("documents", f"""
        SELECT doc_id + k * {span['d']} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE regexp_replace(text, '((\\S+\\s+){{3}})',
                                        '\\1cp' || k || ' ', 'g')
               END AS text,
               lang, source,
               CAST(len(CASE WHEN k = 0 THEN text
                    ELSE regexp_replace(text, '((\\S+\\s+){{3}})',
                                        '\\1cp' || k || ' ', 'g')
               END) AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet'), copies""")
    emit("embeddings", f"""
        SELECT vec_id + k * {span['v']} AS vec_id,
               CAST(CASE WHEN k = 0 THEN embedding
                    ELSE list_concat(embedding[(k + 1):len(embedding)],
                                     embedding[1:k])
               END AS FLOAT[]) AS embedding,
               label
        FROM read_parquet('{src}/embeddings.parquet'), copies""")
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
