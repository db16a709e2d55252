"""Connector throughput bench (BASELINE.md: "record connector throughput —
rows/s read, rows/s written at batch sizes 100 / 1,000 / 10,000").

Uses the FileTransport spool so the number measures the ENGINE's path
(per-partition chunking, Arrow decode, type dispatch) rather than a network
stack; against a live Bolt server the same harness runs with BoltTransport.
Prints one JSON line: {"write_rows_per_s": {batch: r/s}, "read_rows_per_s": N,
"rows": N}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("CONNECTOR_BENCH_ROWS", "200000"))
BATCH_SIZES = (100, 1000, 10000)


def main() -> None:
    from flink_neo4j_spark.session import get_spark
    from flink_neo4j_spark.sources.cypher import read_cypher, write_cypher
    from flink_neo4j_spark.sources.transport import FileTransport

    spark = get_spark("bench-connector")
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(N_ROWS)
        .selectExpr(
            "CAST(id AS INT) AS n",
            "concat('name-', id) AS name",
            "CAST(id % 100 AS DOUBLE) / 7 AS score",
            "id % 2 = 0 AS flag",
        )
        .repartition(8)
        .persist()
    )
    df.count()  # materialize input outside the timed region

    write_rates: dict[str, float] = {}
    spools: dict[int, str] = {}
    root = tempfile.mkdtemp(prefix="cypher-bench-")
    try:
        for batch in BATCH_SIZES:
            spool = os.path.join(root, f"b{batch}")
            spools[batch] = spool

            def factory(spool=spool):
                return FileTransport(spool)

            t0 = time.perf_counter()
            write_cypher(df, factory, label="Row", batch_size=batch)
            write_rates[str(batch)] = round(N_ROWS / (time.perf_counter() - t0), 1)

        spool = spools[BATCH_SIZES[-1]]

        def factory(spool=spool):
            return FileTransport(spool)

        t0 = time.perf_counter()
        out = read_cypher(
            spark,
            factory,
            "MATCH (n:Row) RETURN n.n, n.name, n.score, n.flag",
            schema="n int, name string, score double, flag boolean",
        )
        count = out.count()
        read_rate = round(count / (time.perf_counter() - t0), 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(
        json.dumps(
            {
                "rows": N_ROWS,
                "write_rows_per_s": write_rates,
                "read_rows_per_s": read_rate,
                "read_rows": count,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
