"""DuckDB oracle timing twin of bench.py.

Times every registered oracle SQL at $SPARK_GRAFT_SF_DIR (default sf0.1) in
one warm DuckDB process and prints ONE JSON line mirroring bench.py's shape:
``{"metric": "oracle_total_query_seconds", "value": N, "unit": "sec",
"queries": {...}, "sf": ...}``. Run next to bench.py and commit both
outputs so round-over-round, per-query engine-vs-oracle regressions are
visible (queries with no oracle are absent from the map).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_oracle(sf_dir: str, names: list[str] | None = None) -> dict:
    import duckdb

    from flink_neo4j_spark.catalog import TABLES
    from flink_neo4j_spark.registry import all_oracles

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = all_oracles()
    if names is not None:
        oracles = {n: oracles[n] for n in names if n in oracles}
    # warm pass at the smallest sf mirrors bench.py's steady-state discipline
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        wcon = duckdb.connect()
        wcon.execute("SET TimeZone='UTC'")
        for t in TABLES:
            wcon.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{warm_dir}/{t}.parquet')"
            )
        for name in sorted(oracles):
            try:
                wcon.execute(oracles[name]).fetchall()
            except Exception as exc:
                print(f"  warmup {name} failed: {exc}", file=sys.stderr)
        wcon.close()

    timings: dict[str, float] = {}
    for name in sorted(oracles):
        t0 = time.perf_counter()
        try:
            con.execute(oracles[name]).fetchall()
        except Exception as exc:
            print(f"  {name} failed: {exc}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "oracle_total_query_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(run_oracle(sf_dir)))


if __name__ == "__main__":
    main()
