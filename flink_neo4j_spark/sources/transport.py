"""Pluggable Cypher transports.

The reference talks to Neo4j over Jersey HTTP with a JSON payload template
(`Neo4jFormatBase.java:43-44,96-105`). Here the wire is abstracted behind a
tiny protocol so the engine's batching/decoding logic is testable without a
live server:

- :class:`BoltTransport` — real Neo4j via the ``neo4j`` Bolt driver
  (import-gated: the driver isn't installed in this container). Uses
  parameterized statements, never string splicing — the injection-safe
  replacement for the reference's quote-escaping (`Neo4jFormatBase.java:60`).
- :class:`FileTransport` — a filesystem-spool fake server: each write batch
  lands as one JSON file (atomic rename), reads scan the spool. Works across
  Spark's separate Python worker processes, which lets integration tests
  exercise the REAL per-partition code path (serialization, chunking,
  flush-at-close) with no network.

Transports must be cheaply constructible on executors: pass a *factory*
(a picklable zero-arg callable) into the source/sink, mirroring how the
reference serializes its format object to tasks (`Neo4jFormatBase.java:31`).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Protocol


class Transport(Protocol):
    """One logical Cypher session; executors create one per partition."""

    def run(
        self,
        statement: str,
        rows: list[dict[str, Any]] | None = None,
        params: dict[str, Any] | None = None,
    ) -> list[dict[str, Any]]:
        """Execute ``statement``; ``rows`` is the UNWIND parameter batch for
        writes, ``params`` are scalar query parameters (pushed-down predicate
        values). Returns result rows (empty for writes)."""
        ...

    def close(self) -> None: ...


class BoltTransport:
    """Neo4j Bolt transport. Mirrors the reference's client configuration
    surface (`Neo4jFormatBase.java:112-196`): uri, auth, timeouts."""

    def __init__(
        self,
        uri: str,
        username: str | None = None,
        password: str | None = None,
        connect_timeout_s: float = 1.0,  # reference default 1000 ms, Base:125
        database: str | None = None,
    ):
        try:
            import neo4j  # type: ignore
        except ImportError as exc:  # pragma: no cover - driver not in container
            raise ImportError(
                "BoltTransport requires the 'neo4j' package; install it or "
                "use FileTransport for offline testing"
            ) from exc
        auth = (username, password) if username else None
        self._driver = neo4j.GraphDatabase.driver(
            uri, auth=auth, connection_timeout=connect_timeout_s
        )
        self._database = database

    def run(self, statement, rows=None, params=None):  # pragma: no cover - needs server
        with self._driver.session(database=self._database) as session:
            result = session.run(statement, rows=rows or [], **(params or {}))
            return [dict(record) for record in result]

    def close(self) -> None:  # pragma: no cover - needs server
        self._driver.close()


class FileTransport:
    """Spool-directory fake: writes append batch files; reads return every
    spooled row. One file per ``run`` call makes batch boundaries observable,
    which the batching tests assert on (the analogue of the reference's
    one-HTTP-POST-per-batch, `Neo4jOutputFormat.java:209-225`)."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)

    def run(self, statement, rows=None, params=None):
        # NOTE: the spool fake does not interpret `statement`/`params` on
        # reads (it returns every spooled row) — exactly why read_pattern
        # keeps residual Spark-side filters: pushdown is an optimization,
        # never load-bearing for correctness.
        if rows is not None:
            tmp = os.path.join(self.spool_dir, f".tmp-{uuid.uuid4().hex}")
            final = os.path.join(self.spool_dir, f"batch-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump({"statement": statement, "rows": rows}, f)
            os.rename(tmp, final)  # atomic publish, no partial batches
            return []
        out: list[dict[str, Any]] = []
        for name in sorted(os.listdir(self.spool_dir)):
            if name.startswith("batch-"):
                with open(os.path.join(self.spool_dir, name)) as f:
                    out.extend(json.load(f)["rows"])
        return out

    def close(self) -> None:
        pass

    # test helpers -------------------------------------------------------
    def batches(self) -> list[dict[str, Any]]:
        out = []
        for name in sorted(os.listdir(self.spool_dir)):
            if name.startswith("batch-"):
                with open(os.path.join(self.spool_dir, name)) as f:
                    out.append(json.load(f))
        return out
