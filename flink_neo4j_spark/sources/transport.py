"""Pluggable Cypher transports.

The reference talks to Neo4j over Jersey HTTP with a JSON payload template
(`Neo4jFormatBase.java:43-44,96-105`). Here the wire is abstracted behind a
tiny protocol so the engine's batching/decoding logic is testable without a
live server:

- :class:`HttpTransport` — the reference's own wire protocol: REST
  ``transaction/commit`` with the JSON statements payload, Basic auth and
  connect/read timeouts (`Neo4jFormatBase.java:38,43-44,96-105,125,130`).
  Pure stdlib (``http.client``), so it runs on any executor.
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

import base64
import http.client
import json
import os
import urllib.parse
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

    def run(self, statement, rows=None, params=None):
        # exercised against a protocol stub in tests/test_bolt_transport.py
        # + golden call fixtures in tests/fixtures/wire_fixtures.json (the
        # driver package isn't installed here); live-server behavior
        # additionally depends on the real neo4j wire protocol.
        merged: dict[str, Any] = dict(params or {})
        if rows is not None:
            # same parameter-name contract as HttpTransport: the UNWIND
            # batch parameter is named by the statement itself
            # (`Neo4jOutputFormat.java:129-136`) — and reads ship NO batch
            # parameter at all, matching the reference's read path.
            from flink_neo4j_spark.sources.cypher import extract_parameter_name

            merged[extract_parameter_name(statement)] = rows
        with self._driver.session(database=self._database) as session:
            try:
                result = session.run(statement, **merged)
                return [dict(record) for record in result]
            except Exception as exc:
                # error-path parity with HttpTransport: a server-side
                # Cypher/driver failure (Neo4j errors carry a status
                # ``code`` like ``Neo.ClientError.*``) surfaces as the
                # SAME typed IOError the HTTP transport raises for a
                # non-empty ``errors`` array — callers handle one failure
                # shape for both transports. Non-Neo4j exceptions
                # (programming errors) propagate unchanged.
                code = getattr(exc, "code", None)
                if code is not None:
                    raise IOError(
                        f"Cypher transaction failed: [{code}] {exc}"
                    ) from exc
                raise

    def close(self) -> None:
        self._driver.close()


class HttpTransport:
    """Neo4j transactional HTTP endpoint transport — the reference's actual
    wire protocol (`Neo4jFormatBase.java:38,43-44,96-105`).

    POSTs ``{"statements": [{"statement": ..., "parameters": {...}}]}`` to
    ``rest_uri + "transaction/commit"`` with the reference's headers
    (Accept/Content-Type JSON, ``X-Stream: true``, HTTP Basic auth when
    credentials are set — `Neo4jInputFormat.java:59-68`,
    `Neo4jFormatBase.java:101-103`). Parameters are a JSON object, so values
    never splice into the statement text (vs the reference's quote-escaping
    at `Neo4jFormatBase.java:60`).

    Timeouts mirror ``setConnectTimeout``/``setReadTimeout``
    (`Neo4jFormatBase.java:125,130`; both default 1000 ms): the connect
    timeout bounds the TCP handshake, the read timeout re-arms the socket
    for the response.

    One deliberate deviation: the transactional endpoint answers 200 even
    when the Cypher failed, with the failure under ``"errors"`` — the
    reference never checks that field and silently drops such failures;
    here a non-empty ``errors`` array raises ``IOError``.
    """

    def __init__(
        self,
        rest_uri: str,
        username: str | None = None,
        password: str | None = None,
        connect_timeout_s: float = 1.0,  # reference default 1000 ms, Base:125
        read_timeout_s: float = 1.0,  # reference default 1000 ms, Base:130
    ):
        self.rest_uri = rest_uri if rest_uri.endswith("/") else rest_uri + "/"
        self.username = username
        self.password = password
        self.connect_timeout_s = connect_timeout_s
        self.read_timeout_s = read_timeout_s

    # -- connection management -------------------------------------------
    # One connection per request, matching the reference's client-per-call
    # (`Neo4jInputFormat.java:59`, `Neo4jOutputFormat.java:209-210` both do
    # ``createClient()`` at the call site) — no stale keep-alive state
    # across micro-batches.
    def _connect(self) -> http.client.HTTPConnection:
        u = urllib.parse.urlsplit(self.rest_uri)
        cls = (
            http.client.HTTPSConnection
            if u.scheme == "https"
            else http.client.HTTPConnection
        )
        conn = cls(u.hostname, u.port, timeout=self.connect_timeout_s)
        conn.connect()
        # connect() bound the handshake; from here the socket waits on
        # response bytes, which the read timeout governs.
        if conn.sock is not None:
            conn.sock.settimeout(self.read_timeout_s)
        return conn

    def _headers(self) -> dict[str, str]:
        headers = {
            "Accept": "application/json",
            "Content-Type": "application/json;charset=UTF-8",
            "X-Stream": "true",
        }
        if self.username is not None and self.password is not None:
            token = base64.b64encode(
                f"{self.username}:{self.password}".encode()
            ).decode("ascii")
            headers["Authorization"] = f"Basic {token}"
        return headers

    def run(self, statement, rows=None, params=None):
        if rows is not None:
            # UNWIND batch: the parameter name comes from the statement's
            # contract (`Neo4jOutputFormat.java:129-136`). Lazy import — the
            # cypher module imports this one.
            from flink_neo4j_spark.sources.cypher import extract_parameter_name

            parameters: dict[str, Any] = {extract_parameter_name(statement): rows}
        else:
            parameters = dict(params or {})
        body = json.dumps(
            {"statements": [{"statement": statement, "parameters": parameters}]}
        )
        u = urllib.parse.urlsplit(
            urllib.parse.urljoin(self.rest_uri, TRANSACTION_URI)
        )
        conn = self._connect()
        try:
            conn.request("POST", u.path, body=body, headers=self._headers())
            resp = conn.getresponse()
            payload = resp.read()
        finally:
            conn.close()
        if resp.status != 200:
            raise IOError(f"Server returned status [{resp.status}]")
        doc = json.loads(payload) if payload else {}
        if doc.get("errors"):
            raise IOError(f"Cypher transaction failed: {doc['errors']}")
        out: list[dict[str, Any]] = []
        for result in doc.get("results", []):
            cols = result.get("columns", [])
            for datum in result.get("data", []):
                out.append(dict(zip(cols, datum.get("row", []))))
        return out

    def close(self) -> None:
        pass  # connections are per-request (see _connect)


#: Gets attached to the rest URI for transactional queries (`Base:38`).
TRANSACTION_URI = "transaction/commit"


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
