"""HttpTransport against a local fake Neo4j transactional endpoint.

The fake speaks just enough of the REST ``transaction/commit`` protocol
(`Neo4jFormatBase.java:38,43-44`) to exercise the REAL network path from
Spark executors: statements arrive as the reference's JSON payload shape,
writes append to an in-process store, reads stream the store back in the
``results/data/row`` response format (`Neo4jInputFormat.java:47,100-104`).
The server runs in the pytest process; executors reach it over localhost
TCP, so serialization of the transport factory to workers is covered too.
"""

from __future__ import annotations

import base64
import json
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flink_neo4j_spark.sources.cypher import (
    CypherSinkBuilder,
    CypherSourceBuilder,
    read_cypher,
    write_cypher,
)
from flink_neo4j_spark.sources.transport import HttpTransport


class FakeNeo4jHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "FakeNeo4j/0"

    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_POST(self):
        srv = self.server
        if srv.require_auth:
            expect = "Basic " + base64.b64encode(srv.require_auth.encode()).decode()
            if self.headers.get("Authorization") != expect:
                self._respond(401, {"errors": [{"code": "auth"}]})
                return
        if srv.fail_status:
            self._respond(srv.fail_status, {})
            return
        if srv.response_delay_s:
            time.sleep(srv.response_delay_s)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        stmt = body["statements"][0]
        with srv.lock:
            srv.requests.append(
                {"path": self.path, "statement": stmt, "headers": dict(self.headers)}
            )
        params = stmt.get("parameters", {})
        if stmt["statement"].upper().startswith("UNWIND"):
            (rows,) = params.values()  # single UNWIND parameter array
            with srv.lock:
                srv.store.extend(rows)
            self._respond(200, {"results": [], "errors": []})
        elif srv.cypher_error:
            self._respond(200, {"results": [], "errors": [{"code": "boom"}]})
        else:
            with srv.lock:
                cols = sorted({k for r in srv.store for k in r}) or ["name", "born"]
                data = [{"row": [r.get(c) for c in cols]} for r in srv.store]
            self._respond(
                200, {"results": [{"columns": cols, "data": data}], "errors": []}
            )

    def _respond(self, status, doc):
        payload = json.dumps(doc).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def fake_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeNeo4jHandler)
    srv.lock = threading.Lock()
    srv.store = []
    srv.requests = []
    srv.require_auth = None
    srv.fail_status = None
    srv.cypher_error = False
    srv.response_delay_s = 0.0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.rest_uri = f"http://127.0.0.1:{srv.server_address[1]}/db/data/"
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def _factory(uri, **kw):
    # module-level helperless: functools.partial of the class pickles fine
    import functools

    return functools.partial(HttpTransport, uri, **kw)


def test_round_trip_through_executors(spark, fake_server):
    df = spark.createDataFrame(
        [("Alice", 1984), ("Bob", 1983), ("Eve", 1984)], "name string, born long"
    ).repartition(2)
    write_cypher(
        df,
        _factory(fake_server.rest_uri),
        label="User",
        batch_size=2,
    )
    assert sorted(r["name"] for r in fake_server.store) == ["Alice", "Bob", "Eve"]

    out = read_cypher(
        spark,
        _factory(fake_server.rest_uri),
        "MATCH (n:User) RETURN n.name AS name, n.born AS born",
        "name string, born long",
    ).collect()
    assert sorted((r.name, r.born) for r in out) == [
        ("Alice", 1984),
        ("Bob", 1983),
        ("Eve", 1984),
    ]


def test_payload_shape_and_headers(fake_server):
    t = HttpTransport(fake_server.rest_uri)
    t.run("UNWIND $rows AS r CREATE (n:User {name: r.name})", rows=[{"name": "Zed"}])
    t.close()
    req = fake_server.requests[0]
    assert req["path"].endswith("/db/data/transaction/commit")
    assert req["statement"]["parameters"] == {"rows": [{"name": "Zed"}]}
    assert req["headers"]["X-Stream"] == "true"
    assert req["headers"]["Content-Type"].startswith("application/json")


def test_basic_auth_header(fake_server):
    fake_server.require_auth = "neo4j:secret"
    t = HttpTransport(fake_server.rest_uri, username="neo4j", password="secret")
    assert t.run("MATCH (n) RETURN n.name AS name") == []
    bad = HttpTransport(fake_server.rest_uri, username="neo4j", password="wrong")
    with pytest.raises(IOError, match=r"status \[401\]"):
        bad.run("MATCH (n) RETURN n.name AS name")


def test_http_error_status_raises(fake_server):
    fake_server.fail_status = 500
    t = HttpTransport(fake_server.rest_uri)
    with pytest.raises(IOError, match=r"Server returned status \[500\]"):
        t.run("MATCH (n) RETURN n")


def test_cypher_error_in_200_raises(fake_server):
    fake_server.cypher_error = True
    t = HttpTransport(fake_server.rest_uri)
    with pytest.raises(IOError, match="Cypher transaction failed"):
        t.run("MATCH (n) RETURN n")


def test_read_timeout_enforced(fake_server):
    fake_server.response_delay_s = 2.0
    t = HttpTransport(fake_server.rest_uri, read_timeout_s=0.2)
    with pytest.raises(socket.timeout):
        t.run("MATCH (n) RETURN n")


def test_connect_timeout_enforced():
    # RFC 5737 TEST-NET address: connect attempts hang until timeout
    t = HttpTransport("http://192.0.2.1:7474/db/data/", connect_timeout_s=0.2)
    start = time.monotonic()
    with pytest.raises(OSError):
        t.run("MATCH (n) RETURN n")
    assert time.monotonic() - start < 5


def test_builders_construct_http_transport(spark, fake_server):
    fake_server.store.extend([{"name": "Ann", "born": 2001}])
    sink = (
        CypherSinkBuilder()
        .set_rest_uri(fake_server.rest_uri)
        .set_label("User")
        .finish()
    )
    sink(spark.createDataFrame([("Pat", 1999)], "name string, born long"))
    source = (
        CypherSourceBuilder()
        .set_rest_uri(fake_server.rest_uri)
        .set_connect_timeout(5000)
        .set_read_timeout(5000)
        .set_cypher_query("MATCH (n:User) RETURN n.name AS name, n.born AS born")
        .set_schema("name string, born long")
        .finish()
    )
    rows = source(spark).collect()
    assert sorted(r.name for r in rows) == ["Ann", "Pat"]


def test_builder_requires_uri_or_factory():
    with pytest.raises(ValueError, match="transport factory or REST URI"):
        CypherSinkBuilder().set_label("User").finish()
