"""Recorded-wire fixtures: byte-exact request goldens + canned responses.

The reference's whole test strategy is an embedded real Neo4j
(`Neo4jInputTest.java:21-100`, `Neo4jOutputTest.java:19-74`); no server runs
in this container, so this is the next-strongest guard against protocol
drift: for each statement shape the reference exercises, the EXACT request
body `HttpTransport` must POST is frozen in
``tests/fixtures/wire_fixtures.json``, and the response it must decode is a
canned document in the server's documented `results/data/row` shape —
including the ``meta`` sidecar a real server attaches, which the decoder has
to tolerate. Any drift in the payload template (key order, parameter
nesting, header set) or in response decoding breaks a fixture without any
network beyond localhost.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flink_neo4j_spark.sources.transport import HttpTransport

_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "wire_fixtures.json"
)

with open(_FIXTURE_PATH) as _fh:
    FIXTURES: dict[str, dict] = json.load(_fh)["fixtures"]


class _ReplayHandler(BaseHTTPRequestHandler):
    """Serves exactly one canned fixture; records what actually arrived."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def do_POST(self):
        srv = self.server
        body = self.rfile.read(int(self.headers["Content-Length"]))
        srv.received.append({"path": self.path, "headers": dict(self.headers), "body": body})
        payload = srv.fixture["response_body"].encode()
        self.send_response(srv.fixture["response_status"])
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def replay_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ReplayHandler)
    srv.received = []
    srv.fixture = None
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.rest_uri = f"http://127.0.0.1:{srv.server_address[1]}/db/data/"
    yield srv
    srv.shutdown()
    t.join(timeout=5)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_wire_fixture(replay_server, name):
    fx = FIXTURES[name]
    replay_server.fixture = fx
    t = HttpTransport(replay_server.rest_uri, read_timeout_s=5.0)
    run = lambda: t.run(fx["statement"], rows=fx["rows"], params=fx["params"])  # noqa: E731
    if "expect_error" in fx:
        with pytest.raises(IOError, match=fx["expect_error"]):
            run()
    else:
        assert run() == fx["expect_rows"]
    t.close()

    (req,) = replay_server.received
    # byte-exact golden: the payload template (statement nesting, parameter
    # key, JSON separators) is part of the wire contract
    assert req["body"].decode() == fx["request_body"]
    assert req["path"] == "/db/data/transaction/commit"
    assert req["headers"]["X-Stream"] == "true"
    assert req["headers"]["Accept"] == "application/json"
    assert req["headers"]["Content-Type"] == "application/json;charset=UTF-8"


def test_fixture_request_bodies_are_canonical_json():
    """Golden bodies must themselves be the canonical json.dumps form of
    their parsed content — guards against hand-editing a fixture into a
    shape json.dumps would never emit (the byte-compare would then fail for
    the wrong reason)."""
    for name, fx in FIXTURES.items():
        parsed = json.loads(fx["request_body"])
        assert json.dumps(parsed) == fx["request_body"], name
