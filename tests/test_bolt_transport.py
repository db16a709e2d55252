"""BoltTransport against a stubbed ``neo4j`` driver module.

The real driver isn't installed in this environment, so the protocol
surface BoltTransport depends on (GraphDatabase.driver -> session -> run ->
records) is stubbed into ``sys.modules`` — executing the REAL run/close
code paths (session scoping, parameter passing, record dict conversion)
hermetically, the same way the HTTP transport gets a fake server."""

from __future__ import annotations

import sys
import types

import pytest


class _FakeRecord:
    """Mapping surface of neo4j.Record as dict() consumes it: keys() +
    __getitem__."""

    def __init__(self, data):
        self._data = data

    def keys(self):
        return self._data.keys()

    def __getitem__(self, key):
        return self._data[key]


class _FakeSession:
    def __init__(self, log, database):
        self.log = log
        self.database = database

    def run(self, statement, **params):
        self.log.append({"statement": statement, "params": params, "db": self.database})
        if statement.upper().startswith("UNWIND"):
            return []
        return [_FakeRecord({"name": "Alice", "born": 1984})]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakeDriver:
    def __init__(self, uri, auth=None, connection_timeout=None):
        self.uri = uri
        self.auth = auth
        self.connection_timeout = connection_timeout
        self.log = []
        self.closed = False

    def session(self, database=None):
        return _FakeSession(self.log, database)

    def close(self):
        self.closed = True


@pytest.fixture()
def fake_neo4j(monkeypatch):
    mod = types.ModuleType("neo4j")
    drivers = []

    class _GDB:
        @staticmethod
        def driver(uri, auth=None, connection_timeout=None):
            d = _FakeDriver(uri, auth, connection_timeout)
            drivers.append(d)
            return d

    mod.GraphDatabase = _GDB
    monkeypatch.setitem(sys.modules, "neo4j", mod)
    return drivers


def test_bolt_run_read_and_write(fake_neo4j):
    from flink_neo4j_spark.sources.transport import BoltTransport

    t = BoltTransport(
        "bolt://example:7687", username="neo4j", password="pw",
        connect_timeout_s=2.5, database="mydb",
    )
    (driver,) = fake_neo4j
    assert driver.auth == ("neo4j", "pw")
    assert driver.connection_timeout == 2.5

    rows = t.run("MATCH (n:User) RETURN n.name AS name, n.born AS born")
    assert rows == [{"name": "Alice", "born": 1984}]
    t.run(
        "UNWIND $rows AS r CREATE (n:User {name: r.name})",
        rows=[{"name": "Zed"}],
        params={"p0": 7},
    )
    write_call = driver.log[-1]
    assert write_call["params"]["rows"] == [{"name": "Zed"}]
    assert write_call["params"]["p0"] == 7
    assert write_call["db"] == "mydb"

    t.close()
    assert driver.closed


def test_bolt_read_sends_no_batch_parameter(fake_neo4j):
    """Reads must ship NO UNWIND batch parameter (the reference's read
    path sends none); the batch parameter appears only when rows are
    given, under the statement's own parameter name."""
    from flink_neo4j_spark.sources.transport import BoltTransport

    t = BoltTransport("bolt://example:7687")
    t.run("MATCH (n:User) RETURN n.name")
    (driver,) = fake_neo4j
    assert driver.log[-1]["params"] == {}
    t.run(
        "UNWIND $batch AS r CREATE (n:User {name: r.name})",
        rows=[{"name": "Zed"}],
    )
    assert driver.log[-1]["params"] == {"batch": [{"name": "Zed"}]}


# -- golden call fixtures (wire_fixtures.json `bolt_fixtures`) ------------
#
# The HTTP transport pins byte-exact request bodies; Bolt's equivalent
# contract is the driver CALL shape — session.run kwargs and database
# routing — plus record->dict decoding and error propagation. Same
# statement set as the HTTP fixtures so the two transports stay in parity.

import json as _json
import os as _os

with open(
    _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        "fixtures",
        "wire_fixtures.json",
    )
) as _fh:
    BOLT_FIXTURES: dict = _json.load(_fh)["bolt_fixtures"]


class _FakeNeo4jError(Exception):
    def __init__(self, code, message="boom"):
        super().__init__(f"{code}: {message}")
        self.code = code


@pytest.mark.parametrize("name", sorted(BOLT_FIXTURES))
def test_bolt_golden_call(fake_neo4j, monkeypatch, name):
    from flink_neo4j_spark.sources.transport import BoltTransport

    fx = BOLT_FIXTURES[name]

    def scripted_run(self, statement, **params):
        self.log.append(
            {"statement": statement, "params": params, "db": self.database}
        )
        if "raise_code" in fx:
            raise _FakeNeo4jError(fx["raise_code"])
        return [_FakeRecord(r) for r in fx["records"]]

    monkeypatch.setattr(_FakeSession, "run", scripted_run)
    t = BoltTransport("bolt://example:7687", database="neo4j")
    (driver,) = fake_neo4j
    if "expect_error" in fx:
        # coded driver failures must surface as the SAME typed IOError
        # the HTTP transport raises (error-path parity across transports)
        exc_type = IOError if "raise_code" in fx else Exception
        with pytest.raises(exc_type, match=fx["expect_error"]):
            t.run(fx["statement"], rows=fx["rows"], params=fx["params"])
    else:
        rows = t.run(fx["statement"], rows=fx["rows"], params=fx["params"])
        assert rows == fx["expect_rows"]
    assert driver.log[-1] == fx["expect_call"]
    t.close()
    assert driver.closed


def test_bolt_import_error_without_driver(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_neo4j(name, *a, **k):
        if name == "neo4j":
            raise ImportError("no module named neo4j")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "neo4j", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_neo4j)
    from flink_neo4j_spark.sources.transport import BoltTransport

    with pytest.raises(ImportError, match="FileTransport"):
        BoltTransport("bolt://example:7687")
