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
