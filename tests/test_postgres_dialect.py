"""Postgres dialect certification without a server.

Complement to tests/test_postgres_live.py (which runs a real PostgreSQL 15
instance): this file pins EVERY SQL statement
the catalog can emit, rendered in the Postgres paramstyle, as golden strings
— asserting they are the statements a live Postgres would receive and that
they stay dialect-clean (no '?' placeholders, no SQLite-isms), matching the
reference DDL and CAS shapes (mod.rs:365-385 CREATE, mod.rs:252-278 INSERT
ON CONFLICT, mod.rs:309-335 conditional UPDATE).
"""

from __future__ import annotations

import re

import pytest

from iceberg_catalog_postgres_spark.catalog.backend import SqlBackend
from iceberg_catalog_postgres_spark.catalog.catalog import (
    CommitConflictError,
    NoSuchTableError,
    ObjectStore,
    PostgresCatalog,
    TableIdentifier,
)


class RecordingPostgresBackend(SqlBackend):
    """Renders templates exactly like PostgresBackend (paramstyle %s) but
    records statements instead of needing a server; returns scripted rows."""

    paramstyle = "%s"

    def __init__(self):
        self.statements: list[tuple[str, tuple]] = []
        self.script: list[tuple[list[tuple], int]] = []

    def execute(self, sql, params=()):
        self.statements.append((sql, params))
        if self.script:
            return self.script.pop(0)
        return [(0,)], 1  # default: one scalar row (EXISTS-style), rowcount 1

    def close(self):
        pass


def norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip()


@pytest.fixture()
def recording(tmp_path):
    backend = RecordingPostgresBackend()
    cat = PostgresCatalog("prod", backend, ObjectStore(str(tmp_path / "wh")))
    return cat, backend


def test_every_statement_matches_postgres_golden(recording, tmp_path):
    cat, backend = recording
    ident = TableIdentifier.parse("ns.t1")

    cat.initialize()
    cat.table_exists(ident)  # scripted default row
    backend.script = [([("ns", "t1")], 1)]
    cat.list_tables("ns")
    # register: INSERT rowcount 1, then load_table SELECT returns the pointer
    meta_loc = "data.db/ns/t1/metadata/v1-abc.metadata.json"
    cat.object_store().put(meta_loc, _metadata_json().encode())
    backend.script = [([], 1), ([(meta_loc,)], 1)]
    cat.register_table(ident, meta_loc)
    # CAS update: rowcount 1, then reload
    new_loc = "data.db/ns/t1/metadata/v2-def.metadata.json"
    cat.object_store().put(new_loc, _metadata_json().encode())
    backend.script = [([], 1), ([(new_loc,)], 1)]
    cat.update_table(ident, new_loc, meta_loc)
    cat.drop_table(ident)

    got = [norm(s) for s, _ in backend.statements]
    golden = [
        # initialize (mod.rs:365-385; Iceberg official JDBC-catalog shape)
        "CREATE TABLE IF NOT EXISTS iceberg_tables ( catalog_name VARCHAR(255) NOT NULL, "
        "table_namespace VARCHAR(255) NOT NULL, table_name VARCHAR(255) NOT NULL, "
        "metadata_location VARCHAR(5500), previous_metadata_location VARCHAR(5500), "
        "PRIMARY KEY (catalog_name, table_namespace, table_name) )",
        # table_exists (mod.rs:107-136)
        "SELECT EXISTS (SELECT 1 FROM iceberg_tables WHERE catalog_name = %s AND "
        "table_namespace = %s AND table_name = %s)",
        # list_tables (mod.rs:56-96)
        "SELECT table_namespace, table_name FROM iceberg_tables WHERE catalog_name = %s "
        "AND table_namespace = %s",
        # register_table (mod.rs:242-294)
        "INSERT INTO iceberg_tables (catalog_name, table_namespace, table_name, "
        "metadata_location, previous_metadata_location) VALUES (%s, %s, %s, %s, NULL) "
        "ON CONFLICT (catalog_name, table_namespace, table_name) DO NOTHING",
        # load_table after register (mod.rs:177-236)
        "SELECT metadata_location FROM iceberg_tables WHERE catalog_name = %s AND "
        "table_namespace = %s AND table_name = %s",
        # update_table CAS (mod.rs:309-335)
        "UPDATE iceberg_tables SET metadata_location = %s, previous_metadata_location = %s "
        "WHERE catalog_name = %s AND table_namespace = %s AND table_name = %s AND "
        "metadata_location = %s",
        # load_table after CAS
        "SELECT metadata_location FROM iceberg_tables WHERE catalog_name = %s AND "
        "table_namespace = %s AND table_name = %s",
        # drop_table (mod.rs:138-175)
        "DELETE FROM iceberg_tables WHERE catalog_name = %s AND table_namespace = %s "
        "AND table_name = %s",
    ]
    assert got == golden


def test_postgres_rendering_is_dialect_clean(recording, tmp_path):
    cat, backend = recording
    ident = TableIdentifier.parse("ns.t2")
    cat.initialize()
    cat.table_exists(ident)
    with pytest.raises(NoSuchTableError):
        backend.script = [([], 0)]
        cat.drop_table(ident)
    with pytest.raises(CommitConflictError):
        backend.script = [([], 0)]
        cat.update_table(ident, "a", "b")
    for sql, params in backend.statements:
        assert "?" not in sql, f"unrendered placeholder in {sql!r}"
        # SQLite-only constructs must never leak into the Postgres rendering
        for bad in ("AUTOINCREMENT", "WITHOUT ROWID", "PRAGMA", "||"):
            assert bad not in sql.upper()
        assert sql.count("%s") == len(params)


def _metadata_json() -> str:
    from pyspark.sql.types import LongType, StructField, StructType

    from iceberg_catalog_postgres_spark.catalog.metadata import TableMetadata

    return TableMetadata.new(
        "data.db/ns/t1", StructType([StructField("k", LongType(), True)])
    ).to_json()


def test_wire_paramstyle_numbered_rendering():
    """The driverless wire client binds parameters by position, so '?'
    templates must render to numbered $1..$n exactly once each, in order;
    psycopg2 keeps the positional %s rendering."""
    from iceberg_catalog_postgres_spark.catalog.backend import PostgresBackend

    b = PostgresBackend.__new__(PostgresBackend)  # no server needed
    b.paramstyle = "$n"
    assert (
        b.sql("SELECT x FROM t WHERE a = ? AND b = ? AND c = ?")
        == "SELECT x FROM t WHERE a = $1 AND b = $2 AND c = $3"
    )
    assert b.sql("no placeholders") == "no placeholders"
    b.paramstyle = "%s"
    assert b.sql("a = ? AND b = ?") == "a = %s AND b = %s"


def test_scram_client_rfc7677_vector():
    """_ScramClient reproduces the published SCRAM-SHA-256 test vector
    (RFC 7677 §3: user 'user', password 'pencil') byte for byte, and rejects
    a forged server signature."""
    import pytest

    from iceberg_catalog_postgres_spark.catalog.pgwire import PgError, _ScramClient

    c = _ScramClient("pencil", nonce="rOprNGfwEbeRWgbNEkqO", username="user")
    assert c.client_first() == b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"

    server_first = (
        b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    assert c.client_final(server_first) == (
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    # correct server signature verifies silently
    c.verify_server_final(b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    # forged signature must raise
    with pytest.raises(PgError, match="server signature"):
        c.verify_server_final(b"v=AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=")


def test_scram_client_rejects_nonce_truncation():
    """A MITM that truncates/replaces the combined nonce must be caught."""
    import pytest

    from iceberg_catalog_postgres_spark.catalog.pgwire import PgError, _ScramClient

    c = _ScramClient("pw", nonce="clientnonce")
    with pytest.raises(PgError, match="nonce"):
        c.client_final(b"r=evilnonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")


def _fake_sasl_server(mechanisms: list[str]) -> int:
    """Minimal scripted backend: accepts one connection, reads the startup
    packet, answers AuthenticationSASL advertising ``mechanisms``, then
    closes. Enough to drive the client's mechanism-selection branch."""
    import socket
    import struct
    import threading

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def run():
        conn, _ = srv.accept()
        (ln,) = struct.unpack("!I", conn.recv(4))
        conn.recv(ln - 4)  # startup payload, discarded
        payload = (
            struct.pack("!I", 10)
            + b"".join(m.encode() + b"\x00" for m in mechanisms)
            + b"\x00"
        )
        conn.sendall(b"R" + struct.pack("!I", len(payload) + 4) + payload)
        try:
            conn.recv(65536)
        except OSError:
            pass
        conn.close()
        srv.close()

    threading.Thread(target=run, daemon=True).start()
    return port


def test_channel_binding_only_server_refused_cleanly():
    """r4 brief item 7: a server offering ONLY SCRAM-SHA-256-PLUS (channel
    binding required) must be refused with a clear PgError naming the
    mechanism gap — not a crash, not an attempted -PLUS handshake this
    non-SSL client cannot complete (gs2 header is 'n,,')."""
    import pytest

    from iceberg_catalog_postgres_spark.catalog.pgwire import PgError, PgWireConnection

    port = _fake_sasl_server(["SCRAM-SHA-256-PLUS"])
    with pytest.raises(PgError, match="SCRAM-SHA-256-PLUS"):
        PgWireConnection(f"postgres://u:pw@127.0.0.1:{port}/db")


def test_plain_scram_still_selected_when_both_offered():
    """When the server offers both -PLUS and plain SCRAM-SHA-256 (the normal
    non-SSL PostgreSQL posture), negotiation proceeds with the plain
    mechanism: the client's SASLInitialResponse names SCRAM-SHA-256."""
    import socket
    import struct
    import threading

    import pytest

    from iceberg_catalog_postgres_spark.catalog.pgwire import PgWireConnection

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    seen: dict = {}

    def run():
        conn, _ = srv.accept()
        (ln,) = struct.unpack("!I", conn.recv(4))
        conn.recv(ln - 4)
        payload = (
            struct.pack("!I", 10) + b"SCRAM-SHA-256-PLUS\x00SCRAM-SHA-256\x00\x00"
        )
        conn.sendall(b"R" + struct.pack("!I", len(payload) + 4) + payload)
        head = conn.recv(5)
        (mlen,) = struct.unpack("!I", head[1:5])
        body = b""
        while len(body) < mlen - 4:
            body += conn.recv(mlen - 4 - len(body))
        seen["type"] = head[:1]
        seen["mech"] = body.split(b"\x00", 1)[0]
        conn.close()
        srv.close()

    threading.Thread(target=run, daemon=True).start()
    with pytest.raises(ConnectionError):
        PgWireConnection(f"postgres://u:pw@127.0.0.1:{port}/db")
    assert seen["type"] == b"p"  # SASLInitialResponse
    assert seen["mech"] == b"SCRAM-SHA-256"  # plain, never -PLUS
