"""LIVE PostgreSQL tests: the reference's actual deployment shape
(mod.rs:414-415 connects to a real server) executed against a real
PostgreSQL 15 instance via the pure-Python wire client (pgwire.py).

The container has a Postgres server binary but no Python driver; these tests
boot a private instance (initdb + pg_ctl as the ``postgres`` user, trust
auth, unix socket only) and run the same lifecycle + concurrent-CAS suite
the SQLite backend passes. Skips cleanly where the server can't start.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
import uuid

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    NoSuchTableError,
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY

PG_BIN = "/usr/lib/postgresql/15/bin"
PG_DIR = "/tmp/spark_graft_pg_test"
PG_PORT = 5499

SCHEMA = StructType(
    [
        StructField("one", StringType(), True, {FIELD_ID_KEY: 1}),
        StructField("two", StringType(), True, {FIELD_ID_KEY: 2}),
    ]
)


def _run(cmd: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, timeout=60)


@pytest.fixture(scope="module")
def pg_url():
    if not os.path.exists(f"{PG_BIN}/initdb") or not shutil.which("runuser"):
        pytest.skip("no PostgreSQL server binaries in this environment")
    shutil.rmtree(PG_DIR, ignore_errors=True)
    os.makedirs(PG_DIR, exist_ok=True)
    shutil.chown(PG_DIR, "postgres", "postgres")
    init = _run(
        ["runuser", "-u", "postgres", "--", f"{PG_BIN}/initdb",
         "-D", f"{PG_DIR}/data", "-A", "trust", "-U", "postgres"]
    )
    if init.returncode != 0:
        pytest.skip(f"initdb failed: {init.stderr[-200:]}")
    start = _run(
        ["runuser", "-u", "postgres", "--", f"{PG_BIN}/pg_ctl", "-D", f"{PG_DIR}/data",
         "-o", f"-c listen_addresses='' -c unix_socket_directories={PG_DIR} -c port={PG_PORT}",
         "-l", f"{PG_DIR}/log", "-w", "start"]
    )
    if start.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {start.stderr[-200:]}")
    try:
        yield f"postgres://postgres@localhost:{PG_PORT}/postgres?host={PG_DIR}"
    finally:
        _run(
            ["runuser", "-u", "postgres", "--", f"{PG_BIN}/pg_ctl",
             "-D", f"{PG_DIR}/data", "-m", "immediate", "stop"]
        )
        shutil.rmtree(PG_DIR, ignore_errors=True)


@pytest.fixture()
def live_catalog(pg_url, tmp_path):
    # unique catalog name per test: rows are keyed by catalog_name, so tests
    # never see each other's pointers even in the shared database
    cat = PostgresCatalog.connect(f"live_{uuid.uuid4().hex[:8]}", pg_url, str(tmp_path / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


def test_backend_is_wire_protocol(live_catalog):
    """Without psycopg2 the backend must be the pgwire client with numbered
    placeholders — and really talking to the server."""
    from iceberg_catalog_postgres_spark.catalog.backend import PostgresBackend

    b = live_catalog.backend
    assert isinstance(b, PostgresBackend)
    assert b.sql("a = ? AND b = ?") == "a = $1 AND b = $2"
    rows, _ = b.execute("SELECT current_setting('server_version_num')")
    assert int(rows[0][0]) >= 150000


def test_live_lifecycle_create_update_drop(live_catalog, spark):
    """The reference's own integration test (mod.rs:397-480) against real
    Postgres: create -> exists -> commit changes the pointer -> drop."""
    catalog = live_catalog
    ident = TableIdentifier.parse("test.table1")

    table = catalog.create_table(ident, SCHEMA, identifier_field_ids=[1, 2])
    assert catalog.table_exists(ident)
    assert [str(t) for t in catalog.list_tables("test")] == ["test.table1"]

    metadata_location = table.metadata_location()
    df = spark.createDataFrame([("a", "b"), ("c", "d")], SCHEMA)
    table2 = table.new_transaction().append_dataframe(df).commit()
    assert table2.metadata_location() != metadata_location  # mod.rs:469-471

    loaded = catalog.load_table(ident)
    assert loaded.metadata_location() == table2.metadata_location()
    assert loaded.to_df(spark).count() == 2
    assert loaded.schema.fields[0].metadata[FIELD_ID_KEY] == 1

    catalog.drop_table(ident)
    assert not catalog.table_exists(ident)
    with pytest.raises(NoSuchTableError):
        catalog.load_table(ident)


def test_live_register_conflict_and_stale_cas(live_catalog):
    """ON CONFLICT DO NOTHING (mod.rs:252-278) and the 0-rowcount CAS
    failure (mod.rs:342-343) against the real server."""
    from iceberg_catalog_postgres_spark.catalog.catalog import (
        CommitConflictError,
        TableAlreadyExistsError,
    )

    catalog = live_catalog
    ident = TableIdentifier.parse("test.dup")
    t = catalog.create_table(ident, SCHEMA)
    with pytest.raises(TableAlreadyExistsError):
        catalog.register_table(ident, t.metadata_location())
    t.new_transaction().append_files(["data/a.parquet"]).commit()
    with pytest.raises(CommitConflictError):
        catalog.update_table(ident, "x.metadata.json", t.metadata_location() + "-stale")


def test_live_concurrent_cas_separate_connections(pg_url, tmp_path, spark):
    """The race the reference never tests, on its real DBMS: 8 writers, each
    on its OWN server connection, racing the CAS UPDATE. Every writer's
    snapshot must land; history stays linear."""
    wh = str(tmp_path / "wh")
    name = f"race_{uuid.uuid4().hex[:8]}"
    cat0 = PostgresCatalog.connect(name, pg_url, wh)
    cat0.initialize()
    ident = TableIdentifier.parse("test.race")
    cat0.create_table(ident, SCHEMA)

    n_writers = 8
    errors: list[Exception] = []

    def writer(i: int) -> None:
        cat = PostgresCatalog.connect(name, pg_url, wh)
        try:
            t = cat.load_table(ident)
            t.new_transaction().append_files([f"data/file-{i}.parquet"]).commit()
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            cat.backend.close()

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert errors == []
    final = cat0.load_table(ident)
    assert sorted(final.metadata.current_data_files()) == sorted(
        f"data/file-{i}.parquet" for i in range(n_writers)
    )
    assert len(final.metadata.snapshots) == n_writers
    cat0.backend.close()
