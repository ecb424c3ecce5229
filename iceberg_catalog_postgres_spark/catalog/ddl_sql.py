"""SQL DDL + maintenance-procedure front-end (r13; VERDICT r12 next #3/#5).

Completes the SQL lifecycle around the DML quartet (``merge_sql``) and the
read side (``select_sql``): schema/spec EVOLUTION as ``ALTER TABLE``
statements, and the maintenance engines as Iceberg-style ``CALL
system.<procedure>(...)`` statements. Like the other SQL modules this is a
GRAMMAR, not an engine — every statement renders onto an
already-certified Python API (``commit_schema`` / ``commit_partition_spec``
/ the maintenance module), so the SQL path inherits their CAS semantics,
widening rules, and rename/default follow-through.

Supported ALTER grammar (case-insensitive keywords)::

    ALTER TABLE ns.t ADD COLUMN  <name> <type> [DEFAULT <literal>]
    ALTER TABLE ns.t ADD COLUMNS (<name> <type> [DEFAULT <lit>], ...)
    ALTER TABLE ns.t RENAME COLUMN <a> TO <b>
    ALTER TABLE ns.t ALTER COLUMN <c> TYPE <type>     -- widening only
    ALTER TABLE ns.t DROP COLUMN <c>
    ALTER TABLE ns.t ADD PARTITION FIELD <col | transform(args)>
    ALTER TABLE ns.t DROP PARTITION FIELD <col | transform(args)>
    ALTER TABLE ns.t WRITE ORDERED BY (c1 [ASC] [NULLS FIRST], ...)
    ALTER TABLE ns.t WRITE UNORDERED
    ALTER TABLE ns.t SET TBLPROPERTIES ('k' = 'v', ...)
    ALTER TABLE ns.t UNSET TBLPROPERTIES [IF EXISTS] ('k', ...)
    ALTER TABLE ns.t CREATE [OR REPLACE] BRANCH|TAG [IF NOT EXISTS] <name>
        [AS OF VERSION <snapshot-id>]
        [RETAIN <n> DAYS|HOURS|MINUTES]                   -- max-ref-age-ms
        [WITH SNAPSHOT RETENTION <n> SNAPSHOTS [<m> DAYS|...]
                                | <m> DAYS|...]           -- branch history
    ALTER TABLE ns.t REPLACE BRANCH|TAG <name> [AS OF VERSION ...] [...]
    ALTER TABLE ns.t DROP BRANCH|TAG [IF EXISTS] <name>

(the branch/tag clauses are Iceberg's Spark SQL extension syntax; they
render onto ``Table.set_ref``/``drop_ref`` — per-ref retention keys and
all)

CALL grammar (Iceberg's named-argument procedure syntax)::

    CALL system.expire_snapshots('ns.t', keep_last => 2)
    CALL system.rewrite_small_files('ns.t' [, target_rows => 1000])
    CALL system.rewrite_manifests('ns.t' [, max_chunks => 8]
                                  [, target_entries => 2000])
    CALL system.rewrite_position_deletes_to_dvs('ns.t')
    CALL system.compact_table('ns.t', target_partitions => 1)
    CALL system.remove_orphan_files('ns.t', older_than_s => 86400)
    CALL system.vacuum('ns.t', keep_last_snapshots => 2, ...)
    CALL system.add_files('ns.t', source_dir => 'dir')
    CALL system.rollback_to_snapshot('ns.t', snapshot_id => <id>)
    CALL system.rollback_to_timestamp('ns.t', timestamp_ms => <ms>
                                      | timestamp => '<iso>')
    CALL system.set_current_snapshot('ns.t', snapshot_id => <id>)
    CALL system.cherrypick_snapshot('ns.t', snapshot_id => <id>)
    CALL system.publish_branch|fast_forward('ns.t', branch => 'b'
                                            [, drop_branch => true])
    CALL system.create_changelog_view('ns.t', start_snapshot_id => <id>
                                      [, end_snapshot_id, view_name])

Plus ``ANALYZE TABLE ns.t COMPUTE STATISTICS [FOR [ALL] COLUMNS (...)]``
(stats backfill / NDV sketches), ``TRUNCATE TABLE`` (metadata-only empty
snapshot), ``SHOW TABLES|VIEWS|NAMESPACES|TBLPROPERTIES|CREATE TABLE``, and
``DESCRIBE [TABLE|VIEW] [EXTENDED]``.

``alter_sql`` returns the committed Table (like the DML family);
``call_sql`` returns a ONE-ROW report DataFrame (like Iceberg's CALL
output) so procedure effects are oracle-checkable as data.
"""

from __future__ import annotations

from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
from iceberg_catalog_postgres_spark.catalog.merge_sql import (
    _Cursor,
    _render,
    _split_top,
    _strip_ident,
    _tokenize,
)
from iceberg_catalog_postgres_spark.catalog.select_sql import _parse_literal, _upper

__all__ = [
    "alter_sql",
    "parse_alter",
    "call_sql",
    "parse_call",
    "drop_table_sql",
    "show_tables_sql",
    "describe_sql",
]


def _sql_type(tokens: list[str]):
    """A SQL type name (one or two words, optional ``(n[,m])`` suffix we
    accept and ignore for varchar/char) -> Spark DataType."""
    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        ByteType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    words = [(_upper(t) or t) for t in tokens if t not in ("(", ")", ",")
             and not t.isdigit()]
    name = " ".join(words)
    if name in ("DECIMAL", "NUMERIC", "DEC"):
        # precision/scale live in the digit tokens the generic path drops
        from pyspark.sql.types import DecimalType

        digits = [int(t) for t in tokens if t.isdigit()]
        if len(digits) == 2:
            return DecimalType(digits[0], digits[1])
        if len(digits) == 1:
            return DecimalType(digits[0], 0)
        return DecimalType(10, 0)  # SQL default precision
    mapping = {
        "INT": IntegerType(),
        "INTEGER": IntegerType(),
        "BIGINT": LongType(),
        "LONG": LongType(),
        "FLOAT": FloatType(),
        "REAL": FloatType(),
        "DOUBLE": DoubleType(),
        "DOUBLE PRECISION": DoubleType(),
        "STRING": StringType(),
        "VARCHAR": StringType(),
        "CHAR": StringType(),
        "TEXT": StringType(),
        "BOOLEAN": BooleanType(),
        "DATE": DateType(),
        "TIMESTAMP": TimestampType(),
        "TIMESTAMP_NTZ": TimestampNTZType(),
        "SMALLINT": ShortType(),
        "SHORT": ShortType(),
        "TINYINT": ByteType(),
        "BYTE": ByteType(),
        "BINARY": BinaryType(),
    }
    t = mapping.get(name)
    if t is None:
        raise ValueError(f"ALTER: unsupported column type {name!r}")
    return t


def _until_word(cur: _Cursor, *stops: str) -> list[str]:
    """Tokens until a bare stop WORD (``_kw`` only knows the MERGE keyword
    set, so DDL words like DEFAULT need their own scan)."""
    out = []
    while cur.peek() is not None and _upper(cur.peek()) not in stops:
        out.append(cur.next())
    return out


def _partition_entry(cur: _Cursor) -> str:
    """``col`` or ``transform(args)`` rendered canonically (the spec's
    entry spelling: ``bucket(8, k)`` / ``truncate(10, k)`` / ``day(ts)``)."""
    head = _strip_ident(cur.next())
    if cur.peek() != "(":
        return head
    inner = cur.balanced_parens()
    args = [_render(piece, {}) for piece in _split_top(inner, ",")]
    return f"{head.lower()}({', '.join(args)})"


_DURATION_MS = {
    "DAYS": 86_400_000, "DAY": 86_400_000,
    "HOURS": 3_600_000, "HOUR": 3_600_000,
    "MINUTES": 60_000, "MINUTE": 60_000,
}


def _duration_ms(cur: _Cursor) -> int:
    """``<n> DAYS|HOURS|MINUTES`` -> milliseconds."""
    n = _parse_literal(cur)
    unit = _upper(cur.next())
    if unit not in _DURATION_MS:
        raise ValueError(f"expected DAYS/HOURS/MINUTES, got {unit!r}")
    return int(float(n) * _DURATION_MS[unit])


def _prop_key(tokens: list[str]) -> str:
    """A TBLPROPERTIES key: a string literal or a bare dotted identifier
    (``'write.target-rows'`` / ``write.target-rows`` both spell the same
    key — Spark accepts both forms)."""
    if len(tokens) == 1 and tokens[0].startswith("'"):
        return tokens[0][1:-1].replace("''", "'")
    if all(not t.startswith("'") for t in tokens):
        return "".join(_strip_ident(t) for t in tokens)
    raise ValueError(f"bad TBLPROPERTIES key: {' '.join(tokens)!r}")


def _parse_ref_clauses(cur: _Cursor) -> dict:
    """The optional clause tail of a CREATE/REPLACE BRANCH|TAG statement:
    ``AS OF VERSION n`` / ``RETAIN n DAYS`` / ``WITH SNAPSHOT RETENTION
    n SNAPSHOTS [m DAYS] | m DAYS`` -> set_ref kwargs."""
    out: dict = {
        "snapshot_id": None, "max_ref_age_ms": None,
        "min_snapshots_to_keep": None, "max_snapshot_age_ms": None,
    }
    while cur.peek() is not None:
        kw = _upper(cur.next())
        if kw == "AS":
            for expect in ("OF", "VERSION"):
                if _upper(cur.next()) != expect:
                    raise ValueError("ref clause: expected AS OF VERSION <id>")
            out["snapshot_id"] = int(_parse_literal(cur))
        elif kw == "RETAIN":
            out["max_ref_age_ms"] = _duration_ms(cur)
        elif kw == "WITH":
            for expect in ("SNAPSHOT", "RETENTION"):
                if _upper(cur.next()) != expect:
                    raise ValueError("ref clause: expected WITH SNAPSHOT RETENTION")
            n = _parse_literal(cur)
            unit = _upper(cur.next())
            if unit == "SNAPSHOTS":
                out["min_snapshots_to_keep"] = int(n)
                # optional trailing age bound: ``... 5 SNAPSHOTS 7 DAYS``
                nxt = cur.peek()
                if nxt is not None and not nxt.startswith(("'", "`")) and (
                    nxt[0].isdigit()
                ):
                    out["max_snapshot_age_ms"] = _duration_ms(cur)
            elif unit in _DURATION_MS:
                out["max_snapshot_age_ms"] = int(float(n) * _DURATION_MS[unit])
            else:
                raise ValueError(
                    f"SNAPSHOT RETENTION: expected SNAPSHOTS or a duration "
                    f"unit, got {unit!r}"
                )
        else:
            raise ValueError(f"ref clause: unexpected {kw!r}")
    return out


def parse_alter(sql: str) -> dict:
    """One ALTER TABLE statement -> an action dict (see module grammar)."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    for kw in ("ALTER", "TABLE"):
        tok = cur.next()
        if _upper(tok) != kw:
            raise ValueError(f"ALTER parse error: expected {kw}, got {tok!r}")
    target = cur.dotted_name()
    verb = _upper(cur.next())
    if verb in ("SET", "UNSET"):
        what = _upper(cur.next())
        if verb == "SET" and what == "IDENTIFIER":
            # Iceberg-Spark extension DDL (r17): ALTER TABLE t SET
            # IDENTIFIER FIELDS (a, b) -> schema identifier-field-ids
            if _upper(cur.next()) != "FIELDS":
                raise ValueError("ALTER SET IDENTIFIER: expected FIELDS")
            cols = []
            for piece in _split_top(cur.balanced_parens(), ","):
                if len(piece) != 1:
                    raise ValueError(
                        "SET IDENTIFIER FIELDS: expected bare column "
                        f"names, got {' '.join(piece)!r}"
                    )
                cols.append(_strip_ident(piece[0]))
            if not cols:
                raise ValueError("SET IDENTIFIER FIELDS: empty column list")
            return {"op": "identifier_fields", "target": target, "columns": cols}
        if what != "TBLPROPERTIES":
            raise ValueError(
                f"ALTER {verb}: expected TBLPROPERTIES, got {what!r}"
            )
        if_exists = False
        if verb == "UNSET" and _upper(cur.peek()) == "IF":
            cur.next()
            if _upper(cur.next()) != "EXISTS":
                raise ValueError("ALTER UNSET: expected IF EXISTS")
            if_exists = True
        pieces = [p for p in _split_top(cur.balanced_parens(), ",") if p]
        if not pieces:
            raise ValueError(f"ALTER {verb} TBLPROPERTIES: empty list")
        if verb == "SET":
            props = {}
            for piece in pieces:
                sides = _split_top(piece, "=")
                if len(sides) != 2:
                    raise ValueError(
                        f"SET TBLPROPERTIES: expected 'k' = 'v', got "
                        f"{' '.join(piece)!r}"
                    )
                props[_prop_key(sides[0])] = _parse_literal(_Cursor(sides[1]))
            return {"op": "set_properties", "target": target, "props": props}
        keys = [_prop_key(p) for p in pieces]
        return {
            "op": "unset_properties", "target": target,
            "keys": keys, "if_exists": if_exists,
        }
    if verb in ("CREATE", "REPLACE"):
        mode = "create" if verb == "CREATE" else "replace"
        what = _upper(cur.next())
        if what == "OR":
            if verb != "CREATE" or _upper(cur.next()) != "REPLACE":
                raise ValueError("ALTER parse error: expected CREATE OR REPLACE")
            mode = "create_or_replace"
            what = _upper(cur.next())
        if what not in ("BRANCH", "TAG"):
            raise ValueError(
                f"ALTER {verb}: expected BRANCH/TAG, got {what!r}"
            )
        if_not_exists = False
        if _upper(cur.peek()) == "IF":
            cur.next()
            for expect in ("NOT", "EXISTS"):
                if _upper(cur.next()) != expect:
                    raise ValueError("ALTER parse error: expected IF NOT EXISTS")
            if mode != "create":
                raise ValueError("IF NOT EXISTS applies to CREATE only")
            if_not_exists = True
        name = _strip_ident(cur.next())
        clauses = _parse_ref_clauses(cur)
        return {
            "op": "create_ref", "target": target, "name": name,
            "ref_type": what.lower(), "mode": mode,
            "if_not_exists": if_not_exists, **clauses,
        }
    if verb == "ADD":
        what = _upper(cur.next())
        if what == "COLUMN":
            name = _strip_ident(cur.next())
            type_toks = _until_word(cur, "DEFAULT")
            default = None
            if cur.peek() is not None and _upper(cur.peek()) == "DEFAULT":
                cur.next()
                default = _parse_literal(cur)
            return {
                "op": "add_columns",
                "target": target,
                "columns": [(name, _sql_type(type_toks), default)],
            }
        if what == "COLUMNS":
            cols = []
            for piece in _split_top(cur.balanced_parens(), ","):
                pc = _Cursor(piece)
                name = _strip_ident(pc.next())
                type_toks = _until_word(pc, "DEFAULT")
                default = None
                if pc.peek() is not None and _upper(pc.peek()) == "DEFAULT":
                    pc.next()
                    default = _parse_literal(pc)
                cols.append((name, _sql_type(type_toks), default))
            return {"op": "add_columns", "target": target, "columns": cols}
        if what == "PARTITION":
            if _upper(cur.next()) != "FIELD":
                raise ValueError("ALTER parse error: expected PARTITION FIELD")
            return {
                "op": "add_partition_field",
                "target": target,
                "entry": _partition_entry(cur),
            }
        raise ValueError(f"ALTER ADD: expected COLUMN(S)/PARTITION, got {what!r}")
    if verb == "WRITE":
        # Iceberg's write-order DDL (r16): ALTER TABLE t WRITE ORDERED BY
        # (c1 [ASC] [NULLS FIRST], ...) | WRITE UNORDERED
        what = _upper(cur.next())
        if what == "UNORDERED":
            return {"op": "write_order", "target": target, "columns": None}
        if what != "ORDERED" or _upper(cur.next()) != "BY":
            raise ValueError(
                "ALTER WRITE: expected ORDERED BY (...) or UNORDERED"
            )
        cols = []
        for piece in _split_top(cur.balanced_parens(), ","):
            pc = _Cursor(piece)
            name = _strip_ident(pc.next())
            direction, null_order = None, None
            while pc.peek() is not None:
                mod = _upper(pc.next())
                if mod in ("ASC", "DESC") and direction is None:
                    direction = mod.lower()
                elif mod == "NULLS" and null_order is None:
                    where = _upper(pc.next()) if pc.peek() is not None else ""
                    if where not in ("FIRST", "LAST"):
                        raise ValueError(
                            "ALTER WRITE ORDERED BY: expected NULLS "
                            f"FIRST|LAST on {name!r}, got {where!r}"
                        )
                    null_order = f"nulls-{where.lower()}"
                else:
                    raise ValueError(
                        "ALTER WRITE ORDERED BY: unexpected token "
                        f"{mod!r} on {name!r}"
                    )
            cols.append((name, direction or "asc", null_order))
        if not cols:
            raise ValueError("ALTER WRITE ORDERED BY: empty column list")
        return {"op": "write_order", "target": target, "columns": cols}
    if verb == "RENAME":
        if _upper(cur.next()) != "COLUMN":
            raise ValueError("ALTER parse error: expected RENAME COLUMN")
        src = _strip_ident(cur.next())
        if _upper(cur.next()) != "TO":
            raise ValueError("ALTER parse error: expected TO")
        return {
            "op": "rename_column",
            "target": target,
            "from": src,
            "to": _strip_ident(cur.next()),
        }
    if verb == "ALTER":
        if _upper(cur.next()) != "COLUMN":
            raise ValueError("ALTER parse error: expected ALTER COLUMN")
        name = _strip_ident(cur.next())
        kw = _upper(cur.next())
        if kw == "SET":  # ALTER COLUMN c SET DATA TYPE t
            for expect in ("DATA", "TYPE"):
                if _upper(cur.next()) != expect:
                    raise ValueError("ALTER parse error: expected SET DATA TYPE")
        elif kw != "TYPE":
            raise ValueError(f"ALTER COLUMN: expected TYPE, got {kw!r}")
        return {
            "op": "alter_column_type",
            "target": target,
            "column": name,
            "type": _sql_type(cur.toks[cur.i :]),
        }
    if verb == "DROP":
        what = _upper(cur.next())
        if what == "IDENTIFIER":
            if _upper(cur.next()) != "FIELDS":
                raise ValueError("ALTER DROP IDENTIFIER: expected FIELDS")
            return {"op": "identifier_fields", "target": target, "columns": None}
        if what == "COLUMN":
            return {
                "op": "drop_column",
                "target": target,
                "column": _strip_ident(cur.next()),
            }
        if what == "PARTITION":
            if _upper(cur.next()) != "FIELD":
                raise ValueError("ALTER parse error: expected PARTITION FIELD")
            return {
                "op": "drop_partition_field",
                "target": target,
                "entry": _partition_entry(cur),
            }
        if what in ("BRANCH", "TAG"):
            if_exists = False
            if _upper(cur.peek()) == "IF":
                cur.next()
                if _upper(cur.next()) != "EXISTS":
                    raise ValueError("ALTER parse error: expected IF EXISTS")
                if_exists = True
            return {
                "op": "drop_ref", "target": target,
                "name": _strip_ident(cur.next()),
                "ref_type": what.lower(), "if_exists": if_exists,
            }
        raise ValueError(
            f"ALTER DROP: expected COLUMN/PARTITION/BRANCH/TAG, got {what!r}"
        )
    raise ValueError(f"ALTER: unsupported action {verb!r}")


def alter_sql(spark, catalog, sql: str):
    """Execute one ALTER TABLE statement against a catalog table and
    return the committed Table. Every action is a METADATA-ONLY commit
    (the id-based evolution model — zero data rewrite at any size):
    column edits go through ``commit_schema`` (which enforces widening
    rules, detects renames by field id, applies the rename
    follow-through to spec entries and NDV properties, and records v3
    initial-defaults); partition-field edits go through
    ``commit_partition_spec`` (old files keep their tuples, planners
    stay superset-safe across the spec change)."""
    from pyspark.sql.types import StructField, StructType

    p = parse_alter(sql)
    table = catalog.load_table(TableIdentifier.parse(p["target"]))
    fields = list(table.schema.fields)
    names = {f.name for f in fields}
    op = p["op"]
    if op == "write_order":
        # declared DEFAULT write order: future appends without an explicit
        # sort_by/zorder range-distribute on it (metadata-only here)
        return table.replace_sort_order(p["columns"])
    if op == "identifier_fields":
        # declared row identity (r17): ON-less MERGE resolves its keys here
        return table.set_identifier_fields(p["columns"])
    if op == "set_properties":
        return table.update_properties(set_props=p["props"])
    if op == "unset_properties":
        keys = p["keys"]
        if p["if_exists"]:
            keys = [k for k in keys if k in table.metadata.properties]
            if not keys:
                return table
        return table.update_properties(unset_keys=keys)
    if op == "create_ref":
        existing = table.metadata.refs.get(p["name"])
        if existing is not None:
            if existing.get("type", "tag") != p["ref_type"]:
                raise ValueError(
                    f"ref {p['name']!r} exists with type "
                    f"{existing.get('type')!r}, not {p['ref_type']!r}"
                )
            if p["mode"] == "create":
                if p["if_not_exists"]:
                    return table
                raise ValueError(f"ref already exists: {p['name']!r}")
        elif p["mode"] == "replace":
            raise ValueError(
                f"REPLACE {p['ref_type'].upper()}: no such ref {p['name']!r}"
            )
        return table.set_ref(
            p["name"],
            snapshot_id=p["snapshot_id"],
            ref_type=p["ref_type"],
            min_snapshots_to_keep=p["min_snapshots_to_keep"],
            max_snapshot_age_ms=p["max_snapshot_age_ms"],
            max_ref_age_ms=p["max_ref_age_ms"],
        )
    if op == "drop_ref":
        if p["name"] == "main":
            raise ValueError("cannot drop the main branch")
        existing = table.metadata.refs.get(p["name"])
        if existing is None:
            if p["if_exists"]:
                return table
            raise ValueError(f"no such ref: {p['name']!r}")
        if existing.get("type", "tag") != p["ref_type"]:
            raise ValueError(
                f"DROP {p['ref_type'].upper()}: ref {p['name']!r} is a "
                f"{existing.get('type')!r}"
            )
        return table.drop_ref(p["name"])
    if op == "add_columns":
        defaults = {}
        for name, dtype, default in p["columns"]:
            if name in names:
                raise ValueError(f"ALTER ADD COLUMN: column exists: {name}")
            fields.append(StructField(name, dtype, True))
            names.add(name)
            if default is not None:
                defaults[name] = default
        return table.commit_schema(StructType(fields), defaults=defaults or None)
    if op == "rename_column":
        if p["from"] not in names:
            raise ValueError(f"ALTER RENAME: unknown column {p['from']!r}")
        if p["to"] in names:
            raise ValueError(f"ALTER RENAME: target name exists: {p['to']!r}")
        fields = [
            StructField(p["to"], f.dataType, f.nullable, f.metadata)
            if f.name == p["from"] else f
            for f in fields
        ]
        return table.commit_schema(StructType(fields))
    if op == "alter_column_type":
        if p["column"] not in names:
            raise ValueError(f"ALTER COLUMN: unknown column {p['column']!r}")
        fields = [
            StructField(f.name, p["type"], f.nullable, f.metadata)
            if f.name == p["column"] else f
            for f in fields
        ]
        # commit_schema rejects non-widening changes loudly
        return table.commit_schema(StructType(fields))
    if op == "drop_column":
        if p["column"] not in names:
            raise ValueError(f"ALTER DROP: unknown column {p['column']!r}")
        fields = [f for f in fields if f.name != p["column"]]
        return table.commit_schema(StructType(fields))
    # spec entries are compared CANONICALIZED (kind, param, source) — the
    # SQL path renders 'bucket(8, k)' with a space while the Python API
    # writes 'bucket(8,k)'; raw string equality would miss the match and
    # either refuse a legal DROP or commit a whitespace-variant duplicate
    from iceberg_catalog_postgres_spark.catalog.table import (
        parse_partition_field,
    )

    def canon(entry: str):
        return parse_partition_field(entry)

    if op == "add_partition_field":
        spec = list(table.metadata.partition_spec)
        if canon(p["entry"]) in [canon(e) for e in spec]:
            raise ValueError(f"partition field already in spec: {p['entry']}")
        return table.commit_partition_spec([*spec, p["entry"]])
    if op == "drop_partition_field":
        spec = list(table.metadata.partition_spec)
        keep = [e for e in spec if canon(e) != canon(p["entry"])]
        if len(keep) == len(spec):
            raise ValueError(
                f"partition field not in spec: {p['entry']} (spec: {spec})"
            )
        return table.commit_partition_spec(keep)
    raise AssertionError(op)


def drop_table_sql(spark, catalog, sql: str):
    """``DROP TABLE [IF EXISTS] ns.t`` -> ``catalog.drop_table`` (pointer
    delete with the reference's exactly-one assertion; data files are NOT
    purged — mod.rs:164's acknowledged TODO, orphan GC handles them).
    Returns None like the Python API. IF EXISTS swallows only the
    missing-table case."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    if _upper(cur.next()) != "DROP":
        raise ValueError("DROP parse error: expected DROP")
    what = _upper(cur.next())
    if what == "VIEW":
        from iceberg_catalog_postgres_spark.catalog.views import drop_view_sql

        return drop_view_sql(spark, catalog, sql)
    if what in ("NAMESPACE", "SCHEMA"):
        from iceberg_catalog_postgres_spark.catalog.namespaces import (
            drop_namespace_sql,
        )

        return drop_namespace_sql(spark, catalog, sql)
    if what != "TABLE":
        raise ValueError(
            f"DROP: expected TABLE/VIEW/NAMESPACE, got {what!r}"
        )
    if_exists = False
    if _upper(cur.peek()) == "IF":
        cur.next()
        if _upper(cur.next()) != "EXISTS":
            raise ValueError("DROP parse error: expected IF EXISTS")
        if_exists = True
    ident = TableIdentifier.parse(cur.dotted_name())
    if if_exists and not catalog.table_exists(ident):
        return None
    catalog.drop_table(ident)
    return None


def show_tables_sql(spark, catalog, sql: str):
    """``SHOW TABLES IN <namespace>`` -> (namespace, table_name) rows from
    ``catalog.list_tables`` (the reference's §2.A#3 surface as SQL; the
    namespace is required — the listing is namespace-scoped, like the
    reference's). ``SHOW TBLPROPERTIES ns.t ['key']`` -> (key, value)
    rows from the table's metadata properties (engine-internal structured
    logs excluded — they are not user-visible knobs)."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    if _upper(cur.next()) != "SHOW":
        raise ValueError("SHOW parse error: expected SHOW")
    what = _upper(cur.next())
    if what == "TBLPROPERTIES":
        from iceberg_catalog_postgres_spark.catalog.table import Table

        table = catalog.load_table(TableIdentifier.parse(cur.dotted_name()))
        props = {
            k: v for k, v in table.metadata.properties.items()
            if isinstance(v, (str, int, float, bool))
            and not Table.is_engine_property(k)
        }
        if cur.peek() is not None:
            key = _parse_literal(cur)
            if key not in props:
                raise ValueError(f"no such table property: {key!r}")
            props = {key: props[key]}
        rows = sorted((k, str(v)) for k, v in props.items())
        return spark.createDataFrame(rows or [], "key string, value string")
    if what == "CREATE":
        # SHOW CREATE TABLE ns.t (r16): RECONSTRUCTIBLE DDL — one row per
        # statement; feeding the statements back through execute_dml
        # yields an equivalent table (columns + partition spec + write
        # order + user properties), which is also what the round-trip
        # pytest does. Caveat: nested column types (array/struct/map,
        # API-created) render but the DDL parser cannot re-create them —
        # the emitted statement is still the correct Spark SQL spelling
        from iceberg_catalog_postgres_spark.catalog.table import Table

        if _upper(cur.next()) != "TABLE":
            raise ValueError("SHOW CREATE: expected TABLE")
        table = catalog.load_table(TableIdentifier.parse(cur.dotted_name()))
        full = f"{table.identifier.namespace_str}.{table.identifier.name}"
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in table.schema.fields
        )
        stmt = f"CREATE TABLE {full} ({cols})"
        if table.metadata.partition_spec:
            stmt += " PARTITIONED BY (" + ", ".join(
                table.metadata.partition_spec
            ) + ")"
        stmts = [stmt]
        order = table.metadata.default_sort_fields()
        if order:
            from iceberg_catalog_postgres_spark.catalog.metadata import (
                sort_spec_sql,
            )

            stmts.append(
                f"ALTER TABLE {full} WRITE ORDERED BY "
                f"({', '.join(sort_spec_sql(f) for f in order)})"
            )
        ident = table.metadata.identifier_field_names()
        if ident:
            stmts.append(
                f"ALTER TABLE {full} SET IDENTIFIER FIELDS "
                f"({', '.join(ident)})"
            )
        # is_engine_property (not just ENGINE_PROPERTY_KEYS): ANALYZE's
        # ndv.* sketches and stream.* fences would otherwise leak into the
        # emitted ALTER ... SET TBLPROPERTIES and be REFUSED on replay
        # (r17 advice), breaking the reconstructible-DDL contract
        user_props = {
            k: v for k, v in sorted(table.metadata.properties.items())
            if isinstance(v, (str, int, float, bool))
            and not Table.is_engine_property(k)
        }
        if user_props:
            def _q(x):  # SQL single-quote escaping: it's -> it''s
                return str(x).replace("'", "''")

            kv = ", ".join(
                f"'{_q(k)}' = '{_q(v)}'" for k, v in user_props.items()
            )
            stmts.append(f"ALTER TABLE {full} SET TBLPROPERTIES ({kv})")
        return spark.createDataFrame(
            [(i, s) for i, s in enumerate(stmts)],
            "stmt_order int, statement string",
        )
    if what == "VIEWS":
        from iceberg_catalog_postgres_spark.catalog.views import show_views_sql

        return show_views_sql(spark, catalog, sql)
    if what == "NAMESPACES":
        # implicit namespaces (pointer-row columns, mod.rs:21) folded
        # with explicitly-created ones (r14 — CREATE NAMESPACE rows,
        # which exist before their first table)
        from iceberg_catalog_postgres_spark.catalog.namespaces import (
            list_namespaces,
        )

        return spark.createDataFrame(
            [(ns,) for ns in list_namespaces(catalog)] or [],
            "namespace string",
        )
    if what != "TABLES":
        raise ValueError(
            f"SHOW: expected TABLES/VIEWS/NAMESPACES/TBLPROPERTIES/CREATE, got {what!r}"
        )
    if _upper(cur.next()) != "IN":
        raise ValueError("SHOW TABLES requires IN <namespace>")
    ns = cur.dotted_name()
    rows = sorted(
        (i.namespace_str, i.name) for i in catalog.list_tables(ns)
    )
    return spark.createDataFrame(
        rows or [], "namespace string, table_name string"
    )


def describe_sql(spark, catalog, sql: str):
    """``DESCRIBE [TABLE] [EXTENDED] ns.t`` -> a DataFrame of (col_name,
    data_type, nullable, field_id, partition_entry) — the schema with its
    Iceberg field ids plus one row per partition-spec entry (Spark's
    DESCRIBE shape, typed instead of the string-block form). EXTENDED
    (r16) appends ``#``-prefixed detail rows in col_name/data_type:
    location, current snapshot id + count, format version, declared
    write order, and user properties — Spark's Detailed Table
    Information section, machine-readable."""
    from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY

    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    if _upper(cur.next()) not in ("DESCRIBE", "DESC"):
        raise ValueError("DESCRIBE parse error")
    if _upper(cur.peek()) == "VIEW":
        from iceberg_catalog_postgres_spark.catalog.views import (
            describe_view_sql,
        )

        return describe_view_sql(spark, catalog, sql)
    if _upper(cur.peek()) == "TABLE":
        cur.next()
    extended = False
    if _upper(cur.peek()) == "EXTENDED":
        cur.next()
        extended = True
    table = catalog.load_table(TableIdentifier.parse(cur.dotted_name()))
    rows = [
        (
            f.name,
            f.dataType.simpleString(),
            bool(f.nullable),
            int(f.metadata[FIELD_ID_KEY])
            if f.metadata and FIELD_ID_KEY in f.metadata else None,
            None,
        )
        for f in table.schema.fields
    ]
    for entry in table.metadata.partition_spec:
        rows.append((None, None, None, None, entry))
    if extended:
        from iceberg_catalog_postgres_spark.catalog.metadata import (
            sort_spec_sql as _sort_spec_sql,
        )
        from iceberg_catalog_postgres_spark.catalog.table import Table

        md = table.metadata
        snap = md.current_snapshot()
        detail = [
            ("# location", md.location),
            ("# format-version", str(md.format_version)),
            ("# current-snapshot-id",
             str(md.current_snapshot_id) if snap else None),
            ("# current-data-files",
             str(len(snap.data_files)) if snap else "0"),
            ("# write-order", ", ".join(
                _sort_spec_sql(f) for f in md.default_sort_fields()
            ) or None),
            ("# identifier-fields",
             ", ".join(md.identifier_field_names()) or None),
        ]
        for k, v in sorted(md.properties.items()):
            if isinstance(v, (str, int, float, bool)) and not (
                Table.is_engine_property(k)
            ):
                detail.append((f"# property {k}", str(v)))
        rows += [(k, v, None, None, None) for k, v in detail]
    return spark.createDataFrame(
        rows,
        "col_name string, data_type string, nullable boolean, "
        "field_id int, partition_entry string",
    )


def truncate_sql(spark, catalog, sql: str):
    """``TRUNCATE TABLE ns.t`` -> ``maintenance.truncate_table`` (one
    metadata-only commit, empty file lists; history stays
    time-travelable). Returns the committed Table."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as _m

    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    for kw in ("TRUNCATE", "TABLE"):
        if _upper(cur.next()) != kw:
            raise ValueError(f"TRUNCATE parse error: expected {kw}")
    table = catalog.load_table(TableIdentifier.parse(cur.dotted_name()))
    if cur.peek() is not None:
        raise ValueError(
            f"TRUNCATE parse error: trailing {cur.peek()!r}"
        )
    return _m.truncate_table(table)


def analyze_sql(spark, catalog, sql: str):
    """``ANALYZE TABLE ns.t COMPUTE STATISTICS [FOR COLUMNS (a, b...) |
    FOR ALL COLUMNS]`` — Spark/Iceberg's ANALYZE as a thin grammar over
    two certified engines:

    - plain form -> ``backfill_file_stats``: footer-read ONLY the statless
      legacy files and commit manifest metrics, after which planning and
      counts are pure metadata (idempotent, O(uncovered files));
    - FOR [ALL] COLUMNS -> ``update_column_ndv``: incremental HLL NDV
      sketches into table properties (Iceberg's Puffin/ANALYZE model; the
      CBO's join-order/broadcast input), merging deltas without rescanning
      covered files.

    Returns the report as rows: ``(stat, column, value)`` — file-stats
    coverage for the plain form, one NDV estimate per column otherwise."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as _m

    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    for kw in ("ANALYZE", "TABLE"):
        if _upper(cur.next()) != kw:
            raise ValueError(f"ANALYZE parse error: expected {kw}")
    table = catalog.load_table(TableIdentifier.parse(cur.dotted_name()))
    for kw in ("COMPUTE", "STATISTICS"):
        if _upper(cur.next()) != kw:
            raise ValueError(f"ANALYZE parse error: expected COMPUTE STATISTICS")
    columns: list[str] | None = None
    if cur.peek() is not None:
        if _upper(cur.next()) != "FOR":
            raise ValueError("ANALYZE parse error: expected FOR COLUMNS")
        nxt = _upper(cur.next())
        if nxt == "ALL":
            if _upper(cur.next()) != "COLUMNS":
                raise ValueError("ANALYZE parse error: expected ALL COLUMNS")
            columns = [f.name for f in table.schema.fields]
        elif nxt == "COLUMNS":
            if cur.peek() == "(":
                toks = cur.balanced_parens()
            else:
                toks = cur.toks[cur.i:]
            columns = [
                _strip_ident(t) for t in toks if t not in (",",)
            ]
            if not columns:
                raise ValueError("ANALYZE FOR COLUMNS: empty column list")
            unknown = [
                c for c in columns
                if c not in {f.name for f in table.schema.fields}
            ]
            if unknown:
                raise ValueError(f"ANALYZE: unknown column(s): {unknown}")
        else:
            raise ValueError("ANALYZE parse error: expected [ALL] COLUMNS")
    if columns is None:
        snap = table.metadata.current_snapshot()
        n_files = len(snap.data_files) if snap else 0
        missing_before = sum(
            1 for f in (snap.data_files if snap else [])
            if not (snap.file_stats.get(f) or {}).get("record_count")
        )
        t2 = _m.backfill_file_stats(table)
        rows = [
            ("files", None, n_files),
            ("files_backfilled", None, missing_before),
            ("record_count", None, t2.record_count()),
        ]
    else:
        t2 = _m.update_column_ndv(spark, table, columns)
        rows = [
            ("ndv", c, int(_m.column_ndv(t2, c))) for c in columns
        ]
    return spark.createDataFrame(rows, "stat string, column string, value long")


#: procedure -> accepted named arguments. parse_call REFUSES unknown names:
#: a typo'd knob silently running with defaults is exactly the
#: transposition class the named-argument rule exists to prevent (an
#: expire_snapshots with a dropped keep_last deletes history irreversibly).
_PROCEDURES: dict[str, set] = {
    "expire_snapshots": {"keep_last", "older_than_ms"},
    "rewrite_small_files": {"target_rows", "small_threshold"},
    # Iceberg's manifest-compaction procedure (r16): consolidate the
    # delta-chunk chain into clustered bounded chunks; metadata only
    "rewrite_manifests": {"max_chunks", "target_entries"},
    "rewrite_position_deletes_to_dvs": set(),
    "rewrite_equality_deletes": {"to_dv"},
    "compact_table": {"target_partitions", "preserve_lineage"},
    "remove_orphan_files": {"older_than_s"},
    "vacuum": {
        "keep_last_snapshots", "keep_last_metadata", "max_manifest_chunks",
        "orphan_older_than_s", "dv_convert_min_files",
    },
    "add_files": {"source_dir"},
    # whole-table migration (r15, VERDICT r14 missing #5): create a NEW
    # catalog table from an existing parquet directory and register the
    # files in place (zero copy). snapshot = borrowed files (gc.enabled
    # false, Iceberg's rule — cleanup must never delete them); migrate =
    # the table takes ownership.
    "migrate": {"source_dir"},
    "snapshot": {"source_dir"},
    "create_changelog_view": {
        "view_name", "start_snapshot_id", "end_snapshot_id",
    },
    "rollback_to_snapshot": {"snapshot_id"},
    # r16: the remaining Iceberg snapshot-management procedures —
    # rollback_to_timestamp resolves the snapshot current AS OF the
    # timestamp; set_current_snapshot points head at ANY retained
    # snapshot (rollback_* require an ancestor, Iceberg's distinction)
    "rollback_to_timestamp": {"timestamp_ms", "timestamp"},
    "set_current_snapshot": {"snapshot_id"},
    "cherrypick_snapshot": {"snapshot_id"},
    "publish_branch": {"branch", "drop_branch"},
    "fast_forward": {"branch", "drop_branch"},  # Iceberg's name; same engine
}


def parse_call(sql: str) -> dict:
    """``CALL [system.]<proc>('ns.t' [, name => literal, ...])`` ->
    ``{"proc", "target", "args": {name: value}}``. The first positional
    argument is the table identifier; every other argument must be
    named (Iceberg's ``=>`` syntax) — positional knobs invite silent
    transposition."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    if _upper(cur.next()) != "CALL":
        raise ValueError("CALL parse error: expected CALL")
    proc = cur.dotted_name()
    if proc.lower().startswith("system."):
        proc = proc[len("system."):]
    proc = proc.lower()
    if proc not in _PROCEDURES:
        raise ValueError(
            f"unknown procedure {proc!r} (supported: {sorted(_PROCEDURES)})"
        )
    pieces = [p for p in _split_top(cur.balanced_parens(), ",") if p]
    if not pieces:
        raise ValueError("CALL: the first argument must be the table identifier")
    first = _Cursor(pieces[0])
    target = _parse_literal(first)
    if not isinstance(target, str):
        raise ValueError("CALL: the table identifier must be a string literal")
    args = {}
    for piece in pieces[1:]:
        # name => literal
        try:
            ai = piece.index("=")
            if piece[ai + 1] != ">":
                raise ValueError
        except (ValueError, IndexError):
            raise ValueError(
                f"CALL: arguments after the table must be named (k => v): "
                f"{' '.join(piece)!r}"
            )
        name = _strip_ident(piece[0]).lower()
        if name not in _PROCEDURES[proc]:
            raise ValueError(
                f"CALL {proc}: unknown argument {name!r} "
                f"(accepted: {sorted(_PROCEDURES[proc])})"
            )
        val_toks = piece[ai + 2 :]
        if len(val_toks) == 1 and _upper(val_toks[0]) in ("TRUE", "FALSE"):
            args[name] = _upper(val_toks[0]) == "TRUE"
        else:
            args[name] = _parse_literal(_Cursor(val_toks))
    return {"proc": proc, "target": target, "args": args}


def call_sql(spark, catalog, sql: str):
    """Execute one maintenance procedure and return its ONE-ROW report
    DataFrame (procedure, plus effect counters) — the Iceberg CALL
    contract, so a decision table driven through SQL is checkable as
    data. The mutated Table is re-loadable through the catalog (CALL, like
    any commit, swaps the pointer)."""
    from iceberg_catalog_postgres_spark.catalog import maintenance as _m

    p = parse_call(sql)
    a = p["args"]
    proc = p["proc"]
    if proc in ("migrate", "snapshot"):
        # the target does NOT exist yet — CTAS-style registration: infer
        # the schema from the parquet files, create the table, register
        # the files in place via add_files (zero copy, one CAS commit)
        ident = TableIdentifier.parse(p["target"])
        if catalog.table_exists(ident):
            raise ValueError(f"{proc}: table {ident} already exists")
        src_dir = str(a["source_dir"])
        store = catalog.object_store()
        # hive-partitioned tree (r16): discover the key=value keys and
        # create the table PARTITIONED BY them, so add_files records the
        # per-file tuples and the migrated table prunes like a native one.
        # recursiveFileLookup takes the FILE schema — the partition
        # columns must be physically carried (add_files enforces it).
        import glob as _glob
        import os as _os

        abs_dir = store.resolve(src_dir)
        hive_keys: list[str] = []
        # lazy probe: iglob stops at the FIRST file — a 10^5-file tree is
        # not materialized twice (add_files does the real walk once)
        probe = next(
            _glob.iglob(
                _os.path.join(abs_dir, "**", "*.parquet"), recursive=True
            ),
            None,
        )
        if probe is not None:
            segs = _os.path.relpath(probe, abs_dir).split(_os.sep)[:-1]
            if segs and all("=" in s for s in segs):
                hive_keys = [s.partition("=")[0] for s in segs]
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(abs_dir)
            .schema
        )
        t = catalog.create_table(ident, schema, partition_by=hive_keys or None)
        props = (
            {"gc.enabled": "false", "snapshot-source": src_dir}
            if proc == "snapshot"
            else {"migrated-from": src_dir}
        )
        t = t.update_properties(props)
        t2, n_added, n_records = _m.add_files(spark, t, src_dir)
        return spark.createDataFrame(
            [(proc, n_added, n_records)],
            "procedure string, added_files_count long, "
            "added_records_count long",
        )
    table = catalog.load_table(TableIdentifier.parse(p["target"]))
    snap0 = table.metadata.current_snapshot()
    files_before = len(snap0.data_files) if snap0 else 0
    snaps_before = len(table.metadata.snapshots)
    if proc == "expire_snapshots":
        t2 = _m.expire_snapshots(
            table,
            keep_last=int(a.get("keep_last", 2)),
            older_than_ms=a.get("older_than_ms"),
        )
        report = {"snapshots_before": snaps_before,
                  "snapshots_after": len(t2.metadata.snapshots)}
    elif proc == "rewrite_small_files":
        t2, n_small, n_kept, n_new = _m.rewrite_small_files(
            spark, table,
            # absent => resolved from write.target-rows /
            # write.target-file-size-bytes table properties
            target_rows=int(a["target_rows"]) if "target_rows" in a else None,
            small_threshold=(
                int(a["small_threshold"]) if "small_threshold" in a else None
            ),
        )
        report = {"rewritten_data_files_count": n_small,
                  "kept_data_files_count": n_kept,
                  "added_data_files_count": n_new}
    elif proc == "rewrite_manifests":
        chunks_before = len(snap0.manifests) if snap0 and snap0.manifests else 0
        t2 = _m.rewrite_manifests(
            table,
            max_chunks=int(a.get("max_chunks", 8)),
            target_entries=(
                int(a["target_entries"]) if "target_entries" in a else None
            ),
        )
        s2 = t2.metadata.current_snapshot()
        report = {
            "manifest_chunks_before": chunks_before,
            "manifest_chunks_after": (
                len(s2.manifests) if s2 and s2.manifests else 0
            ),
        }
    elif proc == "rewrite_position_deletes_to_dvs":
        pos_before = len(snap0.position_delete_files) if snap0 else 0
        t2 = _m.rewrite_position_deletes_to_dvs(spark, table)
        s2 = t2.metadata.current_snapshot()
        report = {
            "pos_delete_files_before": pos_before,
            "pos_delete_files_after": len(s2.position_delete_files),
            "deletion_vectors": len(s2.deletion_vectors or {}),
        }
    elif proc == "rewrite_equality_deletes":
        # r14: the other conversion direction through SQL — equality
        # deletes materialize to positional files, or straight to v3
        # deletion vectors with to_dv => true
        eq_before = len(snap0.delete_files) if snap0 else 0
        t2 = _m.rewrite_equality_deletes(
            spark, table, to_dv=bool(a.get("to_dv", False))
        )
        s2 = t2.metadata.current_snapshot()
        report = {
            "eq_delete_files_before": eq_before,
            "eq_delete_files_after": len(s2.delete_files),
            "pos_delete_files_after": len(s2.position_delete_files),
            "deletion_vectors": len(s2.deletion_vectors or {}),
        }
    elif proc == "compact_table":
        t2 = _m.compact_table(
            spark, table,
            target_partitions=int(a.get("target_partitions", 1)),
            preserve_lineage=bool(a.get("preserve_lineage", False)),
        )
        report = {
            "files_before": files_before,
            "files_after": len(t2.metadata.current_snapshot().data_files),
        }
    elif proc == "add_files":
        t2, n_added, n_records = _m.add_files(
            spark, table, str(a["source_dir"])
        )
        report = {"added_files_count": n_added,
                  "added_records_count": n_records}
    elif proc == "create_changelog_view":
        # Iceberg's CDC procedure: register the row-level changelog between
        # two snapshots as a temp view SELECT can query. Default range =
        # the whole lineage (first snapshot exclusive start -> current).
        if "start_snapshot_id" not in a:
            raise ValueError(
                "create_changelog_view requires start_snapshot_id => <id> "
                "(the EXCLUSIVE range start — changes are (start, end])"
            )
        start = int(a["start_snapshot_id"])
        end = a.get("end_snapshot_id")
        cdc = table.changelog_df(
            spark, start, int(end) if end is not None else None
        )
        view_name = str(a.get("view_name", f"{table.identifier.name}_changes"))
        cdc.createOrReplaceTempView(view_name)
        t2 = table
        report = {
            "n_changes": cdc.count(),
            "start_snapshot_id": start,
        }
    elif proc in ("rollback_to_snapshot", "rollback_to_timestamp",
                  "set_current_snapshot"):
        if proc == "rollback_to_timestamp":
            ts = a.get("timestamp_ms")
            if ts is None:
                if "timestamp" not in a:
                    raise ValueError(
                        "rollback_to_timestamp: pass timestamp_ms or timestamp"
                    )
                # same UTC rule as FOR SYSTEM_TIME AS OF (r16 review:
                # naive-ISO-as-local made the procedure restore a
                # DIFFERENT instant than the travel read previewed)
                from iceberg_catalog_postgres_spark.catalog.select_sql import (
                    _ts_literal_to_ms,
                )

                ts = _ts_literal_to_ms(str(a["timestamp"]))
            # resolve among ANCESTORS of the current snapshot only (r16
            # review: snapshot_as_of over ALL retained snapshots picks a
            # rolled-past head after any prior rollback, which the
            # ancestor guard below then rejects — making the procedure
            # unusable exactly when rollbacks are in play)
            cur_s = table.metadata.current_snapshot()
            # strictly BEFORE (r17 advice): Iceberg's rollback_to_timestamp
            # restores the latest snapshot committed strictly before the
            # given instant — a call with a snapshot's exact commit
            # timestamp lands on its PREDECESSOR, not that snapshot
            cands = [
                s for s in table.metadata.snapshots
                if s.timestamp_ms < int(ts) and (
                    cur_s is None
                    or s.sequence_number <= cur_s.sequence_number
                )
            ]
            if not cands:
                raise ValueError(
                    f"rollback_to_timestamp: no ancestor snapshot strictly "
                    f"before {ts}"
                )
            target_id = max(
                cands, key=lambda s: (s.timestamp_ms, s.sequence_number)
            ).snapshot_id
        else:
            target_id = int(a["snapshot_id"])
        if proc != "set_current_snapshot":
            # Iceberg's rule: rollback_* target must be an ancestor of
            # the CURRENT snapshot (ancestry ~ commit order here);
            # pointing head at an abandoned/forward snapshot is
            # set_current_snapshot's job
            cur_s = table.metadata.current_snapshot()
            by_id = {s.snapshot_id: s for s in table.metadata.snapshots}
            tgt = by_id.get(target_id)
            if cur_s is not None and tgt is not None and (
                tgt.sequence_number > cur_s.sequence_number
            ):
                raise ValueError(
                    f"{proc}: snapshot {target_id} is not an ancestor of "
                    "the current snapshot — use set_current_snapshot"
                )
        t2 = table.rollback_to(target_id)
        report = {
            "previous_snapshot_id": table.metadata.current_snapshot_id,
            "current_snapshot_id": t2.metadata.current_snapshot_id,
        }
    elif proc == "cherrypick_snapshot":
        before = table.metadata.current_snapshot_id
        t2 = table.new_transaction().cherry_pick(int(a["snapshot_id"])).commit()
        report = {
            "source_snapshot_id": int(a["snapshot_id"]),
            "changed": int(t2.metadata.current_snapshot_id != before),
        }
    elif proc in ("publish_branch", "fast_forward"):
        # Iceberg's fast_forward: flip main to the audited branch head —
        # the WAP publish step, O(1) metadata
        t2 = table.publish_branch(
            str(a["branch"]), drop=bool(a.get("drop_branch", True))
        )
        report = {
            "current_snapshot_id": t2.metadata.current_snapshot_id,
            "branch_dropped": int(str(a["branch"]) not in t2.metadata.refs),
        }
    elif proc == "remove_orphan_files":
        rep = _m.remove_orphan_files(
            table, older_than_s=float(a.get("older_than_s", 3 * 86400.0))
        )
        report = {"orphan_files_removed": int(rep["n_orphans_deleted"]),
                  "files_scanned": int(rep["n_scanned"])}
    else:  # vacuum
        kwargs = {
            k: int(v)
            for k, v in a.items()
            if k in ("keep_last_snapshots", "keep_last_metadata",
                     "max_manifest_chunks", "dv_convert_min_files")
        }
        if "orphan_older_than_s" in a:
            kwargs["orphan_older_than_s"] = float(a["orphan_older_than_s"])
        t2, rep = _m.vacuum(table, spark=spark, **kwargs)
        report = {
            "snapshots_before": snaps_before,
            "snapshots_after": len(t2.metadata.snapshots),
        }
    rows = [(proc, *[int(v) for v in report.values()])]
    cols = ", ".join(f"{k} long" for k in report)
    return spark.createDataFrame(rows, f"procedure string, {cols}")
