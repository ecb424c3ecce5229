"""SQL front-end for MERGE INTO (r12; VERDICT r11 missing #1).

The reference catalog exists to serve "a compute engine like Spark"
(mod.rs:359-361) whose users speak SQL — the most common DML entry point
for a reconcile-write is the ANSI/Delta/Iceberg statement::

    MERGE INTO cat.db.tbl AS t
    USING (SELECT ...) AS s            -- or a view/table name
    ON t.k1 = s.k1 AND t.k2 = s.k2
    WHEN MATCHED AND t.qty < s.qty THEN UPDATE SET qty = s.qty
    WHEN MATCHED AND s.op = 'D'    THEN DELETE
    WHEN NOT MATCHED               THEN INSERT (k1, k2, qty) VALUES (s.k1, s.k2, 0)
    WHEN NOT MATCHED BY SOURCE     THEN DELETE

This module is a GRAMMAR, not an engine: it tokenizes the statement,
normalizes the user's aliases to the clause algebra's ``t``/``s``, and
dispatches to ``maintenance.merge_into`` — the single-pass join + CASE
decision table that already executes every clause kind (CoW and MOR).
No Catalyst extension is needed; Spark parses the clause EXPRESSIONS
(conditions, SET right-hand sides, INSERT values) natively once
``merge_into`` wraps them in ``F.expr``.

Supported grammar (case-insensitive keywords; ``[]`` optional)::

    MERGE INTO <ident> [AS] [<alias>]
    USING ( <subquery> ) | <name> [AS] [<alias>]
    [ON <conjunction of t.col = s.col  (or <=>)>]   -- omitted: keys come
                                                    -- from the table's
                                                    -- declared identity
                                                    -- (SET IDENTIFIER
                                                    -- FIELDS, r17)
    WHEN MATCHED [AND <cond>] THEN UPDATE SET * | UPDATE SET c=e,... | DELETE
    WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT * | INSERT (cols) VALUES (exprs)
    WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET c=e,... | DELETE

``CASE WHEN ... THEN ... END`` inside any expression is handled (clause
boundaries track CASE nesting). String literals and backticked
identifiers pass through verbatim. The ON condition must be an
equi-conjunction on SAME-NAMED columns (the clause algebra joins
null-safely on shared key names); anything else raises with the
offending fragment.
"""

from __future__ import annotations

import re

__all__ = [
    "merge_sql",
    "parse_merge",
    "update_sql",
    "delete_sql",
    "insert_sql",
    "create_table_sql",
    "execute_dml",
]

_TOKEN_RE = re.compile(
    r"""
    (?P<str>'(?:[^']|'')*')            # single-quoted string, '' escape
                                       # (matched BEFORE comments, so a --
                                       # inside a literal survives)
  | (?P<comment>--[^\n]*|/\*.*?\*/)    # SQL comments, dropped
  | (?P<bq>`[^`]*`)                    # backticked identifier
  | (?P<word>[A-Za-z_][A-Za-z_0-9]*)   # bare identifier / keyword
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)  # numeric (incl. scientific)
  | (?P<op>->|<=>|<>|<=|>=|!=|\|\||::|[=<>().,*+\-/%$\[\]!?:;&^~])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {
    "MERGE", "INTO", "USING", "ON", "WHEN", "MATCHED", "NOT", "BY",
    "SOURCE", "TARGET", "AND", "THEN", "UPDATE", "SET", "DELETE",
    "INSERT", "VALUES", "AS", "CASE", "END", "WHERE", "FROM",
}


def _tokenize(sql: str) -> list[str]:
    out, pos = [], 0
    for m in _TOKEN_RE.finditer(sql):
        between = sql[pos : m.start()].strip()
        if between:
            raise ValueError(f"MERGE parse error: unexpected {between!r}")
        if m.lastgroup != "comment":
            out.append(m.group(0))
        pos = m.end()
    if sql[pos:].strip():
        raise ValueError(f"MERGE parse error: unexpected {sql[pos:].strip()!r}")
    return out


def _kw(tok: str) -> str | None:
    """The keyword a token spells, or None (strings/backticks never do)."""
    up = tok.upper()
    return up if up in _KEYWORDS and not tok.startswith(("'", "`")) else None


def _render(tokens: list[str], alias_map: dict[str, str]) -> str:
    """Tokens back to SQL text with the user's aliases normalized to
    ``t``/``s``. An identifier followed by ``.`` that names an alias is
    rewritten; everything else (including string literals and backticked
    identifiers) passes through."""
    parts: list[str] = []
    for i, tok in enumerate(tokens):
        t = tok
        if (
            not tok.startswith(("'", "`"))
            and i + 1 < len(tokens)
            and tokens[i + 1] == "."
            and tok.lower() in alias_map
            and (i == 0 or tokens[i - 1] != ".")
        ):
            t = alias_map[tok.lower()]
        if t == "." or (parts and parts[-1].endswith(".")):
            parts[-1] = parts[-1] + t
        else:
            parts.append(t)
    return " ".join(parts)


_CASE_IDENT_FOLLOWERS = {
    "=", "<", ">", "<=", ">=", "<>", "!=", "<=>", ")", ",", ".",
}
_CASE_IDENT_FOLLOWER_KWS = {
    "IN", "IS", "BETWEEN", "NOT", "AND", "OR", "THEN", "ELSE", "END",
}


def case_is_keyword(tokens: list[str], i: int) -> bool:
    """Is ``tokens[i]`` (spelled CASE) the CASE *keyword* or a column
    literally named ``case`` (r17 — the tokenizer-level fix for the r14
    finding where such a column inflated the CASE depth and silently
    disabled OR splitting, degrading pruning)? Context decides: a
    qualified ``t.case`` or a ``case`` followed by a comparison operator
    / IN / IS / BETWEEN / a boolean connective / a clause terminator is
    the identifier; the keyword is always followed by an operand or WHEN
    (and never ends the expression). Ambiguity is resolved toward the
    KEYWORD — over-counting depth only widens a prune, never a result."""
    if i > 0 and tokens[i - 1] == ".":
        return False  # qualified name: t.case
    if i + 1 >= len(tokens):
        return False  # expression ends here: CASE needs an operand/WHEN
    nxt = tokens[i + 1]
    if nxt in _CASE_IDENT_FOLLOWERS:
        return False
    if (nxt or "").upper() in _CASE_IDENT_FOLLOWER_KWS:
        return False
    return True


def _split_top(tokens: list[str], sep: str) -> list[list[str]]:
    """Split on a top-level separator token (paren- and CASE-aware)."""
    out, cur, depth, case_depth = [], [], 0, 0
    for i, tok in enumerate(tokens):
        kw = _kw(tok)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif kw == "CASE" and case_is_keyword(tokens, i):
            case_depth += 1
        elif kw == "END" and case_depth > 0:
            # clamp for columns literally named `end` (r15)
            case_depth -= 1
        if depth == 0 and case_depth == 0 and (
            tok == sep or (_kw(sep) and kw == _kw(sep))
        ):
            out.append(cur)
            cur = []
        else:
            cur.append(tok)
    out.append(cur)
    return out


def _strip_ident(tok: str) -> str:
    return tok[1:-1] if tok.startswith("`") else tok


class _Cursor:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError("MERGE parse error: unexpected end of statement")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect_kw(self, *kws: str) -> str:
        tok = self.next()
        if _kw(tok) not in kws:
            raise ValueError(
                f"MERGE parse error: expected {'/'.join(kws)}, got {tok!r}"
            )
        return _kw(tok)

    def try_kw(self, *kws: str) -> bool:
        if self.peek() is not None and _kw(self.peek()) in kws:
            self.i += 1
            return True
        return False

    def dotted_name(self) -> str:
        parts = [_strip_ident(self.next())]
        while self.peek() == ".":
            self.next()
            parts.append(_strip_ident(self.next()))
        return ".".join(parts)

    def until_kw(self, *stops: str) -> list[str]:
        """Tokens until a top-level stop keyword (paren/CASE aware); the
        stop token is NOT consumed."""
        out, depth, case_depth = [], 0, 0
        while self.i < len(self.toks):
            tok = self.toks[self.i]
            kw = _kw(tok)
            if depth == 0 and case_depth == 0 and kw in stops:
                break
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif kw == "CASE" and case_is_keyword(self.toks, self.i):
                case_depth += 1
            elif kw == "END" and case_depth > 0:
                case_depth -= 1
            out.append(tok)
            self.i += 1
        return out

    def balanced_parens(self) -> list[str]:
        """Consume '(' ... matching ')' and return the INNER tokens."""
        if self.next() != "(":
            raise ValueError("MERGE parse error: expected '('")
        out, depth = [], 1
        while True:
            tok = self.next()
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
                if depth == 0:
                    return out
            out.append(tok)


def _parse_on(tokens: list[str], alias_map: dict[str, str]) -> list[str]:
    """The ON conjunction -> merge key column list. Each conjunct must be
    ``<alias>.<col> = <alias>.<col>`` (or ``<=>``) with one target and one
    source reference to the SAME column name — the clause algebra's join
    contract (it joins null-safely on shared key names)."""
    keys = []
    for conj in _split_top(tokens, "AND"):
        sides = _split_top(conj, "=")
        if len(sides) != 2:
            sides = _split_top(conj, "<=>")
        if len(sides) != 2:
            raise ValueError(
                "MERGE ON must be a conjunction of t.col = s.col equalities; "
                f"got {' '.join(conj)!r}"
            )
        refs = {}
        for side in sides:
            if len(side) != 3 or side[1] != ".":
                raise ValueError(
                    "MERGE ON sides must be qualified <alias>.<col>; got "
                    f"{' '.join(side)!r}"
                )
            alias = alias_map.get(side[0].lower())
            if alias is None:
                raise ValueError(f"MERGE ON references unknown alias {side[0]!r}")
            refs[alias] = _strip_ident(side[2])
        if set(refs) != {"t", "s"}:
            raise ValueError(
                "each MERGE ON conjunct needs one target and one source side; "
                f"got {' '.join(conj)!r}"
            )
        if refs["t"].lower() != refs["s"].lower():
            raise ValueError(
                "MERGE ON columns must share a name (the merge joins on "
                f"shared key names); got t.{refs['t']} = s.{refs['s']} — "
                "alias the source column to the target's name first"
            )
        keys.append(refs["t"])
    return keys


def _parse_action(cur: _Cursor, group: str, alias_map: dict) -> dict:
    kw = cur.expect_kw("UPDATE", "DELETE", "INSERT")
    if kw == "DELETE":
        return {"action": "delete"}
    if kw == "UPDATE":
        cur.expect_kw("SET")
        body = cur.until_kw("WHEN")
        if body == ["*"]:
            return {"action": "update", "set": "all"}
        sets = {}
        for assign in _split_top(body, ","):
            lr = _split_top(assign, "=")
            if len(lr) != 2:
                raise ValueError(
                    f"MERGE SET expects col = expr; got {' '.join(assign)!r}"
                )
            lhs = [t for t in lr[0]]
            if len(lhs) == 3 and lhs[1] == ".":
                if alias_map.get(lhs[0].lower()) != "t":
                    # ANSI: only target columns are assignable — a source
                    # qualifier here is a statement bug, not a synonym
                    raise ValueError(
                        f"MERGE SET assigns a non-target column: {' '.join(lr[0])!r}"
                    )
                lhs = lhs[2:]  # t.col — the target qualifier is implied
            if len(lhs) != 1:
                raise ValueError(
                    f"MERGE SET left side must be a column; got {' '.join(lr[0])!r}"
                )
            sets[_strip_ident(lhs[0])] = _render(lr[1], alias_map)
        return {"action": "update", "set": sets}
    # INSERT
    if group != "not_matched":
        raise ValueError("INSERT is only valid in WHEN NOT MATCHED clauses")
    if cur.peek() == "*":
        cur.next()
        return {"action": "insert"}
    cols = [_strip_ident(t) for t in cur.balanced_parens() if t != ","]
    cur.expect_kw("VALUES")
    exprs = _split_top(cur.balanced_parens(), ",")
    if len(cols) != len(exprs):
        raise ValueError(
            f"MERGE INSERT lists {len(cols)} columns but {len(exprs)} values"
        )
    return {
        "action": "insert",
        "values": {c: _render(e, alias_map) for c, e in zip(cols, exprs)},
    }


def parse_merge(sql: str) -> dict:
    """Parse a MERGE statement into ``merge_into`` arguments:
    ``{"target": str, "source": ("subquery"|"name", str),
    "on": [col, ...], "when_matched": [...], "when_not_matched": [...],
    "when_not_matched_by_source": [...]}``."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    cur.expect_kw("MERGE")
    cur.expect_kw("INTO")
    target = cur.dotted_name()
    cur.try_kw("AS")
    # without an explicit alias, SQL lets references use the relation's
    # (last) name — default the alias to it, with `t`/`s` also mapped
    t_alias = target.split(".")[-1].lower()
    if cur.peek() is not None and _kw(cur.peek()) is None and cur.peek() not in (
        "(", ")", ",", ".",
    ):
        t_alias = _strip_ident(cur.next()).lower()
    cur.expect_kw("USING")
    if cur.peek() == "(":
        source = ("subquery", _render(cur.balanced_parens(), {}))
        s_alias = "s"
    else:
        source = ("name", cur.dotted_name())
        s_alias = source[1].split(".")[-1].lower()
    cur.try_kw("AS")
    if cur.peek() is not None and _kw(cur.peek()) is None and cur.peek() not in (
        "(", ")", ",", ".",
    ):
        s_alias = _strip_ident(cur.next()).lower()
    if t_alias == s_alias:
        raise ValueError(f"MERGE target and source share the alias {t_alias!r}")
    # user aliases SHADOW the defaults (a target aliased `s` really is `s`
    # in the statement's scope, mapping to the algebra's `t`)
    alias_map = {"t": "t", "s": "s"}
    alias_map[t_alias] = "t"
    alias_map[s_alias] = "s"
    # ON is optional (r17): omitted -> merge_into resolves the key columns
    # from the table's declared identity (SET IDENTIFIER FIELDS)
    on = None
    if cur.try_kw("ON"):
        on = _parse_on(cur.until_kw("WHEN"), alias_map)

    groups: dict[str, list] = {
        "matched": [],
        "not_matched": [],
        "not_matched_by_source": [],
    }
    while cur.peek() is not None:
        cur.expect_kw("WHEN")
        negated = cur.try_kw("NOT")
        cur.expect_kw("MATCHED")
        group = "matched"
        if negated:
            group = "not_matched"
            if cur.try_kw("BY"):
                which = cur.expect_kw("SOURCE", "TARGET")
                if which == "SOURCE":
                    group = "not_matched_by_source"
        elif cur.try_kw("BY"):
            raise ValueError("WHEN MATCHED takes no BY qualifier")
        clause: dict = {}
        if cur.try_kw("AND"):
            clause["condition"] = _render(cur.until_kw("THEN"), alias_map)
        cur.expect_kw("THEN")
        clause.update(_parse_action(cur, group, alias_map))
        groups[group].append(clause)
    if not any(groups.values()):
        raise ValueError("MERGE needs at least one WHEN clause")
    return {
        "target": target,
        "source": source,
        "on": on,
        "when_matched": groups["matched"],
        "when_not_matched": groups["not_matched"],
        "when_not_matched_by_source": groups["not_matched_by_source"],
    }


def merge_sql(
    spark,
    catalog,
    sql: str,
    sources: dict | None = None,
    preserve_lineage: bool = False,
    strategy: str = "cow",
    pointer_swap=None,
):
    """Execute a SQL ``MERGE INTO`` statement against a catalog table and
    return the committed :class:`Table`.

    The target resolves through ``catalog.load_table``; a ``USING (...)``
    subquery runs through ``spark.sql`` (temp views available), a
    ``USING name`` source resolves from the ``sources`` dict first and
    ``spark.table(name)`` second. ``strategy``/``preserve_lineage`` are
    engine knobs, not grammar: ``"mor"`` commits the same statement as an
    atomic row delta (the O(changed rows) path), and lineage composes with
    CDC exactly as the Python API does."""
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
    from iceberg_catalog_postgres_spark.catalog.maintenance import merge_into

    from iceberg_catalog_postgres_spark.catalog.select_sql import select_sql

    p = parse_merge(sql)
    table = catalog.load_table(TableIdentifier.parse(p["target"]))
    kind, text = p["source"]
    if kind == "subquery":
        # r13: the subquery runs through the SELECT front-end, so USING
        # (SELECT ... FROM cat.ns.other [VERSION AS OF ...]) composes —
        # catalog refs resolve, temp views still pass through
        source = select_sql(spark, catalog, text)
    elif sources and text in sources:
        source = sources[text]
    else:
        from iceberg_catalog_postgres_spark.catalog.catalog import (
            TableIdentifier as _TI,
        )

        source = None
        if "." in text:
            try:
                ident = _TI.parse(text)
            except ValueError:
                ident = None
            if ident is not None and catalog.table_exists(ident):
                source = catalog.load_table(ident).to_df(spark)
            elif ident is not None:
                from iceberg_catalog_postgres_spark.catalog import views as _v

                if _v.view_exists(catalog, ident):
                    # a catalog VIEW as the merge source: expand through
                    # the same resolver SELECT uses
                    source = select_sql(spark, catalog, f"SELECT * FROM {text}")
        if source is None:
            source = spark.table(text)
    return merge_into(
        spark,
        table,
        source,
        on=p["on"],
        when_matched=p["when_matched"],
        when_not_matched=p["when_not_matched"],
        when_not_matched_by_source=p["when_not_matched_by_source"],
        preserve_lineage=preserve_lineage,
        strategy=strategy,
        pointer_swap=pointer_swap,
    )


def _strip_alias(tokens: list[str], aliases: set) -> list[str]:
    """Drop single-table alias qualifiers (``t.col`` -> ``col``): in
    UPDATE/DELETE statements there is exactly one relation in scope, and
    the engine's ``update_where``/``delete_where`` expressions are plain
    column references."""
    out, i = [], 0
    while i < len(tokens):
        tok = tokens[i]
        if (
            not tok.startswith(("'", "`"))
            and tok.lower() in aliases
            and i + 1 < len(tokens)
            and tokens[i + 1] == "."
            and (i == 0 or tokens[i - 1] != ".")
        ):
            i += 2  # skip `alias` and `.`
            continue
        out.append(tok)
        i += 1
    return out


def parse_update(sql: str) -> dict:
    """``UPDATE <ident> [AS alias] SET col = expr[, ...] [WHERE cond]`` ->
    ``{"target", "set": {col: expr}, "where": str|None}``."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    cur.expect_kw("UPDATE")
    target = cur.dotted_name()
    cur.try_kw("AS")
    aliases = {target.split(".")[-1].lower(), "t"}
    if cur.peek() is not None and _kw(cur.peek()) is None and cur.peek() not in (
        "(", ")", ",", ".",
    ):
        aliases.add(_strip_ident(cur.next()).lower())
    cur.expect_kw("SET")
    body = cur.until_kw("WHERE")
    sets = {}
    for assign in _split_top(body, ","):
        lr = _split_top(assign, "=")
        if len(lr) != 2:
            raise ValueError(
                f"UPDATE SET expects col = expr; got {' '.join(assign)!r}"
            )
        lhs = _strip_alias(lr[0], aliases)
        if len(lhs) != 1:
            raise ValueError(
                f"UPDATE SET left side must be a column; got {' '.join(lr[0])!r}"
            )
        sets[_strip_ident(lhs[0])] = _render(_strip_alias(lr[1], aliases), {})
    where = None
    if cur.try_kw("WHERE"):
        where = _render(_strip_alias(cur.toks[cur.i :], aliases), {})
        cur.i = len(cur.toks)
    if cur.peek() is not None:
        raise ValueError(f"UPDATE parse error: trailing {cur.peek()!r}")
    return {"target": target, "set": sets, "where": where}


def parse_delete(sql: str) -> dict:
    """``DELETE FROM <ident> [AS alias] [WHERE cond]`` ->
    ``{"target", "where": str|None}``."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    cur.expect_kw("DELETE")
    cur.expect_kw("FROM")
    target = cur.dotted_name()
    cur.try_kw("AS")
    aliases = {target.split(".")[-1].lower(), "t"}
    if cur.peek() is not None and _kw(cur.peek()) is None and cur.peek() not in (
        "(", ")", ",", ".",
    ):
        aliases.add(_strip_ident(cur.next()).lower())
    where = None
    if cur.try_kw("WHERE"):
        where = _render(_strip_alias(cur.toks[cur.i :], aliases), {})
        cur.i = len(cur.toks)
    if cur.peek() is not None:
        raise ValueError(f"DELETE parse error: trailing {cur.peek()!r}")
    return {"target": target, "where": where}


def update_sql(
    spark,
    catalog,
    sql: str,
    strategy: str = "mor",
    preserve_lineage: bool = False,
    pointer_swap=None,
):
    """Execute a SQL ``UPDATE`` against a catalog table via
    ``maintenance.update_where`` — MOR row delta by default (O(matched
    rows)), CoW on request; lineage composes like the merge paths."""
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
    from iceberg_catalog_postgres_spark.catalog.maintenance import update_where

    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        prune_subset_for_where,
    )

    p = parse_update(sql)
    ident = TableIdentifier.parse(p["target"])
    table = catalog.load_table(ident)
    if p["where"] is not None and _where_has_subquery(p["where"]):
        # r15: UPDATE ... WHERE id IN (SELECT ...) — MOR only (the CoW
        # CASE projection cannot embed a subquery; update_where raises
        # a guided refusal for cow)
        from iceberg_catalog_postgres_spark.catalog.maintenance import (
            sql_where_filter,
        )

        return update_where(
            spark, table,
            lambda df, w=p["where"]: sql_where_filter(spark, table, df, w),
            p["set"], strategy=strategy,
            preserve_lineage=preserve_lineage, pointer_swap=pointer_swap,
        )
    # r14: route the WHERE through the same DNF extractor the SELECT path
    # uses, so the matching scan plans O(candidate files) — None = no
    # extractable partition constraint, scan everything (superset-safe)
    subset = (
        prune_subset_for_where(table, ident, p["where"])
        if p["where"] is not None
        else None
    )
    return update_where(
        spark,
        table,
        p["where"] if p["where"] is not None else "true",
        p["set"],
        strategy=strategy,
        preserve_lineage=preserve_lineage,
        pointer_swap=pointer_swap,
        file_subset=subset,
    )


def delete_sql(spark, catalog, sql: str, strategy: str = "mor",
               as_dv: bool = True, pointer_swap=None):
    """Execute a SQL ``DELETE FROM`` against a catalog table via
    ``maintenance.delete_where_mor`` (deletion vectors by default — the v3
    read-amplification answer) or ``delete_where_cow``."""
    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        delete_where_cow_predicate,
        delete_where_mor,
    )

    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        prune_subset_for_where,
    )

    p = parse_delete(sql)
    ident = TableIdentifier.parse(p["target"])
    table = catalog.load_table(ident)
    if strategy not in ("cow", "mor"):
        raise ValueError(f"strategy must be cow|mor, got {strategy!r}")
    if p["where"] is not None and _where_has_subquery(p["where"]):
        # r15: DELETE ... WHERE id IN (SELECT ...) — the tombstone
        # pattern. Dataset.filter parses EXPRESSIONS only, so the WHERE
        # routes through select_sql as a full statement (catalog refs
        # inside the subquery resolve too).
        from iceberg_catalog_postgres_spark.catalog.maintenance import (
            sql_where_filter,
        )

        if strategy == "cow":
            # keep rows where the predicate IS NOT TRUE (NULL keeps —
            # DELETE removes only provably-matching rows)
            kept = sql_where_filter(
                spark, table, table.to_df(spark),
                f"( {p['where']} ) IS NOT TRUE",
            )
            return (
                table.new_transaction()
                .overwrite_dataframe(kept)
                .commit(pointer_swap=pointer_swap)
            )
        return delete_where_mor(
            spark, table,
            lambda df, w=p["where"]: sql_where_filter(spark, table, df, w),
            as_dv=as_dv, pointer_swap=pointer_swap,
        )
    cond = F.expr(p["where"]) if p["where"] is not None else F.lit(True)
    # r14: the WHERE's partition constraints reach the write path — MOR
    # scans only the planner's candidate files; CoW rewrites only them
    # and carries every other file over byte-identical
    subset = (
        prune_subset_for_where(table, ident, p["where"])
        if p["where"] is not None
        else None
    )
    if strategy == "cow":
        return delete_where_cow_predicate(
            spark, table, cond, pointer_swap=pointer_swap, file_subset=subset
        )
    return delete_where_mor(
        spark, table, cond, as_dv=as_dv, pointer_swap=pointer_swap,
        file_subset=subset,
    )


def _where_has_subquery(where_text: str) -> bool:
    """True when a WHERE contains a subquery token (SELECT inside the
    predicate) — those cannot parse as a Dataset filter expression."""
    return any(
        not t.startswith(("'", "`")) and t.upper() == "SELECT"
        for t in _tokenize(where_text)
        if t and (t[0].isalpha() or t[0] == "_")
    )


def execute_dml(spark, catalog, sql: str, **kwargs):
    """One SQL entry point for the three DML statements the reference's
    engine users write (mod.rs:359-361): dispatch on the leading keyword
    to ``merge_sql`` / ``update_sql`` / ``delete_sql``. ``kwargs`` pass
    through (``strategy``, ``preserve_lineage``, ``sources``, ...)."""
    import inspect

    from iceberg_catalog_postgres_spark.catalog.ddl_sql import (
        alter_sql,
        analyze_sql,
        call_sql,
        describe_sql,
        drop_table_sql,
        show_tables_sql,
        truncate_sql,
    )
    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        explain_sql,
        select_sql,
    )

    head = sql.lstrip().split(None, 1)
    # "BEGIN;" arrives with the semicolon attached to the first word
    kw = head[0].upper().rstrip(";") if head else ""
    if kw == "BEGIN":
        # BEGIN; <dml>; ...; COMMIT — the atomic multi-statement script
        from iceberg_catalog_postgres_spark.catalog.transaction_sql import (
            execute_script,
        )

        return execute_script(spark, catalog, sql, **kwargs)
    fn = {
        "MERGE": merge_sql,
        "UPDATE": update_sql,
        "DELETE": delete_sql,
        "INSERT": insert_sql,
        "CREATE": create_table_sql,
        "SELECT": select_sql,
        "WITH": select_sql,
        "ALTER": alter_sql,
        "ANALYZE": analyze_sql,
        "TRUNCATE": truncate_sql,
        "CALL": call_sql,
        "DROP": drop_table_sql,
        "SHOW": show_tables_sql,
        "DESCRIBE": describe_sql,
        "DESC": describe_sql,
        "EXPLAIN": explain_sql,
    }.get(kw)
    if fn is None:
        raise ValueError(
            "execute_dml handles MERGE/UPDATE/DELETE/INSERT/CREATE/SELECT/"
            "ALTER/ANALYZE/TRUNCATE/CALL/DROP/SHOW/DESCRIBE/EXPLAIN "
            f"statements and BEGIN...COMMIT scripts, got {kw!r}"
        )
    # forward only the knobs this statement kind takes — a generic caller
    # can always pass {strategy, preserve_lineage, sources, as_dv} and let
    # the dispatch drop what does not apply (e.g. DELETE has no lineage
    # knob: the delete side of lineage is implicit)
    accepted = set(inspect.signature(fn).parameters)
    return fn(
        spark, catalog, sql, **{k: v for k, v in kwargs.items() if k in accepted}
    )


def parse_insert(sql: str) -> dict:
    """``INSERT INTO|OVERWRITE <ident> [PARTITION (col = lit, ...)]
    [(cols)] VALUES (...)[, ...] | SELECT ...`` -> ``{"target",
    "overwrite", "partition": {col: lit}|None, "columns": [..]|None,
    "source": ("values"|"select", sql text)}``."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    cur.expect_kw("INSERT")
    mode = cur.next()
    if _kw(mode) == "INTO":
        overwrite = False
    elif not mode.startswith(("'", "`")) and mode.upper() == "OVERWRITE":
        overwrite = True
    else:
        raise ValueError(f"INSERT parse error: expected INTO/OVERWRITE, got {mode!r}")
    target = cur.dotted_name()
    partition = None
    if (
        cur.peek() is not None
        and not cur.peek().startswith(("'", "`"))
        and cur.peek().upper() == "PARTITION"
    ):
        # Spark's static-partition clause: every entry must be col = lit
        # (a dynamic entry is spelled by OMITTING the clause entirely)
        from iceberg_catalog_postgres_spark.catalog.select_sql import (
            _parse_literal,
        )

        cur.next()
        partition = {}
        for piece in _split_top(cur.balanced_parens(), ","):
            if not piece:
                continue
            if len(piece) < 3 or piece[1] != "=":
                raise ValueError(
                    "INSERT PARTITION entries must be col = literal; "
                    "omit the clause for dynamic partition overwrite"
                )
            partition[_strip_ident(piece[0])] = _parse_literal(
                _Cursor(piece[2:])
            )
        if not partition:
            raise ValueError("INSERT PARTITION clause is empty")
    by_name = False
    if (
        cur.peek() is not None
        and _kw(cur.peek()) == "BY"
        and cur.i + 1 < len(cur.toks)
        and not cur.toks[cur.i + 1].startswith(("'", "`"))
        and cur.toks[cur.i + 1].upper() == "NAME"
    ):
        # Spark's INSERT INTO t BY NAME: bind the SELECT's output columns
        # to table columns by NAME instead of position (r13 — prevents
        # silent transposition when a user reorders the SELECT)
        cur.next()
        cur.next()
        by_name = True
    columns = None
    if cur.peek() == "(":
        if by_name:
            raise ValueError("INSERT BY NAME takes no column list")
        columns = [_strip_ident(t) for t in cur.balanced_parens() if t != ","]
    if cur.try_kw("VALUES"):
        if by_name:
            raise ValueError("INSERT BY NAME requires a SELECT body")
        rest = cur.toks[cur.i :]
        cur.i = len(cur.toks)
        return {
            "target": target,
            "overwrite": overwrite,
            "partition": partition,
            "columns": columns,
            "by_name": False,
            "source": ("values", _render(rest, {})),
        }
    # SELECT body: everything that remains, verbatim (Spark parses it)
    rest = cur.toks[cur.i :]
    cur.i = len(cur.toks)
    if not rest or rest[0].upper() != "SELECT":
        raise ValueError("INSERT parse error: expected VALUES or SELECT")
    return {
        "target": target,
        "overwrite": overwrite,
        "partition": partition,
        "columns": columns,
        "by_name": by_name,
        "source": ("select", _render(rest, {})),
    }


def parse_create_table(sql: str) -> dict:
    """``CREATE TABLE [IF NOT EXISTS] <ident> [(col type, ...)]
    [PARTITIONED BY (entries)] [AS SELECT ...]`` ->
    ``{"target", "if_not_exists", "columns": [(name, type_tokens)]|None,
    "partition_by": [..]|None, "select": str|None}``. Column-DDL and AS
    SELECT are mutually exclusive (the CTAS schema comes from the
    select)."""
    cur = _Cursor(_tokenize(sql.strip().rstrip(";")))
    for kw in ("CREATE", "TABLE"):
        tok = cur.next()
        if tok.startswith(("'", "`")) or tok.upper() != kw:
            raise ValueError(f"CTAS parse error: expected {kw}, got {tok!r}")
    if_not_exists = False
    if (
        cur.peek() is not None
        and not cur.peek().startswith(("'", "`"))
        and cur.peek().upper() == "IF"
    ):
        cur.next()
        if _kw(cur.next()) != "NOT" or cur.next().upper() != "EXISTS":
            raise ValueError("CREATE parse error: expected IF NOT EXISTS")
        if_not_exists = True
    target = cur.dotted_name()
    columns = None
    if cur.peek() == "(":
        columns = []
        for piece in _split_top(cur.balanced_parens(), ","):
            pc = _Cursor(piece)
            columns.append((_strip_ident(pc.next()), pc.toks[pc.i :]))
    partition_by = None
    if cur.peek() is not None and not cur.peek().startswith(("'", "`")) and cur.peek().upper() == "PARTITIONED":
        cur.next()
        cur.expect_kw("BY")
        # entries may be identity columns or transforms like bucket(8, k) —
        # canonicalize each to the spec's entry spelling (r16: plain
        # _render space-joins tokens into "day ( ts )", which the spec
        # parser's transform regex never matches — transforms in SQL
        # PARTITIONED BY silently failed table creation)
        partition_by = []
        for e in _split_top(cur.balanced_parens(), ","):
            pc = _Cursor(e)
            head = _strip_ident(pc.next())
            if pc.peek() == "(":
                args = [
                    _render(piece, {})
                    for piece in _split_top(pc.balanced_parens(), ",")
                ]
                partition_by.append(f"{head.lower()}({', '.join(args)})")
            else:
                partition_by.append(head)
            if pc.peek() is not None:
                raise ValueError(
                    "PARTITIONED BY: unexpected trailing tokens "
                    f"{' '.join(pc.toks[pc.i:])!r} after {head!r}"
                )
    if cur.peek() is None:
        # column-DDL form: create an EMPTY table with the declared schema
        if columns is None:
            raise ValueError(
                "CREATE TABLE needs a column list or AS SELECT"
            )
        return {
            "target": target,
            "if_not_exists": if_not_exists,
            "columns": columns,
            "partition_by": partition_by,
            "select": None,
        }
    tok = cur.next()
    if tok.startswith(("'", "`")) or _kw(tok) != "AS":
        raise ValueError(f"CTAS parse error: expected AS, got {tok!r}")
    if columns is not None:
        raise ValueError(
            "CREATE TABLE takes a column list OR AS SELECT, not both"
        )
    rest = cur.toks[cur.i :]
    cur.i = len(cur.toks)
    if not rest or rest[0].upper() != "SELECT":
        raise ValueError("CTAS parse error: expected SELECT after AS")
    return {
        "target": target,
        "if_not_exists": if_not_exists,
        "columns": None,
        "partition_by": partition_by,
        "select": _render(rest, {}),
    }


def insert_sql(spark, catalog, sql: str, n_files: int | None = None,
               pointer_swap=None):
    """Execute a SQL ``INSERT INTO`` (append commit) or ``INSERT
    OVERWRITE`` (CoW overwrite commit) against a catalog table. A VALUES
    body runs as ``SELECT * FROM VALUES ... AS v(cols)``; a SELECT body
    runs through ``spark.sql`` (temp views available). With a column
    list, unnamed table columns fill NULL; every column is cast to the
    table's DECLARED type (the DML family's anti-poisoning rule) and
    bound BY POSITION within the listed columns, by name otherwise via
    the select's output names."""
    from pyspark.sql import functions as F

    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    p = parse_insert(sql)
    ident = TableIdentifier.parse(p["target"])
    # Iceberg's branch-write identifier: INSERT INTO ns.t.branch_dev
    # stages the append on branch 'dev' without moving main (the WAP
    # write half; publish with CALL system.publish_branch). Only used
    # when the literal name does not itself resolve.
    branch = "main"
    if (
        ident.name.startswith("branch_")
        and len(ident.namespace) >= 2
        and not catalog.table_exists(ident)
    ):
        base = TableIdentifier(ident.namespace[:-1], ident.namespace[-1])
        if catalog.table_exists(base):
            branch = ident.name[len("branch_"):]
            ident = base
    table = catalog.load_table(ident)
    if branch != "main" and p["overwrite"]:
        raise ValueError("INSERT OVERWRITE on a branch: branch commits are append-only")
    cols = [f.name for f in table.schema.fields]
    types = {f.name: f.dataType for f in table.schema.fields}
    part = p.get("partition") or {}
    if part:
        unknown = [c for c in part if c not in types]
        if unknown:
            raise ValueError(
                f"INSERT PARTITION names unknown column(s): {unknown}"
            )
    kind, text = p["source"]
    from iceberg_catalog_postgres_spark.catalog.select_sql import select_sql

    if p.get("by_name"):
        # BY NAME binding: the select's OUTPUT names choose the targets —
        # reordering the SELECT can never transpose values into the wrong
        # column; unknown output names refuse loudly
        df = select_sql(spark, catalog, text)
        unknown = [c for c in df.columns if c not in types]
        if unknown:
            raise ValueError(
                f"INSERT BY NAME: select outputs unknown column(s): {unknown}"
            )
        listed = list(df.columns)
    else:
        # with a static PARTITION clause the query supplies the REMAINING
        # columns (Spark's rule); otherwise every table column
        listed = p["columns"] or [c for c in cols if c not in part]
        unknown = [c for c in listed if c not in types]
        if unknown:
            raise ValueError(f"INSERT lists unknown column(s): {unknown}")
        if kind == "values":
            df = spark.sql(
                f"SELECT * FROM (VALUES {text}) AS v({', '.join(listed)})"
            )
        else:
            # SELECT bodies resolve catalog refs too (r13): INSERT INTO a
            # SELECT ... FROM cat.ns.b works without a temp-view detour
            df = select_sql(spark, catalog, text)
            if len(df.columns) != len(listed):
                raise ValueError(
                    f"INSERT SELECT yields {len(df.columns)} columns for "
                    f"{len(listed)} targets"
                )
            df = df.toDF(*listed)
    if part:
        dup = [c for c in part if c in listed]
        if dup:
            raise ValueError(
                f"INSERT PARTITION column(s) also provided by the query: {dup}"
            )
    out = [
        (
            F.lit(part[c]) if c in part
            else F.col(c) if c in listed
            else F.lit(None)
        ).cast(types[c]).alias(c)
        for c in cols
    ]
    if p["overwrite"]:
        from iceberg_catalog_postgres_spark.catalog.maintenance import (
            overwrite_partitions,
        )
        from iceberg_catalog_postgres_spark.catalog.table import (
            parse_partition_field,
        )

        if part:
            # static partition overwrite (r14): the named partition is
            # replaced by the select's rows (partition columns become
            # constants). Correct-by-construction rule: the clause must
            # name EXACTLY the identity partition sources of the spec —
            # a partial key under a multi-entry spec would replace only
            # the tuples present in the batch (dynamic semantics), not
            # the whole named slice, and a transform entry has no single
            # literal. Explicit > silently wrong.
            idents = {
                parse_partition_field(e)[2]
                for e in table.metadata.partition_spec
                if parse_partition_field(e)[0] == "identity"
            }
            if set(part) != idents or len(table.metadata.partition_spec) != len(idents):
                raise ValueError(
                    "INSERT OVERWRITE PARTITION must name exactly the "
                    f"identity partition source(s) {sorted(idents)} of an "
                    "all-identity spec; use dynamic partition overwrite "
                    "(no PARTITION clause, "
                    "spark.sql.sources.partitionOverwriteMode=dynamic) "
                    "for transform or partial-key specs"
                )
            # replace_partitions: the NAMED slice is truncated even when
            # the source query yields zero rows (r15 ADVICE — static
            # overwrite semantics; the dynamic path below replaces only
            # batch-present partitions by design)
            return overwrite_partitions(
                spark, table, df.select(*out), pointer_swap=pointer_swap,
                replace_partitions=[dict(part)],
            )
        mode = str(
            spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        ).lower()
        if mode == "dynamic" and table.metadata.partition_spec:
            # Spark's dynamic mode: replace ONLY the partitions the
            # incoming rows touch (the daily-restatement shape)
            return overwrite_partitions(
                spark, table, df.select(*out), pointer_swap=pointer_swap
            )
        return table.new_transaction(branch=branch).overwrite_dataframe(
            df.select(*out)
        ).commit(pointer_swap=pointer_swap)
    tx = table.new_transaction(branch=branch)
    return tx.append_dataframe(df.select(*out), n_files=n_files).commit(
        pointer_swap=pointer_swap
    )


def create_table_sql(spark, catalog, sql: str):
    """Execute ``CREATE TABLE ... [PARTITIONED BY (...)] AS SELECT ...``:
    create the table from the select's schema (identity or transform
    partition entries pass straight to the catalog's spec) and append the
    rows as the first snapshot."""
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    from iceberg_catalog_postgres_spark.catalog.ddl_sql import _sql_type
    from iceberg_catalog_postgres_spark.catalog.select_sql import select_sql

    # CREATE [OR REPLACE] VIEW routes to the view surface; CREATE
    # NAMESPACE|SCHEMA to the namespace lifecycle (r14)
    head = [
        t.upper() for t in _tokenize(sql.strip())[:4]
        if not t.startswith(("'", "`"))
    ]
    if "VIEW" in head:
        from iceberg_catalog_postgres_spark.catalog.views import create_view_sql

        return create_view_sql(spark, catalog, sql)
    if "NAMESPACE" in head or "SCHEMA" in head:
        from iceberg_catalog_postgres_spark.catalog.namespaces import (
            create_namespace_sql,
        )

        return create_namespace_sql(spark, catalog, sql)
    p = parse_create_table(sql)
    ident = TableIdentifier.parse(p["target"])
    if p["if_not_exists"] and catalog.table_exists(ident):
        return catalog.load_table(ident)
    if p["select"] is None:
        # column-DDL form (r13): empty table, schema from the statement
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [StructField(n, _sql_type(toks), True) for n, toks in p["columns"]]
        )
        return catalog.create_table(
            ident, schema, partition_by=p["partition_by"]
        )
    df = select_sql(spark, catalog, p["select"])
    t = catalog.create_table(ident, df.schema, partition_by=p["partition_by"])
    return t.new_transaction().append_dataframe(df).commit()
