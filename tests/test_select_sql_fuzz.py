"""Adversarial WHERE-pruning fuzz property (r14, VERDICT r13 item 2).

The r13 OR-precedence defect survived because every pruning test was a
hand-picked WHERE the extractor happened to handle; the class of bug —
parser-vs-planner disagreement on which files a predicate can touch —
needs predicates the author did NOT think of. This property generates
random boolean predicate trees (AND / OR / NOT / parens / BETWEEN / IN /
comparisons, over partition AND non-partition columns, with random
keyword casing and redundant parens), renders them with SQL's own
precedence (AND > OR, minimal parens — so flat ``a AND b OR c`` chains
appear constantly), and checks that ``select_sql`` over a PARTITIONED
catalog table returns exactly the rows a direct Python evaluation of the
tree selects. Any pruning decision that drops a matching file fails the
property; pruning that merely under-fires is invisible (superset-safe by
design). Seeded and deterministic."""

from __future__ import annotations

import random

import pytest

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.select_sql import (
    select_plan_info,
    select_sql,
)

from tests.conftest import fuzz_cases

# default tier runs a PREFIX of the same seeded case stream (see conftest)
N_CASES = fuzz_cases(220, 64)
SEED = 1402

#: row model: k unique, day = k % 7 (identity partition),
#: b = k % 13 (truncate(4) partition), name = 'n<k%5>' (never partitioned)
ROWS = [(k, k % 7, k % 13, f"n{k % 5}") for k in range(120)]

_INT_COLS = ("k", "day", "b")
_LITS = list(range(-2, 15))
_NAMES = ["n0", "n1", "n3", "zz"]


def _leaf(rng: random.Random):
    kind = rng.randrange(8)
    if kind < 4:  # comparison
        col = rng.choice(_INT_COLS)
        op = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
        lit = rng.choice(_LITS)
        if rng.random() < 0.2:  # flipped literal-first form
            flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<=",
                    "=": "=", "<>": "<>"}[op]
            return (f"{lit} {flip} {col}",
                    lambda r, c=col, o=op, v=lit: _cmp(r[c], o, v))
        return (f"{col} {op} {lit}",
                lambda r, c=col, o=op, v=lit: _cmp(r[c], o, v))
    if kind == 4:  # BETWEEN (sometimes empty: lo > hi)
        col = rng.choice(_INT_COLS)
        lo, hi = rng.choice(_LITS), rng.choice(_LITS)
        return (f"{col} BETWEEN {lo} AND {hi}",
                lambda r, c=col, a=lo, z=hi: a <= r[c] <= z)
    if kind == 5:  # IN list
        col = rng.choice(_INT_COLS)
        vals = rng.sample(_LITS, rng.randrange(1, 4))
        return (f"{col} IN ({', '.join(map(str, vals))})",
                lambda r, c=col, vs=tuple(vals): r[c] in vs)
    if kind == 6:  # string predicate (never prunable)
        name = rng.choice(_NAMES)
        op = rng.choice(["=", "<>"])
        return (f"name {op} '{name}'",
                lambda r, o=op, v=name: _cmp(r["name"], o, v))
    # tautology/contradiction-ish constant comparison
    a, b = rng.choice(_LITS), rng.choice(_LITS)
    return (f"{a} <= {b}", lambda r, x=a, y=b: x <= y)


def _cmp(x, op, v):
    return {"=": x == v, "<>": x != v, "<": x < v, "<=": x <= v,
            ">": x > v, ">=": x >= v}[op]


def _tree(rng: random.Random, depth: int):
    """-> (sql, eval_fn, prec) with prec 3=atom, 2=AND-chain, 1=OR-chain."""
    if depth <= 0 or rng.random() < 0.35:
        sql, fn = _leaf(rng)
        return sql, fn, 3
    kind = rng.randrange(5)
    if kind == 0:  # NOT — always parenthesized (unambiguous)
        s, f, _p = _tree(rng, depth - 1)
        kw = rng.choice(["NOT", "not"])
        return f"{kw} ( {s} )", (lambda r, f=f: not f(r)), 3
    if kind == 1:  # redundant parens
        s, f, _p = _tree(rng, depth - 1)
        return f"( {s} )", f, 3
    op_and = kind in (2, 3)  # AND twice as likely as OR at each level
    ls, lf, lp = _tree(rng, depth - 1)
    rs, rf, rp = _tree(rng, depth - 1)
    if op_and:
        # parenthesize any OR child: minimal-paren AND rendering
        if lp < 2:
            ls = f"( {ls} )"
        if rp < 2:
            rs = f"( {rs} )"
        kw = rng.choice(["AND", "and", "And"])
        return f"{ls} {kw} {rs}", (lambda r, a=lf, b=rf: a(r) and b(r)), 2
    kw = rng.choice(["OR", "or", "Or"])
    return f"{ls} {kw} {rs}", (lambda r, a=lf, b=rf: a(r) or b(r)), 1


@pytest.fixture(scope="module")
def fuzz_table(tmp_path_factory, spark):
    cat = PostgresCatalog.connect(
        "ssqlfuzz", None, str(tmp_path_factory.mktemp("wh"))
    )
    cat.initialize()
    df = spark.createDataFrame(ROWS, "k long, day long, b long, name string")
    t = cat.create_table(
        TableIdentifier.parse("fz.t"), df.schema,
        partition_by=["day", "truncate(4, b)"],
    )
    t.new_transaction().append_dataframe(df.repartition("day")).commit()
    yield cat
    cat.backend.close()


def test_fuzz_where_pruning_matches_unpruned_evaluation(fuzz_table, spark):
    rng = random.Random(SEED)
    keys = [dict(zip(("k", "day", "b", "name"), r)) for r in ROWS]
    failures = []
    for case in range(N_CASES):
        sql_pred, fn, _p = _tree(rng, rng.randrange(1, 5))
        expect = sorted(r["k"] for r in keys if fn(r))
        stmt = f"SELECT k FROM fz.t WHERE {sql_pred}"
        try:
            got = sorted(
                r.k for r in select_sql(spark, fuzz_table, stmt).collect()
            )
        except Exception as exc:  # a refusal is also a property failure
            failures.append((case, sql_pred, f"raised {exc!r}"))
            continue
        if got != expect:
            info = select_plan_info(spark, fuzz_table, stmt)
            failures.append(
                (case, sql_pred,
                 f"{len(got)} rows != {len(expect)} expected; plan={info}")
            )
        if len(failures) >= 5:
            break
    assert not failures, failures


# --- join fuzz: multi-ref pruning attribution (r14) -----------------------

F_ROWS = [(k, k % 6, k % 4) for k in range(72)]   # k, fday (part), fb
D_ROWS = [(k, k % 5, f"m{k % 3}") for k in range(60)]  # k, dr (part), dn

_J_COLS = {"fday": "f", "fb": "f", "dr": "d", "k": None}


def _j_leaf(rng: random.Random):
    kind = rng.randrange(6)
    if kind < 3:
        col = rng.choice(["fday", "fb", "dr"])
        op = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
        lit = rng.choice(range(-1, 8))
        qual = (
            f"{_J_COLS[col]}." if rng.random() < 0.6 else ""
        )  # qualified or (uniquely named) bare
        return (f"{qual}{col} {op} {lit}",
                lambda fr, dr_, c=col, o=op, v=lit: _cmp(
                    (fr if _J_COLS[c] == "f" else dr_)[c], o, v))
    if kind == 3:
        col = rng.choice(["fday", "dr"])
        lo, hi = rng.choice(range(0, 7)), rng.choice(range(0, 7))
        return (f"{_J_COLS[col]}.{col} BETWEEN {lo} AND {hi}",
                lambda fr, dr_, c=col, a=lo, z=hi: a <= (
                    fr if _J_COLS[c] == "f" else dr_)[c] <= z)
    if kind == 4:
        col = rng.choice(["fday", "dr"])
        vals = rng.sample(range(0, 7), rng.randrange(1, 4))
        return (f"{col} IN ({', '.join(map(str, vals))})",
                lambda fr, dr_, c=col, vs=tuple(vals): (
                    fr if _J_COLS[c] == "f" else dr_)[c] in vs)
    name = rng.choice(["m0", "m2", "zz"])
    return (f"d.dn = '{name}'", lambda fr, dr_, v=name: dr_["dn"] == v)


def _j_tree(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.4:
        sql, fn = _j_leaf(rng)
        return sql, fn, 3
    kind = rng.randrange(5)
    if kind == 0:
        s, f, _ = _j_tree(rng, depth - 1)
        return f"NOT ( {s} )", (lambda a, b, f=f: not f(a, b)), 3
    if kind == 1:
        s, f, _ = _j_tree(rng, depth - 1)
        return f"( {s} )", f, 3
    op_and = kind in (2, 3)
    ls, lf, lp = _j_tree(rng, depth - 1)
    rs, rf, rp = _j_tree(rng, depth - 1)
    if op_and:
        if lp < 2:
            ls = f"( {ls} )"
        if rp < 2:
            rs = f"( {rs} )"
        return (f"{ls} AND {rs}",
                (lambda a, b, x=lf, y=rf: x(a, b) and y(a, b)), 2)
    return (f"{ls} OR {rs}",
            (lambda a, b, x=lf, y=rf: x(a, b) or y(a, b)), 1)


@pytest.fixture(scope="module")
def join_tables(tmp_path_factory, spark):
    cat = PostgresCatalog.connect(
        "ssqljfuzz", None, str(tmp_path_factory.mktemp("whj"))
    )
    cat.initialize()
    fdf = spark.createDataFrame(F_ROWS, "k long, fday long, fb long")
    t = cat.create_table(
        TableIdentifier.parse("fz.f"), fdf.schema, partition_by=["fday"]
    )
    t.new_transaction().append_dataframe(fdf.repartition("fday")).commit()
    ddf = spark.createDataFrame(D_ROWS, "k long, dr long, dn string")
    t = cat.create_table(
        TableIdentifier.parse("fz.d"), ddf.schema, partition_by=["dr"]
    )
    t.new_transaction().append_dataframe(ddf.repartition("dr")).commit()
    yield cat
    cat.backend.close()


def test_fuzz_join_where_pruning_matches_unpruned_evaluation(
    join_tables, spark
):
    """Multi-ref attribution property (r14): random WHERE trees over a
    two-catalog-table inner join — per-ref qualified-conjunct pruning
    must never change the result set."""
    rng = random.Random(SEED + 7)
    fkeys = [dict(zip(("k", "fday", "fb"), r)) for r in F_ROWS]
    dkeys = {r[0]: dict(zip(("k", "dr", "dn"), r)) for r in D_ROWS}
    joined = [(fr, dkeys[fr["k"]]) for fr in fkeys if fr["k"] in dkeys]
    failures = []
    for case in range(fuzz_cases(80, 24)):
        sql_pred, fn, _ = _j_tree(rng, rng.randrange(1, 4))
        expect = sorted(fr["k"] for fr, dr_ in joined if fn(fr, dr_))
        stmt = (
            "SELECT f.k FROM fz.f f JOIN fz.d d ON f.k = d.k "
            f"WHERE {sql_pred}"
        )
        try:
            got = sorted(
                r.k for r in select_sql(spark, join_tables, stmt).collect()
            )
        except Exception as exc:
            failures.append((case, sql_pred, f"raised {exc!r}"))
            continue
        if got != expect:
            failures.append(
                (case, sql_pred, f"{len(got)} != {len(expect)} rows")
            )
        if len(failures) >= 5:
            break
    assert not failures, failures


def test_fuzz_delete_mor_pruned_writes_match_evaluation(tmp_path, spark):
    """WRITE-path pruning property (r14): random WHERE trees executed as
    ``DELETE FROM`` (MOR, planner-pruned scan via prune_subset_for_where)
    must leave exactly the rows a direct evaluation keeps — a wrong
    subset here is silent data corruption, the worst failure class in
    the repo. Each case deletes then rolls the table back to the seed
    snapshot (metadata-only, O(1) per case)."""
    from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml

    cat = PostgresCatalog.connect("ssqldfuzz", None, str(tmp_path / "wh"))
    cat.initialize()
    try:
        df = spark.createDataFrame(ROWS, "k long, day long, b long, name string")
        t = cat.create_table(
            TableIdentifier.parse("fz.w"), df.schema,
            partition_by=["day", "truncate(4, b)"],
        )
        t = t.new_transaction().append_dataframe(df.repartition("day")).commit()
        seed_snap = t.metadata.current_snapshot_id
        rng = random.Random(SEED + 99)
        keys = [dict(zip(("k", "day", "b", "name"), r)) for r in ROWS]
        failures = []
        for case in range(fuzz_cases(25, 10)):
            sql_pred, fn, _p = _tree(rng, rng.randrange(1, 4))
            strategy = rng.choice(["mor", "cow"])
            expect = sorted(r["k"] for r in keys if not fn(r))
            try:
                execute_dml(
                    spark, cat, f"DELETE FROM fz.w WHERE {sql_pred}",
                    strategy=strategy,
                )
                t = cat.load_table(TableIdentifier.parse("fz.w"))
                got = sorted(r.k for r in t.to_df(spark).collect())
            except Exception as exc:
                failures.append((case, strategy, sql_pred, f"raised {exc!r}"))
                t = cat.load_table(TableIdentifier.parse("fz.w"))
                t = t.rollback_to(seed_snap)
                continue
            if got != expect:
                failures.append(
                    (case, strategy, sql_pred,
                     f"{len(got)} survivors != {len(expect)} expected")
                )
            t = t.rollback_to(seed_snap)
            if len(failures) >= 4:
                break
        assert not failures, failures
    finally:
        cat.backend.close()


def test_fuzz_update_mor_pruned_writes_match_evaluation(tmp_path, spark):
    """UPDATE twin of the DELETE property: random WHERE trees executed as
    ``UPDATE ... SET name = 'HIT'`` (MOR row delta over the planner-pruned
    matching scan) must mark exactly the rows a direct evaluation marks —
    and must never lose an unmatched row."""
    from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml

    cat = PostgresCatalog.connect("ssqlufuzz", None, str(tmp_path / "wh"))
    cat.initialize()
    try:
        df = spark.createDataFrame(ROWS, "k long, day long, b long, name string")
        t = cat.create_table(
            TableIdentifier.parse("fz.u"), df.schema,
            partition_by=["day", "truncate(4, b)"],
        )
        t = t.new_transaction().append_dataframe(df.repartition("day")).commit()
        seed_snap = t.metadata.current_snapshot_id
        rng = random.Random(SEED + 303)
        keys = [dict(zip(("k", "day", "b", "name"), r)) for r in ROWS]
        failures = []
        for case in range(fuzz_cases(20, 8)):
            sql_pred, fn, _p = _tree(rng, rng.randrange(1, 4))
            expect = sorted(r["k"] for r in keys if fn(r))
            try:
                execute_dml(
                    spark, cat,
                    f"UPDATE fz.u SET name = 'HIT' WHERE {sql_pred}",
                )
                t = cat.load_table(TableIdentifier.parse("fz.u"))
                rows = t.to_df(spark).collect()
                got = sorted(r.k for r in rows if r.name == "HIT")
                n_rows = len(rows)
            except Exception as exc:
                failures.append((case, sql_pred, f"raised {exc!r}"))
                t = cat.load_table(TableIdentifier.parse("fz.u"))
                t = t.rollback_to(seed_snap)
                continue
            if got != expect or n_rows != len(ROWS):
                failures.append(
                    (case, sql_pred,
                     f"{len(got)} hit != {len(expect)} expected "
                     f"(rows {n_rows}/{len(ROWS)})")
                )
            t = t.rollback_to(seed_snap)
            if len(failures) >= 4:
                break
        assert not failures, failures
    finally:
        cat.backend.close()


def test_fuzz_plan_info_never_raises_and_never_over_prunes(fuzz_table, spark):
    """Companion property: select_plan_info mirrors execution — for every
    generated predicate the planned file count is consistent (0 <= planned
    <= total) and planning never raises."""
    rng = random.Random(SEED + 1)
    for _case in range(60):
        sql_pred, _fn, _p = _tree(rng, rng.randrange(1, 5))
        info = select_plan_info(
            spark, fuzz_table, f"SELECT k FROM fz.t WHERE {sql_pred}"
        )
        assert 0 <= info["n_files_planned"] <= info["n_files_total"]


def test_one_sided_bounds_actually_prune(fuzz_table, spark):
    """r15 (VERDICT r14 #1): the fuzz grammar has always generated lone
    >=/< comparisons; assert the planner now PRUNES them rather than
    planning all files — on both the identity entry and the truncate
    entry — and that a one-sided case through the full SQL path still
    returns exactly the matching rows."""
    total = None
    for sql_pred in (
        "day >= 5",      # identity partition: 2 of 7 day values
        "day < 2",
        "b >= 8",        # truncate(4, b): buckets {8, 12} of 4
        "name >= 'n3'",  # r15: non-partition col prunes via string bounds
    ):
        info = select_plan_info(
            spark, fuzz_table, f"SELECT k FROM fz.t WHERE {sql_pred}"
        )
        total = info["n_files_total"]
        assert 0 < info["n_files_planned"] < total, (sql_pred, info)
    keys = [dict(zip(("k", "day", "b", "name"), r)) for r in ROWS]
    got = sorted(
        r.k for r in select_sql(
            spark, fuzz_table, "SELECT k FROM fz.t WHERE day >= 5"
        ).collect()
    )
    assert got == sorted(r["k"] for r in keys if r["day"] >= 5)


# --- star-join DPP fuzz (r15): join key IS the fact partition column ------

F2_ROWS = [(k, k % 9, k % 4) for k in range(108)]  # k, jk (part), fb
D2_ROWS = [(k, k % 3, f"m{k % 3}") for k in range(9)]  # k (join), dr (part), dn


def _s_leaf(rng: random.Random):
    kind = rng.randrange(6)
    if kind < 3:
        col, side = rng.choice(
            [("jk", "f"), ("fb", "f"), ("dr", "d")]
        )
        op = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
        lit = rng.choice(range(-1, 10))
        return (f"{side}.{col} {op} {lit}",
                lambda fr, dr_, s=side, c=col, o=op, v=lit: _cmp(
                    (fr if s == "f" else dr_)[c], o, v))
    if kind == 3:
        name = rng.choice(["m0", "m2", "zz"])
        return (f"d.dn = '{name}'",
                lambda fr, dr_, v=name: dr_["dn"] == v)
    if kind == 4:
        vals = rng.sample(range(0, 9), rng.randrange(1, 4))
        return (f"f.jk IN ({', '.join(map(str, vals))})",
                lambda fr, dr_, vs=tuple(vals): fr["jk"] in vs)
    lo, hi = rng.choice(range(0, 6)), rng.choice(range(0, 6))
    return (f"d.dr BETWEEN {lo} AND {hi}",
            lambda fr, dr_, a=lo, z=hi: a <= dr_["dr"] <= z)


def _s_tree(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.4:
        sql, fn = _s_leaf(rng)
        return sql, fn, 3
    kind = rng.randrange(5)
    if kind == 0:
        s, f, _ = _s_tree(rng, depth - 1)
        return f"NOT ( {s} )", (lambda a, b, f=f: not f(a, b)), 3
    if kind == 1:
        s, f, _ = _s_tree(rng, depth - 1)
        return f"( {s} )", f, 3
    op_and = kind in (2, 3)
    ls, lf, lp = _s_tree(rng, depth - 1)
    rs, rf, rp = _s_tree(rng, depth - 1)
    if op_and:
        if lp < 2:
            ls = f"( {ls} )"
        if rp < 2:
            rs = f"( {rs} )"
        return (f"{ls} AND {rs}",
                (lambda a, b, x=lf, y=rf: x(a, b) and y(a, b)), 2)
    return (f"{ls} OR {rs}",
            (lambda a, b, x=lf, y=rf: x(a, b) or y(a, b)), 1)


@pytest.fixture(scope="module")
def star_tables(tmp_path_factory, spark):
    cat = PostgresCatalog.connect(
        "ssqlsfuzz", None, str(tmp_path_factory.mktemp("whs"))
    )
    cat.initialize()
    fdf = spark.createDataFrame(F2_ROWS, "k long, jk long, fb long")
    t = cat.create_table(
        TableIdentifier.parse("fz.f2"), fdf.schema, partition_by=["jk"]
    )
    t.new_transaction().append_dataframe(fdf.repartition("jk")).commit()
    ddf = spark.createDataFrame(D2_ROWS, "k long, dr long, dn string")
    t = cat.create_table(
        TableIdentifier.parse("fz.d2"), ddf.schema, partition_by=["dr"]
    )
    t.new_transaction().append_dataframe(ddf.repartition("dr")).commit()
    yield cat
    cat.backend.close()


def test_fuzz_star_join_dpp_matches_unpruned_evaluation(star_tables, spark):
    """r15 adversarial DPP property: random WHERE trees over an inner
    join whose key IS the fact's identity partition column — the
    join-driven prune (dim keys -> fact point-set walk) fires on the
    conjunctive cases and must NEVER change the result set; disjunctive /
    unfiltered cases leave it off and must also stay exact."""
    rng = random.Random(SEED + 15)
    fkeys = [dict(zip(("k", "jk", "fb"), r)) for r in F2_ROWS]
    dkeys = {r[0]: dict(zip(("k", "dr", "dn"), r)) for r in D2_ROWS}
    joined = [(fr, dkeys[fr["jk"]]) for fr in fkeys if fr["jk"] in dkeys]
    failures = []
    for case in range(fuzz_cases(60, 20)):
        sql_pred, fn, _ = _s_tree(rng, rng.randrange(1, 4))
        expect = sorted(fr["k"] for fr, dr_ in joined if fn(fr, dr_))
        stmt = (
            "SELECT f.k FROM fz.f2 f JOIN fz.d2 d ON f.jk = d.k "
            f"WHERE {sql_pred}"
        )
        try:
            got = sorted(
                r.k for r in select_sql(spark, star_tables, stmt).collect()
            )
        except Exception as exc:
            failures.append((case, sql_pred, f"raised {exc!r}"))
            continue
        if got != expect:
            failures.append(
                (case, sql_pred, f"{len(got)} != {len(expect)} rows")
            )
        if len(failures) >= 5:
            break
    assert not failures, failures


# --- zone-map fuzz (r15): UNPARTITIONED table, stats-bounds pruning only ---


@pytest.fixture(scope="module")
def zone_table(tmp_path_factory, spark):
    """Four appends with disjoint k-ranges -> four files whose only
    pruning device is the per-file [min, max] bounds."""
    cat = PostgresCatalog.connect(
        "ssqlzfuzz", None, str(tmp_path_factory.mktemp("whz"))
    )
    cat.initialize()
    # `maybe` is NULL for every third key, all-NULL in no file and
    # no-NULL in no file — nullness pruning must stay superset-safe on
    # PARTIALLY-null files (it can never prune them). `x` is a double
    # holding NaN for some keys in EVERY file (r16 ADVICE): parquet
    # footer [min, max] excludes NaN while Spark orders NaN above every
    # value, so any planner that trusts float bounds silently drops the
    # NaN rows — float columns must never zone-map-prune.
    df = spark.createDataFrame(
        [
            (
                *r,
                None if r[0] % 3 == 0 else r[0],
                float("nan") if r[0] % 9 == 7 else float(r[0]),
            )
            for r in ROWS
        ],
        "k long, day long, b long, name string, maybe long, x double",
    )
    t = cat.create_table(TableIdentifier.parse("fz.z"), df.schema)
    for lo, hi in ((0, 29), (30, 59), (60, 89), (90, 119)):
        t = (
            t.new_transaction()
            .append_dataframe(
                df.filter((df.k >= lo) & (df.k <= hi)).coalesce(1)
            )
            .commit()
        )
    yield cat
    cat.backend.close()


def test_fuzz_zone_map_pruning_matches_unpruned_evaluation(zone_table, spark):
    """r15 adversarial zone-map property: the SAME random predicate trees
    as the partitioned fuzz, over an UNPARTITIONED table where every
    pruning decision comes from stats bounds — results must match direct
    evaluation exactly, and at least one case must actually prune."""
    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        select_plan_info,
        select_sql,
    )

    rng = random.Random(SEED + 31)
    keys = [
        dict(zip(("k", "day", "b", "name", "maybe"),
                 (*r, None if r[0] % 3 == 0 else r[0])))
        for r in ROWS
    ]
    failures = []
    pruned_once = False
    for case in range(fuzz_cases(120, 40)):
        sql_pred, fn, _p = _tree(rng, rng.randrange(1, 5))
        # r15: a third of the cases compose with IS [NOT] NULL on the
        # partially-null column — nullness pruning rides the same DNF
        mode = rng.randrange(6)
        if mode == 0:
            sql_pred = f"( {sql_pred} ) AND maybe IS NULL"
            fn = (lambda r, f=fn: f(r) and r["maybe"] is None)
        elif mode == 1:
            sql_pred = f"( {sql_pred} ) OR maybe IS NOT NULL"
            fn = (lambda r, f=fn: f(r) or r["maybe"] is not None)
        expect = sorted(r["k"] for r in keys if fn(r))
        stmt = f"SELECT k FROM fz.z WHERE {sql_pred}"
        try:
            got = sorted(
                r.k for r in select_sql(spark, zone_table, stmt).collect()
            )
            info = select_plan_info(spark, zone_table, stmt)
            if info["n_files_planned"] < info["n_files_total"]:
                pruned_once = True
        except Exception as exc:
            failures.append((case, sql_pred, f"raised {exc!r}"))
            continue
        if got != expect:
            failures.append(
                (case, sql_pred, f"{len(got)} rows != {len(expect)} expected")
            )
        if len(failures) >= 5:
            break
    assert not failures, failures
    assert pruned_once, "no fuzz case exercised zone-map pruning"


def _nan_cmp(x: float, op: str, v: float) -> bool:
    """Spark's float ordering: NaN is GREATER than every value and equal
    to itself (literals here are never NaN)."""
    import math

    if math.isnan(x):
        return op in (">", ">=", "<>")
    return _cmp(x, op, v)


def test_zone_map_never_prunes_float_nan(zone_table, spark):
    """Targeted r16-ADVICE repro: every file's footer max for `x` is
    ≤ 119.0, yet the NaN rows in each file satisfy ``x > 1000``. A
    planner trusting raw float bounds prunes all four files and returns
    0 rows; since r16 float bounds prune ONLY files whose manifest
    ``nan_value_counts`` proves them NaN-free — every file here holds
    NaNs, so nothing prunes and the NaN rows survive."""
    nan_keys = sorted(k for k in range(120) if k % 9 == 7)
    got = sorted(
        r.k
        for r in select_sql(
            spark, zone_table, "SELECT k FROM fz.z WHERE x > 1000"
        ).collect()
    )
    assert got == nan_keys
    info = select_plan_info(
        spark, zone_table, "SELECT k FROM fz.z WHERE x > 1000"
    )
    # float bounds are untrusted: the predicate prunes NOTHING
    assert info["n_files_planned"] == info["n_files_total"]
    # equality on a float column must not route through bounds either
    got_eq = sorted(
        r.k
        for r in select_sql(
            spark, zone_table, "SELECT k FROM fz.z WHERE x = 8.0"
        ).collect()
    )
    assert got_eq == [8]


def test_fuzz_zone_map_float_predicates_never_drop_rows(zone_table, spark):
    """Float-column fuzz (r16 ADVICE: the r15 suite had no float column):
    random comparisons/BETWEENs over `x` — with NaNs present in every
    file — composed with the integer tree, checked against a Python
    oracle using Spark's NaN ordering."""
    rng = random.Random(SEED + 47)
    keys = [
        {
            "k": k, "day": k % 7, "b": k % 13, "name": f"n{k % 5}",
            "maybe": None if k % 3 == 0 else k,
            "x": float("nan") if k % 9 == 7 else float(k),
        }
        for k in range(120)
    ]
    failures = []
    for case in range(fuzz_cases(60, 20)):
        op = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
        lit = rng.choice([-1.5, 0.0, 7.0, 59.5, 118.0, 1000.0])
        f_sql = f"x {op} {lit}"
        f_fn = lambda r, o=op, v=lit: _nan_cmp(r["x"], o, v)
        if rng.random() < 0.5:  # compose with a random integer tree
            s, fn, p = _tree(rng, rng.randrange(1, 3))
            if rng.random() < 0.5:
                sql_pred = f"{f_sql} AND ( {s} )"
                pred = lambda r, a=f_fn, b=fn: a(r) and b(r)
            else:
                sql_pred = f"{f_sql} OR ( {s} )"
                pred = lambda r, a=f_fn, b=fn: a(r) or b(r)
        else:
            sql_pred, pred = f_sql, f_fn
        expect = sorted(r["k"] for r in keys if pred(r))
        stmt = f"SELECT k FROM fz.z WHERE {sql_pred}"
        try:
            got = sorted(
                r.k for r in select_sql(spark, zone_table, stmt).collect()
            )
        except Exception as exc:
            failures.append((case, sql_pred, f"raised {exc!r}"))
            continue
        if got != expect:
            failures.append(
                (case, sql_pred, f"{len(got)} rows != {len(expect)} expected")
            )
        if len(failures) >= 5:
            break
    assert not failures, failures


def test_zone_map_prunes_nan_free_float_files(tmp_path_factory, spark):
    """The other half of the r16 NaN rule: a float column whose files
    carry ``nan_value_counts == 0`` DOES zone-map-prune — the common
    NaN-free case (prices, measurements) keeps its bounds pruning. A
    file holding NaNs mixed in stays planned even when its non-NaN
    bounds are disjoint from the predicate."""
    cat = PostgresCatalog.connect(
        "ssqlznan", None, str(tmp_path_factory.mktemp("whn"))
    )
    cat.initialize()
    df_schema = "k long, x double"
    t = cat.create_table(TableIdentifier.parse("fz.nf"), spark.createDataFrame([], df_schema).schema)
    # three NaN-free files with disjoint x ranges + one NaN-bearing file
    batches = [
        [(k, float(k)) for k in range(0, 10)],        # x in [0, 9]
        [(k, float(k)) for k in range(10, 20)],       # x in [10, 19]
        [(k, float(k)) for k in range(20, 30)],       # x in [20, 29]
        [(30, 3.0), (31, float("nan"))],              # max 3.0 BUT has NaN
    ]
    for rows in batches:
        t = (
            t.new_transaction()
            .append_dataframe(spark.createDataFrame(rows, df_schema).coalesce(1))
            .commit()
        )
    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        select_plan_info,
        select_sql,
    )

    stmt = "SELECT k FROM fz.nf WHERE x >= 15"
    got = sorted(r.k for r in select_sql(spark, cat, stmt).collect())
    # NaN > 15 in Spark's ordering: k=31 matches from the NaN file
    assert got == list(range(15, 30)) + [31]
    info = select_plan_info(spark, cat, stmt)
    # files [0,9] pruned via proven-NaN-free bounds; the NaN file is
    # KEPT despite max 3.0 < 15; files [10,19] and [20,29] intersect
    assert info["n_files_total"] == 4 and info["n_files_planned"] == 3
    # equality prunes to one NaN-free file plus the NaN file
    info_eq = select_plan_info(
        spark, cat, "SELECT k FROM fz.nf WHERE x = 25.0"
    )
    assert info_eq["n_files_planned"] == 2
    got_eq = [r.k for r in select_sql(
        spark, cat, "SELECT k FROM fz.nf WHERE x = 25.0"
    ).collect()]
    assert got_eq == [25]
    cat.backend.close()


def test_fuzz_delete_float_nan_zone_map_never_loses_rows(tmp_path, spark):
    """Write-path twin of the float NaN rule (r16 ADVICE: the SELECT
    subset feeds DELETE via prune_subset_for_where): random float
    predicates executed as DELETE on an UNPARTITIONED table whose every
    file holds NaNs — a planner trusting float bounds would skip the
    NaN rows' files and leave matching rows undeleted. Survivors must
    equal direct evaluation under Spark's NaN ordering."""
    from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml

    cat = PostgresCatalog.connect("ssqlnfuzz", None, str(tmp_path / "wh"))
    cat.initialize()
    try:
        rows_x = [
            (k, float("nan") if k % 9 == 7 else float(k)) for k in range(120)
        ]
        df = spark.createDataFrame(rows_x, "k long, x double")
        t = cat.create_table(TableIdentifier.parse("fz.dx"), df.schema)
        for lo, hi in ((0, 29), (30, 59), (60, 89), (90, 119)):
            t = (
                t.new_transaction()
                .append_dataframe(
                    df.filter((df.k >= lo) & (df.k <= hi)).coalesce(1)
                )
                .commit()
            )
        seed_snap = t.metadata.current_snapshot_id
        rng = random.Random(SEED + 61)
        failures = []
        for case in range(fuzz_cases(15, 6)):
            op = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
            lit = rng.choice([-1.5, 7.0, 59.5, 118.0, 1000.0])
            strategy = rng.choice(["mor", "cow"])
            expect = sorted(
                k for k, x in rows_x if not _nan_cmp(x, op, lit)
            )
            try:
                execute_dml(
                    spark, cat, f"DELETE FROM fz.dx WHERE x {op} {lit}",
                    strategy=strategy,
                )
                t = cat.load_table(TableIdentifier.parse("fz.dx"))
                got = sorted(r.k for r in t.to_df(spark).collect())
            except Exception as exc:
                failures.append((case, strategy, op, lit, f"raised {exc!r}"))
                t = cat.load_table(TableIdentifier.parse("fz.dx"))
                t = t.rollback_to(seed_snap)
                continue
            if got != expect:
                failures.append(
                    (case, strategy, f"x {op} {lit}",
                     f"{len(got)} survivors != {len(expect)} expected")
                )
            t = t.rollback_to(seed_snap)
            if len(failures) >= 4:
                break
        assert not failures, failures
        # the bug shape, explicitly: every NaN row must die
        execute_dml(spark, cat, "DELETE FROM fz.dx WHERE x > 1000")
        t = cat.load_table(TableIdentifier.parse("fz.dx"))
        got = sorted(r.k for r in t.to_df(spark).collect())
        assert got == [k for k in range(120) if k % 9 != 7]
    finally:
        cat.backend.close()


def test_fuzz_update_float_nan_zone_map_marks_exactly(tmp_path, spark):
    """UPDATE twin of the NaN DELETE property: float predicates executed
    as ``UPDATE ... SET name = 'HIT'`` must mark exactly the rows
    Spark's NaN ordering selects — a bounds-trusting planner would skip
    the NaN files and leave their matching rows unmarked."""
    from iceberg_catalog_postgres_spark.catalog.merge_sql import execute_dml

    cat = PostgresCatalog.connect("ssqlnufuzz", None, str(tmp_path / "wh"))
    cat.initialize()
    try:
        rows_x = [
            (k, f"n{k}", float("nan") if k % 9 == 7 else float(k))
            for k in range(120)
        ]
        df = spark.createDataFrame(rows_x, "k long, name string, x double")
        t = cat.create_table(TableIdentifier.parse("fz.ux"), df.schema)
        for lo, hi in ((0, 59), (60, 119)):
            t = (
                t.new_transaction()
                .append_dataframe(
                    df.filter((df.k >= lo) & (df.k <= hi)).coalesce(1)
                )
                .commit()
            )
        seed_snap = t.metadata.current_snapshot_id
        rng = random.Random(SEED + 71)
        failures = []
        for case in range(fuzz_cases(10, 5)):
            op = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
            lit = rng.choice([-1.5, 7.0, 59.5, 118.0, 1000.0])
            expect = sorted(
                k for k, _n, x in rows_x if _nan_cmp(x, op, lit)
            )
            try:
                execute_dml(
                    spark, cat,
                    f"UPDATE fz.ux SET name = 'HIT' WHERE x {op} {lit}",
                )
                t = cat.load_table(TableIdentifier.parse("fz.ux"))
                got = sorted(
                    r.k for r in t.to_df(spark).filter("name = 'HIT'").collect()
                )
                n_rows = t.to_df(spark).count()
            except Exception as exc:
                failures.append((case, op, lit, f"raised {exc!r}"))
                t = cat.load_table(TableIdentifier.parse("fz.ux"))
                t = t.rollback_to(seed_snap)
                continue
            if got != expect or n_rows != 120:
                failures.append(
                    (case, f"x {op} {lit}",
                     f"{len(got)} marked != {len(expect)}; n={n_rows}")
                )
            t = t.rollback_to(seed_snap)
            if len(failures) >= 4:
                break
        assert not failures, failures
    finally:
        cat.backend.close()


def test_zone_map_prunes_decimal_bounds(tmp_path_factory, spark):
    """r16: decimal(P, S) columns carry manifest bounds (raw unscaled
    parquet stats decoded Iceberg-style — pyarrow's typed accessor
    refuses them) and zone-map-prune like any other comparable type;
    no NaN exists for decimals, so no NaN-freeness proof is needed."""
    cat = PostgresCatalog.connect(
        "ssqldec", None, str(tmp_path_factory.mktemp("whd"))
    )
    cat.initialize()
    df_schema = "k long, price decimal(12,2)"
    t = cat.create_table(
        TableIdentifier.parse("fz.dc"),
        spark.createDataFrame([], df_schema).schema,
    )
    import decimal as D

    batches = [
        [(k, D.Decimal(k) + D.Decimal("0.25")) for k in rng]
        for rng in (range(0, 10), range(100, 110), range(200, 210))
    ]
    for rows in batches:
        t = (
            t.new_transaction()
            .append_dataframe(spark.createDataFrame(rows, df_schema).coalesce(1))
            .commit()
        )
    # manifest bounds recorded as Decimal (no footer reads at plan time)
    import iceberg_catalog_postgres_spark.catalog.table as tm

    before = tm.PLANNING_FOOTER_READS
    planned = t.planned_files(
        "price", D.Decimal("100.00"), D.Decimal("150.00"),
        require_stats=True,
    )
    assert len(planned) == 1
    assert tm.PLANNING_FOOTER_READS == before
    from iceberg_catalog_postgres_spark.catalog.select_sql import (
        select_plan_info,
        select_sql,
    )

    stmt = "SELECT k FROM fz.dc WHERE price BETWEEN 100 AND 150"
    info = select_plan_info(spark, cat, stmt)
    assert (info["n_files_planned"], info["n_files_total"]) == (1, 3)
    got = sorted(r.k for r in select_sql(spark, cat, stmt).collect())
    assert got == list(range(100, 110))
    # half-open + equality routes too
    info2 = select_plan_info(
        spark, cat, "SELECT k FROM fz.dc WHERE price >= 200"
    )
    assert info2["n_files_planned"] == 1
    got_eq = [r.k for r in select_sql(
        spark, cat, "SELECT k FROM fz.dc WHERE price = 205.25"
    ).collect()]
    assert got_eq == [205]
    cat.backend.close()
