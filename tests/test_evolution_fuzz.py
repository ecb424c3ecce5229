"""Property-based fuzz of the schema/spec-evolution state machine (r8).

r7 and r8 both found silent wrong-answer bugs in the same vein — state
keyed by COLUMN or ENTRY NAME crossed with rename / re-add / spec
evolution (recycled physical names, recycled tuple labels). This test
drives RANDOM operation sequences (append / rename / add / drop / spec
evolution) against a pandas-free pure-Python row model and asserts after
every sequence that:

  1. a full table read equals the model exactly (per-cohort column
     resolution never misattributes bytes),
  2. a partition-filtered read over each evolvable column equals the
     model's filter (pruning is superset-safe AND the row filter lands),
  3. planned-file pruning never EXCLUDES a file containing a matching row
     (checked implicitly by 2 — lost rows are the failure mode that
     matters).

Sequences are small (Spark latency per append) but hypothesis shrinks any
failure to a minimal op list, which is exactly the repro format the
rename/recycle bugs were fixed from.
"""

from __future__ import annotations

import pytest

from tests.conftest import fuzz_cases
from hypothesis import HealthCheck, Phase, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY

# operation alphabet: weights favor the interactions that found real bugs
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 9)),      # batch seed
        st.tuples(st.just("rename"), st.integers(0, 3)),      # which column
        st.tuples(st.just("add"), st.integers(0, 2)),         # name pool idx
        st.tuples(st.just("drop"), st.integers(0, 3)),
        st.tuples(st.just("spec"), st.integers(0, 3)),        # new spec source
        st.tuples(st.just("delete"), st.integers(0, 4)),      # eq-delete value
        st.tuples(st.just("posdel"), st.integers(0, 3)),      # pos-delete k%4
        st.tuples(st.just("dvdel"), st.integers(0, 4)),       # DV delete k%5
        st.tuples(st.just("mormerge"), st.integers(0, 2)),    # MOR merge k%3
    ),
    min_size=3,
    max_size=8,
)

NAME_POOL = ["c0", "c1", "c2"]  # names that get recycled across adds/renames


def _apply_mormerge(spark, t, model, arg):
    """r11 op: MOR multi-clause merge (atomic rowdelta) under evolution —
    update the FIRST non-key column to 777 for rows with k % 3 == arg % 3
    via merge_into(strategy="mor", preserve_lineage=True): originals go to
    deletion vectors, new versions append as materialized-lineage files
    written with the CURRENT (possibly renamed/evolved) schema. Returns
    (table, changed)."""
    from iceberg_catalog_postgres_spark.catalog.maintenance import merge_into

    non_key = [(cid, n) for cid, n in model.cols if cid != 1]
    hits = [r for r in model.rows if r.get(1) % 3 == arg % 3]
    if not non_key or not hits:
        return t, False
    cid, name = non_key[0]
    src_rows = [
        tuple(777 if i == cid else r.get(i) for i, _n in model.cols)
        for r in hits
    ]
    for r in hits:
        r[cid] = 777
    msrc = spark.createDataFrame(src_rows, t.metadata.spark_schema)
    t = merge_into(
        spark, t, msrc, on=["k"],
        when_matched=[{"action": "update", "set": {name: f"s.{name}"}}],
        preserve_lineage=True,
        strategy="mor",
    )
    return t, True


class Model:
    """Pure-Python mirror: ordered columns with stable ids, rows as dicts
    keyed by column ID (ids never lie; names are the hazard)."""

    def __init__(self):
        self.cols: list[tuple[int, str]] = [(1, "k"), (2, "c0")]
        self.next_id = 3
        self.rows: list[dict] = []  # {col_id: value}
        self.next_k = 0

    def names(self):
        return [n for _i, n in self.cols]

    def append(self, seed: int) -> list[tuple]:
        batch = []
        for j in range(3):
            r = {}
            for cid, _n in self.cols:
                if cid == 1:
                    r[cid] = self.next_k
                else:
                    r[cid] = (seed * 7 + j * 3 + cid) % 5
            self.next_k += 1
            self.rows.append(r)
            batch.append(tuple(r.get(cid) for cid, _n in self.cols))
        return batch

    def rename(self, idx: int) -> bool:
        non_key = [i for i, (cid, _n) in enumerate(self.cols) if cid != 1]
        if not non_key:
            return False
        pos = non_key[idx % len(non_key)]
        cid, old = self.cols[pos]
        unused = [n for n in NAME_POOL if n not in self.names()]
        if not unused:
            return False
        self.cols[pos] = (cid, unused[cid % len(unused)])
        return True

    def add(self, idx: int) -> bool:
        unused = [n for n in NAME_POOL if n not in self.names()]
        if not unused:
            return False
        name = unused[idx % len(unused)]
        self.cols.append((self.next_id, name))
        self.next_id += 1
        return True

    def delete_eq(self, col_pos: int, v: int) -> tuple[str, int] | None:
        """Delete rows where (a current non-key column) == v. Returns the
        (column name, id) the eq-delete is keyed on, or None if no-op."""
        non_key = [(cid, n) for cid, n in self.cols if cid != 1]
        if not non_key:
            return None
        cid, name = non_key[col_pos % len(non_key)]
        before = len(self.rows)
        self.rows = [r for r in self.rows if r.get(cid) != v]
        return (name, cid) if len(self.rows) != before else None

    def drop(self, idx: int, spec_source: str | None) -> bool:
        droppable = [
            i
            for i, (cid, n) in enumerate(self.cols)
            if cid != 1 and n != spec_source
        ]
        if not droppable:
            return False
        pos = droppable[idx % len(droppable)]
        del self.cols[pos]
        return True


def _schema(model: Model) -> StructType:
    return StructType(
        [
            StructField(n, LongType(), True, {FIELD_ID_KEY: cid})
            for cid, n in model.cols
        ]
    )


@pytest.fixture(scope="module")
def fuzz_catalog(tmp_path_factory):
    p = tmp_path_factory.mktemp("fuzz")
    cat = PostgresCatalog.connect("fuzz_cat", None, str(p / "wh"))
    cat.initialize()
    yield cat
    cat.backend.close()


_COUNTER = [0]


@settings(
    # derandomized: default tier replays a prefix of the same example stream
    max_examples=fuzz_cases(12, 5),
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
    phases=[Phase.generate, Phase.shrink],
)
@given(ops=OPS)
def test_evolution_sequences_read_exactly(fuzz_catalog, spark, ops):
    _COUNTER[0] += 1
    model = Model()
    ident = TableIdentifier.parse(f"fz.t{_COUNTER[0]}")
    t = fuzz_catalog.create_table(ident, _schema(model), partition_by=["c0"])
    spec_source = "c0"
    # (snapshot_id, frozen row list) after every DATA commit — the model's
    # history for time-travel verification (reads resolve through the
    # CURRENT schema regardless of which snapshot is read, like Iceberg)
    history = []

    for op, arg in ops:
        if op == "append":
            batch = model.append(arg)
            t = t.new_transaction().append_dataframe(
                spark.createDataFrame(batch, t.metadata.spark_schema).coalesce(1)
            ).commit()
            history.append(
                (t.metadata.current_snapshot_id, [dict(r) for r in model.rows])
            )
        elif op == "rename":
            if model.rename(arg):
                t = t.commit_schema(_schema(model))
                ren = {n for _i, n in model.cols}
                if spec_source not in ren:  # follow-through renamed the spec
                    spec_source = t.metadata.partition_spec[0]
        elif op == "add":
            if model.add(arg):
                t = t.commit_schema(_schema(model))
        elif op == "drop":
            saved = list(model.cols)
            if model.drop(arg, spec_source):
                try:
                    t = t.commit_schema(_schema(model))
                except ValueError:
                    # drop guard: pending eq-delete files keyed on the column
                    # (or other protected state) — the model reverts too
                    model.cols = saved
        elif op == "delete":
            non_key = [(cid, n) for cid, n in model.cols if cid != 1]
            if non_key:
                cid, name = non_key[arg % len(non_key)]
                # mirror BEFORE mutating the model: eq-delete applies only
                # to rows visible now (seq-scoped), which equals the model's
                # current rows since keys here are never re-inserted
                hit = model.delete_eq(arg, arg)
                if hit is not None:
                    keys = spark.createDataFrame(
                        [(arg,)],
                        StructType([StructField(name, LongType(), True)]),
                    )
                    t = t.new_transaction().delete_keys_dataframe(keys).commit()
                    history.append(
                        (t.metadata.current_snapshot_id, [dict(r) for r in model.rows])
                    )
        elif op == "posdel":
            # positional DELETE WHERE k % 4 == arg: exact-row deletes via
            # scan identity (r9 — exercises pos-delete reconstruction in
            # the changelog/CDC-replay and time-travel properties)
            before_n = len(model.rows)
            model.rows = [r for r in model.rows if r.get(1) % 4 != arg]
            if len(model.rows) != before_n:
                from iceberg_catalog_postgres_spark.catalog.maintenance import (
                    delete_where_mor,
                )

                t = delete_where_mor(spark, t, F.col("k") % 4 == arg)
                history.append(
                    (t.metadata.current_snapshot_id, [dict(r) for r in model.rows])
                )
        elif op == "dvdel":
            # positional DELETE WHERE k % 5 == arg as an Iceberg v3
            # DELETION VECTOR (r10) — exercises vector supersede-union,
            # mixed pos-parquet + DV state, and mid-sequence conversion
            # under the same evolution interleavings that found the
            # r7/r8 name-keyed-state bugs
            from iceberg_catalog_postgres_spark.catalog.maintenance import (
                rewrite_position_deletes_to_dvs,
            )

            before_n = len(model.rows)
            model.rows = [r for r in model.rows if r.get(1) % 5 != arg]
            if len(model.rows) != before_n:
                positions = (
                    t.to_df(spark)
                    .withColumn("file_path", F.col("_metadata.file_path"))
                    .withColumn("row_index", F.col("_metadata.row_index"))
                    .where(F.col("k") % 5 == arg)
                    .select("file_path", "row_index")
                )
                t = t.new_transaction().delete_positions_dv(positions).commit()
                history.append(
                    (t.metadata.current_snapshot_id, [dict(r) for r in model.rows])
                )
            if arg % 2 == 0 and t.metadata.current_position_delete_files():
                # representation conversion mid-sequence: rows unchanged
                t = rewrite_position_deletes_to_dvs(spark, t)
                history.append(
                    (t.metadata.current_snapshot_id, [dict(r) for r in model.rows])
                )
        elif op == "mormerge":
            t, changed = _apply_mormerge(spark, t, model, arg)
            if changed:
                history.append(
                    (t.metadata.current_snapshot_id, [dict(r) for r in model.rows])
                )
        elif op == "spec":
            candidates = [n for _i, n in model.cols if n != "k"]
            if candidates:
                spec_source = candidates[arg % len(candidates)]
                t = t.commit_partition_spec([spec_source])
        # keep spec_source in sync with any rename follow-through
        spec_source = t.metadata.partition_spec[0]

    # 1) full read == model (ids -> current names)
    got = sorted(
        tuple(row[n] for _i, n in model.cols) for row in
        (r.asDict() for r in t.to_df(spark).collect())
    )
    want = sorted(
        tuple(r.get(cid) for cid, _n in model.cols) for r in model.rows
    )
    assert got == want, f"full read mismatch after {ops}"

    # 2) time travel: every historical snapshot reads exactly the model's
    # rows AS OF that commit, projected through the CURRENT schema
    for snap_id, frozen in history:
        got_h = sorted(
            tuple(row[n] for _i, n in model.cols)
            for row in (r.asDict() for r in t.to_df(spark, snapshot_id=snap_id).collect())
        )
        want_h = sorted(
            tuple(r.get(cid) for cid, _n in model.cols) for r in frozen
        )
        assert got_h == want_h, f"time travel to {snap_id} mismatch after {ops}"

    # 3) partition-filtered reads on every current non-key column: the
    # pruned read + row filter must equal the model's filter exactly
    for cid, name in model.cols:
        if cid == 1:
            continue
        for v in range(5):
            n_model = sum(1 for r in model.rows if r.get(cid) == v)
            n_read = (
                t.to_df(spark, transformed_filter={name: v})
                .filter(F.col(name) == v)
                .count()
            )
            assert n_read == n_model, (
                f"filtered read {name}={v}: got {n_read}, want {n_model} "
                f"after {ops}"
            )

    # 4) CDC replay (r9): applying the changelog from the FIRST data
    # snapshot onto that snapshot's frozen rows must reconstruct the
    # CURRENT table exactly — inserts add, deletes remove, in ordinal
    # order. This certifies changelog_df's delete reconstruction (parent
    # replay + per-signature dedup) under the same random evolution
    # sequences as the read properties.
    if history:
        from collections import Counter

        first_id, first_rows = history[0]
        cur_names = [n for _i, n in model.cols]
        state = Counter(
            tuple(r.get(cid) for cid, _n in model.cols) for r in first_rows
        )
        changes = sorted(
            (
                r.asDict()
                for r in t.changelog_df(spark, from_snapshot_id=first_id).collect()
            ),
            key=lambda r: r["_change_ordinal"],
        )
        for ch in changes:
            key = tuple(ch[n] for n in cur_names)
            if ch["_change_type"] in ("insert", "update_after"):
                state[key] += 1
            else:
                assert state[key] > 0, (
                    f"changelog deleted a row not present: {key} after {ops}"
                )
                state[key] -= 1
        want_state = Counter(
            tuple(r.get(cid) for cid, _n in model.cols) for r in model.rows
        )
        assert +state == +want_state, f"CDC replay mismatch after {ops}"

    # 5) composed range∩point planning (r9, VERDICT item 5): under the
    # same random rename/re-add/spec-flip sequences that found the r7 AND
    # r8 bugs, planned_files_composed must never EXCLUDE a file containing
    # a matching row — reading ONLY the planned files with the row filter
    # applied equals the model's filter exactly. The range rides the
    # current spec source (identity long => monotone); the point
    # constrains each OTHER current column.
    from iceberg_catalog_postgres_spark.catalog.table import (
        parse_partition_field,
    )

    kind, _p, spec_src = parse_partition_field(t.metadata.partition_spec[0])
    name_to_id = {n: cid for cid, n in model.cols}
    if kind == "identity" and spec_src in name_to_id:
        sid = name_to_id[spec_src]
        lo, hi = 1, 3
        for cid, name in model.cols:
            if cid == 1 or name == spec_src:
                continue
            for v in (0, 3):
                files = t.planned_files_composed(
                    ranges={spec_src: (lo, hi)}, points={name: v}
                )
                n_model = sum(
                    1
                    for r in model.rows
                    if r.get(sid) is not None
                    and lo <= r[sid] <= hi
                    and r.get(cid) == v
                )
                n_read = (
                    t.to_df(spark, file_subset=files)
                    .filter(F.col(spec_src).between(lo, hi) & (F.col(name) == v))
                    .count()
                    if files
                    else 0
                )
                assert n_read == n_model, (
                    f"composed plan {spec_src} in [{lo},{hi}] & {name}={v}: "
                    f"got {n_read}, want {n_model} after {ops}"
                )

    # 6) row lineage (r10): under the same random evolution sequences, the
    # lineage read returns exactly the model's rows, every non-null
    # _row_id is UNIQUE (ids are never reused), and non-null ids stay
    # below the document's next-row-id high-water mark.
    lrows = t.to_df(spark, with_row_lineage=True).collect()
    assert len(lrows) == len(model.rows), f"lineage read row count after {ops}"
    ids = [r["_row_id"] for r in lrows if r["_row_id"] is not None]
    assert len(ids) == len(set(ids)), f"duplicate _row_id after {ops}"
    assert all(v < t.metadata.next_row_id for v in ids), (
        f"_row_id above next-row-id after {ops}"
    )


# ---- r8: Avro interop round trip under the SAME evolution state machine ----
#
# The export/import path shares the name-keyed-state hazards the fuzz above
# exists for (physical-name resolution, spec tuples, delete scoping) PLUS its
# own (URI mapping, bounds encoding, delete-manifest rewrite). Round-tripping
# the fuzzed tables certifies the whole interop surface against the row
# model: on-ramps applied exactly as a user would (rewrite_equality_deletes
# for pending eq-deletes, compact_table when the seq-scoped refusals fire),
# then a foreign-catalog import must read EXACTLY the model's rows.

_RT_COUNTER = [0]


@settings(
    max_examples=fuzz_cases(10, 4),
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
    phases=[Phase.generate, Phase.shrink],
)
@given(ops=OPS)
def test_avro_round_trip_under_evolution(fuzz_catalog, spark, ops):
    from iceberg_catalog_postgres_spark.catalog.avro_export import (
        export_iceberg_avro,
        import_iceberg_avro,
    )
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        compact_table,
        rewrite_equality_deletes,
    )

    _RT_COUNTER[0] += 1
    model = Model()
    ident = TableIdentifier.parse(f"fzrt.t{_RT_COUNTER[0]}")
    t = fuzz_catalog.create_table(ident, _schema(model), partition_by=["c0"])
    spec_source = "c0"

    for op, arg in ops:
        if op == "append":
            batch = model.append(arg)
            t = t.new_transaction().append_dataframe(
                spark.createDataFrame(batch, t.metadata.spark_schema).coalesce(1)
            ).commit()
        elif op == "rename":
            if model.rename(arg):
                t = t.commit_schema(_schema(model))
        elif op == "add":
            if model.add(arg):
                t = t.commit_schema(_schema(model))
        elif op == "drop":
            saved = list(model.cols)
            if model.drop(arg, spec_source):
                try:
                    t = t.commit_schema(_schema(model))
                except ValueError:
                    model.cols = saved
        elif op == "delete":
            non_key = [(cid, n) for cid, n in model.cols if cid != 1]
            if non_key:
                cid, name = non_key[arg % len(non_key)]
                hit = model.delete_eq(arg, arg)
                if hit is not None:
                    keys = spark.createDataFrame(
                        [(arg,)],
                        StructType([StructField(name, LongType(), True)]),
                    )
                    t = t.new_transaction().delete_keys_dataframe(keys).commit()
        elif op == "posdel":
            # positional DELETE WHERE k % 4 == arg: exact-row deletes via
            # scan identity (r9 — exercises pos-delete reconstruction in
            # the changelog/CDC-replay and time-travel properties)
            before_n = len(model.rows)
            model.rows = [r for r in model.rows if r.get(1) % 4 != arg]
            if len(model.rows) != before_n:
                from iceberg_catalog_postgres_spark.catalog.maintenance import (
                    delete_where_mor,
                )

                t = delete_where_mor(spark, t, F.col("k") % 4 == arg)
        elif op == "dvdel":
            # DV deletes in the export round-trip property: the v2 export
            # REFUSES deletion vectors, so these sequences exercise the
            # refusal + compaction on-ramp path below
            before_n = len(model.rows)
            model.rows = [r for r in model.rows if r.get(1) % 5 != arg]
            if len(model.rows) != before_n:
                positions = (
                    t.to_df(spark)
                    .withColumn("file_path", F.col("_metadata.file_path"))
                    .withColumn("row_index", F.col("_metadata.row_index"))
                    .where(F.col("k") % 5 == arg)
                    .select("file_path", "row_index")
                )
                t = t.new_transaction().delete_positions_dv(positions).commit()
        elif op == "mormerge":
            t, _changed = _apply_mormerge(spark, t, model, arg)
        elif op == "spec":
            candidates = [n for _i, n in model.cols if n != "k"]
            if candidates:
                t = t.commit_partition_spec([candidates[arg % len(candidates)]])
        spec_source = t.metadata.partition_spec[0]

    if t.metadata.current_snapshot() is None:
        with pytest.raises(ValueError, match="no snapshot"):
            export_iceberg_avro(spark, t)
        return

    # eq-deletes export DIRECTLY (content=2, per-entry real seqs). Exercise
    # the rewrite on-ramp too, on half the examples, so both delete
    # encodings round-trip. Refusals are resolved with the TARGETED r9
    # on-ramps first (cohort rewrite for renames, re-tuple for spec
    # evolution) — exercising them under the same random sequences that
    # found the r7/r8 bugs — with full compaction as the last resort.
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        rewrite_files_before_seq,
        rewrite_files_to_current_spec,
    )

    if t.metadata.current_delete_files() and _RT_COUNTER[0] % 2 == 0:
        t = rewrite_equality_deletes(spark, t)
    res = None
    for attempt in range(4):
        try:
            res = export_iceberg_avro(spark, t)
            break
        except ValueError as e:
            msg = str(e)
            if "rename" in msg and t.column_renames():
                boundary = max(int(r["as-of-seq"]) for r in t.column_renames())
                t, _n, _k, _w = rewrite_files_before_seq(spark, t, boundary)
            elif "partition tuple" in msg:
                t, _n, _k, _w = rewrite_files_to_current_spec(spark, t)
            else:
                t = compact_table(spark, t)
    if res is None:
        t = compact_table(spark, t)
        res = export_iceberg_avro(spark, t)  # must succeed after compaction

    imp = import_iceberg_avro(
        spark,
        fuzz_catalog,
        TableIdentifier.parse(f"fzrt.imp{_RT_COUNTER[0]}"),
        res["metadata_json"],
    )
    got = sorted(
        tuple(row[n] for _i, n in model.cols)
        for row in (r.asDict() for r in imp.to_df(spark).collect())
    )
    want = sorted(
        tuple(r.get(cid) for cid, _n in model.cols) for r in model.rows
    )
    assert got == want, f"avro round-trip mismatch after {ops}"
