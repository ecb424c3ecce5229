"""Deterministic soak of the r10/r11 surfaces: random-but-seeded op
sequences interleaving every delete representation (eq / pos-parquet /
deletion vector), both conversion directions, lineage-preserving
compaction, lineage merges, MOR multi-clause merges (atomic rowdelta,
r11), and rollbacks — with READ PARITY against a row model plus the
lineage invariants (id uniqueness, high-water bound) asserted after
EVERY op. A 14-sequence randomized superset ran clean at r10 round end;
these four fixed seeds are the committed regression slice (their
sequences re-randomized when the op alphabet grew in r11)."""

from __future__ import annotations

import os
import random

import pytest

from tests.conftest import soak_only
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.catalog.catalog import (
    PostgresCatalog,
    TableIdentifier,
)


@pytest.fixture(scope="module")
def soak_catalog(tmp_path_factory):
    cat = PostgresCatalog.connect(
        "soak_cat", None, str(tmp_path_factory.mktemp("wh"))
    )
    cat.initialize()
    yield cat
    cat.backend.close()


def _positions(t, spark, pred):
    return (
        t.to_df(spark)
        .withColumn("file_path", F.col("_metadata.file_path"))
        .withColumn("row_index", F.col("_metadata.row_index"))
        .where(pred)
        .select("file_path", "row_index")
    )


# SOAK_EXTRA_SEEDS=1001,1002,... widens the committed slice to the
# randomized superset on demand (the audit runs at round end use it)
_EXTRA_SEEDS = [
    int(s) for s in os.environ.get("SOAK_EXTRA_SEEDS", "").split(",") if s
]


@pytest.mark.parametrize(
    "seed",
    [
        1000,
        # soak tier: the remaining seeds replay the same sequence family
        *[pytest.param(s, marks=soak_only) for s in (1003, 1004, 1008, *_EXTRA_SEEDS)],
    ],
)
def test_dv_lineage_soak_sequence(soak_catalog, spark, seed):
    from iceberg_catalog_postgres_spark.catalog.maintenance import (
        compact_table,
        merge_into,
        merge_upsert,
        rewrite_dvs_to_position_deletes,
        rewrite_equality_deletes,
        rewrite_position_deletes_to_dvs,
    )

    rng = random.Random(seed)
    schema = "k long, u string"
    t = soak_catalog.create_table(
        TableIdentifier.parse(f"s.soak{seed}"),
        spark.createDataFrame([], schema).schema,
    )
    model: dict = {}
    next_k = 0
    ops_log = []
    for _op_i in range(rng.randint(5, 9)):
        op = rng.choice(
            [
                "append", "dvdel", "posdel", "eqdel", "convert",
                "invert", "compactL", "mergeL", "mergeMOR", "rollback",
                "vac_eq",
            ]
        )
        ops_log.append(op)
        if op == "append" or (
            not model and op in ("dvdel", "posdel", "eqdel", "mergeL", "mergeMOR")
        ):
            rows = [
                (next_k + j, f"v{rng.randint(0, 3)}")
                for j in range(rng.randint(2, 6))
            ]
            for k, v in rows:
                model[k] = v
            next_k += len(rows)
            t = t.new_transaction().append_dataframe(
                spark.createDataFrame(rows, schema).orderBy("k").coalesce(1)
            ).commit()
        elif op in ("dvdel", "posdel"):
            mod = rng.randint(2, 5)
            r = rng.randint(0, mod - 1)
            doomed = [k for k in model if k % mod == r]
            if not doomed:
                continue
            for k in doomed:
                del model[k]
            pos = _positions(t, spark, F.col("k") % mod == r)
            tx = t.new_transaction()
            t = (
                tx.delete_positions_dv(pos)
                if op == "dvdel"
                else tx.delete_positions_dataframe(pos)
            ).commit()
        elif op == "eqdel":
            vals = [f"v{rng.randint(0, 3)}"]
            doomed = [k for k, v in model.items() if v in vals]
            if not doomed:
                continue
            for k in doomed:
                del model[k]
            keys = spark.createDataFrame(
                [(v,) for v in vals], "u string"
            ).coalesce(1)
            t = t.new_transaction().delete_keys_dataframe(keys).commit()
        elif op == "convert":
            t = rewrite_position_deletes_to_dvs(spark, t)
        elif op == "invert":
            t = rewrite_dvs_to_position_deletes(spark, t)
        elif op == "vac_eq":
            if t.metadata.current_delete_files():
                t = rewrite_equality_deletes(spark, t, to_dv=rng.random() < 0.5)
        elif op == "compactL":
            if t.metadata.current_data_files():
                t = compact_table(spark, t, preserve_lineage=True)
        elif op == "mergeL":
            if not model:
                continue
            upd_keys = rng.sample(sorted(model), min(2, len(model)))
            new_rows = [(next_k, "NEW")]
            next_k += 1
            for k in upd_keys:
                model[k] = "UPD"
            for k, v in new_rows:
                model[k] = v
            updates = spark.createDataFrame(
                [(k, "UPD") for k in upd_keys] + new_rows, schema
            )
            t = merge_upsert(spark, t, updates, ["k"], preserve_lineage=True)
        elif op == "mergeMOR":
            # r11: multi-clause MOR merge (atomic rowdelta) — update one
            # key, delete another via a matched clause, insert one row
            if len(model) < 2:
                continue
            upd_k, del_k = rng.sample(sorted(model), 2)
            ins = (next_k, "INS")
            next_k += 1
            model[upd_k] = "MUPD"
            del model[del_k]
            model[ins[0]] = ins[1]
            msrc = spark.createDataFrame(
                [(upd_k, "MUPD"), (del_k, "x"), ins], schema
            )
            t = merge_into(
                spark, t, msrc, on=["k"],
                when_matched=[
                    {"action": "delete", "condition": f"t.k = {del_k}"},
                    {"action": "update", "set": {"u": "s.u"}},
                ],
                when_not_matched=[{"action": "insert"}],
                preserve_lineage=True,
                strategy="mor",
            )
        elif op == "rollback":
            snaps = t.metadata.snapshots
            if len(snaps) >= 2 and rng.random() < 0.4:
                t = t.rollback_to(snaps[-2].snapshot_id)
                model = {r["k"]: r["u"] for r in t.to_df(spark).collect()}

        got = {r["k"]: r["u"] for r in t.to_df(spark).collect()}
        assert got == model, f"seed {seed} after {ops_log}: rows diverged"
        lr = t.to_df(spark, with_row_lineage=True).collect()
        ids = [r["_row_id"] for r in lr if r["_row_id"] is not None]
        assert len(ids) == len(set(ids)), f"seed {seed} {ops_log}: dup _row_id"
        assert all(v < t.metadata.next_row_id for v in ids), (
            f"seed {seed} {ops_log}: _row_id above the high-water mark"
        )
