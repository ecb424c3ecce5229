"""Invariant tests for the curation / layout / session operators — properties
the DuckDB oracle can't express (cross-engine equality says both engines agree,
these say the *semantics* are right)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_postgres_spark.operators.scale_patterns import _z_value
from iceberg_catalog_postgres_spark.registry import load, load_all

REGISTRY = load_all()


def _py_zvalue(x: int, y: int, bits: int = 11) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(st.integers(0, 2047), st.integers(0, 2047)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None)
def test_zvalue_matches_python_reference(spark, pairs):
    """The JVM bit-op z-value must equal the reference Morton interleave."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "x long, y long")
    got = [r.z for r in df.select(_z_value(F.col("x"), F.col("y")).alias("z")).collect()]
    assert got == [_py_zvalue(x, y) for x, y in pairs]


def test_pack_bins_are_contiguous_doc_ranges(spark, sf_oracle):
    """Within a language, packed bins must cover disjoint, increasing doc-id
    ranges (a doc never jumps bins; bins are filled in doc order)."""
    pdf = REGISTRY["pack_token_budget"].fn(spark, sf_oracle).toPandas()
    for lang, g in pdf.groupby("lang"):
        g = g.sort_values("seq_bin")
        assert list(g.seq_bin) == sorted(set(g.seq_bin)), lang
        prev_last = -1
        for _, row in g.iterrows():
            assert row.first_doc > prev_last, (lang, row.seq_bin)
            assert row.last_doc >= row.first_doc
            prev_last = row.last_doc


def test_pack_conserves_tokens(spark, sf_oracle):
    """Sum of per-bin token counts equals the corpus total (nothing dropped)."""
    from pyspark.sql import functions as F

    pdf = REGISTRY["pack_token_budget"].fn(spark, sf_oracle).toPandas()
    total = (
        load(spark, sf_oracle, "documents")
        .select(F.sum(F.size(F.split("text", " "))).alias("n"))
        .collect()[0].n
    )
    assert int(pdf.sum_tokens.sum()) == total


def test_mixture_sampling_bounds(spark, sf_oracle):
    """Every language keeps <= its total; the smallest language keeps all
    (rate 1.0); kept fraction is within 15% of the target rate."""
    pdf = REGISTRY["sample_domain_mixture"].fn(spark, sf_oracle).toPandas()
    assert (pdf.n_kept <= pdf.n_total).all()
    smallest = pdf.loc[pdf.n_total.idxmin()]
    assert smallest.n_kept == smallest.n_total
    for _, r in pdf.iterrows():
        assert abs(r.n_kept / r.n_total - r.rate) <= 0.15, r.lang


def test_sessionize_partitions_user_events(spark, sf_oracle):
    """Per-user session event counts must sum to the user's event count, and
    session_seq must be 1..n_sessions dense."""
    from pyspark.sql import functions as F

    pdf = REGISTRY["sessionize_gap_lag"].fn(spark, sf_oracle).toPandas()
    ev = (
        load(spark, sf_oracle, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("user_id")["n"]
    )
    got = pdf.groupby("user_id").n_events.sum()
    assert got.to_dict() == ev.to_dict()
    for uid, g in pdf.groupby("user_id"):
        seqs = sorted(g.session_seq)
        assert seqs == list(range(1, len(seqs) + 1)), uid
    assert (pdf.dur_ms >= 0).all()


def test_decontamination_never_flags_eval_docs(spark, sf_oracle):
    """The contamination report must only contain training docs."""
    pdf = REGISTRY["decon_ngram_overlap"].fn(spark, sf_oracle).toPandas()
    assert len(pdf) > 0
    assert (pdf.doc_id % 97 != 0).all()
    assert (pdf.n_shingles_hit >= 1).all() and (pdf.n_eval_docs >= 1).all()


def test_tag_pins_snapshot_through_expiry(spark, sf_smoke):
    """set_ref/drop_ref lifecycle: a tag survives expire_snapshots; dropping
    it makes the snapshot expirable; reading a dropped ref raises."""
    import pytest as _pytest

    from iceberg_catalog_postgres_spark.catalog.integration import _fresh_catalog
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
    from iceberg_catalog_postgres_spark.catalog.maintenance import expire_snapshots

    cat = _fresh_catalog("tag_lifecycle")
    src = load(spark, sf_smoke, "region")
    ident = TableIdentifier.parse("t.region")
    t = cat.create_table(ident, src.schema)
    t.new_transaction().append_dataframe(src).commit()
    t = cat.load_table(ident)
    v1 = t.metadata.current_snapshot().snapshot_id
    t = t.set_ref("v1")
    t.new_transaction().append_dataframe(src).commit()
    t = cat.load_table(ident)
    t.new_transaction().append_dataframe(src).commit()

    t = expire_snapshots(cat.load_table(ident), keep_last=1)
    t = cat.load_table(ident)
    assert v1 in t.metadata.snapshot_ids()  # pinned by tag
    assert t.to_df(spark, ref="v1").count() == src.count()

    t = t.drop_ref("v1")
    t = cat.load_table(ident)
    t = expire_snapshots(t, keep_last=1)
    t = cat.load_table(ident)
    assert v1 not in t.metadata.snapshot_ids()  # expirable once untagged
    with _pytest.raises(ValueError):
        t.to_df(spark, ref="v1")


def test_branch_chain_and_failed_audit_rollback(spark, sf_smoke):
    """Two appends chained on one branch both land in the branch head; a
    failed audit (drop_ref without publish) leaves main exactly as before;
    non-append branch commits are rejected."""
    import pytest as _pytest

    from iceberg_catalog_postgres_spark.catalog.integration import _fresh_catalog
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    cat = _fresh_catalog("wap_lifecycle")
    src = load(spark, sf_smoke, "region")
    n = src.count()
    ident = TableIdentifier.parse("w.region")
    t = cat.create_table(ident, src.schema)
    t.new_transaction().append_dataframe(src).commit()

    t = cat.load_table(ident)
    t.new_transaction(branch="stage").append_dataframe(src).commit()
    t = cat.load_table(ident)
    t.new_transaction(branch="stage").append_dataframe(src).commit()
    t = cat.load_table(ident)
    assert t.to_df(spark, ref="stage").count() == 3 * n  # chained on branch
    assert t.to_df(spark).count() == n  # main untouched

    with _pytest.raises(ValueError):
        t.new_transaction(branch="stage").overwrite_dataframe(src).commit()

    t = t.drop_ref("stage")  # failed audit: discard staging
    t = cat.load_table(ident)
    assert t.to_df(spark).count() == n
    assert "stage" not in t.metadata.refs


def test_catalog_tail_replay_is_deterministic(spark, sf_smoke):
    """The streaming tail's readBetweenOffsets (crash-recovery replay) must
    return exactly the rows the original read returned, and offsets must
    advance with new commits."""
    import os
    import shutil

    from iceberg_catalog_postgres_spark.catalog.catalog import PostgresCatalog, TableIdentifier
    from iceberg_catalog_postgres_spark.sources.catalog_datasource import (
        CatalogCommitsStreamReader,
    )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = os.path.join(repo_root, ".tmp", "tail_replay")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    db, wh = os.path.join(work, "catalog.db"), os.path.join(work, "wh")
    cat = PostgresCatalog.connect("tr", f"sqlite://{db}", wh)
    cat.initialize()
    src = load(spark, sf_smoke, "region")
    ident = TableIdentifier.parse("tr.region")
    t = cat.create_table(ident, src.schema)
    t.new_transaction().append_dataframe(src).commit()

    reader = CatalogCommitsStreamReader(
        {"db": db, "warehouse": wh, "ident": "tr.region", "catalog": "tr"}
    )
    start = reader.initialOffset()
    rows1, end1 = reader.read(start)
    rows1 = list(rows1)
    assert end1["n_snapshots"] == 1 and len(rows1) == src.count()
    assert sorted(reader.readBetweenOffsets(start, end1)) == sorted(rows1)  # replay

    cat.load_table(ident).new_transaction().append_dataframe(src).commit()
    rows2, end2 = reader.read(end1)
    assert end2["n_snapshots"] == 2
    assert len(list(rows2)) == src.count()  # only the delta


def test_metadata_edit_retries_past_concurrent_commit(spark, sf_smoke):
    """set_ref from a STALE table handle must survive a concurrent data
    commit via CAS retry (metadata edits commute with data commits)."""
    from iceberg_catalog_postgres_spark.catalog.integration import _fresh_catalog
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier

    cat = _fresh_catalog("ref_race")
    src = load(spark, sf_smoke, "region")
    ident = TableIdentifier.parse("r.region")
    t = cat.create_table(ident, src.schema)
    t.new_transaction().append_dataframe(src).commit()

    stale = cat.load_table(ident)
    v1 = stale.metadata.current_snapshot().snapshot_id
    # concurrent writer commits AFTER `stale` was loaded
    cat.load_table(ident).new_transaction().append_dataframe(src).commit()

    t2 = stale.set_ref("pin-v1", snapshot_id=v1)  # stale CAS -> retry -> ok
    t2 = cat.load_table(ident)
    assert t2.metadata.refs["pin-v1"]["snapshot-id"] == v1
    assert t2.to_df(spark).count() == 2 * src.count()  # concurrent commit kept
    assert t2.to_df(spark, ref="pin-v1").count() == src.count()


def test_publish_refuses_when_main_advanced(spark, sf_smoke):
    """Fast-forward publish must refuse if main advanced past the branch
    base — otherwise the concurrent main commit would be silently orphaned."""
    import pytest as _pytest

    from iceberg_catalog_postgres_spark.catalog.integration import _fresh_catalog
    from iceberg_catalog_postgres_spark.catalog.catalog import TableIdentifier
    from iceberg_catalog_postgres_spark.catalog.table import CommitConflictError

    cat = _fresh_catalog("wap_race")
    src = load(spark, sf_smoke, "region")
    ident = TableIdentifier.parse("wr.region")
    t = cat.create_table(ident, src.schema)
    t.new_transaction().append_dataframe(src).commit()

    t = cat.load_table(ident)
    t.new_transaction(branch="stage").append_dataframe(src).commit()
    # concurrent writer advances MAIN after the branch was staged
    cat.load_table(ident).new_transaction().append_dataframe(src).commit()

    t = cat.load_table(ident)
    with _pytest.raises(CommitConflictError):
        t.publish_branch("stage")
    t = cat.load_table(ident)
    assert t.to_df(spark).count() == 2 * src.count()  # main intact
    assert "stage" in t.metadata.refs  # branch preserved for re-staging


def test_q2_min_cost_keeps_at_least_one_supplier_per_part(spark, sf_oracle):
    """The fp-equality min-cost filter must never drop a qualifying part
    entirely (every part with an eligible supplier keeps >= 1 winner)."""
    from pyspark.sql import functions as F

    pdf = REGISTRY["q2_min_cost_supplier"].fn(spark, sf_oracle).toPandas()
    # every part appearing appears with >= 1 supplier row, and within a part
    # all winners share one (minimal) cost by construction
    assert len(pdf) > 0
    assert pdf.groupby("p_partkey").size().min() >= 1
    assert pdf.s_acctbal.is_monotonic_decreasing  # ordered output contract
