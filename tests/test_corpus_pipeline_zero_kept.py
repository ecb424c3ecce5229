"""ADVICE r4 (medium): llm_corpus_pipeline must emit NO row for a language
whose every document fails the quality gate, while still counting those docs
in the global attrition totals — matching the DuckDB oracle, which builds its
per-lang rows only from quality survivors."""

from __future__ import annotations

import pandas as pd

import duckdb

from iceberg_catalog_postgres_spark.llm.text import llm_corpus_pipeline
from iceberg_catalog_postgres_spark.oracle import compare
from iceberg_catalog_postgres_spark.registry import load_all


def _write_fixture(tmp_path):
    """3 English survivors (one duplicated) + 2 'zz' docs that are all too
    short to pass the 10-word minimum -> 'zz' must not appear in the output
    but its 2 docs must appear in n_docs_in."""
    long_a = " ".join(f"w{i}" for i in range(20))
    long_b = " ".join(f"v{i}" for i in range(15))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [long_a, long_a, long_b, "too short", "tiny"],
            "lang": ["en", "en", "en", "zz", "zz"],
            "source": ["s"] * 5,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_zero_kept_lang_emits_no_row(spark, tmp_path):
    sf_dir = _write_fixture(tmp_path)
    out = llm_corpus_pipeline(spark, sf_dir).toPandas().sort_values("lang")
    assert list(out["lang"]) == ["en"], "zero-kept language leaked into output"
    row = out.iloc[0]
    assert row["n_docs_kept"] == 2  # long_a deduped, long_b kept
    assert row["n_docs_in"] == 5  # zz docs still counted in attrition
    assert row["n_after_quality"] == 3


def test_zero_kept_lang_matches_oracle(spark, tmp_path):
    sf_dir = _write_fixture(tmp_path)
    spec = load_all()["llm_corpus_pipeline"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    try:
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    res = compare("llm_corpus_pipeline_zero_kept", spark_pdf, oracle_pdf)
    assert res.ok, f"{res.detail} (rows {res.spark_rows}/{res.oracle_rows})"
