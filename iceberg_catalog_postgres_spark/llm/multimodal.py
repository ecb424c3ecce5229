"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched Pandas UDFs over mapInPandas.

The image/audio decode libraries are not in this container, so the decode
step is STUBBED behind an import-try (deterministic fake features when PIL is
absent, NotImplementedError raised only inside the real-decode branch); the
Spark-side plumbing — binary schema, metadata struct, batch iteration shape,
partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT source,
           count(*)                                   AS n_items,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text))                  AS n_distinct_payloads,
           max(octet_length(encode(text)))            AS max_bytes
    FROM documents
    GROUP BY source
    """,
    tags=("llm", "multimodal"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column (utf-8 encoded text standing in for image/audio
    bytes) + typed metadata aggregation per source.

    Scale: payload bytes stay columnar in parquet and are only materialized
    for the rows/columns a query touches; metadata (sizes, hashes) is
    computed once at ingest in production so scans never read blobs.
    """
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select("source", payload.alias("payload"), F.md5("text").alias("content_md5")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.countDistinct("content_md5").alias("n_distinct_payloads"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Decode stub: real branch needs PIL (absent here); fake branch derives
    deterministic "features" from payload bytes so tests are stable."""
    try:  # pragma: no cover - PIL not installed in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode requires fixture image bytes; wire PIL.Image.open here"
        )
    except ImportError:
        pass
    payloads = batch["payload"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            # fake 'width/height': stable functions of content
            "width": payloads.map(lambda b: 1 + (b[0] if len(b) else 0) % 64).astype("int32"),
            "height": payloads.map(lambda b: 1 + (b[-1] if len(b) else 0) % 64).astype("int32"),
            "mean_byte": payloads.map(lambda b: float(sum(b)) / max(len(b), 1)),
        }
    )


@register("mm_decode_features", oracle=None, tags=("llm", "multimodal", "udf"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payloads: Arrow-batched
    (one pandas DataFrame per partition chunk), the canonical shape for
    CPU-bound media decode.

    Scale: decode parallelism == partition count; payloads never gather to
    the driver. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
    memory for fat rows (real images). Rows-only check: feature values are
    stub-derived, but schema/shape/determinism are contract-tested.
    """
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload")).repartition(8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch)

    out = src.mapInPandas(
        gen, "doc_id long, n_bytes long, width int, height int, mean_byte double"
    )
    return out.orderBy("doc_id")


@register(
    "mm_frame_sample_plan",
    oracle="""
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx
    FROM (SELECT doc_id, n_chars // 50 AS n_frames FROM documents WHERE doc_id < 50),
         LATERAL (SELECT unnest(range(0, n_frames, 10)) AS frame_idx) f
    """,
    tags=("llm", "multimodal"),
)
def mm_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for video-like payloads: every 10th frame index
    per item (frame count derived from payload size here; from container
    metadata in production). explode(sequence(...)) — the decode itself would
    consume this plan via mapInPandas.

    Scale: the plan rows are tiny; the expensive decode stays deferred and
    parallel. Generating (item, frame) work units as a DataFrame is what
    lets Spark schedule/retry decode at frame granularity.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    n_frames = (F.col("n_chars") / 50).cast("long")
    return d.select(
        "doc_id",
        F.explode(
            F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(10))).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("frame_idx_l"),
    ).select("doc_id", F.col("frame_idx_l").cast("int").alias("frame_idx"))
