"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched Pandas UDFs over mapInPandas.

The image/audio codec libraries are not in this container, so the "decode"
step computes deterministic byte-level features (length, magic-byte format
sniffing, byte histogram buckets) that a DuckDB oracle recomputes from the
same bytes — a real pipeline swaps the feature block for the codec call; the
Spark-side plumbing — binary schema, metadata struct, Arrow batch iteration
shape, partitioning — is identical either way and is what's under test.
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


# Magic-byte prefixes for container-format sniffing. The fixture payloads are
# utf-8 text so every row lands on the 'raw-text' fallback — the detection
# branches are certified separately with synthetic payloads in
# tests/test_multimodal.py (codec libs aren't in this container; a real
# pipeline would dispatch each fmt to its decoder after this step).
_MAGIC = (
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
)


def _sniff_format(b: bytes) -> str:
    for magic, name in _MAGIC:
        if b.startswith(magic):
            return name
    return "raw-text"


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic pure-Arrow byte features over the binary payload:
    length, magic-byte format, first/last byte, mean byte, space and
    lowercase-alpha histogram buckets — all recomputable by the DuckDB
    oracle from the same bytes (fixture text is pure ASCII, so byte values
    equal code points)."""
    import numpy as np

    payloads = batch["payload"]
    arrs = [np.frombuffer(b, dtype=np.uint8) for b in payloads]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": pd.Series([a.size for a in arrs], dtype="int64"),
            "fmt": pd.Series([_sniff_format(bytes(b[:8])) for b in payloads], dtype="object"),
            "first_byte": pd.Series([int(a[0]) if a.size else -1 for a in arrs], dtype="int32"),
            "last_byte": pd.Series([int(a[-1]) if a.size else -1 for a in arrs], dtype="int32"),
            "mean_byte": pd.Series(
                [round(float(a.sum(dtype="int64")) / a.size, 6) if a.size else 0.0 for a in arrs],
                dtype="float64",
            ),
            "n_spaces": pd.Series([int((a == 32).sum()) for a in arrs], dtype="int64"),
            "n_alpha": pd.Series([int(((a >= 97) & (a <= 122)).sum()) for a in arrs], dtype="int64"),
        }
    )


@register(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'raw-text' AS fmt,
           CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(unicode(substr(text, length(text), 1)) AS INT) AS last_byte,
           round(list_sum(list_transform(range(1, length(text) + 1),
                                         i -> unicode(substr(text, i, 1)))) * 1.0
                 / length(text), 6) AS mean_byte,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
           CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payloads: Arrow-batched
    (one pandas DataFrame per partition chunk), the canonical shape for
    CPU-bound media decode.

    Oracle-backed (round-3 upgrade from rows-only): the features are
    deterministic byte-level statistics (length, magic-byte format,
    first/last/mean byte, space/alpha histogram buckets) that DuckDB
    recomputes from the same payload bytes — the fixture text is pure ASCII,
    so per-byte values equal per-char code points. Real image/audio decode
    would replace `_decode_batch`'s feature block with the codec call; the
    Spark-side plumbing (binary column, Arrow batching, schema, partition
    parallelism) is exactly what that production path uses.

    Scale: decode parallelism == partition count; payloads never gather to
    the driver. ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
    memory for fat rows (real images).
    """
    d = load(spark, sf_dir, "documents")
    src = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload")).repartition(8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch)

    out = src.mapInPandas(
        gen,
        "doc_id long, n_bytes long, fmt string, first_byte int, last_byte int, "
        "mean_byte double, n_spaces long, n_alpha long",
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


_FIT_BOX = 224  # the ubiquitous vision-model input edge


@register(
    "mm_resize_plan",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(320 + n_chars % 1280 AS INT) AS src_w,
             CAST(240 + (n_chars * 7) % 720 AS INT) AS src_h
      FROM documents
    )
    SELECT doc_id, src_w, src_h,
           CAST(floor(src_w * least({_FIT_BOX}.0 / src_w, {_FIT_BOX}.0 / src_h)) AS INT) AS dst_w,
           CAST(floor(src_h * least({_FIT_BOX}.0 / src_w, {_FIT_BOX}.0 / src_h)) AS INT) AS dst_h,
           round(least({_FIT_BOX}.0 / src_w, {_FIT_BOX}.0 / src_h), 6) AS scale,
           least({_FIT_BOX}.0 / src_w, {_FIT_BOX}.0 / src_h) > 1.0 AS upscaled
    FROM dims
    """,
    tags=("llm", "multimodal"),
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning for image-like payloads: given
    per-item source dimensions (synthesized deterministically from item
    properties here; read from container metadata in production), compute
    the target (dst_w, dst_h) that fits a {BOX}x{BOX} model-input box, the
    scale factor, and an upscaling flag — the preprocessing decision every
    vision-training pipeline makes per image BEFORE touching pixels.

    Completes the multimodal quartet (metadata -> decode -> RESIZE ->
    frame-sample): like the frame-sample plan, the expensive pixel work
    stays deferred — a mapInPandas stage consumes (payload, dst_w, dst_h)
    rows and calls the codec's resize; this query is the JVM-side planning
    half, so filters (e.g. drop upscaled items) prune BEFORE any decode.

    Scale: pure codegen arithmetic over metadata columns; no UDF, no blob
    reads. The fp contract is engine-stable: one double division, least(),
    multiply, floor — identical operation order on both engines.
    """
    d = load(spark, sf_dir, "documents")
    src_w = (F.lit(320) + F.col("n_chars") % 1280).cast("int")
    src_h = (F.lit(240) + (F.col("n_chars") * 7) % 720).cast("int")
    dims = d.select("doc_id", src_w.alias("src_w"), src_h.alias("src_h"))
    scale = F.least(
        F.lit(float(_FIT_BOX)) / F.col("src_w"), F.lit(float(_FIT_BOX)) / F.col("src_h")
    )
    return dims.select(
        "doc_id",
        "src_w",
        "src_h",
        F.floor(F.col("src_w") * scale).cast("int").alias("dst_w"),
        F.floor(F.col("src_h") * scale).cast("int").alias("dst_h"),
        F.round(scale, 6).alias("scale"),
        (scale > 1.0).alias("upscaled"),
    )


mm_resize_plan.__doc__ = mm_resize_plan.__doc__.replace("{BOX}", str(_FIT_BOX))
