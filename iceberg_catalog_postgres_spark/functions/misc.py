"""Second scalar-function batch: remaining string/array/null-handling
surface (SURVEY §2.C completeness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "fn_string_family2",
    oracle="""
    SELECT p_partkey,
           reverse(p_name)                                   AS rev_name,
           concat_ws('-', p_brand, p_type)                   AS brand_dash_type,
           strpos(p_name, '1')                               AS pos_of_1,
           split_part(p_name, ' ', 2)                        AS name_noun,
           translate(p_brand, '#', '-')                      AS brand_translated,
           CASE WHEN p_size > 25 THEN NULL ELSE p_type END   AS small_type_or_null,
           coalesce(CASE WHEN p_size > 25 THEN NULL ELSE p_type END, 'BIG') AS nvl_type,
           nullif(p_brand, 'Brand#13')                       AS brand_not_13,
           repeat('*', p_size % 5)                           AS stars
    FROM part WHERE p_partkey <= 300
    """,
    tags=("functions", "string"),
)
def fn_string_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reverse/concat_ws/instr/substring_index/translate/nvl/nullif/repeat."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    small_or_null = F.when(F.col("p_size") > 25, F.lit(None)).otherwise(F.col("p_type"))
    return p.select(
        "p_partkey",
        F.reverse("p_name").alias("rev_name"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_dash_type"),
        F.instr("p_name", "1").alias("pos_of_1"),
        F.element_at(F.split("p_name", " "), 2).alias("name_noun"),
        F.translate("p_brand", "#", "-").alias("brand_translated"),
        small_or_null.alias("small_type_or_null"),
        F.coalesce(small_or_null, F.lit("BIG")).alias("nvl_type"),
        F.nullif(F.col("p_brand"), F.lit("Brand#13")).alias("brand_not_13"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
    )


@register(
    "fn_array_family2",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ')[1:6]  AS a,
             string_split(text, ' ')[4:9]  AS b
      FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ',')        AS a_minus_b,
           len(flatten([a, b]))                                          AS flat_len,
           array_to_string(a[2:4], '/')                                  AS mid_slice,
           greatest(len(a), len(b))                                      AS max_len,
           least(a[1], b[1])                                             AS lex_min_head
    FROM t
    """,
    tags=("functions", "array"),
)
def fn_array_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_except/flatten/slice/greatest/least — the set-algebra side of
    the array API (dedup between overlapping token windows is the same
    shape as chunk-overlap removal in a training pipeline)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = F.split("text", " ")
    t = d.select("doc_id", F.slice(toks, 1, 6).alias("a"), F.slice(toks, 4, 6).alias("b"))
    return t.select(
        "doc_id",
        F.array_join(F.sort_array(F.array_distinct(F.array_except("a", "b"))), ",").alias("a_minus_b"),
        F.size(F.flatten(F.array("a", "b"))).alias("flat_len"),
        F.array_join(F.slice("a", 2, 3), "/").alias("mid_slice"),
        F.greatest(F.size("a"), F.size("b")).alias("max_len"),
        F.least(F.element_at("a", 1), F.element_at("b", 1)).alias("lex_min_head"),
    )


@register(
    "fn_arrays_zip_struct",
    oracle="""
    SELECT vec_id,
           round(CAST(pair['x'] AS DOUBLE), 6) AS x,
           round(CAST(pair['y'] AS DOUBLE), 6) AS y,
           CAST(pair['i'] AS INT) AS i
    FROM (
      SELECT vec_id,
             unnest(list_transform(range(1, 4),
               i -> {'x': CAST(embedding[i] AS DOUBLE),
                     'y': CAST(embedding[i + 1] AS DOUBLE), 'i': i})) AS pair
      FROM embeddings WHERE vec_id < 20
    )
    """,
    tags=("functions", "array", "struct"),
)
def fn_arrays_zip_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + explode: pairing adjacent vector components into structs
    (struct columns round-tripping through explode — the nested-data path)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.lit(3)),
        lambda i: F.struct(
            F.element_at(vec, i).alias("x"),
            F.element_at(vec, i + 1).alias("y"),
            i.alias("i"),
        ),
    )
    return e.select("vec_id", F.explode(pairs).alias("pair")).select(
        "vec_id",
        F.round(F.col("pair.x"), 6).alias("x"),
        F.round(F.col("pair.y"), 6).alias("y"),
        F.col("pair.i").cast("int").alias("i"),
    )


@register(
    "fn_try_error_safe",
    oracle="""
    SELECT event_id,
           TRY_CAST(props AS INT)                                   AS bad_cast,
           TRY_CAST(json_extract_string(props, '$.k') AS INT)       AS good_cast,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) = 0 THEN NULL
                ELSE CAST(100.0 / nullif(CAST(json_extract_string(props, '$.k') AS INT), 0) AS DOUBLE)
           END                                                      AS safe_ratio
    FROM events
    WHERE event_id < 200
    """,
    tags=("functions", "error-handling"),
)
def fn_try_error_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation: try_cast / try_divide return NULL instead of
    failing the task — at 100 TB one malformed row must never kill a
    billion-row job. (ANSI mode makes plain cast/divide throw; the try_*
    family is the per-expression opt-out.)"""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.expr("try_cast(props AS INT)").alias("bad_cast"),
        F.expr("try_cast(get_json_object(props, '$.k') AS INT)").alias("good_cast"),
        F.try_divide(
            F.lit(100.0), F.nullif(F.expr("try_cast(get_json_object(props, '$.k') AS INT)"), F.lit(0))
        ).alias("safe_ratio"),
    )


@register(
    "agg_bitwise_family",
    oracle="""
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey)  AS key_or,
           bit_xor(o_orderkey) AS key_xor,
           CAST(bit_or(1 << (o_custkey % 60)) AS BIGINT) AS custkey_bitmap60
    FROM orders WHERE o_orderkey < 1000
    GROUP BY o_orderpriority
    """,
    tags=("functions", "bitwise"),
)
def agg_bitwise_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor) plus a poor-man's bitmap
    index: OR-ing single-bit masks of ``o_custkey % 60`` per group packs set
    membership into one BIGINT — the building block of bitmap-accelerated
    distinct counting and semi-join pruning.

    Scale: all four are associative single-value aggregates — perfect
    map-side partial aggregation, constant state per group; a 64-bit bitmap
    per group replaces a collect_set for small domains.
    """
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    # shiftleft()'s numBits arg must be a literal in the Python API; the SQL
    # form takes a column expression.
    mask = F.expr("shiftleft(1L, cast(o_custkey % 60 AS int))")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").alias("key_and"),
        F.bit_or("o_orderkey").alias("key_or"),
        F.bit_xor("o_orderkey").alias("key_xor"),
        F.bit_or(mask).alias("custkey_bitmap60"),
    )
