"""Scalar function families: string, date/time, math, array, map, JSON,
hash, conversion. SURVEY.md §2.C "Scalar functions".

Everything here is built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen. No Python UDFs anywhere in these paths (UDFs are the slow
path; the LLM modules use Pandas UDFs only where built-ins can't express the
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "fn_string_family",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS uname,
           lower(c_mktsegment)                             AS lseg,
           substring(c_name, 1, 8)                         AS prefix,
           length(c_name)                                  AS name_len,
           concat(c_name, ':', c_mktsegment)               AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')       AS padded_key,
           trim('  ' || c_mktsegment || ' ')               AS trimmed,
           replace(c_name, 'Customer', 'Cust')             AS replaced,
           regexp_extract(c_name, '([0-9]+)', 1)           AS digits,
           regexp_replace(c_name, '0+', '#', 'g')          AS squashed
    FROM customer
    WHERE c_custkey <= 200
    """,
    tags=("functions", "string"),
)
def fn_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/length/concat/lpad/trim/replace/regexp_*."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "0+", "#").alias("squashed"),
    )


@register(
    "fn_datetime_family",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)  AS mo,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT)  AS dy,
           CAST(EXTRACT(isodow FROM o_orderdate) AS INT) - 1 AS wkday,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT)            AS epoch_s,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INT) AS days_to_y2k,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    WHERE o_orderkey <= 500
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/weekday, date_trunc, epoch, datediff, interval add.

    All outputs are ints or ISO strings — never raw timestamps — to dodge
    engine timezone canonicalization drift (SURVEY §7 hard-point #2).
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.weekday("o_orderdate").cast("int").alias("wkday"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_y2k"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd").alias("due_date"),
    )


@register(
    "fn_math_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(30,8)), 1) AS DOUBLE) AS rounded,
           abs(l_discount - 0.05)                       AS absdiff,
           CAST(floor(l_quantity) AS BIGINT)            AS flr,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_quantity), 6)                   AS sqrt_qty,
           round(pow(1 + l_tax, 2), 6)                  AS tax_sq,
           round(ln(l_extendedprice), 6)                AS ln_price,
           round(log10(l_extendedprice), 6)             AS log10_price,
           CAST(l_orderkey % 7 AS BIGINT)               AS mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE)      AS sgn
    FROM lineitem
    WHERE l_orderkey <= 300
    """,
    tags=("functions", "math"),
)
def fn_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/sqrt/pow/ln/log10/mod/sign."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("absdiff"),
        F.floor("l_quantity").alias("flr"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
    )


@register(
    "fn_array_family",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                                   AS n_tokens,
           list_contains(string_split(text, ' '), 'spark')                AS has_spark,
           array_to_string(list_sort(string_split(text, ' ')[1:5]), '|')  AS first5_sorted,
           len(list_filter(string_split(text, ' '), t -> length(t) > 4))  AS n_long_tokens,
           array_to_string(list_transform(string_split(text, ' ')[1:3], t -> upper(t)), ',') AS first3_upper
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("functions", "array"),
)
def fn_array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/array_contains/slice/sort_array/filter/transform over token
    arrays — higher-order functions, all JVM-side codegen (no UDF)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.sort_array(F.slice(toks, 1, 5)), "|").alias("first5_sorted"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.array_join(F.transform(F.slice(toks, 1, 3), lambda t: F.upper(t)), ",").alias("first3_upper"),
    )


@register(
    "fn_array_fold_explode",
    oracle="""
    SELECT vec_id,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6) AS sq_norm,
           len(embedding)  AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_component
    FROM embeddings
    WHERE vec_id < 50
    """,
    tags=("functions", "array", "fold"),
)
def fn_array_fold_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.aggregate (fold) over an embedding vector — squared L2 norm without
    exploding. Cast to double BEFORE the fold so both engines accumulate in
    float64 with identical sequential order (bitwise-reproducible)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
        F.size("embedding").alias("dim"),
        F.round(F.element_at(vec, 1), 6).alias("first_component"),
    )


@register(
    "fn_explode_posexplode",
    oracle="""
    SELECT doc_id, CAST(tok.i - 1 AS INT) AS pos, tok.t AS token
    FROM documents,
         LATERAL (SELECT UNNEST(string_split(text, ' ')) AS t,
                         generate_subscripts(string_split(text, ' '), 1) AS i) tok
    WHERE doc_id < 10
    """,
    tags=("functions", "explode"),
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: flatten token arrays to (doc, position, token) rows —
    the row-multiplying lateral view.

    Scale: explode multiplies rows but is map-side only (no shuffle); column
    pruning keeps non-exploded payloads out of the expansion.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@register(
    "fn_map_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT)          AS k_val,
           map_extract(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}, 'type')[1] AS type_from_map,
           CAST(len(map_keys(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)})) AS INT) AS n_keys
    FROM events
    WHERE event_id < 200
    """,
    tags=("functions", "map"),
)
def fn_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at + map_keys (MapType round-trip)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.element_at(m, "type").alias("type_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_json_family",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT))              AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("functions", "json"),
)
def fn_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (get_json_object / from_json) feeding aggregation —
    the events.props pattern from SURVEY §2.C.

    Scale: schema-on-read JSON parse is per-row CPU; from_json with an
    explicit schema vectorizes better than repeated get_json_object calls
    when extracting many fields.
    """
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn("k", F.from_json("props", "k INT").getField("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("k").cast("double")), 6).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "fn_hash_family",
    oracle="""
    SELECT c_custkey,
           md5(c_name)            AS name_md5,
           sha256(c_name)         AS name_sha256,
           md5(concat(c_name, '|', c_mktsegment)) AS composite_hash
    FROM customer
    WHERE c_custkey <= 100
    """,
    tags=("functions", "hash"),
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2-256 content hashes — the primitives under exact dedup and
    the driver's own value-hash check. (xxhash64 is Spark-internal seeded —
    exercised in the rows-only dedup paths instead.)"""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.md5(F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment"))).alias("composite_hash"),
    )


@register(
    "fn_cast_conversion",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT)          AS price_int,
           CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(o_orderkey AS VARCHAR)                  AS key_str,
           CAST(substring(CAST(o_orderkey AS VARCHAR), 1, 2) AS INT) AS key_prefix,
           CAST(o_totalprice > 200000 AS INT)           AS is_big
    FROM orders
    WHERE o_orderkey <= 400
    """,
    tags=("functions", "cast"),
)
def fn_cast_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across numeric/string/decimal/boolean domains."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        # decimal exercised mid-expression; emitted as double because decimal
        # stringification differs across engines ('1.10' vs '1.1')
        F.round("o_totalprice", 2).cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.substring(F.col("o_orderkey").cast("string"), 1, 2).cast("int").alias("key_prefix"),
        (F.col("o_totalprice") > 200000).cast("int").alias("is_big"),
    )
