"""UDF / UDAF / UDTF surface (SURVEY §2.C): scalar Pandas UDF, grouped-agg
Pandas UDF, applyInPandas grouped-map, Python UDTF, and SQL registration.

These exist to prove the extension surface. Every one of them is the SLOW
path relative to the built-in functions used everywhere else in this repo —
each docstring says what the built-in replacement is. Production rule: a UDF
must earn its Python round-trip (a model call, a codec, real per-row logic
Catalyst can't express).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from iceberg_catalog_postgres_spark.registry import load, register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price
    FROM lineitem WHERE l_orderkey <= 200
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow-vectorized): net price computation.

    Deliberately expressible as a built-in expression (see the oracle) so
    the UDF's correctness is checkable; in a real pipeline this slot holds
    logic Catalyst can't run (tokenizers, custom codecs). Arrow batches mean
    one Python call per ~10k rows, not per row.
    """

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        # no rounding inside the UDF: pandas .round is banker's rounding,
        # which diverges from SQL round-half-away on exact .5 boundaries
        return price * (1.0 - discount) * (1.0 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 6: the product of three 2-dp factors has <= 6 exact
        # decimals, so 6-dp rounding is the identity and can never land on a
        # half-way boundary (where Spark's BigDecimal-of-shortest-repr and
        # DuckDB's binary rounding disagree). Rounding computed money at
        # FEWER decimals than its exact precision is the unstable pattern.
        F.round(net_price("l_extendedprice", "l_discount", "l_tax"), 6).alias("net_price"),
    )


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice * o_totalprice) / sum(o_totalprice), 6) AS weighted_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("udf", "pandas", "udaf"),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (the UDAF surface): self-weighted mean.

    Scale caveat: a grouped-agg pandas UDF materializes each group's column
    in one pandas Series — no partial aggregation! Groups must fit in
    executor memory. The oracle shows the decomposed built-in form
    (sum(x*x)/sum(x)) which DOES partial-aggregate; prefer it whenever the
    aggregate is algebraic.
    """

    @pandas_udf("double")
    def weighted_price(price: pd.Series) -> float:
        return float(round((price * price).sum() / price.sum(), 6))

    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(weighted_price("o_totalprice").alias("weighted_price"))


@register(
    "udf_apply_in_pandas_zscore",
    oracle="""
    SELECT user_id, event_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS zscore
    FROM events
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def udf_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user z-score normalization of event
    values — the grouped-transform shape used for per-key model scoring.

    The oracle shows the window-function equivalent (which partial-computes
    and never leaves the JVM); applyInPandas is for when the per-group logic
    is genuinely imperative. Each group becomes one pandas DataFrame —
    same memory caveat as the grouped agg.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "zscore": ((pdf["value"] - pdf["value"].mean()) / sd).round(6),
            }
        )

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(zscore, "user_id long, event_id long, zscore double")


@register(
    "udtf_explode_price_bands",
    oracle="""
    SELECT o_orderkey, band, round(amount, 2) AS amount
    FROM (
      SELECT o_orderkey,
             unnest(['base', 'tax_10', 'tax_20']) AS band,
             unnest([o_totalprice, o_totalprice * 1.1, o_totalprice * 1.2]) AS amount
      FROM orders
      WHERE o_orderkey <= 100
    )
    """,
    tags=("udf", "udtf"),
)
def udtf_explode_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input order -> three (band, amount)
    rows. The built-in equivalent is explode(array(struct(...))) — shown in
    the oracle via unnest; the UDTF form is for generators with real logic
    (parsers, samplers).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, band string, amount double")
    class PriceBands:
        def eval(self, o_orderkey: int, o_totalprice: float):
            yield o_orderkey, "base", o_totalprice
            yield o_orderkey, "tax_10", o_totalprice * 1.1
            yield o_orderkey, "tax_20", o_totalprice * 1.2

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    o.createOrReplaceTempView("udtf_orders_src")
    spark.udtf.register("price_bands", PriceBands)
    out = spark.sql(
        "SELECT b.* FROM udtf_orders_src o, LATERAL price_bands(o.o_orderkey, o.o_totalprice) b"
    )
    return out.select("o_orderkey", "band", F.round("amount", 2).alias("amount"))


@register(
    "udf_sql_registered",
    oracle="""
    SELECT p_partkey, upper(p_brand) || '/' || p_type AS brand_type
    FROM part WHERE p_partkey <= 300
    """,
    tags=("udf", "sql"),
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.udf.register: a Python UDF callable from SQL text.

    This is the row-at-a-time slow path (one Python call PER ROW) — present
    for API completeness; the oracle shows the built-in concat/upper form
    that runs ~100x faster. Never ship this pattern in a hot loop.
    """
    spark.udf.register("brand_type_py", lambda b, t: f"{b.upper()}/{t}", "string")
    load(spark, sf_dir, "part").createOrReplaceTempView("udf_part_src")
    return spark.sql(
        "SELECT p_partkey, brand_type_py(p_brand, p_type) AS brand_type "
        "FROM udf_part_src WHERE p_partkey <= 300"
    )


@register(
    "udf_map_in_arrow_netprice",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) / 10000
             AS net_price
    FROM lineitem WHERE l_orderkey <= 1000
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow_netprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the Arrow-NATIVE batch transform (Spark 3.3+) — Python
    receives pyarrow RecordBatches directly, with no pandas conversion on
    either side. The cheapest possible Python interchange; the right tool
    when the Python side is itself Arrow-computed (pyarrow.compute, polars,
    DuckDB) rather than pandas.

    Completes the Python-interchange family next to pandas-scalar,
    grouped-agg, grouped-map (applyInPandas), mapInPandas (multimodal
    decode), and UDTF. The computation (net price per line item) is
    per-row deterministic, so the DuckDB oracle recomputes it exactly.

    Scale: zero-copy Arrow batches per partition; pyarrow.compute kernels
    are vectorized C++, so the per-batch Python overhead is a constant
    dispatch cost, not per-row work. Still prefer built-in JVM expressions
    (the oracle's form) when they can express the op — this exists for the
    cases they can't.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def net_price(batches):
        for batch in batches:
            ep, disc, tax = (
                batch.column("l_extendedprice"),
                batch.column("l_discount"),
                batch.column("l_tax"),
            )
            # raw product only — rounding happens outside the Arrow stage,
            # as an explicit floor(x*1e4 + 0.5)/1e4 mirrored in the oracle:
            # pyarrow rounds half-to-even, Spark's round() goes through
            # BigDecimal's shortest-decimal repr, and DuckDB rounds the
            # binary value — three half-up definitions that disagree by 1 ulp
            # at knife-edge values (measured on this fixture). The floor
            # form is pure fp64 arithmetic, bit-identical on both engines.
            net = pc.multiply(
                pc.multiply(ep, pc.subtract(pa.scalar(1.0), disc)),
                pc.add(pa.scalar(1.0), tax),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"), net],
                names=["l_orderkey", "l_linenumber", "net_price_raw"],
            )

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
    )
    return li.mapInArrow(
        net_price, "l_orderkey bigint, l_linenumber int, net_price_raw double"
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("net_price_raw") * 10000 + 0.5) / 10000).alias("net_price"),
    )
