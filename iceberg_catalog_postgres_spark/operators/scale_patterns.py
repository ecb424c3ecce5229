"""Scale-pattern operators: techniques that exist purely for 100 TB
behavior, each proven result-identical to its naive form by the oracle.

- Salted aggregation (skew mitigation) — same result as plain groupBy.
- Two-phase distinct (pre-aggregate before the wide distinct).
- Multi-resolution time rollup (hour+day in ONE input pass).
- TF-IDF (explode + doc-frequency join, the classic two-shuffle shape).
- Rolling-hash document fingerprint (order-sensitive fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, register

SALT_BUCKETS = 8


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("scale", "skew"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation: groupBy(key, salt) -> groupBy(key).

    The oracle is the PLAIN groupBy — proving salting is semantically free.
    Scale: when one key dominates (a viral event_type at 100 TB), the plain
    plan funnels that key's rows through one reducer; salting spreads each
    key over SALT_BUCKETS reducers in stage 1, and stage 2 merges only
    SALT_BUCKETS pre-aggregated rows per key. (For count/sum this is what
    partial aggregation already does; salting matters for aggregates whose
    partial state is heavy — collect_list, exact distinct — and for skewed
    JOIN keys, where AQE skew-split is the automatic variant.)
    """
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"), F.round(F.sum("pv"), 4).alias("total_value")
    )


@register(
    "twophase_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tags=("scale", "distinct"),
)
def twophase_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual two-phase exact distinct: dedupe (key, user) pairs first, then
    count — the rewrite Catalyst performs for COUNT(DISTINCT); spelled out
    so the shape is explicit and reusable for multi-column variants the
    optimizer can't always decompose.

    Scale: the first distinct shuffles (type, user) pairs with map-side
    dedup; the count then shuffles only |distinct| rows. Never collect a
    distinct set into one task.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "rollup_time_multires",
    oracle="""
    SELECT resolution, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           n_events, round(total_value, 4) AS total_value
    FROM (
      SELECT 'hour' AS resolution, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             count(*) AS n_events, sum(value) AS total_value
      FROM events GROUP BY 2
      UNION ALL
      SELECT 'day', time_bucket(INTERVAL '1 day', ts), count(*), sum(value)
      FROM events GROUP BY 2
    )
    """,
    tags=("scale", "rollup", "timeseries"),
)
def rollup_time_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly AND daily aggregates
    from ONE pass over the input, via an exploded (resolution, bucket) key.

    Scale: the naive form scans the fact table once per resolution; this
    shape explodes each row into its R resolution buckets (map-side) and
    aggregates once — input I/O is 1x instead of Rx, shuffle stays
    proportional to the number of (resolution, bucket) groups. The same
    pattern extends to week/month and to continuous-aggregate maintenance.
    """
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        F.explode(
            F.array(
                F.struct(F.lit("hour").alias("resolution"), F.date_trunc("hour", "ts").alias("bucket")),
                F.struct(F.lit("day").alias("resolution"), F.date_trunc("day", "ts").alias("bucket")),
            )
        ).alias("rk"),
        "value",
    )
    return (
        keyed.groupBy("rk.resolution", "rk.bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "resolution",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE tf.doc_id < 10
    ORDER BY tf.doc_id ASC, tfidf DESC, tf.token ASC
    """,
    tags=("scale", "text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency per doc x inverse document frequency.

    Scale: two keyed shuffles (tf on (doc, token), df on token) + a join on
    token; df is orders of magnitude smaller than tf (vocabulary vs corpus)
    so AQE broadcasts it. The n_docs scalar is a 1-row cross join. The
    WHERE doc_id < 10 output filter happens AFTER scoring because idf needs
    the full corpus — a correctness subtlety the plan must respect.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df_, "token")
        .join(F.broadcast(n))
        .filter(F.col("doc_id") < 10)
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.col("doc_id").asc(), F.col("tfidf").desc(), F.col("token").asc())
    )


@register(
    "text_rolling_hash_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_transform(string_split(text, ' '),
                            t -> (length(t) * 7 + ascii(t)) % 1000003),
             (a, b) -> (a * 31 + b) % 1000003
           ) AS fingerprint
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("scale", "text", "fingerprint"),
)
def text_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling hash over the token stream (polynomial hash
    mod prime) — unlike the bag fingerprint, permutations produce different
    fingerprints. Pure fold (F.reduce / list_reduce), map-side only.

    Scale: one pass, no shuffle; the mod keeps values bounded so the fold
    never overflows — the streaming-friendly fingerprint for incremental
    dedup (extendable to rolling windows for chunk-level dedup).
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok_h = F.transform(
        F.split("text", " "), lambda t: (F.length(t) * 7 + F.ascii(t)) % 1000003
    )
    fp = F.aggregate(
        tok_h,
        F.lit(0).cast("int"),
        lambda acc, x: (acc * 31 + x) % 1000003,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


def _z_terms_sql(px: str, sx: str, bits: int = 11) -> str:
    """DuckDB SQL expression interleaving the low ``bits`` of two ints."""
    terms = []
    for i in range(bits):
        terms.append(f"((({px} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({sx} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _z_value_n(cols: list, bits: int = 11):
    """Morton z-value over N columns: round-robin bit-interleave (pure JVM
    bit ops, whole-stage-codegen'd). ``n * bits`` must fit a long; callers
    shrink ``bits`` as dimensions grow (r9 N-column generalization)."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), n * i + j)
    return z


def _z_value(x, y, bits: int = 11):
    """Morton z-value: bit-interleave of two columns (pure JVM bit ops)."""
    return _z_value_n([x, y], bits)


@register(
    "layout_zorder_pruning",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_partkey, l_suppkey,
             {_z_terms_sql('l_partkey', 'l_suppkey')} AS z
      FROM lineitem
    ), both_layouts AS (
      SELECT 'naive' AS layout, l_orderkey % 64 AS bucket, l_partkey, l_suppkey FROM li
      UNION ALL
      SELECT 'zorder' AS layout, z >> 12 AS bucket, l_partkey, l_suppkey FROM li
    ), stats AS (
      SELECT layout, bucket,
             min(l_partkey) AS min_p, max(l_partkey) AS max_p,
             min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
      FROM both_layouts GROUP BY layout, bucket
    )
    SELECT layout,
           count(*) AS n_buckets,
           CAST(sum(CASE WHEN NOT (max_p < 256 OR min_p > 511 OR max_s < 32 OR min_s > 47)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
           round(CAST(sum(CASE WHEN NOT (max_p < 256 OR min_p > 511 OR max_s < 32 OR min_s > 47)
                              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS frac_scanned
    FROM stats GROUP BY layout
    """,
    tags=("scale", "layout", "zorder"),
)
def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout vs insertion order: measured
    min/max-pruning benefit for a 2-D box predicate.

    Each bucket models one data file; per-bucket min/max mirror the per-file
    column stats the catalog stores in its manifests (the same stats
    delete_where_cow/pruned scans consult). Under insertion order every file
    spans the whole (partkey, suppkey) domain, so a 2-D box predicate prunes
    nothing; clustering files by the bit-interleaved z-value makes file stat
    ranges tight in BOTH dimensions, and the same box touches only the files
    whose z-range intersects it.

    Scale: this is the layout decision that dominates selective-scan cost at
    100 TB — a `rewrite sorted by z` is one repartition-and-rewrite pass
    (cheap, incremental per partition), after which every 2-D-selective
    query reads a small fraction of files via metadata alone. The z-value
    itself is ~44 JVM bit-ops per row, whole-stage-codegen'd, no shuffle
    beyond the per-layout stats rollup.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_partkey").cast("long").alias("l_partkey"),
        F.col("l_suppkey").cast("long").alias("l_suppkey"),
    )
    z = _z_value(F.col("l_partkey"), F.col("l_suppkey"))
    naive = li.select(
        F.lit("naive").alias("layout"), (F.col("l_orderkey") % 64).alias("bucket"), "l_partkey", "l_suppkey"
    )
    zord = li.select(
        F.lit("zorder").alias("layout"), F.shiftright(z, 12).alias("bucket"), "l_partkey", "l_suppkey"
    )
    stats = (
        naive.unionByName(zord)
        .groupBy("layout", "bucket")
        .agg(
            F.min("l_partkey").alias("min_p"),
            F.max("l_partkey").alias("max_p"),
            F.min("l_suppkey").alias("min_s"),
            F.max("l_suppkey").alias("max_s"),
        )
    )
    overlap = ~(
        (F.col("max_p") < 256) | (F.col("min_p") > 511) | (F.col("max_s") < 32) | (F.col("min_s") > 47)
    )
    return stats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(overlap.cast("long")).alias("n_scanned"),
        F.round(F.sum(overlap.cast("long")).cast("double") / F.count(F.lit(1)), 6).alias("frac_scanned"),
    )


@register(
    "skew_salted_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("scale", "skew", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted big-big join: the fact side adds a salt bucket from its join
    key, the dim side is replicated once per salt value, and the join runs on
    (key, salt) — splitting any hot key across N reducers.

    The oracle is the PLAIN join: salting must be result-invariant (it only
    changes partitioning). The salt uses xxhash64 (Spark-side only, no
    cross-engine constraint for exactly this reason).

    Scale: this is the manual fix when one key holds a double-digit share of
    a 100 TB fact table and AQE skew-split (which handles moderate skew
    automatically) isn't enough; replication factor N trades dim-side volume
    (N×) for an N-way split of the hottest reducer.
    """
    n_salt = 8
    fact = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(n_salt))
    )
    dim = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        .withColumn("salt", F.col("salt").cast("long"))
    )
    return (
        fact.join(dim, (fact.l_orderkey == dim.o_orderkey) & (fact.salt == dim.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )


@register(
    "agg_hll_partitioned_union",
    oracle="""
    SELECT lang AS scope, true AS within_tol FROM documents GROUP BY lang
    UNION ALL
    SELECT 'ALL' AS scope, true AS within_tol
    ORDER BY scope
    """,
    tags=("scale", "sketch", "agg"),
)
def agg_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches: per-language DataSketches HLL of document
    hashes, then a UNION of the per-language sketches estimates the global
    distinct count — without re-touching the data. Emitted as tolerance
    booleans (|estimate - exact| / exact <= 5%) so DuckDB can certify the
    contract (the sketch bytes themselves are engine-specific).

    Scale: sketch mergeability is the whole point — at 100 TB, per-partition
    sketches are built map-side (fixed bytes per partition), unioned in a
    tiny reduce, and can be stored per-snapshot and merged incrementally on
    every append instead of rescanning history for exact distinct counts.
    """
    d = load(spark, sf_dir, "documents").select("lang", F.md5("text").alias("h"))
    per = d.groupBy("lang").agg(
        F.hll_sketch_agg("h").alias("sk"),
        F.countDistinct("h").alias("exact"),
    )
    per_lang = per.select(
        F.col("lang").alias("scope"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact")) / F.col("exact") <= 0.05
        ).alias("within_tol"),
    )
    glob = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(d.agg(F.countDistinct("h").alias("exact"))))
        .select(
            F.lit("ALL").alias("scope"),
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("exact")) / F.col("exact") <= 0.05
            ).alias("within_tol"),
        )
    )
    return per_lang.unionByName(glob).orderBy("scope")


def _final_adaptive_metrics(df: DataFrame, node_substr: str) -> list[dict]:
    """SQL metric values from every node of the FINAL adaptive plan whose
    name contains ``node_substr`` (py4j walk, incl. QueryStage subtrees) —
    the same walk tests/test_aqe_skew.py certifies with."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()
    found: list[dict] = []

    def walk(node):
        if node_substr in node.nodeName():
            metrics = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[kv._1()] = kv._2().value()
            found.append(metrics)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if node.nodeName().endswith("QueryStage"):
            walk(node.plan())

    walk(plan)
    return found


_AQE_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local data is MBs, not the prod-default 256MB threshold — scale the
    # knobs down so the same code path fires (at a real 1000-executor
    # deployment these stay at defaults)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
}


@register(
    "skew_aqe_auto_split",
    oracle="""
    SELECT CAST(600000 AS BIGINT)   AS n_rows,
           CAST(10100000 AS BIGINT) AS sum_v,
           true AS skew_detected,
           true AS hot_partition_split,
           true AS uniform_control_clean
    """,
    tags=("scale", "skew", "aqe"),
)
def skew_aqe_auto_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE automatic skew-join split under the oracle gate (r9, VERDICT
    item 6 — promoting tests/test_aqe_skew.py's certification to a driver
    row): a synthetic hot-key join (key 0 carries ~83% of 600k rows) runs
    as a sort-merge join under lowered skew thresholds, and the FINAL
    adaptive plan's AQEShuffleRead metrics must report >=1 skewed
    partition split into >1 read — with the exact aggregate unchanged. A
    uniform join under the SAME knobs must report zero skew handling (the
    control proves the metric measures the split, not the conf).

    Scale: this automatic path — not the manual salted join
    (skew_salted_join) — is what keeps a 100x-organic-skew join's
    straggler task from running 400x longer than the median on a real
    cluster, where the thresholds stay at their 256MB defaults."""
    saved: dict[str, str | None] = {}
    for k, v in _AQE_SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        hot, spread, n_keys = 500_000, 100_000, 100
        left = spark.range(hot + spread).select(
            F.when(F.col("id") < hot, F.lit(0))
            .otherwise((F.col("id") % n_keys) + 1)
            .alias("k"),
            # ~80-byte payload so the hot partition clears the lowered 1 MB
            # skew threshold
            F.concat(F.lit("x" * 72), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(n_keys + 1).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        # the payload term keeps the column alive through the shuffle —
        # without it Catalyst prunes payload pre-exchange and the hot
        # partition never clears the byte threshold
        agg = left.join(right, "k").agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sv"),
            F.sum(F.length("payload")).alias("sp"),
        )
        [row] = agg.collect()
        reads = _final_adaptive_metrics(agg, "AQEShuffleRead")
        skewed_parts = sum(int(m.get("numSkewedPartitions", 0)) for m in reads)
        skewed_splits = sum(int(m.get("numSkewedSplits", 0)) for m in reads)

        # control: uniform keys, same knobs — zero skew handling
        u_left = spark.range(200_000).select(
            (F.col("id") % 64).alias("k"),
            F.concat(F.lit("x" * 72), F.col("id").cast("string")).alias("payload"),
        )
        u_agg = u_left.join(right.limit(64), "k").agg(F.count("*").alias("n"))
        u_agg.collect()
        u_reads = _final_adaptive_metrics(u_agg, "AQEShuffleRead")
        u_skewed = sum(int(m.get("numSkewedPartitions", 0)) for m in u_reads)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    return spark.createDataFrame(
        [
            (
                int(row["n"]),
                int(row["sv"]),
                bool(skewed_parts >= 1),
                bool(skewed_splits > 1),
                bool(u_skewed == 0),
            )
        ],
        "n_rows long, sum_v long, skew_detected boolean,"
        " hot_partition_split boolean, uniform_control_clean boolean",
    )


@register(
    "layout_aggregate_pushdown",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
           true AS aggregation_pushed
    FROM lineitem
    """,
    tags=("scale", "layout", "pushdown"),
)
def layout_aggregate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet AGGREGATE pushdown (r9): COUNT/MIN/MAX answered from footer
    statistics without materializing a single data row. Under the DSv2
    parquet path (``useV1SourceList`` excludes parquet) with
    ``spark.sql.parquet.aggregatePushdown`` on, the scan node itself
    reports ``PushedAggregation: [COUNT(*), MIN(...), MAX(...)]`` — the
    query certifies that marker from the EXECUTED plan and returns the
    aggregates, which must equal the oracle's full scan.

    Scale: at 100 TB this is the difference between reading row-group
    FOOTERS (KBs per file) and scanning the table — the same reason the
    catalog's metadata-only counts exist, here as the engine-native path
    for raw parquet. Confs are set and restored around the query; at a
    real deployment they are session defaults."""
    import re as _re

    saved = {}
    for k, v in {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        df = load(spark, sf_dir, "lineitem")
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
        )
        [row] = agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        m = _re.search(r"PushedAggregation: \[([^\]]*)\]", plan)
        pushed = bool(m and "COUNT" in m.group(1) and "MIN" in m.group(1))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        [(row["n_rows"], row["min_qty"], row["max_qty"], row["min_price"],
          row["max_price"], pushed)],
        "n_rows long, min_qty double, max_qty double, min_price double,"
        " max_price double, aggregation_pushed boolean",
    )
