"""Text-analysis operators: token statistics, quality scoring, n-gram
language ID, document fingerprinting, token frequency.

All pure built-in-function pipelines (split/explode/regexp/array ops) — the
hot path stays in whole-stage codegen; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, load_parallel, register

# tiny per-language marker lists for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


@register(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(*)                                        AS n_docs,
           round(avg(len(string_split(text, ' '))), 6)     AS avg_tokens,
           round(avg(n_chars), 6)                          AS avg_chars,
           max(len(string_split(text, ' ')))               AS max_tokens,
           round(avg(CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))), 6) AS avg_token_len
    FROM documents
    GROUP BY lang
    """,
    tags=("llm", "text", "bench"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + per-language corpus statistics."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(n_tok), 6).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.max(n_tok).alias("max_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double") / n_tok), 6).alias("avg_token_len"),
    )


@register(
    "text_bpe_ish_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                            AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_ish_tokens,
           CAST(ceil(n_chars / 4.0) AS BIGINT)                     AS byte_estimate
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("llm", "text"),
)
def text_bpe_ish_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex (letter runs /
    digit runs / single punctuation — the GPT-2 pre-tokenizer shape), and the
    chars/4 byte heuristic."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0))).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("byte_estimate"),
    )


def _marker_case_sql() -> str:
    score = lambda lang: (  # noqa: E731
        f"len(list_intersect(toks, {LANG_MARKERS[lang]!r}))".replace("'", "'")
    )
    scores = ", ".join(f"len(list_intersect(toks, {LANG_MARKERS[l]!r}))" for l in LANG_MARKERS)
    return scores


@register(
    "text_lang_id_markers",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
             {", ".join(f"len(list_intersect(toks, {LANG_MARKERS[l]!r})) AS s_{l}" for l in LANG_MARKERS)}
      FROM (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents)
    ),
    predicted AS (
      SELECT doc_id, actual_lang,
             CASE {" ".join(f"WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = s_{l} AND s_{l} > 0 THEN '{l}'" for l in LANG_MARKERS)}
                  ELSE 'unknown' END AS predicted_lang
      FROM scored
    )
    SELECT actual_lang, predicted_lang, count(*) AS n
    FROM predicted GROUP BY actual_lang, predicted_lang
    """,
    tags=("llm", "text", "langid"),
)
def text_lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with a confusion-matrix output.

    CASE evaluates in declaration order on ties, so both engines pick the
    same winner deterministically (en > es > fr > de > zh priority).

    Scale: marker lists are literal arrays compiled into the plan — a
    map-only scoring pass, then a tiny groupBy.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in LANG_MARKERS[l]]))).alias(f"s_{l}")
            for l in LANG_MARKERS
        ],
    )
    best = F.greatest(*[F.col(f"s_{l}") for l in LANG_MARKERS])
    pred = F.lit("unknown")
    # build the CASE in reverse so earlier langs win ties (same as SQL order)
    for l in reversed(list(LANG_MARKERS)):
        pred = F.when((best == F.col(f"s_{l}")) & (F.col(f"s_{l}") > 0), F.lit(l)).otherwise(pred)
    return (
        scored.withColumn("predicted_lang", pred)
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_quality_score",
    oracle="""
    WITH q AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             n_chars,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 ['the','a','of','and','to','in','is','it','on','for'])) AS n_stop,
             len(list_filter(string_split(text, ' '), t -> length(t) >= 8)) AS n_long
      FROM documents
    )
    SELECT doc_id,
           round(
             least(1.0, n_tokens / 200.0) * 0.4
             + least(1.0, n_stop / 5.0) * 0.3
             + (1.0 - least(1.0, CAST(n_long AS DOUBLE) / n_tokens)) * 0.3
           , 6) AS quality,
           n_tokens, n_stop
    FROM q
    ORDER BY quality DESC, doc_id ASC
    LIMIT 25
    """,
    tags=("llm", "text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score: length saturation + stopword
    presence + long-token penalty (the C4/Gopher-style filter family),
    top-25 deterministic.

    Scale: map-only scoring, TakeOrderedAndProject for the top-k; a real
    pipeline filters on the score instead (still map-only).
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])))
    n_long = F.size(F.filter(toks, lambda t: F.length(t) >= 8))
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / 200.0) * 0.4
        + F.least(F.lit(1.0), n_stop / 5.0) * 0.3
        + (1.0 - F.least(F.lit(1.0), n_long.cast("double") / n_tokens)) * 0.3,
        6,
    )
    return (
        d.select("doc_id", quality.alias("quality"), n_tokens.alias("n_tokens"), n_stop.alias("n_stop"))
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .limit(25)
    )


@register(
    "text_fingerprint_bag",
    oracle="""
    SELECT fp, count(*) AS n_docs, min(doc_id) AS first_doc
    FROM (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
          FROM documents)
    GROUP BY fp
    HAVING count(*) > 1
    """,
    tags=("llm", "text", "fingerprint"),
)
def text_fingerprint_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words fingerprint (md5 of sorted distinct tokens): catches
    docs that are word-permutations of each other — a cheaper, stricter
    near-dup signal than MinHash, same groupBy-on-hash scaling."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " "))
    return (
        d.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "text_token_frequency",
    oracle="""
    SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token ASC
    LIMIT 20
    """,
    tags=("llm", "text"),
)
def text_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency + document frequency, top 20.

    Scale: explode multiplies rows map-side; the groupBy(token) partial agg
    collapses before shuffle. Token-skew ("the") is exactly what partial
    aggregation absorbs — each partition ships one row per hot token.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "text_gopher_quality_rules",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_words,
             list_avg(list_transform(string_split(text, ' '), t -> CAST(length(t) AS DOUBLE))) AS mean_wlen,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS frac_distinct
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_words BETWEEN 10 AND 10000
                          AND mean_wlen BETWEEN 2 AND 12
                          AND frac_distinct >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           round(avg(frac_distinct), 6) AS avg_frac_distinct,
           round(avg(mean_wlen), 6)     AS avg_mean_wlen
    FROM per_doc
    GROUP BY source
    """,
    tags=("llm", "text", "quality"),
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (the filter battery every
    large-scale pretraining corpus pass applies): word-count bounds, mean
    word length bounds, and a repetition bound expressed as the distinct-token
    fraction (1 - this is the repeated-token ratio). Returns per-source pass
    counts and the two continuous signals.

    Scale: all three signals are per-row array expressions over the token
    split — map-side, whole-stage codegen, no UDF; the only shuffle is the
    final tiny per-source agg. At 100 TB this runs at scan speed.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks)
    mean_wlen = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n_words
    frac_distinct = F.size(F.array_distinct(toks)).cast("double") / n_words
    per_doc = d.select(
        "source",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        frac_distinct.alias("frac_distinct"),
    )
    passes = (
        F.col("n_words").between(10, 10000)
        & F.col("mean_wlen").between(2, 12)
        & (F.col("frac_distinct") >= 0.1)
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(passes.cast("long")).alias("n_pass"),
        F.round(F.avg("frac_distinct"), 6).alias("avg_frac_distinct"),
        F.round(F.avg("mean_wlen"), 6).alias("avg_mean_wlen"),
    )


@register(
    "llm_corpus_pipeline",
    oracle="""
    WITH quality AS (
      SELECT doc_id, text, lang, source
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 10 AND 10000
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) >= 0.1
    ),
    exact AS (
      SELECT h, lang, min(doc_id) AS keep_id
      FROM (SELECT doc_id, lang, md5(text) AS h FROM quality)
      GROUP BY h, lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs_in,
           CAST((SELECT count(*) FROM quality) AS BIGINT) AS n_after_quality
    FROM exact
    GROUP BY lang
    """,
    tags=("llm", "pipeline", "bench"),
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus pass a user of this engine actually
    runs: quality-rule filter -> exact dedup (md5 groupBy, keep lowest id)
    -> per-language survivor counts with stage attrition. The corpus is
    scanned ONCE: instead of filtering (which would need separate eager
    counts for the attrition columns, i.e. extra full scans), the quality
    gate conditionally NULLs the dedup hash. One groupBy(h, lang) then
    carries all three stage metrics — NULL-hash groups are the quality
    rejects, non-NULL groups are the dedup survivors — and the per-lang /
    global rollups aggregate that already-tiny grouped output, sharing its
    shuffle via ReuseExchange rather than rereading documents.

    Scale: stage attrition is the operating metric of a 100 TB corpus
    build (how many docs survived each gate); at 100 TB the difference
    between this shape and per-stage .count() calls is two extra full
    corpus scans per run. Only (hash, lang) shuffles; text never moves.
    """
    # plain load (r17; was load_parallel): the per-row work here is one
    # split + md5 — too cheap to amortize a full-corpus repartition
    # shuffle, which interleaved A/B measured as a pure loss (best-of-4
    # 0.83-1.10 s with the 32-way repartition vs 0.50-0.59 s without,
    # identical output). At 100 TB scan parallelism comes from row-group
    # splits for free; the repartition was never the scale path.
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks)
    frac_distinct = F.size(F.array_distinct(toks)).cast("double") / n_words
    passes = n_words.between(10, 10000) & (frac_distinct >= 0.1)
    # groupBy (hash, lang) rather than hash + min(lang): a string-typed agg
    # buffer forces SortAggregate; grouping on it keeps the dedup a pure
    # HashAggregate (per-language dedup semantics — duplicate texts never
    # cross languages in a sane corpus, and if they did you'd want both).
    groups = (
        d.select("lang", F.when(passes, F.md5("text")).alias("h"))
        .groupBy("h", "lang")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    per_lang = groups.groupBy("lang").agg(
        # count(h) skips NULLs: distinct surviving texts per language
        F.count("h").alias("n_docs_kept"),
        F.sum("n_rows").alias("lang_total"),
        F.sum(F.when(F.col("h").isNotNull(), F.col("n_rows")).otherwise(F.lit(0))).alias(
            "lang_quality"
        ),
    )
    # Global attrition totals via a whole-frame window over the per-lang
    # rollup (a handful of rows — one per language — so the single-partition
    # window is free). This keeps the query ONE linear pipeline with ONE
    # FileScan in the plan, rather than two branches sharing a scan through
    # runtime exchange reuse.
    from pyspark.sql.window import Window

    everything = Window.partitionBy()
    # Languages whose every doc failed the quality gate contribute only a
    # NULL-hash group; they must still feed the global attrition totals
    # (n_docs_in) but emit NO output row — matching the filter-then-dedup
    # contract (and the oracle). The filter sits ABOVE the window (it is not
    # on a partition key, so Catalyst cannot push it below), so totals are
    # computed over all languages before zero-kept rows are dropped.
    return per_lang.select(
        "lang",
        "n_docs_kept",
        F.sum("lang_total").over(everything).alias("n_docs_in"),
        F.sum("lang_quality").over(everything).alias("n_after_quality"),
    ).where(F.col("n_docs_kept") > 0)


@register(
    "text_zipf_fit",
    oracle="""
    WITH freq AS (
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rank
      FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vocab,
           round(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope,
           round(regr_r2(ln(n), ln(rank)), 4) AS fit_r2
    FROM ranked
    """,
    tags=("llm", "text", "statistics"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: slope of log(frequency)
    vs log(rank) by least squares (natural text sits near -1; a synthetic
    or template-heavy corpus deviates — this is a cheap corpus-health
    fingerprint used to spot boilerplate floods and tokenizer mismatches
    before training).

    Plan: one token explode + groupBy (the only corpus-wide shuffle), then
    ``regr_slope``/``regr_r2`` built-in aggregates — JVM-side throughout,
    no UDF, no collect.

    Scale (r6): the vocabulary rank is a TWO-LEVEL bucket-and-stitch, so
    even a 10^7-token web-scale vocab never funnels through one reducer.
    Level 1 partitions by the frequency value itself (the order key's tie
    group): per-frequency counts feed an exclusive running sum over ONE
    ROW PER DISTINCT FREQUENCY (bounded by the count domain — thousands,
    not vocab-sized). Level 2 breaks the giant n=1 tie group by token
    first-character: per-(frequency, prefix) local row_numbers plus
    per-frequency prefix offsets (a window over <= 256 rows per
    frequency). rank = frequency offset + prefix offset + local
    row_number — exact, because (n desc, token asc) ordering decomposes
    as (n) -> (first char) -> (token).
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = freq.withColumn("pfx", F.substring("token", 1, 1))
    w_local = Window.partitionBy("n", "pfx").orderBy(F.col("token").asc())
    local = b.withColumn("rn_local", F.row_number().over(w_local))
    # level 2: prefix offsets WITHIN each frequency (<= charset rows per n)
    pfx_tot = b.groupBy("n", "pfx").agg(F.count(F.lit(1)).alias("pn"))
    w_pfx = (
        Window.partitionBy("n")
        .orderBy(F.col("pfx").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pfx_off = pfx_tot.select(
        "n", "pfx", F.coalesce(F.sum("pn").over(w_pfx), F.lit(0)).alias("p_off")
    )
    # level 1: frequency offsets (one row per DISTINCT count value)
    n_tot = b.groupBy("n").agg(F.count(F.lit(1)).alias("nn"))
    w_n = Window.orderBy(F.col("n").desc()).rowsBetween(Window.unboundedPreceding, -1)
    n_off = n_tot.select(
        "n", F.coalesce(F.sum("nn").over(w_n), F.lit(0)).alias("f_off")
    )
    ranked = (
        local.join(F.broadcast(pfx_off), ["n", "pfx"])
        .join(F.broadcast(n_off), "n")
        .withColumn("rank", F.col("f_off") + F.col("p_off") + F.col("rn_local"))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.round(F.regr_slope(F.log("n"), F.log("rank")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("n"), F.log("rank")), 4).alias("fit_r2"),
    )


@register(
    "text_length_histogram",
    oracle="""
    SELECT CAST(floor(log2(len(string_split(text, ' ')))) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT)                AS n_docs,
           CAST(min(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
           CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY 1
    """,
    tags=("llm", "text", "statistics"),
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram — the corpus-shape
    fingerprint reviewed before packing/truncation decisions (a spike in a
    low bucket means fragments; a fat tail means concatenation artifacts).
    Map-side bucketing, one tiny groupBy.
    """
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    return (
        d.select(F.floor(F.log2(n)).cast("long").alias("log2_bucket"), n.alias("n"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n").cast("long").alias("min_tokens"),
            F.max("n").cast("long").alias("max_tokens"),
        )
    )
