"""Corpus-curation operators for LLM training-data pipelines: benchmark
decontamination, sequence packing, domain-mixture sampling, repetition
flagging, and PII redaction plumbing.

Reference anchor: the reference catalog (mod.rs:359-361) delegates all data
processing to "a compute engine like Spark"; these are the curation passes a
training pipeline runs over a catalog-managed document corpus. All hot paths
are built-in JVM expressions (split/transform/slice/regexp) — no Python UDFs.

Cross-engine notes (DuckDB oracle parity):
- Word n-grams are built with ``transform(sequence(...), i -> concat_ws(' ',
  slice(toks, i, n)))`` on the Spark side and list comprehensions over
  1-based inclusive slices on the DuckDB side.
- Deterministic sampling uses a Knuth multiplicative hash over ``doc_id``
  (pure BIGINT arithmetic — exact in both engines). At 100 TB you would use
  ``xxhash64`` of a stable key; the arithmetic hash keeps the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, load_parallel, register

# 3-word shingles: real decontamination uses 8-13-gram collision (GPT-3 /
# PaLM appendices); the fixture vocabulary is ~30 words so 3-grams are the
# smallest n with cross-document collisions worth reporting. The pipeline
# shape (shingle -> distinct -> join eval side -> per-doc rollup) is
# n-independent.
DECON_N = 3
PACK_BUDGET = 512  # tokens per packed training sequence
KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 * phi)
MOD32 = 4294967296


def _shingles(tokens, n: int):
    """Distinct word n-grams of ``tokens`` as an array column (JVM-side)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n))))


@register(
    "decon_ngram_overlap",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+{DECON_N - 1}], ' ')
                                   FOR i IN range(1, len(t) - {DECON_N - 2})])) AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= {DECON_N}
    )
    SELECT a.doc_id,
           count(DISTINCT a.g)      AS n_shingles_hit,
           count(DISTINCT b.doc_id) AS n_eval_docs
    FROM sh a JOIN sh b ON a.g = b.g
    WHERE b.doc_id % 97 = 0 AND a.doc_id % 97 <> 0
    GROUP BY a.doc_id
    """,
    tags=("llm", "curation", "decontamination"),
)
def decon_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing word n-grams
    with a held-out eval set (here: ``doc_id % 97 == 0``).

    Scale: the eval set is small by construction (benchmarks are KBs-MBs, the
    corpus is TBs), so the eval shingle set is **broadcast** and the training
    side is a map-only scan + broadcast-hash-join — the 100 TB corpus never
    shuffles. Shingles are deduped per-doc *before* the join (array_distinct,
    map-side) so the join input is minimal.
    """
    d = load_parallel(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("t")).where(F.size("t") >= DECON_N)
    sh = base.select("doc_id", F.explode(_shingles(F.col("t"), DECON_N)).alias("g"))
    ev = sh.where(F.col("doc_id") % 97 == 0).select(F.col("g"), F.col("doc_id").alias("eval_doc"))
    tr = sh.where(F.col("doc_id") % 97 != 0)
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shingles_hit"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


@register(
    "pack_token_budget",
    oracle=f"""
    WITH x AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ), c AS (
      SELECT lang, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS start
      FROM x
    )
    SELECT lang,
           CAST(start // {PACK_BUDGET} AS BIGINT) AS seq_bin,
           count(*)                        AS n_docs,
           CAST(sum(n_tok) AS BIGINT)      AS sum_tokens,
           min(doc_id)                     AS first_doc,
           max(doc_id)                     AS last_doc
    FROM c GROUP BY lang, start // {PACK_BUDGET}
    """,
    tags=("llm", "curation", "packing"),
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: concatenation-style assignment of docs
    to fixed-budget training sequences (doc straddles a boundary like GPT
    document packing; bin = cumulative start offset div budget).

    Scale: the running sum partitions by ``lang`` so packing parallelizes
    across languages; at 100 TB you would partition by (lang, shard-hash) so
    no single window partition exceeds an executor — packing only needs
    *within-shard* contiguity, not a global order.
    """
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = d.select("lang", "doc_id", n_tok.alias("n_tok")).withColumn(
        "start", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    return (
        c.withColumn("seq_bin", F.expr(f"start div {PACK_BUDGET}"))
        .groupBy("lang", "seq_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "sample_domain_mixture",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang),
    r AS (
      SELECT lang, n_total,
             CAST(min(n_total) OVER () AS DOUBLE) / n_total AS rate
      FROM c
    ), k AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN r USING (lang)
      WHERE CAST((d.doc_id * {KNUTH}) % {MOD32} AS DOUBLE) / {MOD32} < rate
      GROUP BY d.lang
    )
    SELECT r.lang,
           CAST(r.n_total AS BIGINT)           AS n_total,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           round(rate, 6)                      AS rate
    FROM r LEFT JOIN k USING (lang)
    """,
    tags=("llm", "curation", "sampling"),
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: downsample every language to
    the smallest language's volume (balanced mixture) via a reproducible
    per-doc hash fraction — rerunnable, no RNG state.

    Scale: per-lang counts are |langs| rows → the rate table broadcasts; the
    corpus side is a map-only filter (hash-fraction < rate), no shuffle of
    document data. Changing target proportions is a broadcast-table edit.
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    min_n = counts.agg(F.min("n_total").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).withColumn(
        "rate", F.col("min_n").cast("double") / F.col("n_total")
    )
    frac = ((F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD32)).cast("double") / F.lit(MOD32)
    kept = (
        d.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .where(frac < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(F.broadcast(kept), "lang", "left")
        .select(
            "lang",
            F.col("n_total"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round("rate", 6).alias("rate"),
        )
    )


@register(
    "text_repetition_bigrams",
    oracle="""
    SELECT lang,
           round(avg(rep), 6) AS avg_rep,
           round(max(rep), 6) AS max_rep,
           CAST(sum(CASE WHEN rep > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM (
      SELECT lang,
             CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) AS rep
      FROM (
        SELECT lang, [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))] AS bg
        FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 2
      )
    )
    GROUP BY lang
    """,
    tags=("llm", "curation", "quality"),
)
def text_repetition_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style): fraction of duplicated word
    bigrams per doc, rolled up per language with a flag threshold.

    Scale: pure map-side expression work (split/transform/array_distinct in
    whole-stage codegen) + one |langs|-row aggregation — a single scan pass.
    """
    d = load_parallel(spark, sf_dir, "documents")
    t = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size("t") - 1)
    bg = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 2)))
    rep = (F.size("bg") - F.size(F.array_distinct("bg"))).cast("double") / F.size("bg")
    return (
        d.select("lang", t.alias("t"))
        .where(F.size("t") >= 2)
        .select("lang", bg.alias("bg"))
        .select("lang", rep.alias("rep"))
        .groupBy("lang")
        .agg(
            F.round(F.avg("rep"), 6).alias("avg_rep"),
            F.round(F.max("rep"), 6).alias("max_rep"),
            F.sum((F.col("rep") > 0.05).cast("long")).alias("n_flagged"),
        )
    )


@register(
    "pii_redact_contacts",
    oracle=r"""
    WITH msgs AS (
      SELECT 'user' || user_id || '@example.com call +1-555-' ||
             lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') AS contact
      FROM events WHERE event_id < 2000
    ), red AS (
      SELECT contact,
             len(regexp_extract_all(contact, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+')) AS n_emails,
             len(regexp_extract_all(contact, '\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
             regexp_replace(regexp_replace(contact, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+',
                                           '[EMAIL]', 'g'),
                            '\+1-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted
      FROM msgs
    )
    SELECT count(*)                          AS n_msgs,
           CAST(sum(n_emails) AS BIGINT)     AS n_emails,
           CAST(sum(n_phones) AS BIGINT)     AS n_phones,
           CAST(sum(CASE WHEN NOT regexp_matches(redacted, '[0-9]')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_digit_free
    FROM red
    """,
    tags=("llm", "curation", "pii"),
)
def pii_redact_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction plumbing: regex-extract + regex-replace of email/phone
    patterns, with a digit-free post-condition audit.

    The document fixture contains no real PII, so contact strings are
    synthesized deterministically from event ids — the op under test is the
    redaction pipeline (extract counts, in-place replace, audit), which is
    what runs over a real corpus. All regexp work is JVM-side codegen.

    Scale: map-only; no shuffle except the final 1-row rollup.
    """
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    contact = F.concat(
        F.lit("user"),
        F.col("user_id").cast("string"),
        F.lit("@example.com call +1-555-"),
        F.lpad((F.col("event_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
    phone_re = r"\+1-[0-9]{3}-[0-9]{4}"
    m = e.select(contact.alias("contact"))
    red = m.select(
        F.size(F.regexp_extract_all(F.col("contact"), F.lit(email_re), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("contact"), F.lit(phone_re), F.lit(0))).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("contact"), email_re, "[EMAIL]"), phone_re, "[PHONE]"
        ).alias("redacted"),
    )
    return red.agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.sum((~F.col("redacted").rlike("[0-9]")).cast("long")).alias("n_digit_free"),
    )


@register(
    "split_train_val_test",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN frac < 0.8 THEN 'train'
                  WHEN frac < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT lang,
               CAST((doc_id * {KNUTH}) % {MOD32} AS DOUBLE) / {MOD32} AS frac
        FROM documents
      )
    )
    SELECT lang, split, count(*) AS n_docs
    FROM assigned GROUP BY lang, split
    """,
    tags=("llm", "curation", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: each doc's split is a
    pure function of its id (Knuth-hash fraction), so the split is stable
    across reruns, machines, and engine versions — no RNG state, no seed
    file; membership is re-derivable for any doc at any time. Per-language
    counts verify the stratification.

    Scale: map-only (one expression per row, no shuffle except the count
    rollup); at 100 TB the same predicate pushes into any engine that can
    evaluate integer arithmetic, and the split never needs to be stored —
    it IS the hash.
    """
    d = load(spark, sf_dir, "documents")
    frac = ((F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD32)).cast("double") / F.lit(MOD32)
    split = (
        F.when(frac < 0.8, F.lit("train")).when(frac < 0.9, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_unigram_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ), total AS (SELECT sum(n) AS t FROM freq)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(-log2(CAST(n AS DOUBLE) / (SELECT t FROM total))), 6) AS avg_surprisal
    FROM toks JOIN freq USING (tok)
    WHERE doc_id < 150
    GROUP BY doc_id
    """,
    tags=("llm", "curation", "quality"),
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal scoring: corpus token frequencies become a
    unigram language model; each document scores as the mean -log2
    probability of its tokens — the cheap, engine-native twin of the
    perplexity filtering CCNet-style pipelines run with a KenLM model
    (high surprisal = gibberish/rare-token soup, low = boilerplate).

    Scale: one token-frequency aggregation (keyed shuffle with map-side
    partials), then the frequency table BROADCASTS (a 100k-row vocab with an
    OOV floor at production scale) and scoring is a map-only join + per-doc
    average — the corpus text streams through once per pass.
    """
    d = load_parallel(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t")
    return (
        toks.where(F.col("doc_id") < 150)
        .join(F.broadcast(freq.crossJoin(total)), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log2(p)), 6).alias("avg_surprisal"),
        )
    )


@register(
    "sample_cap_per_stratum",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ),
    kept AS (SELECT source, doc_id FROM ranked WHERE rn <= 30),
    t AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source)
    SELECT t.source,
           CAST(t.n_total AS BIGINT) AS n_total,
           CAST(count(kept.doc_id) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(kept.doc_id), 0) AS BIGINT) AS kept_id_sum
    FROM t LEFT JOIN kept ON t.source = kept.source
    GROUP BY t.source, t.n_total
    """,
    tags=("llm", "curation", "sampling"),
)
def sample_cap_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum cap sampling: keep at most K=30 documents per source,
    chosen by a deterministic md5 shuffle — the "cap documents per domain"
    step that stops a handful of giant domains from dominating a training
    mixture. kept_id_sum certifies WHICH docs were kept, not just how many.

    Scale: one shuffle on the stratum key; rank-limit (row_number <= K)
    prunes within each partition, so no stratum ever materializes more than
    its own rows and the output is reproducible across reruns/engines (md5
    order is engine-independent, unlike RNG sampling).
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_id_sum"),
        )
    )
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept, "source", "left").select(
        "source",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_id_sum", F.lit(0)).cast("long").alias("kept_id_sum"),
    )


@register(
    "sample_temperature_mixture",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang),
    s AS (SELECT sum(n_total) AS n, sum(sqrt(n_total)) AS sw FROM c),
    t AS (
      SELECT c.lang, c.n_total,
             CAST(least(
               c.n_total,
               CAST(floor((s.n // 2) * sqrt(c.n_total) / s.sw + 0.5) AS BIGINT)
             ) AS BIGINT) AS target
      FROM c, s
    ),
    rk AS (
      SELECT d.lang, d.doc_id,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY (d.doc_id * {KNUTH}) % {MOD32}, d.doc_id
             ) AS rk
      FROM documents d
    ),
    k AS (
      SELECT rk.lang, count(*) AS n_kept, sum(rk.doc_id) AS sum_kept
      FROM rk JOIN t USING (lang) WHERE rk.rk <= t.target GROUP BY rk.lang
    )
    SELECT t.lang, CAST(t.n_total AS BIGINT) AS n_total, t.target,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.sum_kept, 0) AS BIGINT) AS sum_kept
    FROM t LEFT JOIN k USING (lang) ORDER BY lang
    """,
    tags=("llm", "curation", "sampling", "temperature"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-mixture resampling — the standard multilingual-
    pretraining rebalancer (mT5/XLM-R style): sample language ``s`` with
    probability ∝ ``n_s^alpha`` so high-resource languages are dampened
    without flattening to the minimum (``sample_domain_mixture``'s
    balanced special case is alpha=0). ``alpha = 0.5`` here BY DESIGN:
    ``sqrt`` is IEEE-exactly-rounded, so Spark and the oracle compute
    bit-identical targets, while a general ``pow`` differs across libms in
    the last ulp — at a rounding boundary that would flip a whole count.
    Budget is half the corpus; per-language targets cap at availability
    (sampling without replacement); selection is the deterministic Knuth-
    hash rank within language, so the sample is reproducible and
    value-pinned (sum of kept doc_ids), not just counted.

    Scale: the target table is |langs| rows (broadcast); ranking is one
    window per language partition — at 100 TB shard the rank key to
    (lang, hash-bucket) and take per-bucket quotas so no single partition
    exceeds an executor, exactly like the packing note."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    tot = counts.agg(
        F.sum("n_total").alias("n"),
        F.sum(F.sqrt(F.col("n_total").cast("double"))).alias("sw"),
    )
    targets = counts.crossJoin(F.broadcast(tot)).withColumn(
        "target",
        F.least(
            F.col("n_total"),
            F.floor(
                (F.expr("n div 2")) * F.sqrt(F.col("n_total").cast("double"))
                / F.col("sw")
                + 0.5
            ),
        ).cast("long"),
    )
    frac = (F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD32)
    ranked = d.select("lang", "doc_id").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(frac.asc(), F.col("doc_id").asc())
        ),
    )
    kept = (
        ranked.join(F.broadcast(targets.select("lang", "target")), "lang")
        .where(F.col("rk") <= F.col("target"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("sum_kept"),
        )
    )
    return (
        targets.join(F.broadcast(kept), "lang", "left")
        .select(
            "lang",
            F.col("n_total").cast("long").alias("n_total"),
            "target",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("sum_kept"), F.lit(0)).cast("long").alias("sum_kept"),
        )
        .orderBy("lang")
    )


CHUNK_SIZE = 200  # chars per chunk (a RAG/pretraining chunker's window)
CHUNK_STRIDE = 150  # window step => 50-char overlap between neighbors


@register(
    "chunk_sliding_window",
    oracle=f"""
    WITH g AS (
      SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, 4095) AS t(i)
    )
    SELECT d.doc_id, g.i AS chunk_idx,
           g.i * {CHUNK_STRIDE} AS chunk_start,
           length(substr(d.text, CAST(g.i * {CHUNK_STRIDE} + 1 AS INT),
                         {CHUNK_SIZE})) AS chunk_len,
           md5(substr(d.text, CAST(g.i * {CHUNK_STRIDE} + 1 AS INT),
                      {CHUNK_SIZE})) AS chunk_md5
    FROM documents d JOIN g
      ON g.i <= CAST(ceil(greatest(length(d.text) - {CHUNK_SIZE}, 0)
                          / {CHUNK_STRIDE}.0) AS BIGINT)
    WHERE d.text IS NOT NULL
    ORDER BY d.doc_id, chunk_idx
    """,
    tags=("llm", "curation", "chunking"),
)
def chunk_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document CHUNKING — the canonical RAG / long-context
    pretraining preprocessor: split every document into fixed-size windows
    (``CHUNK_SIZE`` chars) advancing by ``CHUNK_STRIDE`` (so neighbors
    overlap by size−stride chars and no boundary content is lost). Chunk
    count per doc is ``1 + ceil(max(len − size, 0) / stride)`` — every
    character is covered, a doc shorter than one window yields exactly one
    chunk, and the final window is allowed to run short. Output carries
    (doc_id, chunk_idx, chunk_start, chunk_len, md5(chunk_text)) so the
    oracle value-compares the exact chunk CONTENT without shipping it.

    Spark side is pure JVM expressions: ``sequence`` + ``explode``
    generates indices (one row amplification, no Python), ``substring``
    slices, ``md5`` fingerprints — map-side only, zero shuffles; at 100 TB
    chunking is embarrassingly parallel per input split. (The DuckDB
    oracle cross-joins a constant 0..4095 index because its
    ``generate_series`` rejects correlated bounds — that caps ORACLE texts
    at ~614k chars, far beyond the fixtures; the Spark side has no cap.)
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_last = F.ceil(
        F.greatest(F.length("text") - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
    ).cast("int")
    return (
        d.select("doc_id", "text", n_last.alias("__n_last"))
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), F.col("__n_last"))))
        .withColumn("chunk_idx", F.col("chunk_idx").cast("long"))
        .withColumn("chunk_start", (F.col("chunk_idx") * CHUNK_STRIDE).cast("long"))
        .withColumn(
            "chunk_text",
            F.expr(f"substring(text, CAST(chunk_start + 1 AS INT), {CHUNK_SIZE})"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.length("chunk_text").cast("long").alias("chunk_len"),
            F.md5("chunk_text").alias("chunk_md5"),
        )
        # no orderBy: the driver's value hash is order-insensitive and a
        # presentation sort would be this plan's ONLY exchange
    )


def _capstone_oracle() -> str:
    return f"""
    WITH q AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             round(
               least(1.0, len(string_split(text, ' ')) / 200.0) * 0.4
               + least(1.0, len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['the','a','of','and','to','in','is','it','on','for'])) / 5.0) * 0.3
               + (1.0 - least(1.0,
                   CAST(len(list_filter(string_split(text, ' '), t -> length(t) >= 8)) AS DOUBLE)
                   / len(string_split(text, ' ')))) * 0.3
             , 6) AS quality
      FROM documents
    ),
    survivors AS (SELECT * FROM q WHERE quality >= 0.5),
    hashes AS (SELECT doc_id, md5(text) AS h FROM survivors),
    exact_losers AS (
      SELECT doc_id FROM hashes
      WHERE doc_id != (SELECT min(doc_id) FROM hashes h2 WHERE h2.h = hashes.h)
    ),
    toks AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s FROM survivors
    ),
    near_losers AS (
      SELECT DISTINCT b.doc_id FROM toks a JOIN toks b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ),
    kept AS (
      SELECT * FROM survivors
      WHERE doc_id NOT IN (SELECT doc_id FROM exact_losers)
        AND doc_id NOT IN (SELECT doc_id FROM near_losers)
    ),
    assigned AS (
      SELECT lang, n_tokens,
             CASE WHEN frac < 0.8 THEN 'train'
                  WHEN frac < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT lang, n_tokens,
               CAST((doc_id * {KNUTH}) % {MOD32} AS DOUBLE) / {MOD32} AS frac
        FROM kept
      )
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY lang, split
    """


@register(
    "llm_curation_capstone",
    oracle=_capstone_oracle(),
    tags=("llm", "curation", "pipeline", "capstone"),
)
def llm_curation_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline as one certified job: quality gate
    (C4/Gopher-style composite score >= 0.5) -> dedup on the survivors
    (exact hash + lang-blocked Jaccard near-dup) -> deterministic 80/10/10
    split -> per-(lang, split) document and token counts — the final
    training-mix manifest a data team ships.

    Everything chains on ONE documents scan: the quality score, content
    hash, and token set are projections of the same row; dedup's only
    joins are the keyed hash groupBy and the bounded lang-block pair join;
    the split is a pure hash of doc_id (stable across runs and engines —
    the property that makes the mix reproducible). The oracle replays the
    entire pipeline in SQL, so the certified artifact is the composition,
    not just the stages.

    Scale: identical shapes to the certified component queries — at 100 TB
    the near-dup stage swaps the block join for the MinHash-LSH candidate
    path (same verify arithmetic), and the manifest lands as a catalog
    commit tagged for reproducible reads (``catalog_tag_reproducible_read``).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text", "n_chars")
    toks = F.split("text", " ")
    stop = F.array([F.lit(w) for w in
                    ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]])
    n_tokens = F.size(toks)
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    n_long = F.size(F.filter(toks, lambda t: F.length(t) >= 8))
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / 200.0) * 0.4
        + F.least(F.lit(1.0), n_stop / 5.0) * 0.3
        + (1.0 - F.least(F.lit(1.0), n_long.cast("double") / n_tokens)) * 0.3,
        6,
    )
    survivors = d.select(
        "doc_id", "lang", "text", n_tokens.alias("n_tokens"), quality.alias("quality")
    ).filter(F.col("quality") >= 0.5)

    hashes = survivors.select("doc_id", F.md5("text").alias("h"))
    keepers = hashes.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_losers = (
        hashes.join(keepers, "h").filter(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    )
    tsets = survivors.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("s")
    )
    a, b = tsets.alias("a"), tsets.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
        / F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    )
    near_losers = (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(jac >= 0.8)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    losers = exact_losers.unionByName(near_losers).distinct()
    kept = survivors.join(losers, "doc_id", "left_anti")

    frac = ((F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD32)).cast("double") / F.lit(MOD32)
    split = (
        F.when(frac < 0.8, F.lit("train"))
        .when(frac < 0.9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        kept.select("lang", "n_tokens", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@register(
    "dedup_cross_split_leakage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM toks a JOIN toks b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ),
    assigned AS (
      SELECT doc_id,
             CASE WHEN frac < 0.8 THEN 'train'
                  WHEN frac < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               CAST((doc_id * {KNUTH}) % {MOD32} AS DOUBLE) / {MOD32} AS frac
        FROM documents
      )
    )
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_neardup_pairs,
           CAST(count(*) AS BIGINT)                     AS n_leaking_pairs,
           CAST(count(CASE WHEN sa.split = 'train' AND sb.split = 'test'
                             OR sa.split = 'test' AND sb.split = 'train'
                      THEN 1 END) AS BIGINT)            AS n_train_test_leaks
    FROM pairs p
    JOIN assigned sa ON sa.doc_id = p.doc_a
    JOIN assigned sb ON sb.doc_id = p.doc_b
    WHERE sa.split != sb.split
    """,
    tags=("llm", "curation", "dedup", "leakage"),
)
def dedup_cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN/TEST LEAKAGE through near-duplicates: a random doc-level split
    puts near-identical documents on opposite sides, silently inflating
    eval scores — the failure mode cluster-aware splitting exists to
    prevent. This query measures it: lang-blocked Jaccard pairs (the
    certified near-dup arithmetic) joined against the deterministic split
    assignment, counting pairs that straddle splits, with the
    train-vs-test subset (the one that corrupts benchmarks) broken out.

    The fix is split-by-cluster (assign the Knuth hash to the dup-cluster
    representative, not the doc — `dedup_cluster_resolution` provides the
    clusters); this query is the auditor that says whether you need it.

    Scale: the pair join is the bounded-block near-dup shape; the split
    join is two broadcast-sized lookups per pair. One documents scan feeds
    both sides.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = d.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("s")
    )
    a, b = toks.alias("a"), toks.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
        / F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.8)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    frac = ((F.col("doc_id") * F.lit(KNUTH)) % F.lit(MOD32)).cast("double") / F.lit(MOD32)
    split = (
        F.when(frac < 0.8, F.lit("train"))
        .when(frac < 0.9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    assigned = d.select("doc_id", split.alias("split"))
    n_pairs = pairs.count()
    joined = (
        pairs.join(
            assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    tt = (
        (F.col("split_a") == "train") & (F.col("split_b") == "test")
    ) | ((F.col("split_a") == "test") & (F.col("split_b") == "train"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_leaking_pairs"),
        F.count(F.when(tt, 1)).alias("n_train_test_leaks"),
    ).select(
        F.lit(n_pairs).cast("long").alias("n_neardup_pairs"),
        "n_leaking_pairs",
        "n_train_test_leaks",
    )


@register(
    "curation_line_dedup_boilerplate",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || 'subscribe to our newsletter'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN chr(10) || 'all rights reserved'
                     ELSE '' END AS t
      FROM documents
    ),
    lines AS (
      SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM docs
    ),
    freq AS (SELECT line, count(*) AS n FROM lines GROUP BY line),
    perdoc AS (
      SELECT l.doc_id,
             count(*) FILTER (WHERE f.n < 10)  AS n_kept,
             count(*) FILTER (WHERE f.n >= 10) AS n_dropped,
             COALESCE(sum(length(l.line)) FILTER (WHERE f.n < 10), 0)
               AS kept_chars
      FROM lines l JOIN freq f ON l.line = f.line
      GROUP BY l.doc_id
    )
    SELECT doc_id, CAST(n_kept AS BIGINT) AS n_kept,
           CAST(n_dropped AS BIGINT) AS n_dropped,
           CAST(kept_chars AS BIGINT) AS kept_chars
    FROM perdoc ORDER BY doc_id
    """,
    tags=("llm", "curation", "dedup", "line-dedup", "boilerplate"),
)
def curation_line_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact LINE dedup (C4 / RefinedWeb boilerplate
    removal): a line that recurs across >= K documents is boilerplate
    (cookie banners, "subscribe to our newsletter", copyright footers)
    and is dropped from EVERY document; rare lines stay. The fixture
    text carries no newlines, so two deterministic boilerplate lines are
    appended to the doc_id % 3 and % 5 cohorts — the op then drops
    exactly those and keeps each document's unique body line.

    Plan shape at 100 TB: split + posexplode is map-side; ONE groupBy
    over lines builds the frequency table; the boilerplate set (lines
    with freq >= K) is TINY by construction — the whole point of the
    threshold — so it broadcasts and the removal is a broadcast
    LEFT ANTI join against the exploded lines, never a shuffle of the
    corpus against itself. Reported per doc as (kept, dropped,
    kept-char-sum) so the oracle certifies values, not just counts."""
    k = 10
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\nsubscribe to our newsletter"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit("\nall rights reserved")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col("t"), "\n")).alias("line")
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= k)
        .select("line")
    )
    flagged = lines.join(
        F.broadcast(boiler).withColumn("__hot", F.lit(True)),
        "line",
        "left",
    )
    keep = F.col("__hot").isNull()
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum(keep.cast("long")).alias("n_kept"),
            F.sum((~keep).cast("long")).alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(keep, F.length("line"))), F.lit(0)
            ).alias("kept_chars"),
        )
        .orderBy("doc_id")
    )
