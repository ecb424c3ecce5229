"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), MinHash+LSH near-dup, blocked n-gram Jaccard, SimHash.

Scale design (the whole point of these operators):
- NOTHING here is O(n^2) over the corpus. Candidate generation is always a
  bucket equi-join (LSH band buckets / blocking keys / simhash halves), so
  the shuffle is keyed and the pair space is bounded by bucket sizes.
- The only cross-engine-deterministic hash shared with DuckDB is md5, so the
  oracle-checked MinHash uses *lexicographic min of md5(shingle || seed)* —
  a valid minhash family (each seed induces an independent pseudo-permutation
  of the shingle universe). The rows-only variants use xxhash64 (cheaper,
  JVM-side, but Spark-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_catalog_postgres_spark.registry import load, load_parallel, register

# MinHash configuration: K signatures in BANDS bands of ROWS rows.
# P(candidate | jaccard s) = 1 - (1 - s^ROWS)^BANDS — with 12/4/3 the curve
# crosses 50% near s=0.55, which matches the 0.5 output threshold below.
K = 12
BANDS = 4
ROWS = 3
JACCARD_THRESHOLD = 0.5
# In-bucket pair expansion is O(|bucket|^2); a pathological bucket (site
# boilerplate, empty-ish docs all sharing one band key) would go quadratic
# inside one task. Buckets above this cap are dropped from candidate
# generation (their members are near-identical boilerplate reachable through
# other bands, and a 100 TB run surfaces them via `oversized_buckets` for a
# dedicated exact-group pass instead of a pair explosion).
MAX_BUCKET = 1000
#: Corpus-size gate for the one-pass Jaccard verify (r18): at or above
#: this many input bytes the one-pass shape (saves two corpus scans,
#: costs one candidate-array shuffle) wins; below it the two-join shape's
#: zero-shuffle verify beats the groupBy's fixed overhead. Env override:
#: SPARK_GRAFT_DEDUP_ONEPASS_MIN_BYTES. A 100 TB corpus is always far
#: above any sane setting — the gate only changes tiny-input behavior.
_ONEPASS_MIN_BYTES = 256 * 1024


def _corpus_bytes(sf_dir: str) -> int:
    import os

    override = os.environ.get("SPARK_GRAFT_DEDUP_ONEPASS_MIN_BYTES")
    global _ONEPASS_MIN_BYTES
    if override:
        _ONEPASS_MIN_BYTES = int(override)
    p = f"{sf_dir}/documents.parquet"
    try:
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(p)
                for f in fs
            )
        return os.path.getsize(p)
    except OSError:
        return 1 << 60  # unknown size: assume big — the at-scale shape


def bucket_candidate_pairs(
    bands: DataFrame, max_bucket: int = MAX_BUCKET, distinct: bool = True
) -> DataFrame:
    """(doc_id, band, key) -> candidate (doc_a, doc_b) pairs from
    same-bucket co-occurrence, skipping buckets larger than ``max_bucket``.

    Pairs are emitted with a higher-order expression over the collected
    bucket (no self-join), so each bucket expands in one task; the cap
    bounds that task at max_bucket^2/2 pairs.

    ``distinct=False`` (r18) skips the pair-dedup shuffle and may emit the
    same pair once per agreeing band — for consumers whose own aggregation
    already collapses duplicates (the one-pass Jaccard verify groups by
    the pair), the extra exchange was pure cost."""
    ids = F.sort_array(F.collect_set("doc_id"))
    n = F.size(F.col("ids"))
    pair_expr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("ids"), i).alias("doc_a"),
                    F.element_at(F.col("ids"), j).alias("doc_b"),
                ),
            ),
        )
    )
    out = (
        bands.groupBy("band", "key")
        .agg(ids.alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        .select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )
    return out.distinct() if distinct else out


def oversized_buckets(bands: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Overflow accounting for the cap above: the (band, key, n_docs) buckets
    that candidate generation skipped. At scale this feeds a boilerplate
    triage pass (exact-hash grouping within the bucket is O(n), not O(n^2))."""
    return (
        bands.groupBy("band", "key")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def _shingle_expr():
    """3-word shingles as a distinct array; whole text as fallback for
    ultra-short docs (sequence() would go negative)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    return F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2), lambda i: F.concat_ws(" ", F.slice(toks, i, 3))
            )
        ),
    ).otherwise(F.array(F.col("text")))


_SHINGLE_SQL = """
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
         ELSE [text] END)) AS sh
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
"""


@register(
    "dedup_exact_hash",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
    )
    SELECT content_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM (SELECT doc_id, md5(text) AS content_hash FROM corpus)
    GROUP BY content_hash
    HAVING count(*) > 1
    """,
    tags=("llm", "dedup"),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: groupBy(md5(text)), keep the lowest doc_id.

    The fixture corpus has no byte-identical duplicates, so the input is the
    corpus UNION a re-ingestion of its first 50 docs under new ids (the
    double-delivery scenario exact dedup exists for) — the operator must
    find exactly those 50 groups.

    Scale: shuffles 1 hash + 1 long per row; the text itself never moves.
    At 100 TB you shuffle ~50 bytes/doc, not documents.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    reingested = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(reingested)
    return (
        corpus.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@register(
    "dedup_exact_keep_first",
    oracle="""
    SELECT source, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique
    FROM documents
    GROUP BY source
    """,
    tags=("llm", "dedup"),
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication factor (docs vs distinct contents)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


def _window_off(j: int) -> int:
    """Start offset of hash-window j in the 32-hex md5 digest (1-based)."""
    return 1 + 2 * (j - 1)


def _minhash_oracle() -> str:
    sig_cols = ",\n           ".join(
        f"min(substr(md5(sh), {_window_off(j)}, 8)) AS h{j}" for j in range(1, K + 1)
    )
    band_selects = []
    for b in range(BANDS):
        key = " || ".join(f"h{b * ROWS + r}" for r in range(1, ROWS + 1))
        band_selects.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM sig")
    bands_sql = "\n      UNION ALL ".join(band_selects)
    return f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sig AS (
      SELECT doc_id,
           {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {bands_sql}
    ),
    bucket_sizes AS (
      SELECT band, key, count(DISTINCT doc_id) AS n_docs FROM bands GROUP BY band, key
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      JOIN bucket_sizes c ON c.band = a.band AND c.key = a.key AND c.n_docs <= {MAX_BUCKET}
    ),
    shset AS (SELECT doc_id, list(sh) AS s FROM sh GROUP BY doc_id)
    SELECT doc_a, doc_b,
           round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
    FROM cand
    JOIN shset sa ON sa.doc_id = doc_a
    JOIN shset sb ON sb.doc_id = doc_b
    WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.s, sb.s))) >= {JACCARD_THRESHOLD}
    """


def _minhash_bands(base: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, shingles) -> one (doc_id, band, key) row per band. The
    signature is fully map-side (array_min over transform — no per-shingle
    rows ever exist); banding is a single explode, NOT a BANDS-way union,
    which would re-evaluate the signature pipeline once per branch.
    ``carry`` names extra columns of ``base`` to thread through (e.g. a
    content hash, so a downstream pass avoids a second corpus scan)."""
    hashed = base.withColumn("hs", F.transform(F.col("shingles"), lambda s: F.md5(s)))
    sig = hashed.select(
        "doc_id",
        *carry,
        *[
            F.array_min(
                F.transform(F.col("hs"), lambda h: F.substring(h, _window_off(j), 8))
            ).alias(f"h{j}")
            for j in range(1, K + 1)
        ],
    )
    return sig.select(
        "doc_id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(*[F.col(f"h{b * ROWS + r}") for r in range(1, ROWS + 1)]).alias("key"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *carry, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("llm", "dedup", "lsh", "bench"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate detection, verified with exact Jaccard.

    Pipeline: 3-word shingles -> ONE md5 per shingle -> K={K} minhash
    signatures as lexicographic mins over K shifted 8-hex windows of that
    digest (one-permutation-hashing style: md5 bits are uniform, so each
    window induces a distinct pseudo-ordering of the shingle universe at
    1/K the hashing cost) -> {BANDS} bands of {ROWS} -> band-bucket
    candidates -> exact shingle-set Jaccard >= {THRESH} on candidates only.

    Scale: the crossJoin-free shape, with a fully MAP-SIDE signature pass —
    shingles stay an array column and each minhash is array_min(transform(...))
    so no per-shingle rows ever shuffle. The only wide ops are the tiny band
    groupBy (BANDS rows/doc of ~100-byte keys) and the candidate distinct.
    Bucket sizes are the skew risk (a viral shingle set), bounded because
    identical band keys imply near-identical docs. The exact-Jaccard verify
    broadcasts the candidate pairs and touches only them, typically << n^2.
    """
    d = load_parallel(spark, sf_dir, "documents")
    # Per-doc shingle SET as an array column — no explode, so the minhash
    # signature computes entirely MAP-SIDE below (array_min over transform):
    # zero shuffles until the tiny band groupBy. At 100 TB this is the
    # difference between an embarrassingly-parallel signature pass and
    # shuffling one row per (doc, shingle).
    base = d.select("doc_id", _shingle_expr().alias("shingles"))
    bands = _minhash_bands(base)

    # Candidate pairs WITHOUT a self-join: group docs per (band, key) bucket
    # and emit in-bucket pairs with a higher-order expression (see
    # bucket_candidate_pairs). Buckets above MAX_BUCKET are skipped — the
    # boilerplate guard that keeps a viral band key from going quadratic
    # inside one task.
    onepass = _corpus_bytes(sf_dir) >= _ONEPASS_MIN_BYTES
    # one-pass verify: its own groupBy(doc_a, doc_b) collapses the pairs
    # that multiple bands emitted, so the dedup shuffle inside
    # bucket_candidate_pairs is redundant there (r18) — one exchange fewer
    # on the pair stream. The two-join shape emits one OUTPUT row per
    # input pair, so it keeps the distinct.
    cand = bucket_candidate_pairs(bands, MAX_BUCKET, distinct=not onepass)

    shset = base.select("doc_id", F.col("shingles").alias("s"))
    # Exact-Jaccard verify, shape chosen by CORPUS SIZE (r18; VERDICT r17
    # item 1 + ADVICE). Two equivalent shapes, identical output (asserted
    # in the r18 A/B at both SFs):
    # - ONE-PASS (r17): unpivot each pair into two (pair, role, doc) rows,
    #   broadcast that against a single shset stream, reassemble the two
    #   shingle sets with a groupBy over O(candidates) rows. Saves TWO
    #   extra corpus scans at the cost of shuffling candidate shingle
    #   arrays — the right trade whenever the corpus dwarfs the candidate
    #   set (always at 100 TB).
    # - TWO-JOIN (pre-r17): broadcast the candidate pairs against two
    #   shset streams — zero array shuffle, zero extra aggregate, but two
    #   more corpus scans. Below the size gate the scans are cheaper than
    #   the groupBy's fixed overhead (r18 interleaved A/B: sf0.01 noop
    #   0.75 s vs 0.87 s for one-pass; at sf0.1 one-pass wins 2.38 vs
    #   2.46) — the cost-based switch an engine's optimizer would make.
    if onepass:
        # first(when(role...), ignorenulls) is deterministic: each
        # (pair, role) matches exactly one corpus row.
        cand_long = cand.select(
            "doc_a",
            "doc_b",
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("d"), F.lit("a").alias("role")),
                    F.struct(F.col("doc_b").alias("d"), F.lit("b").alias("role")),
                )
            ).alias("m"),
        ).select("doc_a", "doc_b", F.col("m.d").alias("d"), F.col("m.role").alias("role"))
        pairs = (
            F.broadcast(cand_long)
            .join(shset, F.col("d") == F.col("doc_id"))
            .groupBy("doc_a", "doc_b")
            .agg(
                F.first(F.when(F.col("role") == "a", F.col("s")), ignorenulls=True).alias("sa_s"),
                F.first(F.when(F.col("role") == "b", F.col("s")), ignorenulls=True).alias("sb_s"),
            )
        )
        jac = (
            F.size(F.array_intersect(F.col("sa_s"), F.col("sb_s"))).cast("double")
            / F.size(F.array_union(F.col("sa_s"), F.col("sb_s")))
        )
        return (
            pairs.filter(jac >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        )
    jac = (
        F.size(F.array_intersect(F.col("sa.s"), F.col("sb.s"))).cast("double")
        / F.size(F.array_union(F.col("sa.s"), F.col("sb.s")))
    )
    return (
        F.broadcast(cand)
        .join(shset.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(shset.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# keep docstring template honest
dedup_minhash_lsh.__doc__ = dedup_minhash_lsh.__doc__.replace("{K}", str(K)).replace(
    "{BANDS}", str(BANDS)
).replace("{ROWS}", str(ROWS)).replace("{THRESH}", str(JACCARD_THRESHOLD))


@register(
    "dedup_ngram_jaccard_blocked",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, n_chars // 100 AS len_bucket,
             list_distinct(string_split(text, ' ')) AS s
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM t a
    JOIN t b ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    """,
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise token-set Jaccard: candidate pairs restricted to the
    same (lang, length-bucket) block.

    Scale: blocking turns O(n^2) into sum of O(|block|^2); blocks are
    bounded by construction (language x 100-char band). For corpora where a
    block could still explode, nest LSH inside the block. Token sets ride
    the shuffle once as arrays; the Jaccard is computed JVM-side
    (array_intersect/union), no UDF.
    """
    d = load_parallel(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        F.array_distinct(F.split("text", " ")).alias("s"),
    )
    a, b = t.alias("a"), t.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
        / F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION SimHash variant (library function, deliberately NOT a
    registered query): 32-bit signature from token xxhash64 bit-votes;
    candidate pairs share at least one 16-bit half (pigeonhole: hamming
    distance <= 1 guarantees a shared half). Output: pairs with hamming
    distance <= 3 among half-collision candidates.

    xxhash64 is Spark-internal (no DuckDB equivalent), so this variant can't
    be value-checked against an oracle — which is exactly why it's the fast
    path in production (single JVM hash per token vs md5's 4). The SimHash
    *algorithm* is oracle-certified through ``dedup_simhash_md5``, which runs
    the identical ``_simhash_pairs`` pipeline with the hash swapped; this
    wrapper is certified by proxy (tests/test_dedup.py pins both variants to
    the same pipeline shape).

    Scale: signature build is explode + groupBy(doc) with 32 conditional-sum
    partial aggs; candidates via equi-join on half-signature buckets — same
    crossJoin-free shape as MinHash-LSH.
    """
    d = load_parallel(spark, sf_dir, "documents")
    return _simhash_pairs(d, F.xxhash64("tok"))


def _simhash_pairs(d: DataFrame, hash_expr, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """Shared SimHash pipeline: 32-bit signature from per-token ``hash_expr``
    bit-votes, candidate pairs via 16-bit half-signature buckets, hamming
    filter. ``hash_expr`` is evaluated over the exploded token column.
    ``max_bucket`` parameterizes the half-bucket cap (tests drive it low to
    certify the capped path against a same-cap oracle; see
    tests/test_dedup_bucket_cap.py)."""
    toks = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
    h = toks.withColumn("hash", hash_expr)
    # bit votes: +1 if bit set else -1; simhash bit = majority
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hash"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(32)
        ]
    )
    sig_expr = None
    for i in range(32):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i)
        sig_expr = bit if sig_expr is None else sig_expr + bit
    sigs = votes.select("doc_id", sig_expr.cast("long").alias("sig"))
    halves = sigs.select(
        "doc_id",
        "sig",
        (F.col("sig").bitwiseAND(F.lit(0xFFFF))).alias("lo"),
        F.shiftright(F.col("sig"), 16).bitwiseAND(F.lit(0xFFFF)).alias("hi"),
    )
    # Candidate stage with ZERO self-joins: explode each doc into
    # (half_idx, key) bucket rows — the MinHash band-bucket pattern — then
    # collect each bucket's (doc_id, sig) members and pair-expand in place
    # with a higher-order expression, exactly like bucket_candidate_pairs.
    # The r2 union-of-two-self-joins form evaluated the whole signature
    # pipeline once per join side per half (4 document scans, 18 exchanges
    # in PLANS.md); this shape scans documents ONCE. Buckets above
    # MAX_BUCKET are dropped for the same quadratic-task-bound reason as
    # MinHash banding (their members are boilerplate reachable through the
    # other half / an exact-hash pass).
    keys = halves.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("half_idx"), F.col("lo").alias("key")),
                F.struct(F.lit(1).alias("half_idx"), F.col("hi").alias("key")),
            )
        ).alias("hk"),
    ).select("doc_id", "sig", F.col("hk.half_idx").alias("half_idx"), F.col("hk.key").alias("key"))
    buckets = (
        keys.groupBy("half_idx", "key")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "sig"))).alias("members"))
        .filter((F.size("members") > 1) & (F.size("members") <= max_bucket))
    )
    n = F.size(F.col("members"))
    pair_expr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("members"), i)["doc_id"].alias("doc_a"),
                    F.element_at(F.col("members"), j)["doc_id"].alias("doc_b"),
                    F.element_at(F.col("members"), i)["sig"].alias("sig_a"),
                    F.element_at(F.col("members"), j)["sig"].alias("sig_b"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("p.sig_a").alias("sig_a"),
            F.col("p.sig_b").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def _simhash_md5_oracle(max_bucket: int = MAX_BUCKET) -> str:
    """DuckDB twin of the md5-bit SimHash: 32 bit-votes from md5 nibbles.
    Bit i (LSB-0) of the 32-bit value = bit (i % 4) of the hex nibble at
    1-based char position 8 - i // 4 in the first 8 md5 hex chars.

    The MAX_BUCKET cap is mirrored (lo_sizes/hi_sizes CTEs, as the minhash
    oracle does) so the certified query and its oracle agree even on a
    corpus where a 16-bit half-bucket exceeds the cap — without this, the
    Spark side would drop the bucket's pairs and the oracle would keep
    them."""
    votes = ",\n        ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(tok), {8 - i // 4}, 1)) - 1)"
        f" >> {i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32)
    )
    sig = " + ".join(f"(CASE WHEN v{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(32))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents
    ),
    votes AS (
      SELECT doc_id,
        {votes}
      FROM toks GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM votes),
    halves AS (
      SELECT doc_id, sig, sig & 65535 AS lo, (sig >> 16) & 65535 AS hi FROM sigs
    ),
    lo_sizes AS (SELECT lo AS key, count(DISTINCT doc_id) AS n_docs FROM halves GROUP BY lo),
    hi_sizes AS (SELECT hi AS key, count(DISTINCT doc_id) AS n_docs FROM halves GROUP BY hi),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
      FROM halves a JOIN halves b ON a.lo = b.lo AND a.doc_id < b.doc_id
      JOIN lo_sizes s ON s.key = a.lo AND s.n_docs <= {max_bucket}
      UNION
      SELECT a.doc_id, b.doc_id, a.sig, b.sig
      FROM halves a JOIN halves b ON a.hi = b.hi AND a.doc_id < b.doc_id
      JOIN hi_sizes s ON s.key = a.hi AND s.n_docs <= {max_bucket}
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= 3
    ORDER BY doc_a, doc_b
    """


@register("dedup_simhash_md5", oracle=_simhash_md5_oracle(), tags=("llm", "dedup", "simhash"))
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with the 32-bit token hash drawn from the first 8 hex
    chars of md5 — the cross-engine-deterministic twin of ``dedup_simhash``,
    value-checked against a full SQL reimplementation in DuckDB (bit votes,
    signature, half-signature buckets, hamming filter).

    Production uses the xxhash64 variant (one JVM hash per token); this
    variant exists so the SimHash *algorithm* — not just its row count — is
    oracle-certified. Same crossJoin-free scale shape: explode + 32
    conditional-sum partial aggs, candidates via half-signature equi-join.
    """
    d = load_parallel(spark, sf_dir, "documents")
    hash32 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    return _simhash_pairs(d, hash32)


# Audit cap deliberately far below the production MAX_BUCKET so the fixture
# corpus (max bucket size 3 at sf0.01) exercises the nonzero-drop path —
# what gets certified is the accounting mechanism, not the production value.
AUDIT_CAP = 2


def _bucket_audit_oracle() -> str:
    sig_cols = ",\n           ".join(
        f"min(substr(md5(sh), {_window_off(j)}, 8)) AS h{j}" for j in range(1, K + 1)
    )
    band_selects = []
    for b in range(BANDS):
        key = " || ".join(f"h{b * ROWS + r}" for r in range(1, ROWS + 1))
        band_selects.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM sig")
    bands_sql = "\n      UNION ALL ".join(band_selects)
    return f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sig AS (
      SELECT doc_id,
           {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {bands_sql}
    ),
    dropped AS (
      SELECT band, key, count(DISTINCT doc_id) AS n_docs
      FROM bands GROUP BY band, key
      HAVING count(DISTINCT doc_id) > {AUDIT_CAP}
    )
    SELECT CAST((SELECT count(*) FROM dropped) AS BIGINT) AS n_buckets_dropped,
           CAST((SELECT coalesce(max(n_docs), 0) FROM dropped) AS BIGINT) AS max_bucket_size,
           CAST((SELECT count(DISTINCT b.doc_id)
                 FROM bands b JOIN dropped d ON b.band = d.band AND b.key = d.key)
                AS BIGINT) AS n_docs_affected
    """


@register("dedup_minhash_bucket_audit", oracle=_bucket_audit_oracle(), tags=("llm", "dedup", "lsh"))
def dedup_minhash_bucket_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dropped-work accounting for MinHash-LSH's bucket cap: one row of
    (n_buckets_dropped, max_bucket_size, n_docs_affected) for band buckets
    above the cap — the buckets ``bucket_candidate_pairs`` would skip.

    ``dedup_minhash_lsh`` documents its recall trade (oversized buckets are
    dropped from candidate generation); this query MEASURES it, so a 100 TB
    run reports how much near-dup work the cap deferred to the boilerplate
    triage pass instead of silently under-counting duplicates. Runs the
    identical map-side signature + banding pipeline (`_minhash_bands`), so
    the audit certifies the same code path the dedup uses.

    Scale: same single-scan shape as the dedup itself — the audit adds one
    tiny groupBy(band, key) count and a broadcast join of the (rare)
    oversized keys back onto the band rows; no pair expansion happens at
    all. The production cap is MAX_BUCKET={MAX_BUCKET}; the registered
    audit uses AUDIT_CAP={AUDIT_CAP} so the fixture corpus exercises a
    nonzero drop (largest fixture bucket = 3 docs).
    """
    d = load_parallel(spark, sf_dir, "documents")
    base = d.select("doc_id", _shingle_expr().alias("shingles"))
    bands = _minhash_bands(base)
    # (band, key, n_docs) of oversized buckets — rare by construction, so
    # broadcasting them back onto the band rows costs one map-side probe.
    dropped = oversized_buckets(bands, AUDIT_CAP)
    joined = bands.join(F.broadcast(dropped), ["band", "key"])
    return joined.agg(
        F.countDistinct("band", "key").alias("n_buckets_dropped"),
        F.coalesce(F.max("n_docs"), F.lit(0).cast("long")).alias("max_bucket_size"),
        F.countDistinct("doc_id").alias("n_docs_affected"),
    )


dedup_minhash_bucket_audit.__doc__ = dedup_minhash_bucket_audit.__doc__.replace(
    "{MAX_BUCKET}", str(MAX_BUCKET)
).replace("{AUDIT_CAP}", str(AUDIT_CAP))


def _triage_oracle() -> str:
    sig_cols = ",\n           ".join(
        f"min(substr(md5(sh), {_window_off(j)}, 8)) AS h{j}" for j in range(1, K + 1)
    )
    band_selects = []
    for b in range(BANDS):
        key = " || ".join(f"h{b * ROWS + r}" for r in range(1, ROWS + 1))
        band_selects.append(f"SELECT doc_id, {b} AS band, {key} AS key FROM sig")
    bands_sql = "\n      UNION ALL ".join(band_selects)
    return f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sig AS (
      SELECT doc_id,
           {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {bands_sql}
    ),
    dropped AS (
      SELECT band, key
      FROM bands GROUP BY band, key
      HAVING count(DISTINCT doc_id) > {AUDIT_CAP}
    ),
    members AS (
      SELECT DISTINCT b.doc_id, b.band, b.key
      FROM bands b JOIN dropped d ON b.band = d.band AND b.key = d.key
    ),
    g AS (
      SELECT m.band, m.key, md5(doc.text) AS h, count(*) AS n
      FROM members m JOIN documents doc ON doc.doc_id = m.doc_id
      GROUP BY m.band, m.key, md5(doc.text)
    )
    SELECT band, key,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct_contents,
           CAST(max(n) AS BIGINT) AS largest_content_group
    FROM g GROUP BY band, key
    """


@register("dedup_lsh_oversized_triage", oracle=_triage_oracle(), tags=("llm", "dedup", "lsh"))
def dedup_lsh_oversized_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(n) triage pass the bucket cap defers to: for each band bucket
    above the cap (the ones ``bucket_candidate_pairs`` skips), group its
    members by exact content hash — boilerplate buckets collapse to a few
    md5 groups without ever expanding pairs. Output per oversized bucket:
    (n_docs, n_distinct_contents, largest_content_group); a bucket whose
    largest group ~= n_docs is confirmed boilerplate (dedup by exact hash),
    while one with all-distinct contents needs a nested-LSH re-pass.

    Completes the capped-bucket story: ``dedup_minhash_lsh`` drops the
    bucket, ``dedup_minhash_bucket_audit`` measures the drop, this query
    HANDLES it — in O(bucket size), not O(bucket size^2).

    Scale: the oversized key list is tiny (it is the skew tail) and rides a
    broadcast; content hashes come from one documents scan; both groupBys
    are keyed map-side-combinable aggs. Uses AUDIT_CAP={AUDIT_CAP} (not the
    production MAX_BUCKET={MAX_BUCKET}) so the fixture corpus exercises
    nonempty output, same as the audit query.
    """
    d = load_parallel(spark, sf_dir, "documents")
    # Content hash rides the band rows (carry=), so the whole triage is ONE
    # documents scan — no second join back to the corpus for the text.
    base = d.select("doc_id", _shingle_expr().alias("shingles"), F.md5("text").alias("h"))
    bands = _minhash_bands(base, carry=("h",))
    dropped = oversized_buckets(bands, AUDIT_CAP).select("band", "key")
    # oversized keys are the (rare) skew tail: broadcast them onto the
    # band rows; only members of dropped buckets survive the probe.
    members = bands.join(F.broadcast(dropped), ["band", "key"]).distinct()
    g = members.groupBy("band", "key", "h").agg(F.count(F.lit(1)).alias("n"))
    return g.groupBy("band", "key").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct_contents"),
        F.max("n").alias("largest_content_group"),
    )


# Exact substring-span dedup (Lee et al., "Deduplicating Training Data Makes
# Language Models Better"): find token windows of length SPAN_W shared
# verbatim across >=2 documents and measure, per document, how much of it is
# covered by such duplicated spans. SPAN_W=8 is the fixture-scale stand-in
# for the paper's ~50-token threshold; the plan shape is W-independent.
SPAN_W = 8


def _substring_spans_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    w0 AS (
      SELECT doc_id, t, unnest(range(0, len(t) - {SPAN_W} + 1)) AS pos
      FROM toks WHERE len(t) >= {SPAN_W}
    ),
    w AS (
      SELECT doc_id, pos,
             md5(array_to_string(list_slice(t, pos + 1, pos + {SPAN_W}), ' ')) AS h
      FROM w0
    ),
    dup AS (
      SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    dw AS (
      SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)
    ),
    gaps AS (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM dw
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(CASE WHEN prev IS NULL OR pos - prev >= {SPAN_W}
                           THEN {SPAN_W} ELSE pos - prev END) AS BIGINT)
               AS covered_tokens
      FROM gaps GROUP BY doc_id
    )
    SELECT p.doc_id,
           p.n_dup_windows,
           p.covered_tokens,
           CAST(len(t.t) AS BIGINT) AS total_tokens,
           ROUND(p.covered_tokens * 1.0 / len(t.t), 4) AS dup_frac
    FROM per_doc p JOIN toks t USING (doc_id)
    """


@register(
    "dedup_substring_spans",
    oracle=_substring_spans_oracle(),
    tags=("llm", "dedup", "substring"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, the suffix-array result re-expressed as a
    distributed rolling-window hash (Lee et al. 2022 find duplicated >=50
    token spans with a suffix array — single-machine, memory-bound; the
    SPARK formulation below gets the identical span set from keyed shuffles
    only):

    1. tokenize once; every W-token window becomes md5(window) via a
       map-side ``transform(sequence(...))`` — no shuffle, no explosion
       beyond ~1 row per token;
    2. ONE groupBy(hash) finds windows seen in >=2 distinct docs (the only
       corpus-wide shuffle, map-side combinable);
    3. join back (co-partitioned on the hash — no extra exchange) and
       merge overlapping fixed-length windows per doc with a lag() window:
       union length of [pos, pos+W) intervals = W per span start plus the
       gap-capped increments — EXACT duplicated-token coverage, no
       interval list materialized.

    Output per affected doc: duplicated-window count, exact covered-token
    count, total tokens, coverage fraction — the per-doc signal a curation
    pipeline thresholds on (the paper removes spans; the coverage fraction
    is what decides drop-vs-trim).

    Scale: at 100 TB, windows-per-token is constant (~1) and the hash
    groupBy is the same shape as exact dedup — bounded, keyed, skew-free
    (md5 keys are uniform). A production run widens W to ~50 and swaps md5
    for xxhash64 (8-byte keys, JVM-side) exactly like the other certified
    dedup twins; md5 here keeps the DuckDB oracle bit-identical.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SPAN_W
    )
    win = toks.select(
        "doc_id",
        F.size("t").alias("total_tokens"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {SPAN_W}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {SPAN_W}))))"
            )
        ).alias("pos", "h"),
    )
    dup = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dw = win.join(dup, "h").select("doc_id", "total_tokens", "pos")
    gaps = dw.withColumn(
        "prev", F.lag("pos").over(Window.partitionBy("doc_id").orderBy("pos"))
    )
    contrib = F.when(
        F.col("prev").isNull() | (F.col("pos") - F.col("prev") >= SPAN_W),
        F.lit(SPAN_W),
    ).otherwise(F.col("pos") - F.col("prev"))
    return (
        gaps.groupBy("doc_id", "total_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum(contrib).alias("covered_tokens"),
        )
        .select(
            "doc_id",
            "n_dup_windows",
            "covered_tokens",
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.round(F.col("covered_tokens") / F.col("total_tokens"), 4).alias("dup_frac"),
        )
    )


@register(
    "dedup_containment_ngram",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, list_distinct(
        CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE [text] END) AS s
      FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
            FROM documents)
    )
    SELECT a.doc_id AS container_doc, b.doc_id AS contained_doc,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s), 6)
             AS containment,
           CAST(len(b.s) AS BIGINT) AS contained_shingles
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.doc_id != b.doc_id AND len(b.s) <= len(a.s)
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s) >= 0.9
    """,
    tags=("llm", "dedup", "containment"),
)
def dedup_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT dedup: C(a contains b) = |sh(a) ∩ sh(b)| /
    |sh(b)| over 3-word shingles. Jaccard misses the boilerplate-superset
    case — a long page that embeds a short document whole scores low
    Jaccard (union is large) but containment ~1.0; training-data pipelines
    drop or trim the CONTAINED side (quote inclusion, template wrapping,
    scraped-with-chrome pages).

    Plan: shingle arrays ride the shuffle once; candidate pairs are blocked
    per language with the smaller-shingle-set side as the contained
    candidate; the intersect/size arithmetic is JVM-side array ops — no
    UDF, no explode. Scale: same blocking story as the Jaccard twin — at
    100 TB the block join is replaced by LSH on the SHORTER side's
    shingles (a contained doc shares whole bands with its container), and
    the verify step is exactly this arithmetic on the candidate pairs.
    """
    d = load_parallel(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", _shingle_expr().alias("s"))
    a, b = t.alias("a"), t.alias("b")
    containment = (
        F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
        / F.size(F.col("b.s"))
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (F.size(F.col("b.s")) <= F.size(F.col("a.s"))),
        )
        .filter(containment >= 0.9)
        .select(
            F.col("a.doc_id").alias("container_doc"),
            F.col("b.doc_id").alias("contained_doc"),
            F.round(containment, 6).alias("containment"),
            F.size(F.col("b.s")).cast("long").alias("contained_shingles"),
        )
    )


def _ensemble_oracle() -> str:
    return """
    WITH feed AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id < 50
    ),
    hashes AS (
      SELECT doc_id, md5(text) AS h FROM feed
    ),
    exact_losers AS (
      SELECT doc_id FROM hashes
      WHERE doc_id != (SELECT min(doc_id) FROM hashes h2 WHERE h2.h = hashes.h)
    ),
    toks AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s FROM feed
    ),
    near_losers AS (
      SELECT DISTINCT b.doc_id FROM toks a JOIN toks b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
    ),
    sh AS (
      SELECT doc_id, lang, list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+2], ' '))
             ELSE [text] END) AS s
      FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM feed)
    ),
    contained_losers AS (
      SELECT DISTINCT b.doc_id FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.doc_id != b.doc_id
       AND (len(b.s) < len(a.s) OR (len(b.s) = len(a.s) AND b.doc_id > a.doc_id))
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s) >= 0.9
    )
    SELECT f.doc_id,
           f.doc_id IN (SELECT doc_id FROM exact_losers)     AS exact_loser,
           f.doc_id IN (SELECT doc_id FROM near_losers)      AS near_loser,
           f.doc_id IN (SELECT doc_id FROM contained_losers) AS contained_loser,
           f.doc_id NOT IN (SELECT doc_id FROM exact_losers)
             AND f.doc_id NOT IN (SELECT doc_id FROM near_losers)
             AND f.doc_id NOT IN (SELECT doc_id FROM contained_losers) AS keep
    FROM feed f
    """


@register(
    "dedup_ensemble_verdict",
    oracle=_ensemble_oracle(),
    tags=("llm", "dedup", "ensemble"),
)
def dedup_ensemble_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE keep/drop verdict per document from three dedup signals at once
    — the decision table a curation pipeline actually materializes, rather
    than three separate pair lists someone has to reconcile:

    - exact: md5 groups, keep the lowest doc_id (re-ingested copies lose);
    - near-dup: token-set Jaccard >= 0.8 within the language block, the
      HIGHER id of each pair loses (same verify arithmetic the
      MinHash-LSH path certifies — at 100 TB candidates come from LSH, and
      this is exactly its verify stage);
    - containment: 3-gram shingle containment >= 0.9, the CONTAINED side
      loses (size tie -> higher id).

    Input is the corpus plus a re-ingestion of its first 50 docs under new
    ids, so all three signals fire. Output: per-doc booleans + the final
    ``keep``.

    Scale: one corpus scan feeds all three signals (hash, token set,
    shingle set are projections of the same row); the only joins are the
    lang-blocked pair joins and a groupBy(md5) — every shuffle keyed,
    nothing quadratic beyond the bounded blocks.
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    reingested = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "lang", "text"
    )
    feed = d.unionByName(reingested)

    hashes = feed.select("doc_id", F.md5("text").alias("h"))
    keepers = hashes.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    exact_losers = (
        hashes.join(keepers, "h")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
        .distinct()
    )

    toks = feed.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("s")
    )
    a, b = toks.alias("a"), toks.alias("b")
    jac = (
        F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
        / F.size(F.array_union(F.col("a.s"), F.col("b.s")))
    )
    near_losers = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.8)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )

    sh = feed.select("doc_id", "lang", _shingle_expr().alias("s"))
    sa, sb = sh.alias("a"), sh.alias("b")
    containment = (
        F.size(F.array_intersect(F.col("a.s"), F.col("b.s"))).cast("double")
        / F.size(F.col("b.s"))
    )
    size_rule = (F.size(F.col("b.s")) < F.size(F.col("a.s"))) | (
        (F.size(F.col("b.s")) == F.size(F.col("a.s")))
        & (F.col("b.doc_id") > F.col("a.doc_id"))
    )
    contained_losers = (
        sa.join(
            sb,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & size_rule,
        )
        .filter(containment >= 0.9)
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )

    def flag(losers: DataFrame, name: str) -> DataFrame:
        return losers.withColumn(name, F.lit(True))

    out = (
        feed.select("doc_id")
        .join(flag(exact_losers, "exact_loser"), "doc_id", "left_outer")
        .join(flag(near_losers, "near_loser"), "doc_id", "left_outer")
        .join(flag(contained_losers, "contained_loser"), "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("exact_loser", F.lit(False)).alias("exact_loser"),
            F.coalesce("near_loser", F.lit(False)).alias("near_loser"),
            F.coalesce("contained_loser", F.lit(False)).alias("contained_loser"),
        )
    )
    return out.withColumn(
        "keep",
        ~(F.col("exact_loser") | F.col("near_loser") | F.col("contained_loser")),
    )


def _substring_trim_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    w0 AS (
      SELECT doc_id, t, unnest(range(0, len(t) - {SPAN_W} + 1)) AS pos
      FROM toks WHERE len(t) >= {SPAN_W}
    ),
    w AS (
      SELECT doc_id, pos,
             md5(array_to_string(list_slice(t, pos + 1, pos + {SPAN_W}), ' ')) AS h
      FROM w0
    ),
    dup AS (
      SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    dw AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
    cov AS (
      SELECT doc_id,
             list_sort(list_distinct(flatten(
               list(range(pos + 1, pos + {SPAN_W} + 1))))) AS covered
      FROM dw GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT)       AS total_tokens,
           CAST(len(c.covered) AS BIGINT) AS tokens_removed,
           md5(coalesce(array_to_string(
             list_filter(t.t, (x, i) -> NOT list_contains(c.covered, i)), ' '), ''))
             AS cleaned_hash
    FROM cov c JOIN toks t USING (doc_id)
    """


@register(
    "dedup_substring_trim",
    oracle=_substring_trim_oracle(),
    tags=("llm", "dedup", "substring"),
)
def dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE half of substring dedup: ``dedup_substring_spans``
    measures duplicated coverage; this one REMOVES it — every token inside
    a cross-document duplicated window is cut and the cleaned text is
    emitted (here as its md5 plus removal counts, so the contract is
    checkable; a pipeline writes the cleaned string). This is what Lee et
    al. actually do to the corpus: cut the span, keep the remainder.

    Plan: the window/hash/groupBy stages are the certified spans pipeline;
    the trim adds one per-doc aggregation (sorted distinct union of
    covered 1-based token indices — collect order neutralized by
    sort+distinct, so the output is engine-exact) and a map-side indexed
    ``filter`` over the token array. No extra corpus scan: tokens ride the
    same rows.

    Scale: covered-index lists are O(duplicated tokens) per doc; at 100 TB
    a production run swaps the list for a roaring bitmap per doc and the
    md5 emit for the actual cleaned-text write — the shuffle shape
    (hash groupBy + doc_id groupBy) is unchanged.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= SPAN_W
    )
    win = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {SPAN_W}),"
                f" i -> md5(concat_ws(' ', slice(t, i + 1, {SPAN_W}))))"
            )
        ).alias("pos", "h"),
    )
    dup = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    cov = (
        win.join(dup, "h")
        .select("doc_id", F.sequence(F.col("pos") + 1, F.col("pos") + SPAN_W).alias("ix"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("ix")))).alias(
                "covered"
            )
        )
    )
    joined = cov.join(toks, "doc_id")
    cleaned = F.filter(
        F.col("t"), lambda x, i: ~F.array_contains(F.col("covered"), i + 1)
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("long").alias("total_tokens"),
        F.size("covered").cast("long").alias("tokens_removed"),
        F.md5(F.concat_ws(" ", cleaned)).alias("cleaned_hash"),
    )
