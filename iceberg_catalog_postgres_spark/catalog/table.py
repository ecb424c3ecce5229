"""Table handle + TableBuilder + snapshot Transaction.

Ports the iceberg-rs surfaces the reference invokes (SURVEY §2.B):
- ``TableBuilder::new_metastore_table`` + ``builder.commit()``
  (mod.rs:356, mod.rs:104): stage metadata v1, write it, register pointer.
- ``Table::new_metastore_table`` (mod.rs:222-228): handle binding
  identifier + catalog + metadata + current location.
- ``table.new_transaction()`` / ``transaction.commit()`` (mod.rs:466-467):
  snapshot-producing write => NEW metadata JSON => catalog CAS
  (``update_table``), with a bounded retry loop on conflict (the reference
  errors immediately — SURVEY §5 calls out that its CAS is untested under
  concurrency; we test it).

Spark integration: ``to_df`` plans a DataFrame over exactly the current
snapshot's data files — scan planning from metadata, not directory listing
(SURVEY §4). At 100 TB this is the difference between an O(1) pointer read
plus a file list, and a multi-minute recursive S3 LIST.
"""

from __future__ import annotations

import posixpath
import random
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from iceberg_catalog_postgres_spark.catalog.catalog import (
    CommitConflictError,
    PostgresCatalog,
    TableIdentifier,
)
from iceberg_catalog_postgres_spark.catalog.metadata import (
    Snapshot,
    TableMetadata,
    decode_bound,
    encode_bound,
    load_chunk,
    new_snapshot_id,
    plan_manifests,
)


#: Iceberg's write.metadata.metrics default truncates string bounds to 16
#: chars so wide text columns don't bloat the manifest.
BOUND_TRUNCATE_LENGTH = 16

# ---------------------------------------------------------------------------
# Partition transforms (Iceberg PartitionSpec transforms, public spec):
# a spec entry is either a bare column name (identity) or
# "bucket(N,col)" / "truncate(W,col)". bucket follows the Iceberg binary
# spec: murmur3_x86_32 (seed 0) of the TYPED byte form — int/long widened to
# 8-byte little-endian, string as UTF-8 — then (hash & Int.MAX) % N, so an
# external Iceberg reader (official Spark runtime jar, Trino) pointed at one
# of these tables computes the SAME bucket assignments. The hash is
# implemented twice, bit-identically: pure Python (``murmur3_32``) for the
# driver-side planner, and as a JVM column expression built from Spark
# built-ins (``murmur3_32_long_col`` / ``murmur3_32_utf8_col`` — 32-bit
# arithmetic on masked longs, higher-order-function word loop; no UDF, no
# Python in the write path). Iceberg's own spec vectors are pinned in
# tests/test_partition_transforms.py. Tables written before this existed
# carry ``write.bucket-hash=crc32`` semantics (property absent) and keep the
# legacy CRC-32-of-str hash — documented deviation, flagged so foreign
# readers can refuse rather than mis-read. Truncate follows Iceberg:
# strings -> prefix, integers -> floor-to-width (negative-safe).
# Bucket/truncate source columns are restricted to int/long/string at
# create/evolve time (``validate_partition_spec``): the typed byte form for
# other types (double, boolean, decimal) is not implemented, and silently
# hashing their string form is exactly the mis-pruning trap ADVICE flagged.
# ---------------------------------------------------------------------------
import re as _re
import zlib as _zlib

_TRANSFORM_RE = _re.compile(r"^(bucket|truncate)\((\d+)\s*,\s*([A-Za-z0-9_]+)\)$")
_TEMPORAL_RE = _re.compile(r"^(year|month|day|hour)\(\s*([A-Za-z0-9_]+)\)$")

#: table property naming the bucket hash; absent (pre-r6 tables) == crc32.
BUCKET_HASH_PROP = "write.bucket-hash"
DEFAULT_BUCKET_HASH = "murmur3"


# Executor-side deletion-vector blob cache: (puffin path, offset) ->
# sorted uint64 positions. Module-global so each executor PROCESS does one
# ranged read + decode per blob, across all its tasks and batches. LRU with
# a hard entry cap: a long-lived executor scanning many tables/snapshots
# would otherwise accumulate superseded vectors forever (each new DV commit
# writes a fresh (sidecar, offset) key, orphaning the old one here).
from collections import OrderedDict as _OrderedDict

_DV_EXECUTOR_CACHE: "_OrderedDict[tuple, object]" = _OrderedDict()
_DV_EXECUTOR_CACHE_MAX = 64


def _dv_cache_get(key):
    pos = _DV_EXECUTOR_CACHE.get(key)
    if pos is not None:
        _DV_EXECUTOR_CACHE.move_to_end(key)  # LRU touch
    return pos


def _dv_cache_put(key, pos) -> None:
    _DV_EXECUTOR_CACHE[key] = pos
    _DV_EXECUTOR_CACHE.move_to_end(key)
    while len(_DV_EXECUTOR_CACHE) > _DV_EXECUTOR_CACHE_MAX:
        _DV_EXECUTOR_CACHE.popitem(last=False)


def _dv_membership_filter(entry_by_scan_path: dict):
    """mapInPandas function applying deletion vectors ON THE EXECUTORS —
    the large-cardinality path of ``to_df``'s ``_apply_dvs``: instead of
    decoding every vector on the driver and broadcasting O(deleted
    positions) pairs, each Arrow batch ranged-reads ONLY its own file's
    blob from the Puffin sidecar (shared storage, same access contract as
    the data files) and drops rows whose ``row_index`` is in the bitmap
    via a vectorized ``searchsorted``. Driver/closure state is the tiny
    ``{scan_path -> (abs_puffin, offset, length)}`` dict — O(files with
    vectors) — so the plan survives delete cardinalities that would break
    any broadcast."""

    def fn(batches):
        import numpy as np

        from iceberg_catalog_postgres_spark.catalog.dv import parse_dv_payload

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            keep = np.ones(len(pdf), dtype=bool)
            for fp, idx in pdf.groupby("__dvf").indices.items():
                ent = entry_by_scan_path.get(fp)
                if ent is None:
                    continue
                key = (ent[0], ent[1])
                pos = _dv_cache_get(key)
                if pos is None:
                    with open(ent[0], "rb") as fh:
                        fh.seek(ent[1])
                        payload = fh.read(ent[2])
                    pos = parse_dv_payload(payload)  # sorted uint64
                    _dv_cache_put(key, pos)
                if len(pos) == 0:
                    continue
                rows = pdf["__dvp"].to_numpy()[idx].astype("uint64")
                loc = np.searchsorted(pos, rows)
                hit = (loc < len(pos)) & (
                    pos[np.minimum(loc, len(pos) - 1)] == rows
                )
                keep[idx[hit]] = False
            yield pdf[keep]

    return fn


def parse_partition_field(entry: str) -> tuple[str, int | None, str]:
    """Spec entry -> (kind, param, column); kind in
    identity/bucket/truncate/year/month/day/hour."""
    m = _TRANSFORM_RE.match(entry)
    if m:
        return m.group(1), int(m.group(2)), m.group(3)
    m = _TEMPORAL_RE.match(entry)
    if m:
        return m.group(1), None, m.group(2)
    return "identity", None, entry


#: pseudo file_path a MERGE folds into its DV positions frame to detect a
#: cardinality violation in the SAME action that encodes the vectors (r15)
MERGE_CARDINALITY_SENTINEL = "__merge_cardinality_violation__"


class NullnessConstraint:
    """Planner point-value marker for ``col IS [NOT] NULL`` (r15): rides
    inside the SQL extractor's ``points`` dict so the DNF machinery needs
    no fourth field; the value-based planners skip it (superset-safe) and
    ``_branch_files`` routes it to ``planned_files_nullness``."""

    __slots__ = ("want_null",)

    def __init__(self, want_null: bool):
        self.want_null = want_null

    def __repr__(self) -> str:  # EXPLAIN / plan-info rendering
        return "IS NULL" if self.want_null else "IS NOT NULL"

    def __eq__(self, other):
        return (
            isinstance(other, NullnessConstraint)
            and other.want_null == self.want_null
        )

    def __hash__(self):
        return hash(("__icps_nullness__", self.want_null))


def _in_bounds(iv: int, a: int | None, b: int | None) -> bool:
    """Transformed-value containment for a possibly HALF-OPEN interval —
    ``None`` on either side means unbounded (r15: ``WHERE ts >= X``, the
    most common event-log predicate, prunes through the same monotone
    compare; pre-r15 a lone bound planned ALL files)."""
    return (a is None or a <= iv) and (b is None or iv <= b)


def build_partition_entry(kind: str, param: int | None, column: str) -> str:
    """Canonical spec entry string for (kind, param, column) — the inverse
    of ``parse_partition_field``."""
    if kind == "identity":
        return column
    if kind in ("bucket", "truncate"):
        return f"{kind}({param},{column})"
    return f"{kind}({column})"  # year/month/day/hour


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (Austin Appleby, public domain), returning the SIGNED
    32-bit value Java produces — the hash Iceberg's bucket transform
    specifies. Pinned against the spec's Appendix-B vectors in tests."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    for i in range(n // 4):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[(n // 4) * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _bucket_value_bytes(v) -> bytes:
    """Iceberg's typed byte form for bucketable values: int/long as 8-byte
    little-endian two's complement (int is widened, so int and long columns
    bucket identically per the spec), string as UTF-8."""
    if isinstance(v, bool):
        raise TypeError("bucket() does not support boolean (Iceberg spec)")
    if isinstance(v, int):
        return (v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    raise TypeError(
        f"bucket() source must be int/long/string/binary, got {type(v).__name__}"
    )


def _micros_from_epoch_utc(v) -> int:
    """Microseconds from the UTC epoch for a datetime. tz-aware values are
    normalized to UTC first so the same *instant* always maps to the same
    micros regardless of its offset (2024-01-01T02:00+05:00 ==
    2023-12-31T21:00Z); naive values are read as UTC wall-clock (the repo
    pins the session tz to UTC). Subtracting an epoch carrying ``v.tzinfo``
    would instead shift the instant by the UTC offset and plan the wrong
    day/bucket partition."""
    import datetime as _dt

    if v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    d = v - _dt.datetime(1970, 1, 1)
    return (d.days * 86400 + d.seconds) * 1_000_000 + d.microseconds


def transform_value(
    entry: str, v, bucket_hash: str = DEFAULT_BUCKET_HASH, src_type: str | None = None
) -> str | None:
    """Driver-side transform of a query value to its recorded partition
    tuple value — pure Python, no Spark job, so scan planning on a
    transformed spec stays a metadata dictionary walk. ``src_type``
    (Iceberg type name of the SOURCE column, when the caller knows the
    schema) coerces the query value to the column's type first, so a point
    lookup passed "34" against an int column still plans the right bucket."""
    kind, param, _col = parse_partition_field(entry)
    if v is None:
        return None
    if src_type in ("int", "long", "integer", "bigint", "smallint", "tinyint") and not isinstance(v, bool):
        v = int(v)
    elif src_type == "string":
        v = str(v)
    elif src_type == "date":
        # Iceberg hashes dates as days-from-epoch widened to long
        import datetime as _dt

        if isinstance(v, str):
            v = _dt.date.fromisoformat(v)
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            v = v.date()
        if isinstance(v, _dt.date):
            v = (v - _dt.date(1970, 1, 1)).days
        v = int(v)
    elif src_type and src_type.startswith("timestamp"):
        # Iceberg hashes timestamps as microseconds-from-epoch (long);
        # naive values are read as UTC (the repo pins the session tz UTC)
        import datetime as _dt

        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day)  # midnight of that day
        if isinstance(v, _dt.datetime):
            v = _micros_from_epoch_utc(v)
        v = int(v)
    if kind == "identity":
        return str(v)
    if kind in ("year", "month", "day", "hour"):
        # Iceberg temporal transforms: year/month since 1970(-01), day as
        # days-from-epoch, hour as hours-from-epoch — all floor semantics.
        import datetime as _dt

        unit = src_type
        if unit is None:
            if isinstance(v, _dt.datetime):
                v = _micros_from_epoch_utc(v)
                unit = "timestamp"
            elif isinstance(v, _dt.date):
                v = (v - _dt.date(1970, 1, 1)).days
                unit = "date"
            else:
                raise ValueError(
                    f"{kind}() needs src_type (date/timestamp) or a "
                    "date/datetime value to disambiguate the unit"
                )
        if unit == "date":
            days = int(v)
            if kind == "hour":
                raise TypeError("hour() requires a timestamp source column")
        else:
            us = int(v)
            if kind == "hour":
                return str(us // 3_600_000_000)
            days = us // 86_400_000_000
        if kind == "day":
            return str(days)
        d0 = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
        if kind == "year":
            return str(d0.year - 1970)
        return str((d0.year - 1970) * 12 + d0.month - 1)
    if kind == "bucket":
        if bucket_hash == "crc32":
            return str(_zlib.crc32(str(v).encode("utf-8")) % param)
        return str((murmur3_32(_bucket_value_bytes(v)) & 0x7FFFFFFF) % param)
    if isinstance(v, str):
        return v[:param]
    return str(int(v) - int(v) % param)


# -- JVM-side murmur3_x86_32: 32-bit arithmetic on masked longs. Every
# intermediate stays < 2^48, so no 64-bit overflow even under ANSI mode;
# every step is a Spark built-in, so the write path stays whole-stage
# codegen / JVM higher-order-function territory — no UDF. --


def _u32(c):
    from pyspark.sql import functions as F

    return c.bitwiseAND(F.lit(0xFFFFFFFF))


def _mul32(c, const: int):
    """(c * const) mod 2^32 for c < 2^32 without overflowing a signed long:
    split the constant into 16-bit halves."""
    from pyspark.sql import functions as F

    lo, hi = const & 0xFFFF, const >> 16
    return _u32(
        c * F.lit(lo)
        + F.shiftleft((c * F.lit(hi)).bitwiseAND(F.lit(0xFFFF)), 16)
    )


def _rotl32(c, r: int):
    from pyspark.sql import functions as F

    return _u32(F.shiftleft(c, r).bitwiseOR(F.shiftright(c, 32 - r)))


def _mm3_mix_k(k):
    k = _mul32(k, 0xCC9E2D51)
    k = _rotl32(k, 15)
    return _mul32(k, 0x1B873593)


def _mm3_step(h, k):
    from pyspark.sql import functions as F

    h = _u32(h.bitwiseXOR(_mm3_mix_k(k)))
    h = _rotl32(h, 13)
    return _u32(h * F.lit(5) + F.lit(0xE6546B64))


def _mm3_fmix(h, n):
    from pyspark.sql import functions as F

    h = _u32(h.bitwiseXOR(n))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = _mul32(h, 0xC2B2AE35)
    return h.bitwiseXOR(F.shiftright(h, 16))


def murmur3_32_long_col(c):
    """murmur3_x86_32(seed 0) of a long column's 8-byte little-endian form —
    two 32-bit words, loop unrolled. Returns the UNSIGNED value as a long
    (mask with 0x7FFFFFFF for Iceberg's bucket, exactly Java's
    ``hash & Integer.MAX_VALUE``)."""
    from pyspark.sql import functions as F

    c = c.cast("long")
    w0 = _u32(c)
    w1 = _u32(F.shiftrightunsigned(c, 32))
    h = F.lit(0).cast("long")
    for w in (w0, w1):
        h = _mm3_step(h, w)
    return _mm3_fmix(h, F.lit(8))


# --- murmur3 as ONE parsed SQL expression (r17) -------------------------
# The lambda-Column construction of the byte loop paid seconds of py4j
# round trips per plan build, and its per-BYTE substr+hex+conv evaluation
# dominated bucketed-write hashing (~4.5 ms/row measured). The SQL-string
# form below parses in one call and hex-encodes the buffer ONCE per row
# (bound as a lambda variable via the transform-over-1-element-array
# let-binding idiom), extracting each little-endian word with a single
# conv — measured ~3.4x faster end-to-end and bit-identical on a
# 212-case property sweep (empty/1..7-byte tails, unicode, long strings).


def _mm3_sql_u32(x: str) -> str:
    return f"({x} & 4294967295)"


def _mm3_sql_mul32(x: str, c: int) -> str:
    lo, hi = c & 0xFFFF, c >> 16
    return _mm3_sql_u32(f"({x} * {lo} + shiftleft(({x} * {hi}) & 65535, 16))")


def _mm3_sql_rotl(x: str, r: int) -> str:
    return _mm3_sql_u32(f"(shiftleft({x}, {r}) | shiftright({x}, {32 - r}))")


def _mm3_sql_mix_k(k: str) -> str:
    return _mm3_sql_mul32(_mm3_sql_rotl(_mm3_sql_mul32(k, 0xCC9E2D51), 15), 0x1B873593)


def _mm3_sql_step(h: str, k: str) -> str:
    h1 = _mm3_sql_u32(f"({h} ^ {_mm3_sql_mix_k(k)})")
    return _mm3_sql_u32(f"({_mm3_sql_rotl(h1, 13)} * 5 + 3864292196)")


def _mm3_sql_fmix(h: str, n: str) -> str:
    h = _mm3_sql_u32(f"({h} ^ ({n}))")
    h = f"({h} ^ shiftright({h}, 16))"
    h = _mm3_sql_mul32(h, 0x85EBCA6B)
    h = f"({h} ^ shiftright({h}, 13))"
    h = _mm3_sql_mul32(h, 0xC2B2AE35)
    return f"({h} ^ shiftright({h}, 16))"


def murmur3_32_binary_sql(b_sql: str) -> str:
    """murmur3_x86_32(seed 0) of the binary SQL expression ``b_sql`` as one
    SQL expression string (unsigned u32 as BIGINT). Lambda variables serve
    as let-bindings: ``hx`` = the hex encoding (computed once per row),
    ``hloop`` = the word-loop fold, ``hfin`` = loop+tail — so no subtree is
    re-evaluated, interpreted-HOF mode included."""
    word = (
        "cast(conv(concat("
        "substring(hx, 8*wi+7, 2), substring(hx, 8*wi+5, 2), "
        "substring(hx, 8*wi+3, 2), substring(hx, 8*wi+1, 2)), 16, 10) as bigint)"
    )
    nw = "(length(hx) div 8)"
    nbytes = "(length(hx) div 2)"
    tl = f"({nbytes} % 4)"

    def byte_j(j: int) -> str:
        return f"cast(conv(substring(hx, 2*({nw}*4+{j})+1, 2), 16, 10) as bigint)"

    k1 = " + ".join(
        f"(CASE WHEN {tl} > {j} THEN {byte_j(j)} * {256 ** j} ELSE 0 END)"
        for j in range(3)
    )
    loop = (
        f"aggregate(CASE WHEN {nw} > 0 THEN sequence(0, {nw}-1) "
        f"ELSE cast(array() as array<int>) END, 0L, "
        f"(hacc, wi) -> {_mm3_sql_step('hacc', word)})"
    )
    tail_h = _mm3_sql_u32("(hloop ^ " + _mm3_sql_mix_k("(" + k1 + ")") + ")")
    with_tail = f"(CASE WHEN {tl} > 0 THEN {tail_h} ELSE hloop END)"
    fmix = _mm3_sql_fmix("hfin", nbytes)
    body = (
        f"element_at(transform(array({loop}), hloop -> "
        f"element_at(transform(array({with_tail}), hfin -> {fmix}), 1)), 1)"
    )
    return f"element_at(transform(array(hex({b_sql})), hx -> {body}), 1)"


def _col_sql(c) -> str:
    """Render a simple Column (attribute ref / encode / cast) as SQL text
    via the shared helper (r18); REJECTS explicitly (instead of failing
    deep inside F.expr) when the Column cannot be rendered — the murmur3
    SQL builders below have no lambda-Column fallback."""
    from iceberg_catalog_postgres_spark.exprs import col_ref_sql

    src = col_ref_sql(c)
    if src is None:
        raise ValueError(
            f"cannot render Column as SQL text for the murmur3 bucket hash: {c}; "
            "pass a plain column reference or a SQL expression string"
        )
    return src


def murmur3_32_utf8_col(c):
    """murmur3_x86_32(seed 0) of a string column's UTF-8 bytes. ``c`` may be
    a SQL expression string or a simple Column."""
    from pyspark.sql import functions as F

    src = c if isinstance(c, str) else _col_sql(c)
    return F.expr(murmur3_32_binary_sql(f"encode({src}, 'UTF-8')"))


def murmur3_32_binary_col(b):
    """murmur3_x86_32(seed 0) of a binary column's bytes as one parsed SQL
    expression (see ``murmur3_32_binary_sql``). Bit-identical to the
    pure-Python ``murmur3_32`` (property-tested). ``b`` may be a SQL
    expression string or a simple Column."""
    from pyspark.sql import functions as F

    src = b if isinstance(b, str) else _col_sql(b)
    return F.expr(murmur3_32_binary_sql(src))


def murmur3_long_sql_columns(src: str = "v", out: str = "h") -> str:
    """DuckDB SELECT-list fragment computing murmur3_x86_32(seed 0) of a
    BIGINT column's 8-byte little-endian form (the Iceberg long hash),
    bit-identical to ``murmur3_32``/``murmur3_32_long_col`` — as a chain
    of ~20 lateral-aliased 32-bit steps (masked arithmetic on BIGINTs, no
    overflow), so a DuckDB ORACLE can replay the bucket assignment and the
    driver gate certifies cross-engine hash identity. ``out`` is the
    unsigned 32-bit hash; Iceberg's bucket = (out & 2147483647) % N."""
    u = 4294967295

    def mul32(a: str, c: int) -> str:
        lo, hi = c & 0xFFFF, c >> 16
        return f"(({a}) * {lo} + ((({a}) * {hi}) & 65535) * 65536) & {u}"

    def rotl(a: str, r: int) -> str:
        return f"(((({a}) << {r}) | (({a}) >> {32 - r})) & {u})"

    cols, names = [], []

    def emit(name: str, expr: str) -> str:
        cols.append(f"{expr} AS {name}")
        names.append(name)
        return name

    emit("mmw0", f"(({src}) & {u})")
    emit("mmw1", f"((({src}) >> 32) & {u})")
    h = "0"
    for i, w in enumerate(("mmw0", "mmw1")):
        k = emit(f"mmk{i}a", mul32(w, 0xCC9E2D51))
        k = emit(f"mmk{i}b", rotl(k, 15))
        k = emit(f"mmk{i}c", mul32(k, 0x1B873593))
        hx = emit(f"mmh{i}a", f"xor(({h}), ({k})) & {u}")
        hr = emit(f"mmh{i}b", rotl(hx, 13))
        h = emit(f"mmh{i}c", f"(({hr}) * 5 + 3864292196) & {u}")
    h = emit("mmf0", f"xor(({h}), 8) & {u}")
    h = emit("mmf1", f"xor(({h}), ({h}) >> 16) & {u}")
    h = emit("mmf2", mul32(h, 0x85EBCA6B))
    h = emit("mmf3", f"xor(({h}), ({h}) >> 13) & {u}")
    h = emit("mmf4", mul32(h, 0xC2B2AE35))
    emit(out, f"xor(({h}), ({h}) >> 16) & {u}")
    return ",\n           ".join(cols)


def murmur3_string_sql_ctes(src_sql: str, src_col: str = "s", out: str = "mm_h") -> str:
    """DuckDB CTE chain computing murmur3_x86_32(seed 0) of a VARCHAR
    column's UTF-8 bytes — the Iceberg string hash — bit-identical to
    ``murmur3_32``/``murmur3_32_utf8_col``. ``src_sql`` is a SELECT
    producing column ``src_col``; the returned fragment ends with CTE
    ``mm_fin`` carrying every source column plus ``out`` (unsigned 32-bit
    hash). Bytes come from hex(encode(s)) decoded with strpos, the 4-byte
    word loop is a list_reduce fold with a prepended seed, and the tail /
    finalizer are the same masked 32-bit arithmetic as the long variant."""
    u = 4294967295

    def mul32(a: str, c: int) -> str:
        lo, hi = c & 0xFFFF, c >> 16
        return f"((({a}) * {lo} + ((({a}) * {hi}) & 65535) * 65536) & {u})"

    def rotl(a: str, r: int) -> str:
        return f"(((({a}) << {r}) | (({a}) >> {32 - r})) & {u})"

    def mixk(k: str) -> str:
        return mul32(rotl(mul32(k, 0xCC9E2D51), 15), 0x1B873593)

    inner = f"(xor((h), {mixk('k')}) & {u})"
    step = f"((({rotl(inner, 13)}) * 5 + 3864292196) & {u})"
    return f"""mm_src AS ({src_sql}),
    mm_hb AS (
      SELECT *, hex(encode({src_col})) AS mm_hx,
             octet_length(encode({src_col})) AS mm_n
      FROM mm_src
    ),
    mm_by AS (
      SELECT *, list_transform(range(0, mm_n), i ->
        (strpos('0123456789ABCDEF', substring(mm_hx, i*2+1, 1)) - 1) * 16 +
        (strpos('0123456789ABCDEF', substring(mm_hx, i*2+2, 1)) - 1)) AS mm_bl
      FROM mm_hb
    ),
    mm_wd AS (
      SELECT *, list_transform(range(0, mm_n // 4), w ->
        mm_bl[w*4+1] + mm_bl[w*4+2]*256 + mm_bl[w*4+3]*65536
        + mm_bl[w*4+4]*16777216) AS mm_words
      FROM mm_by
    ),
    mm_fold AS (
      SELECT *, CASE WHEN len(mm_words) = 0 THEN 0
        ELSE list_reduce(
          list_prepend(CAST(0 AS BIGINT),
                       list_transform(mm_words, w -> CAST(w AS BIGINT))),
          (h, k) -> {step}) END AS mm_hw
      FROM mm_wd
    ),
    mm_tl AS (
      SELECT *, (mm_n % 4) AS mm_tlen,
        (CASE WHEN mm_n % 4 >= 1 THEN mm_bl[(mm_n//4)*4 + 1] ELSE 0 END
         + CASE WHEN mm_n % 4 >= 2 THEN mm_bl[(mm_n//4)*4 + 2]*256 ELSE 0 END
         + CASE WHEN mm_n % 4 >= 3 THEN mm_bl[(mm_n//4)*4 + 3]*65536 ELSE 0 END)
        AS mm_k1
      FROM mm_fold
    ),
    mm_mixed AS (
      SELECT *, CASE WHEN mm_tlen > 0
        THEN xor(mm_hw, {mixk('mm_k1')}) & {u} ELSE mm_hw END AS mm_hb0
      FROM mm_tl
    ),
    mm_fin AS (
      SELECT *,
        xor(mm_hb0, mm_n) & {u} AS mm_f0,
        xor(mm_f0, mm_f0 >> 16) & {u} AS mm_f1,
        {mul32('mm_f1', 0x85EBCA6B)} AS mm_f2,
        xor(mm_f2, mm_f2 >> 13) & {u} AS mm_f3,
        {mul32('mm_f3', 0xC2B2AE35)} AS mm_f4,
        xor(mm_f4, mm_f4 >> 16) & {u} AS {out}
      FROM mm_mixed
    )"""


def transform_column(entry: str, dtype, bucket_hash: str = DEFAULT_BUCKET_HASH) -> "F.Column":
    """The Spark expression whose value matches ``transform_value`` —
    applied as the shadow partition column at write time."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    kind, param, col = parse_partition_field(entry)
    c = F.col(col)
    if kind == "identity":
        return c.cast("string")
    if kind in ("year", "month", "day", "hour"):
        from pyspark.sql.types import DateType

        if isinstance(dtype, DateType):
            if kind == "hour":
                raise TypeError("hour() requires a timestamp source column")
            if kind == "day":
                out = F.unix_date(c)
            elif kind == "year":
                out = F.year(c) - 1970
            else:
                out = (F.year(c) - 1970) * 12 + F.month(c) - 1
        else:
            ts = c.cast("timestamp")
            us = F.unix_micros(ts)

            def _floordiv(x, d: int):
                # exact floor division on longs (pmod keeps negatives
                # floor-consistent with Python's //)
                return ((x - F.pmod(x, F.lit(d))) / F.lit(d)).cast("long")

            if kind == "hour":
                out = _floordiv(us, 3_600_000_000)
            elif kind == "day":
                out = _floordiv(us, 86_400_000_000)
            elif kind == "year":
                out = F.year(ts) - 1970
            else:
                out = (F.year(ts) - 1970) * 12 + F.month(ts) - 1
        return out.cast("long").cast("string")
    if kind == "bucket":
        if bucket_hash == "crc32":
            return F.pmod(
                F.crc32(c.cast("string").cast("binary")), F.lit(param)
            ).cast("string")
        from pyspark.sql.types import (
            BinaryType,
            DateType,
            TimestampNTZType,
            TimestampType,
        )

        if isinstance(dtype, StringType):
            h = murmur3_32_utf8_col(c)
        elif isinstance(dtype, BinaryType):
            h = murmur3_32_binary_col(c)
        elif isinstance(dtype, DateType):
            # Iceberg: days-from-epoch widened to long
            h = murmur3_32_long_col(F.unix_date(c))
        elif isinstance(dtype, (TimestampType, TimestampNTZType)):
            # Iceberg: microseconds-from-epoch; NTZ wall-clock reads as UTC
            # (session tz pinned UTC repo-wide), matching the driver side
            h = murmur3_32_long_col(F.unix_micros(c.cast("timestamp")))
        else:
            h = murmur3_32_long_col(c)
        return F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(param)).cast("string")
    if isinstance(dtype, StringType):
        return F.substring(c, 1, param)
    return (c - F.pmod(c, F.lit(param))).cast("long").cast("string")


def sort_field_exprs(specs: list) -> list:
    """Direction-honoring Spark sort expressions for normalized
    ``(name, direction, null_order)`` triples (r17) — shared by the sorted
    write distribution and the order-preserving compaction rewrite."""
    from pyspark.sql import functions as _F

    return [
        (_F.col(c).desc_nulls_last() if n == "nulls-last"
         else _F.col(c).desc_nulls_first()) if d == "desc"
        else (_F.col(c).asc_nulls_last() if n == "nulls-last"
              else _F.col(c).asc_nulls_first())
        for c, d, n in specs
    ]


def _bucket_hash_of(metadata) -> str:
    """The table's bucket hash: explicit property, else legacy CRC-32 (every
    table created before the property existed was written with CRC-32 — a
    murmur3 default on old tables would silently re-map their buckets)."""
    return metadata.properties.get(BUCKET_HASH_PROP, "crc32")


def validate_partition_spec(partition_by: list[str], schema: "StructType") -> None:
    """Reject spec entries whose source column is missing or (for
    bucket/truncate) not int/long/string — the types whose typed byte /
    floor form is implemented identically driver-side and JVM-side. A
    double or boolean bucket column would silently mis-prune (ADVICE r5),
    so it fails at create/evolve time instead."""
    from pyspark.sql.types import (
        BinaryType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    ints = (ByteType, ShortType, IntegerType, LongType)
    bucket_ok = (
        *ints, StringType, BinaryType, DateType, TimestampType, TimestampNTZType
    )
    truncate_ok = (*ints, StringType)
    by_name = {f.name: f.dataType for f in schema.fields}
    temporal_ok = (DateType, TimestampType, TimestampNTZType)
    for e in partition_by:
        kind, _param, col = parse_partition_field(e)
        if col not in by_name:
            raise ValueError(f"partition columns not in schema: ['{e}']")
        if kind == "bucket" and not isinstance(by_name[col], bucket_ok):
            raise ValueError(
                f"bucket() source column {col} must be int/long/string/"
                f"binary/date/timestamp, got {by_name[col].simpleString()}"
            )
        if kind == "truncate" and not isinstance(by_name[col], truncate_ok):
            raise ValueError(
                f"truncate() source column {col} must be int/long/string, "
                f"got {by_name[col].simpleString()}"
            )
        if kind in ("year", "month", "day") and not isinstance(
            by_name[col], temporal_ok
        ):
            raise ValueError(
                f"{kind}() source column {col} must be date/timestamp, "
                f"got {by_name[col].simpleString()}"
            )
        if kind == "hour" and not isinstance(
            by_name[col], (TimestampType, TimestampNTZType)
        ):
            raise ValueError(
                f"hour() source column {col} must be timestamp, "
                f"got {by_name[col].simpleString()}"
            )

#: Footer opens performed by the read/plan path (NOT the write path — writers
#: legitimately read their own freshly-written footers once at commit). Lets
#: tests and registered queries assert that stats-backed planning opened
#: ZERO files.
PLANNING_FOOTER_READS = 0


def _truncate_string_bounds(lo: str, hi: str, length: int = BOUND_TRUNCATE_LENGTH):
    """Iceberg-style string-bound truncation: the lower bound's prefix is
    still a valid lower bound; the upper bound's prefix has its last code
    point incremented (skipping the surrogate range) to stay a valid upper
    bound. Returns (lo, hi) with hi=None when no prefix char is
    incrementable — pruning then has no upper bound for the file."""
    lo_t = lo[:length]
    if len(hi) <= length:
        return lo_t, hi
    prefix = hi[:length]
    for i in range(length - 1, -1, -1):
        nxt = ord(prefix[i]) + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        if nxt <= 0x10FFFF:
            return lo_t, prefix[:i] + chr(nxt)
    return lo_t, None


def collect_file_stats_many(paths_by_rel: dict[str, str]) -> dict[str, dict]:
    """Collect stats for many freshly-written files concurrently (footer
    reads are I/O-bound; on object storage the serial loop would add a
    round-trip per file to every commit). rel path -> stats dict. In a real
    cluster deployment the write TASKS would report these with their task
    results — this threaded driver-side collection is the local analogue
    with the same O(files-written) cost model."""
    if not paths_by_rel:
        return {}
    if len(paths_by_rel) == 1:
        rel, p = next(iter(paths_by_rel.items()))
        return {rel: collect_file_stats(p)}
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(16, len(paths_by_rel))) as ex:
        futs = {rel: ex.submit(collect_file_stats, p) for rel, p in paths_by_rel.items()}
        return {rel: f.result() for rel, f in futs.items()}


def _decode_decimal_stat(st) -> tuple | None:
    """(min, max) as ``decimal.Decimal`` from a parquet column-chunk
    Statistics whose logical type is DECIMAL (r16). Parquet stores the
    UNSCALED integer — big-endian two's-complement bytes for
    FIXED_LEN_BYTE_ARRAY/BYTE_ARRAY physical, a plain int for
    INT32/INT64 — exactly what Iceberg readers decode. None when the
    stats are not decimal or the raw values are absent."""
    import decimal as _decimal

    import json as _json

    lt = getattr(st, "logical_type", None)
    if lt is None or getattr(lt, "type", None) != "DECIMAL":
        return None
    # ParquetLogicalType exposes precision/scale only through to_json()
    try:
        scale = int(_json.loads(lt.to_json()).get("scale", 0))
    except Exception:
        return None
    raw_lo, raw_hi = getattr(st, "min_raw", None), getattr(st, "max_raw", None)
    if raw_lo is None or raw_hi is None:
        return None

    def _one(raw):
        unscaled = (
            int.from_bytes(raw, "big", signed=True)
            if isinstance(raw, bytes)
            else int(raw)
        )
        return _decimal.Decimal(unscaled).scaleb(-scale)

    return _one(raw_lo), _one(raw_hi)


def collect_file_stats(path: str) -> dict:
    """Per-file statistics for a manifest entry, read ONCE from the footer
    the writer just produced (page-cache warm; on a real cluster the write
    tasks would report these with the task result — either way the cost is
    O(files written this commit), paid at write time, never at read time).

    Returns ``{"record_count": n, "bounds": {col: [lo, hi]},
    "null_counts": {col: n}, "nan_counts": {col: n}}`` — the Iceberg
    manifest model: ``record_count`` plus ``lower_bounds``/
    ``upper_bounds`` plus ``null_value_counts`` plus (float/double
    columns only) ``nan_value_counts`` per top-level primitive column
    (nested/binary columns and columns with any statless row group are
    omitted; readers fall back to the footer for those). An all-NULL
    column has min/max absent in the footer but a valid null count, so it
    appears in ``null_counts`` without a ``bounds`` entry — exactly what
    IS NOT NULL pruning needs.

    ``nan_value_counts`` (r16, Iceberg manifest spec field 110): parquet
    footer min/max EXCLUDES NaN while Spark orders NaN above every value,
    so float bounds are only trustworthy for pruning when the file is
    provably NaN-free. Footers carry no NaN statistic, so the float
    columns are read back ONCE here — at write time, page-cache warm,
    one columnar batch per file, O(float-column bytes written this
    commit), never at read time. On a real cluster the write tasks would
    report these counts with the task result exactly as Iceberg's Spark
    writer does; this read-back is the single-process analogue."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    nan_counts: dict = {}
    try:
        fcols = [
            f.name
            for f in pf.schema_arrow
            if pa.types.is_float32(f.type) or pa.types.is_float64(f.type)
        ]
        if fcols:
            tbl = pf.read(columns=fcols)
            for name in fcols:
                s = pc.sum(pc.is_nan(tbl[name]))  # null-skipping
                nan_counts[name] = 0 if s.as_py() is None else int(s.as_py())
    except Exception:
        nan_counts = {}  # unknown => float bounds stay untrusted (safe)
    agg: dict = {}
    nulls: dict = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue  # nested field: no top-level bound
            st = col.statistics
            if st is None or st.null_count is None or nulls.get(name, 0) is None:
                nulls[name] = None  # unknown in one row group => unknown
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if st is None or not st.has_min_max:
                # one statless row group poisons the column's bounds — but an
                # all-NULL row group legitimately has no min/max and must NOT
                # poison (its rows constrain nothing).
                if not (st is not None and st.null_count == row_group.num_rows):
                    agg[name] = None
                continue
            if name in agg and agg[name] is None:
                continue
            if (
                getattr(st, "is_min_value_exact", True) is False
                or getattr(st, "is_max_value_exact", True) is False
            ):
                # foreign writer truncated the footer stats (parquet-mr
                # marks them inexact): a truncated UPPER bound understates
                # and would let bounds pruning drop matching files — poison
                # the column's bounds instead (r15; our own writes are
                # exact, and string bounds re-truncate Iceberg-style with
                # the incremented upper below)
                agg[name] = None
                continue
            if getattr(getattr(st, "logical_type", None), "type", None) == "DECIMAL":
                # DECIMAL stats decode from the RAW unscaled values
                # unconditionally (r16): pyarrow's typed accessor either
                # raises or yields the unscaled int depending on the
                # physical type — never the scaled value an Iceberg
                # reader needs
                dec = _decode_decimal_stat(st)
                if dec is None:
                    agg[name] = None
                    continue
                lo, hi = dec
            else:
                try:
                    lo, hi = st.min, st.max
                except Exception:
                    # undecodable stats for some other physical type: no
                    # bound, readers fall back superset-safely
                    agg[name] = None
                    continue
            if name in agg and agg[name] is not None:
                prev_lo, prev_hi = agg[name]
                lo, hi = min(prev_lo, lo), max(prev_hi, hi)
            agg[name] = (lo, hi)
    bounds = {}
    for name, v in agg.items():
        if v is None:
            continue
        lo, hi = v
        if isinstance(lo, str) and isinstance(hi, str):
            lo, hi = _truncate_string_bounds(lo, hi)
        lo_e = encode_bound(lo)
        hi_e = None if hi is None else encode_bound(hi)
        if lo_e is None:
            continue  # unsupported bound type (bytes, decimal, ...)
        bounds[name] = [lo_e, hi_e]
    import os as _os

    return {
        "record_count": md.num_rows,
        # Iceberg's manifest file_size_in_bytes: byte-based compaction
        # targets and storage accounting come from metadata, not listings
        "file_size_bytes": _os.path.getsize(path),
        "bounds": bounds,
        "null_counts": {k: v for k, v in nulls.items() if v is not None},
        **({"nan_counts": nan_counts} if nan_counts else {}),
    }


def _file_range_stats(path: str, column: str) -> tuple | None:
    """(min, max) of ``column`` across a parquet file's row groups, read
    from the FOOTER only — the local analogue of Iceberg manifest
    lower/upper bounds. Returns None when stats are absent (then the file
    must be treated as possibly-matching). Since round 5 this is the
    FALLBACK for statless legacy files; freshly-committed files answer from
    manifest stats with zero opens (``PLANNING_FOOTER_READS`` counts the
    fallback hits so tests can pin the zero).

    Float/double columns return None unconditionally (r16): parquet
    footer min/max excludes NaN, the footer carries no NaN count to
    prove the file NaN-free, and Spark orders NaN above every value — a
    footer-derived float bound could prune a file whose NaN rows match."""
    import pyarrow.parquet as pq

    global PLANNING_FOOTER_READS
    PLANNING_FOOTER_READS += 1
    md = pq.ParquetFile(path).metadata
    lo = hi = None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            if col.path_in_schema == column:
                if col.physical_type in ("FLOAT", "DOUBLE"):
                    return None  # NaN-unsafe: footer can't prove NaN-free
                st = col.statistics
                if st is None or not st.has_min_max:
                    return None
                if getattr(
                    getattr(st, "logical_type", None), "type", None
                ) == "DECIMAL":
                    dec = _decode_decimal_stat(st)  # r16: decimal raws
                    if dec is None:
                        return None
                    c_lo, c_hi = dec
                else:
                    try:
                        c_lo, c_hi = st.min, st.max
                    except Exception:
                        return None
                lo = c_lo if lo is None else min(lo, c_lo)
                hi = c_hi if hi is None else max(hi, c_hi)
    if lo is None:
        return None
    import datetime as _dt

    def _norm(v):
        # same canonicalization as encode_bound: naive UTC wall-clock
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v

    return _norm(lo), _norm(hi)


def _ensure_stats_friendly_writes(spark: SparkSession) -> None:
    """Spark's default parquet timestamp encoding is the deprecated INT96,
    which carries NO column statistics — a timestamp column written that
    way can never be manifest- or footer-pruned. Pin TIMESTAMP_MICROS (the
    standard parquet logical type; every modern reader handles it) before
    any catalog write so time-range pruning works. Runtime-settable, so
    this also covers vanilla driver-provided sessions."""
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")


def write_dataframe_partitioned(
    df: DataFrame, md, rel_dir: str, abs_dir: str
) -> tuple[list[str], dict[str, dict], dict[str, str]]:
    """Write ``df`` as parquet under the CURRENT partition spec's shadow
    ``partitionBy`` (the same hive-path tuple recording the transaction
    append path uses, table.py ``append_dataframe``), so every written
    file carries a complete current-spec partition tuple. Returns
    (new rel files, partition tuples by rel, abs path by rel). Used by
    maintenance rewrites that must RE-TUPLE old-spec cohorts
    (``rewrite_files_to_current_spec``)."""
    import glob as _glob
    import os as _os
    import re as _re2
    import urllib.parse as _up

    _ensure_stats_friendly_writes(df.sparkSession)
    spec = md.partition_spec
    new_files: list[str] = []
    partitions: dict[str, dict] = {}
    abs_by_rel: dict[str, str] = {}
    if not spec:
        df.write.mode("overwrite").parquet(abs_dir)
        for p in sorted(_glob.glob(_os.path.join(abs_dir, "*.parquet"))):
            rel = posixpath.join(rel_dir, _os.path.basename(p))
            new_files.append(rel)
            abs_by_rel[rel] = p
        return new_files, partitions, abs_by_rel

    dtypes = {f.name: f.dataType for f in df.schema.fields}

    def _shadow_name(entry: str) -> str:
        return "__p_" + _re2.sub(r"[^A-Za-z0-9_]", "_", entry)

    shadow_to_entry = {_shadow_name(e): e for e in spec}
    _bh = _bucket_hash_of(md)
    aug = df
    for e in spec:
        col = parse_partition_field(e)[2]
        aug = aug.withColumn(
            _shadow_name(e), transform_column(e, dtypes.get(col), bucket_hash=_bh)
        )
    aug.write.mode("overwrite").partitionBy(
        *[_shadow_name(e) for e in spec]
    ).parquet(abs_dir)
    for p in sorted(_glob.glob(_os.path.join(abs_dir, *["*"] * len(spec), "*.parquet"))):
        rel = posixpath.join(rel_dir, _os.path.relpath(p, abs_dir))
        tuple_vals = {}
        for seg in _os.path.relpath(p, abs_dir).split(_os.sep)[:-1]:
            k, _, v = seg.partition("=")
            entry = shadow_to_entry.get(
                k, k[len("__p_"):] if k.startswith("__p_") else k
            )
            val = _up.unquote(v)
            tuple_vals[entry] = None if val == "__HIVE_DEFAULT_PARTITION__" else val
        partitions[rel] = tuple_vals
        abs_by_rel[rel] = p
        new_files.append(rel)
    return new_files, partitions, abs_by_rel


class TableBuilder:
    """Staged create (mod.rs:349-357): holds location + schema until
    ``commit`` writes metadata v1 and registers the pointer."""

    def __init__(
        self,
        catalog: PostgresCatalog,
        identifier: TableIdentifier,
        location: str,
        schema: StructType,
        identifier_field_ids: list[int] | None = None,
        partition_by: list[str] | None = None,
    ):
        self.catalog = catalog
        self.identifier = identifier
        self.location = location
        self.schema = schema
        self.identifier_field_ids = identifier_field_ids
        if partition_by:
            validate_partition_spec(partition_by, schema)
        self.partition_by = list(partition_by or [])

    def commit(self) -> "Table":
        """Write v1 metadata JSON to the warehouse, then register_table
        (create path E1 in SURVEY §3)."""
        metadata = TableMetadata.new(
            self.location,
            self.schema,
            self.identifier_field_ids,
            partition_spec=self.partition_by,
        )
        # New tables are spec-faithful murmur3 bucketing, recorded explicitly
        # so readers never have to guess; pre-existing tables lack the
        # property and keep legacy CRC-32 semantics (_bucket_hash_of).
        metadata.properties.setdefault(BUCKET_HASH_PROP, DEFAULT_BUCKET_HASH)
        metadata_location = posixpath.join(
            self.location, "metadata", f"v1-{uuid.uuid4().hex}.metadata.json"
        )
        self.catalog.object_store().put(metadata_location, metadata.to_json().encode())
        return self.catalog.register_table(self.identifier, metadata_location)


class Table:
    """Table handle bound to its catalog (mod.rs:222-228)."""

    def __init__(
        self,
        identifier: TableIdentifier,
        catalog: PostgresCatalog,
        metadata: TableMetadata,
        metadata_location: str,
    ):
        self.identifier = identifier
        self.catalog = catalog
        self.metadata = metadata
        self._metadata_location = metadata_location

    def metadata_location(self) -> str:  # mod.rs:464, 469
        return self._metadata_location

    @property
    def schema(self) -> StructType:
        return self.metadata.spark_schema

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        store = self.catalog.object_store()
        if snapshot_id is not None:
            files = self.metadata.snapshot_by_id(snapshot_id).data_files
        else:
            files = self.metadata.current_data_files()
        return [store.resolve(f) for f in files]

    def delete_files(self, snapshot_id: int | None = None) -> list[str]:
        store = self.catalog.object_store()
        if snapshot_id is not None:
            files = self.metadata.snapshot_by_id(snapshot_id).delete_files
        else:
            files = self.metadata.current_delete_files()
        return [store.resolve(f) for f in files]

    def position_delete_files(self, snapshot_id: int | None = None) -> list[str]:
        store = self.catalog.object_store()
        if snapshot_id is not None:
            files = self.metadata.snapshot_by_id(snapshot_id).position_delete_files
        else:
            files = self.metadata.current_position_delete_files()
        return [store.resolve(f) for f in files]

    def deletion_vectors(self, snapshot_id: int | None = None) -> dict:
        """The snapshot's deletion-vector map: data-file REL path ->
        {"puffin", "offset", "length", "cardinality"} (Iceberg v3 —
        catalog/dv.py). Empty dict when the snapshot carries none."""
        if snapshot_id is not None:
            return dict(self.metadata.snapshot_by_id(snapshot_id).deletion_vectors)
        return self.metadata.current_deletion_vectors()

    def column_renames(self) -> list[dict]:
        """Chronological rename log: ``{"field-id", "from", "to",
        "as-of-seq"}`` per rename, recorded by ``commit_schema`` when a
        field keeps its id but changes name. Files whose sequence number
        predates a rename's ``as-of-seq`` physically carry the old name."""
        return list(self.metadata.properties.get("column-renames", []))

    def column_defaults(self) -> list[dict]:
        """Initial-default log (Iceberg v3 ``initial-default``): ``{"field-id",
        "default", "as-of-seq"}`` per added-with-default column. Files whose
        sequence number predates ``as-of-seq`` were written BEFORE the column
        existed; reads fill the default for exactly those files — a NULL
        explicitly written after the add stays NULL (the distinction the
        seq scoping exists for)."""
        return list(self.metadata.properties.get("column-defaults", []))

    def physical_name(self, column: str, file_seq: int) -> str:
        """The name ``column`` (a CURRENT logical name) had when a file at
        ``file_seq`` was written — walk the rename log backwards through
        every rename that happened after the file. Chained renames a→b→c
        compose."""
        name = column
        for r in reversed(self.column_renames()):
            if r["to"] == name and file_seq < r["as-of-seq"]:
                name = r["from"]
        return name

    def current_name(self, written_name: str, file_seq: int) -> str:
        """Forward mapping: the current logical name of a column that was
        written as ``written_name`` in a file at ``file_seq``."""
        name = written_name
        for r in self.column_renames():
            if r["from"] == name and file_seq < r["as-of-seq"]:
                name = r["to"]
        return name

    def _resolve_chain(self, name: str, file_seq: int) -> tuple[str, float]:
        """Walk the rename log backwards for one current logical name:
        returns ``(physical_name, departure_seq)`` where ``departure_seq``
        is the as-of-seq of the rename that moved the column OFF that
        physical name (``inf`` when it still carries it — never renamed
        since ``file_seq``). The departure seq is what disambiguates
        recycled names: a physical name has exactly one owner at a time,
        so owners' [.., departure) intervals are disjoint and the owner at
        ``file_seq`` is the claimant with the SMALLEST departure seq."""
        dep: float = float("inf")
        for r in reversed(self.column_renames()):
            if r["to"] == name and file_seq < r["as-of-seq"]:
                name = r["from"]
                dep = r["as-of-seq"]  # last assignment in the backward walk
                # == chronologically-earliest applied rename == the one
                # whose ``from`` is the final physical name
        return name, dep

    def physical_names_at(self, file_seq: int) -> tuple[str | None, ...]:
        """Physical name of every current schema column at ``file_seq``
        (schema order), with name-recycling collisions resolved: when two
        distinct current columns resolve to the SAME physical name (the
        name was renamed away and later reused — possibly renamed again,
        e.g. y→a, add y, y→b leaves both a and b claiming 'y' for old
        cohorts), only the column that actually OWNED the name at
        ``file_seq`` keeps it; every other claimant maps to ``None``
        (absent from that cohort — read as NULL, never the old bytes).
        Ownership = smallest departure seq among claimants (see
        ``_resolve_chain``); a claimant that departed the name at seq s
        owned it until s, so for file_seq < s_min the s_min claimant is
        the owner and every later owner's data cannot be in the file."""
        fields = self.schema.fields
        if not self.column_renames():
            return tuple(f.name for f in fields)
        cache = getattr(self, "_phys_names_cache", None)
        if cache is None:
            cache = self._phys_names_cache = {}
        hit = cache.get(file_seq)
        if hit is not None:
            return hit
        resolved = [self._resolve_chain(f.name, file_seq) for f in fields]
        by_phys: dict[str, list[tuple[float, int]]] = {}
        for i, (phys, dep) in enumerate(resolved):
            by_phys.setdefault(phys, []).append((dep, i))
        out: list[str | None] = [None] * len(fields)
        for phys, claims in by_phys.items():
            winner = min(claims)[1]
            out[winner] = phys
        result = tuple(out)
        cache[file_seq] = result
        return result

    def physical_name_or_absent(self, column: str, file_seq: int) -> str | None:
        """``physical_name``, but None when ``column``'s name was RECYCLED:
        some OTHER current column historically owned ``column``'s physical
        name at ``file_seq``. Files of that cohort carry the OLD column's
        data under this name, and the newer column cannot exist in them
        under any name — so by-name stats/bounds/data lookups must treat
        it as absent, not read the old column's bytes (r7 found the
        direct-recycle case; r8 generalizes to re-renamed reuse, where two
        renamed columns collide on a shared historical name and neither
        equals it — whole-schema collision resolution via
        ``physical_names_at``)."""
        if not self.column_renames():
            return column  # fast path: no renames ever — per-file planning
            # loops must stay O(1) per column here (10^7-file tables)
        names = self.physical_names_at(file_seq)
        for f, n in zip(self.schema.fields, names):
            if f.name == column:
                return n
        return self.physical_name(column, file_seq)  # not a current column
        # (caller passed a historical name) — plain chain walk, no
        # collision arbitration possible or needed

    def _read_data_files(
        self,
        spark: SparkSession,
        rel_files: list[str],
        seqs: dict,
        extra_phys_cols: list | None = None,
        keep_metadata_cols: bool = False,
    ) -> DataFrame:
        """Read data files with rename awareness: group files by the
        PHYSICAL column names they were written with (a function of their
        sequence number and the rename log), read each group with that
        physical schema, rename to the current logical names, and union.
        With no renames this is exactly one ``spark.read.schema(...)`` —
        zero overhead on the common path. This is how column-id-based
        evolution (mod.rs:431-453 — fields tracked by id, not name) stays
        correct over name-based parquet files without rewriting them.

        ``extra_phys_cols``: (name, DataType) pairs physically present in
        these files beyond the table schema (e.g. the materialized
        ``_row_id`` column lineage-preserving compaction writes) — appended
        to each physical read schema and the output projection. Never
        subject to renames.

        ``keep_metadata_cols``: project ``_metadata.file_path`` /
        ``_metadata.row_index`` as ``__mfile``/``__mpos`` INSIDE each cohort
        (before any union) — Spark's metadata pseudo-column does not resolve
        through a Union, so consumers needing file identity on a
        rename-cohort table (the lineage join) must capture it here."""
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        from iceberg_catalog_postgres_spark.catalog.metadata import FIELD_ID_KEY as _FID

        store = self.catalog.object_store()
        fields = self.schema.fields
        logical = [f.name for f in fields]
        defaults = self.column_defaults()
        names_by_id = {
            f.metadata.get(_FID): f.name for f in fields if f.metadata and _FID in f.metadata
        }
        types_by_id = {
            f.metadata.get(_FID): f.dataType for f in fields if f.metadata and _FID in f.metadata
        }
        groups: dict[tuple, list[str]] = {}
        name_cache: dict[int, tuple] = {}
        for rel in rel_files:
            s = seqs.get(rel, 0)
            # physical_name_or_absent: a recycled column name (renamed away,
            # later reused for a new column) maps to None for cohorts whose
            # files carry the OLD column under that name — the new column is
            # read as NULL there instead of mis-reading the old bytes
            if s not in name_cache:
                name_cache[s] = self.physical_names_at(s)
            names = name_cache[s]
            # initial-defaults apply to files written BEFORE the column
            # existed (seq scoping) — part of the cohort key so the fill
            # never leaks onto post-add files
            applicable = tuple(
                sorted(
                    d["field-id"]
                    for d in defaults
                    if s < d["as-of-seq"] and d["field-id"] in names_by_id
                )
            )
            groups.setdefault((names, applicable), []).append(rel)
        parts = []
        for (names, applicable), members in sorted(
            groups.items(), key=lambda kv: tuple(n or "" for n in kv[0][0])
        ):
            phys = _ST(
                [
                    _SF(n, f.dataType, f.nullable, f.metadata)
                    for n, f in zip(names, fields)
                    if n is not None
                ]
                + [_SF(en, et, True) for en, et in (extra_phys_cols or [])]
            )
            p = spark.read.schema(phys).parquet(*[store.resolve(f) for f in members])
            remap = {o: n for o, n in zip(names, logical) if o is not None and o != n}
            if remap:
                p = p.withColumnsRenamed(remap)
            for n, f in zip(names, fields):
                if n is None:  # column absent from this cohort (recycled name)
                    p = p.withColumn(f.name, F.lit(None).cast(f.dataType))
            for d in defaults:
                fid = d["field-id"]
                if fid in applicable:
                    p = p.withColumn(
                        names_by_id[fid], F.lit(d["default"]).cast(types_by_id[fid])
                    )
            meta_cols = (
                [
                    F.col("_metadata.file_path").alias("__mfile"),
                    F.col("_metadata.row_index").alias("__mpos"),
                ]
                if keep_metadata_cols
                else []
            )
            parts.append(
                p.select(
                    *logical,
                    *[en for en, _et in (extra_phys_cols or [])],
                    *meta_cols,
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def file_bounds(
        self, rel_path: str, column: str, snapshot_id: int | None = None
    ) -> tuple | None:
        """Decoded (lo, hi) bound for ``column`` of one data file: manifest
        stats first (zero I/O), parquet footer as the statless-legacy
        fallback. ``hi`` may be None (truncated un-incrementable string upper
        bound) — callers may then prune only on the lower side. Returns None
        when no bound exists anywhere (file must be treated as
        possibly-matching)."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return None
        phys = self.physical_name_or_absent(column, snap.file_seqs.get(rel_path, 0))
        if phys is None:
            return None  # recycled name: column absent in this file's cohort
        b = ((snap.file_stats.get(rel_path) or {}).get("bounds") or {}).get(phys)
        if b is not None:
            return decode_bound(b[0]), (None if b[1] is None else decode_bound(b[1]))
        return _file_range_stats(self.catalog.object_store().resolve(rel_path), phys)

    @staticmethod
    def _bounds_prune_ok(st: dict | None, column: str, f_lo, f_hi) -> bool:
        """May this file's [min, max] for ``column`` be TRUSTED for range
        pruning? Always for non-float bounds. Float/double bounds exclude
        NaN (parquet spec) while Spark orders NaN above every value, so
        they prune only when the manifest's ``nan_value_counts`` proves
        the file NaN-free (r16); a missing count (legacy file, foreign
        writer) keeps the file — superset-safe."""
        if not (isinstance(f_lo, float) or isinstance(f_hi, float)):
            return True
        return ((st or {}).get("nan_counts") or {}).get(column) == 0

    def planned_files(
        self, column: str, lo, hi, snapshot_id: int | None = None,
        require_stats: bool = False, footer_fallback: bool = True,
    ) -> list[str]:
        """Metadata-driven scan planning: the snapshot's data files whose
        manifest [min, max] for ``column`` intersects [lo, hi] (files without
        any bound are kept — they might match). This is the Iceberg
        manifest-bounds prune: stats were written into the snapshot at commit
        time, so at 100 TB a time-range query over a range-partitioned table
        plans the handful of matching files from the metadata JSON alone —
        zero file opens, no listing. Files committed before stats existed
        (or via raw ``append_files``) fall back to one footer read each;
        ``require_stats=True`` turns that fallback into an error so tests
        can certify the pure-metadata path; ``footer_fallback=False`` KEEPS
        statless files without opening them (pure-metadata superset — the
        SQL planner's mode, where planning must never do O(files) I/O).
        Either bound may be None for a HALF-OPEN interval (r15)."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return []
        store = self.catalog.object_store()
        refs = snap.chunk_refs()
        if refs is not None and not self.column_renames():
            # Two-level prune (Iceberg manifest-list model): a chunk whose
            # SUMMARY bounds cover every data entry and are provably
            # disjoint from [lo, hi] is skipped without being fetched —
            # planning cost is O(matching chunks), not O(all files). Gated
            # on an empty rename log so the summary's physical column names
            # are exactly the logical ones; renamed tables fall through to
            # the per-entry path below, which resolves names per file seq.
            out = []
            for c in refs:
                s = c["summary"]
                nd = s["counts"]["data"]
                if nd == 0:
                    continue
                cb = s["bounds"].get(column)
                if cb is not None and cb["n"] == nd:
                    c_lo = decode_bound(cb["lo"])
                    c_hi = None if cb["hi"] is None else decode_bound(cb["hi"])
                    # float summary bounds skip the chunk only when the
                    # summary proves EVERY covered entry NaN-free (r16);
                    # pre-r16 summaries lack "nan0" and fall through to
                    # the per-entry nan_counts guard below
                    float_ok = (
                        not (isinstance(c_lo, float) or isinstance(c_hi, float))
                        or cb.get("nan0") == nd
                    )
                    if float_ok and (
                        (lo is not None and c_hi is not None and c_hi < lo)
                        or (hi is not None and c_lo is not None and c_lo > hi)
                    ):
                        continue  # whole chunk disjoint — never fetched
                doc = load_chunk(store, c["path"])
                for e in doc["entries"]:
                    if e["kind"] != "data":
                        continue
                    rel = e["path"]
                    b = ((e.get("stats") or {}).get("bounds") or {}).get(column)
                    if b is not None:
                        f_lo = decode_bound(b[0])
                        f_hi = None if b[1] is None else decode_bound(b[1])
                        if self._bounds_prune_ok(
                            e.get("stats"), column, f_lo, f_hi
                        ) and (
                            (lo is not None and f_hi is not None and f_hi < lo)
                            or (hi is not None and f_lo is not None and f_lo > hi)
                        ):
                            continue
                        out.append(store.resolve(rel))
                        continue
                    if require_stats:
                        raise ValueError(
                            f"no manifest bounds for column {column!r} on {rel}"
                        )
                    if not footer_fallback:
                        out.append(store.resolve(rel))  # statless: keep, no I/O
                        continue
                    stats = _file_range_stats(store.resolve(rel), column)
                    if stats is None or not (
                        (lo is not None and stats[1] < lo)
                        or (hi is not None and stats[0] > hi)
                    ):
                        out.append(store.resolve(rel))
            return out
        out = []
        for rel in snap.data_files:
            phys = self.physical_name_or_absent(column, snap.file_seqs.get(rel, 0))
            if phys is None:
                # recycled name: the column is all-NULL in this cohort, and
                # NULL never satisfies a range predicate — prune exactly
                continue
            b = ((snap.file_stats.get(rel) or {}).get("bounds") or {}).get(phys)
            if b is not None:
                f_lo = decode_bound(b[0])
                f_hi = None if b[1] is None else decode_bound(b[1])
                if self._bounds_prune_ok(
                    snap.file_stats.get(rel), phys, f_lo, f_hi
                ) and (
                    (lo is not None and f_hi is not None and f_hi < lo)
                    or (hi is not None and f_lo is not None and f_lo > hi)
                ):
                    continue  # provably disjoint, pruned from metadata alone
                out.append(store.resolve(rel))
                continue
            if require_stats:
                raise ValueError(f"no manifest bounds for column {column!r} on {rel}")
            if not footer_fallback:
                out.append(store.resolve(rel))  # statless: keep, no I/O
                continue
            stats = _file_range_stats(store.resolve(rel), phys)
            if stats is None or not (
                (lo is not None and stats[1] < lo)
                or (hi is not None and stats[0] > hi)
            ):
                out.append(store.resolve(rel))
        return out

    def planned_files_nullness(
        self, column: str, want_null: bool, snapshot_id: int | None = None
    ) -> list[str]:
        """IS NULL / IS NOT NULL scan planning from manifest null counts
        (Iceberg ``null_value_counts``), zero file opens: for ``IS NOT
        NULL`` a file whose ``null_count == record_count`` (every row null)
        provably matches nothing and is pruned; for ``IS NULL`` a file with
        ``null_count == 0`` is pruned. Files without a recorded null count
        are kept (superset-safe). At 100 TB this is what makes
        completeness-style DQ scans (``WHERE col IS NOT NULL``) skip the
        legacy files written before a column was backfilled."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return []
        store = self.catalog.object_store()
        refs = snap.chunk_refs()
        if refs is not None and not self.column_renames():
            # two-level nullness prune: a chunk whose summary proves every
            # covered data entry is uniformly no-null (for IS NULL) or
            # all-null (for IS NOT NULL) is skipped without being fetched
            out = []
            for c in refs:
                s = c["summary"]
                nd = s["counts"]["data"]
                if nd == 0:
                    continue
                nn = (s.get("nullness") or {}).get(column)
                if nn is not None and nn["n"] == nd:
                    if want_null and nn["no_null"] == nd:
                        continue
                    if not want_null and nn["all_null"] == nd:
                        continue
                for e in load_chunk(store, c["path"])["entries"]:
                    if e["kind"] != "data":
                        continue
                    st = e.get("stats") or {}
                    nc = (st.get("null_counts") or {}).get(column)
                    rc = st.get("record_count")
                    if nc is not None:
                        if want_null and nc == 0:
                            continue
                        if not want_null and rc is not None and nc == rc:
                            continue
                    out.append(store.resolve(e["path"]))
            return out
        out = []
        for rel in snap.data_files:
            st = snap.file_stats.get(rel) or {}
            phys = self.physical_name_or_absent(column, snap.file_seqs.get(rel, 0))
            if phys is None:
                # recycled name: column is all-NULL in this cohort — exact
                if not want_null:
                    continue
                out.append(store.resolve(rel))
                continue
            nc = (st.get("null_counts") or {}).get(phys)
            rc = st.get("record_count")
            if nc is not None:
                if want_null and nc == 0:
                    continue  # no nulls in this file: IS NULL matches nothing
                if not want_null and rc is not None and nc == rc:
                    continue  # all rows null: IS NOT NULL matches nothing
            out.append(store.resolve(rel))
        return out

    def record_count(
        self, snapshot_id: int | None = None, files: list[str] | None = None, kind: str = "data"
    ) -> int:
        """Row count from manifest ``record_count`` sums — O(#files) metadata
        fold, ZERO data reads (Iceberg serves ``table$snapshots`` /
        ``total-records`` exactly this way). ``kind`` selects which file list
        to fold: "data", "eq-delete", or "pos-delete" (the delete-file counts
        are what lets a MOR read report how many delete entries apply without
        re-scanning the delete files). ``files`` restricts the fold to a
        subset (table-relative paths) — the incremental-read delta count.
        Statless legacy files cost one footer ``num_rows`` read each (still
        metadata I/O, never a data scan).

        Note: like Iceberg's ``total-records`` summary this counts rows IN
        the data files; it does not net out merge-on-read deletes (use
        ``kind="eq-delete"``/``"pos-delete"`` to see the pending delete
        volume)."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return 0
        if kind == "dv":
            # deletion vectors: cardinality lives in the snapshot's DV map
            # (written at commit time from the bitmap) — zero I/O
            return sum(int(e["cardinality"]) for e in snap.deletion_vectors.values())
        if files is None:
            # Manifest-list fold first: O(#chunks) over the summaries, zero
            # chunk fetches (Iceberg's total-records summary) — at 10^7
            # files the count comes from a few thousand summary dicts
            # already in the metadata JSON.
            folded = snap.chunk_records(kind)
            if folded is not None:
                return folded
            files = {
                "data": snap.data_files,
                "eq-delete": snap.delete_files,
                "pos-delete": snap.position_delete_files,
            }[kind]
        store = self.catalog.object_store()
        total = 0
        for rel in files:
            st = snap.file_stats.get(rel)
            if st is not None and "record_count" in st:
                total += st["record_count"]
            else:
                import pyarrow.parquet as pq

                global PLANNING_FOOTER_READS
                PLANNING_FOOTER_READS += 1
                total += pq.ParquetFile(store.resolve(rel)).metadata.num_rows
        return total

    def total_bytes(self, snapshot_id: int | None = None, kind: str = "data") -> int:
        """Storage footprint from manifest ``file_size_bytes`` — the same
        metadata fold as ``record_count`` (chunk summaries first, per-file
        stats next, one ``getsize`` per statless legacy file last). This is
        what byte-based compaction targets and storage billing read; at
        10^7 files the answer never touches a listing."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return 0
        if kind == "dv":
            return sum(int(e["length"]) for e in snap.deletion_vectors.values())
        refs = snap.chunk_refs()
        if refs is not None:
            total = 0
            complete = True
            for c in refs:
                b = (c["summary"].get("bytes") or {}).get(kind)
                if b is None:
                    complete = False
                    break
                total += b
            if complete:
                return total
        files = {
            "data": snap.data_files,
            "eq-delete": snap.delete_files,
            "pos-delete": snap.position_delete_files,
        }[kind]
        store = self.catalog.object_store()
        total = 0
        for rel in files:
            st = snap.file_stats.get(rel) or {}
            if "file_size_bytes" in st:
                total += st["file_size_bytes"]
            else:
                import os as _os

                total += _os.path.getsize(store.resolve(rel))
        return total

    def partition_entry_spellings(self, entry: str) -> list[str]:
        """All spellings ``entry`` has had over the table's life: the current
        string plus every historical spelling recorded when a rename of its
        SOURCE column rewrote the spec (``partition-entry-renames``, r7).
        Old files' recorded tuples are keyed by the spelling current at
        write time; planners match against any spelling — the transform and
        value are unchanged by a rename, only the label."""
        log = self.metadata.properties.get("partition-entry-renames", [])
        aliases: dict[str, list[str]] = {}
        for r in log:
            olds = aliases.pop(r["from"], [])
            aliases[r["to"]] = [*olds, r["from"]]
        return [entry, *aliases.get(entry, [])]

    def _entry_rename_log_scoped(self) -> list | None:
        """The entry-rename log when every record is seq-scoped (r8), [] when
        there are no renames, None for a legacy unscoped log (pre-r8 records
        lack ``as-of-seq`` — callers fall back to the multi-spelling match,
        which is exact for simple renames; the recycled-label hazard below
        only arises for logs written after labels could be scoped)."""
        cached = getattr(self, "_entry_log_scoped_cache", False)
        if cached is not False:
            return cached
        log = self.metadata.properties.get("partition-entry-renames", [])
        if not log:
            out: list | None = []
        elif any("as-of-seq" not in r for r in log):
            out = None
        else:
            out = log
        self._entry_log_scoped_cache = out
        return out

    def entry_spelling_or_absent(self, entry: str, file_seq: int) -> str | None:
        """The label ``entry``'s values were recorded under in partition
        tuples of files at ``file_seq`` — or None when that cohort's tuples
        CANNOT carry this entry: its resolved label was owned by a DIFFERENT
        entry's chain at that seq (recycled labels — rename the source, add
        a new column under the old name, put it in the spec; r8 found the
        unscoped multi-spelling match reading the NEW column's tuples as
        historical values of the OLD entry, wrongly excluding files from
        partition-filtered reads). Mirror of ``physical_name_or_absent`` at
        the tuple-key level. Requires a fully scoped log
        (``_entry_rename_log_scoped``)."""
        cache = getattr(self, "_entry_spelling_cache", None)
        if cache is None:
            cache = self._entry_spelling_cache = {}
        key = (entry, file_seq)
        if key in cache:
            return cache[key]
        log = self._entry_rename_log_scoped() or []
        name = entry
        used: set[int] = set()
        for r in reversed(log):
            if r["to"] == name and file_seq < r["as-of-seq"]:
                name = r["from"]
                used.add(id(r))
        out: str | None = name
        for r in log:
            # a rename OFF this label after file_seq that is NOT part of our
            # own chain means another entry owned the label at file_seq
            if r["from"] == name and file_seq < r["as-of-seq"] and id(r) not in used:
                out = None
                break
        cache[key] = out
        return out

    def _entries_chunk_excludable(self, entries) -> set:
        """Entries whose labels never appear in the rename log: for these,
        a chunk summary keyed by the label covers exactly this entry's
        values and chunk-level exclusion is exact. Touched labels (renamed
        or recycled) skip chunk exclusion under a scoped log — per-entry
        seq-aware matching still prunes exactly; only the chunk-fetch
        short-cut is given up."""
        log = self.metadata.properties.get("partition-entry-renames", [])
        touched = {r["from"] for r in log} | {r["to"] for r in log}
        return {e for e in entries if e not in touched}

    def _tuple_value(
        self, tup: dict, key: str, spellings: dict, file_seq: int | None = None
    ) -> tuple[bool, object]:
        """(present, value) for ``key`` in a recorded partition tuple. With
        ``file_seq`` and a fully seq-scoped rename log, the match resolves
        the SINGLE label the entry had at that seq (absent for foreign-owned
        labels — see ``entry_spelling_or_absent``); otherwise every
        historical spelling is checked (legacy behavior, exact for
        un-recycled labels)."""
        scoped = self._entry_rename_log_scoped()
        if scoped == []:  # no renames ever: plain lookup, no cache churn
            if key in tup:
                return True, tup[key]
            return False, None
        if file_seq is not None and scoped is not None:
            s = self.entry_spelling_or_absent(key, file_seq)
            if s is None or s not in tup:
                return False, None
            return True, tup[s]
        for s in spellings.get(key, (key,)):
            if s in tup:
                return True, tup[s]
        return False, None

    def planned_files_partition(
        self, filters: dict, snapshot_id: int | None = None
    ) -> list[str]:
        """Partition pruning from METADATA ALONE (Iceberg manifest partition
        summaries): keep data files whose recorded identity-partition tuple
        matches every ``{column: value}`` filter. Unlike ``planned_files``
        (footer stats), this opens zero files — at 10^7 files the plan is a
        dictionary scan, which is why identity/time partitioning is the first
        line of defense at 100 TB. Files without a recorded tuple are kept
        (superset-safe). Tuple keys written before a source-column rename
        match via the entry's historical spellings (r7)."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return []
        store = self.catalog.object_store()
        spells = {col: self.partition_entry_spellings(col) for col in filters}

        def tup_matches(tup, svals, seq) -> bool:
            for col, sv in svals.items():
                present, v = self._tuple_value(tup, col, spells, file_seq=seq)
                if not present:
                    # tuple recorded under a DIFFERENT spec (partition
                    # evolution): the file may still contain matching rows —
                    # keep it (superset-safe; r7: excluding here silently
                    # dropped old-spec rows from partition-filtered reads)
                    continue
                if v != sv:
                    return False
            return True

        refs = snap.chunk_refs()
        if refs is not None:
            # Two-level partition prune: a chunk whose summary's distinct
            # partition values cover every data entry and exclude the
            # filter value is skipped without being fetched.
            svals = {col: (None if v is None else str(v)) for col, v in filters.items()}
            excludable = self._entries_chunk_excludable(svals)  # r8
            out = []
            for c in refs:
                s = c["summary"]
                nd = s["counts"]["data"]
                if nd == 0:
                    continue
                parts = s.get("partitions", {})
                skip = False
                for col, sv in svals.items():
                    if col not in excludable:
                        continue
                    # a chunk is excludable only when ONE spelling's summary
                    # covers every data entry and excludes the value (a
                    # chunk mixing spellings has per-spelling n < nd)
                    for sp in spells[col]:
                        p = parts.get(sp)
                        if p is not None and p["n"] == nd and sv not in p["values"]:
                            skip = True
                            break
                    if skip:
                        break
                if skip:
                    continue  # whole chunk excluded — never fetched
                for e in load_chunk(store, c["path"])["entries"]:
                    if e["kind"] != "data":
                        continue
                    tup = e.get("partition")
                    if tup is None or tup_matches(tup, svals, e.get("seq", 0)):
                        out.append(store.resolve(e["path"]))
            return out
        svals = {col: (None if v is None else str(v)) for col, v in filters.items()}
        out = []
        for f in snap.data_files:
            tup = snap.file_partitions.get(f)
            if tup is None or tup_matches(tup, svals, snap.file_seqs.get(f, 0)):
                out.append(store.resolve(f))
        return out

    def planned_files_transformed(
        self, filters: dict, snapshot_id: int | None = None
    ) -> list[str]:
        """Transform-aware partition pruning: ``filters`` maps SOURCE column
        -> query value; each spec entry over a filtered column is applied
        DRIVER-SIDE (``transform_value`` — murmur3-32 bucket per the Iceberg
        spec, or legacy CRC-32 when the table's ``write.bucket-hash``
        property says so; truncate prefix/floor; pure Python, no Spark job)
        and the resulting tuple values prune via
        ``planned_files_partition``. This is how a point lookup on a
        ``bucket(N, key)``-partitioned 100 TB table plans 1/N of the files
        from the metadata dictionary alone. The query value is coerced to
        the SOURCE column's schema type before hashing (an int column
        filtered with "34" still plans the right bucket — the r5 ADVICE
        canonicalization trap). Identity specs degrade to the plain path,
        so callers can always use this entry point."""
        spec = self.metadata.partition_spec
        bucket_hash = _bucket_hash_of(self.metadata)
        src_types = {f.name: f.dataType.simpleString() for f in self.schema.fields}
        tuple_filters = {}
        for entry in spec:
            col = parse_partition_field(entry)[2]
            if col in filters and not isinstance(
                filters[col], NullnessConstraint
            ):
                tuple_filters[entry] = transform_value(
                    entry, filters[col], bucket_hash=bucket_hash,
                    src_type=src_types.get(col),
                )
        if not tuple_filters:
            # no spec entry covers the filtered columns: every file might match
            store = self.catalog.object_store()
            return [store.resolve(f) for f in self.metadata.current_data_files()] \
                if snapshot_id is None else [
                    self.catalog.object_store().resolve(f)
                    for f in self.metadata.snapshot_by_id(snapshot_id).data_files
                ]
        return self.planned_files_partition(tuple_filters, snapshot_id=snapshot_id)

    def planned_files_composed(
        self,
        ranges: dict | None = None,
        points: dict | None = None,
        snapshot_id: int | None = None,
    ) -> list[str]:
        """ONE planner call composing RANGE predicates over monotone
        transforms with POINT predicates over any transform, against a
        multi-entry spec — the "ts BETWEEN a AND b AND region = r" query
        on a ``(day(ts), bucket(N,region))`` layout plans the intersection
        in a single walk of the manifest index (pre-r8 it took two walks
        whose file sets were intersected driver-side; at 10^7 files the
        chunk index is the planning cost, so one pass halves it).

        ``ranges``: {source col: (lo, hi)} — applied through every MONOTONE
        entry over that column (year/month/day/hour, integer truncate,
        integer identity); bucket and string-truncate entries are skipped
        for ranges (non-monotone / lexicographic — superset-safe). Either
        side may be None for a HALF-OPEN interval (r15 — ``ts >= X``
        prunes from the lower bound alone; a monotone transform preserves
        order, so T(lo) bounds the transformed values exactly).
        ``points``: {source col: value | [values]} — applied through EVERY
        entry over that column via the driver-side transform (bucket
        murmur3 included), exactly ``planned_files_transformed``'s
        mapping. A LIST of values (r13 — SQL ``IN`` predicates) plans as
        set membership in the SAME single walk: a file survives when its
        tuple matches ANY of the values, a chunk is excluded when its
        summary covers every entry and intersects none of them.

        Two-level: a manifest chunk whose partition summary covers every
        data entry and excludes the point value (or contains no value
        inside the range) for ANY constrained entry is skipped without
        being fetched. Files without a recorded tuple, or whose tuple was
        written under a different spec (partition evolution), are kept —
        superset-safe, matching the single-predicate planners."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return []
        ranges = ranges or {}
        points = points or {}
        store = self.catalog.object_store()
        src_types = {f.name: f.dataType.simpleString() for f in self.schema.fields}
        bucket_hash = _bucket_hash_of(self.metadata)
        bounds: dict[str, tuple[int, int]] = {}
        eq_vals: dict[str, set] = {}  # entry -> allowed transformed values
        for entry in self.metadata.partition_spec:
            kind, _param, src = parse_partition_field(entry)
            if src in points:
                pv = points[src]
                if isinstance(pv, NullnessConstraint):
                    continue  # handled by planned_files_nullness (r15)
                allowed = set()
                for v in (pv if isinstance(pv, (list, tuple, set)) else [pv]):
                    t = transform_value(
                        entry, v, bucket_hash=bucket_hash,
                        src_type=src_types.get(src),
                    )
                    allowed.add(None if t is None else str(t))
                eq_vals[entry] = allowed
                continue  # equality subsumes any range over the same entry
            if src in ranges and kind != "bucket" and not (
                kind == "truncate" and src_types.get(src) == "string"
            ):
                # either side may be None — a half-open interval (r15:
                # ``ts >= X`` prunes via the monotone lower bound alone)
                lo, hi = ranges[src]
                try:
                    a = None if lo is None else int(
                        transform_value(entry, lo, src_type=src_types.get(src))
                    )
                    b = None if hi is None else int(
                        transform_value(entry, hi, src_type=src_types.get(src))
                    )
                except (TypeError, ValueError):
                    continue  # non-integer transformed bounds: drop entry
                if a is None and b is None:
                    continue
                bounds[entry] = (a, b)
        if not bounds and not eq_vals:
            return [store.resolve(f) for f in snap.data_files]
        spells = {
            e: self.partition_entry_spellings(e) for e in (*bounds, *eq_vals)
        }

        def tuple_ok(tup, seq) -> bool:
            if tup is None:
                return True
            for entry, allowed in eq_vals.items():
                present, v = self._tuple_value(tup, entry, spells, file_seq=seq)
                if present and v not in allowed:
                    return False
            for entry, (a, b) in bounds.items():
                present, v = self._tuple_value(tup, entry, spells, file_seq=seq)
                if not present or v is None:
                    continue
                try:
                    iv = int(v)
                except (TypeError, ValueError):
                    continue
                if not _in_bounds(iv, a, b):
                    return False
            return True

        refs = snap.chunk_refs()
        if refs is None:
            return [
                store.resolve(f)
                for f in snap.data_files
                if tuple_ok(snap.file_partitions.get(f), snap.file_seqs.get(f, 0))
            ]
        # chunk-level exclusion only for labels untouched by renames — a
        # renamed/recycled label's summary can mix owners (r8); per-entry
        # seq-aware matching below still prunes exactly
        excludable = self._entries_chunk_excludable(spells)
        out = []
        for c in refs:
            s = c["summary"]
            nd = s["counts"]["data"]
            if nd == 0:
                continue
            parts = s.get("partitions", {})
            skip = False
            for entry in spells:
                if entry not in excludable:
                    continue
                for sp in spells[entry]:
                    p = parts.get(sp)
                    if p is None or p["n"] != nd:
                        continue
                    if entry in eq_vals and not any(
                        x in p["values"] for x in eq_vals[entry]
                    ):
                        skip = True
                        break
                    if entry in bounds:
                        a, b = bounds[entry]
                        vals = []
                        for v in p["values"]:
                            try:
                                vals.append(int(v))
                            except (TypeError, ValueError):
                                vals = None
                                break
                        if vals is not None and all(
                            not _in_bounds(iv, a, b) for iv in vals
                        ):
                            skip = True
                            break
                if skip:
                    break
            if skip:
                continue  # whole chunk excluded — never fetched
            for e in load_chunk(store, c["path"])["entries"]:
                if e["kind"] != "data":
                    continue
                if tuple_ok(e.get("partition"), e.get("seq", 0)):
                    out.append(store.resolve(e["path"]))
        return out

    def planned_files_transformed_range(
        self, col: str, lo, hi, snapshot_id: int | None = None
    ) -> list[str]:
        """RANGE pruning over a MONOTONE partition transform — the dominant
        access pattern on temporal layouts ("ts BETWEEN a AND b" on a
        day(ts)-partitioned table plans only the touched days). The query
        bounds map driver-side to transformed bounds [T(lo), T(hi)]
        (year/month/day/hour and integer truncate are monotone, so value
        containment is exact; identity over ints degrades to the same
        compare; bucket is NOT monotone and is skipped), and files prune by
        integer comparison of their recorded tuple values — metadata only,
        zero footers. Two-level: a manifest chunk whose partition summary
        covers every data entry and contains no value inside the range is
        skipped without being fetched. Files without a recorded tuple (or
        under a non-monotone-only spec) are kept — superset-safe."""
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if snap is None:
            return []
        store = self.catalog.object_store()
        src_types = {f.name: f.dataType.simpleString() for f in self.schema.fields}
        bounds: dict[str, tuple[int, int]] = {}
        for entry in self.metadata.partition_spec:
            kind, _param, src = parse_partition_field(entry)
            if src != col or kind == "bucket" or (
                kind == "truncate" and src_types.get(src) == "string"
            ):
                continue  # non-monotone (bucket) / lexicographic (str truncate)
            try:
                a = None if lo is None else int(
                    transform_value(entry, lo, src_type=src_types.get(src))
                )
                b = None if hi is None else int(
                    transform_value(entry, hi, src_type=src_types.get(src))
                )
            except (TypeError, ValueError):
                # e.g. identity over a string source: transformed bounds are
                # not integers — drop the entry (superset-safe fallback),
                # matching the point planner's tolerance of this spec shape
                continue
            if a is None and b is None:
                continue  # unbounded both sides: nothing to prune on
            bounds[entry] = (a, b)
        if not bounds:
            return [store.resolve(f) for f in snap.data_files]
        spells = {e: self.partition_entry_spellings(e) for e in bounds}

        def tuple_ok(tup, seq) -> bool:
            if tup is None:
                return True
            for entry, (a, b) in bounds.items():
                present, v = self._tuple_value(tup, entry, spells, file_seq=seq)
                if not present or v is None:
                    continue
                try:
                    iv = int(v)
                except (TypeError, ValueError):
                    continue
                if not _in_bounds(iv, a, b):
                    return False
            return True

        refs = snap.chunk_refs()
        if refs is None:
            return [
                store.resolve(f)
                for f in snap.data_files
                if tuple_ok(snap.file_partitions.get(f), snap.file_seqs.get(f, 0))
            ]
        excludable = self._entries_chunk_excludable(spells)  # r8: see above
        out = []
        for c in refs:
            s = c["summary"]
            nd = s["counts"]["data"]
            if nd == 0:
                continue
            parts = s.get("partitions", {})
            skip = False
            for entry, (a, b) in bounds.items():
                if entry not in excludable:
                    continue
                for sp in spells[entry]:
                    p = parts.get(sp)
                    if p is not None and p["n"] == nd:
                        vals = []
                        for v in p["values"]:
                            try:
                                vals.append(int(v))
                            except (TypeError, ValueError):
                                vals = None
                                break
                        if vals is not None and all(
                            not _in_bounds(iv, a, b) for iv in vals
                        ):
                            skip = True
                            break
                if skip:
                    break
            if skip:
                continue  # whole chunk excluded — never fetched
            for e in load_chunk(store, c["path"])["entries"]:
                if e["kind"] != "data":
                    continue
                if tuple_ok(e.get("partition"), e.get("seq", 0)):
                    out.append(store.resolve(e["path"]))
        return out

    def _commit_metadata_edit(self, edit_fn, label: str, max_retries: int = 5) -> "Table":
        """Commit a metadata-only edit (refs, partition spec, schema) via the
        CAS swap, with bounded retry: on conflict, reload the winner's
        metadata and re-apply the edit to it. These edits commute with data
        commits (they touch disjoint metadata fields), so blind re-apply is
        safe — unlike an overwrite transaction, nothing computed from the
        file set is being replayed."""
        import posixpath as _pp
        import random as _random
        import time as _time
        import uuid as _uuid

        current = self
        for attempt in range(max_retries + 1):
            new_md = edit_fn(current.metadata).with_log_entry(
                current._metadata_location, current.metadata.last_updated_ms
            )
            store = current.catalog.object_store()
            new_location = _pp.join(
                current.metadata.location,
                "metadata",
                f"{label}-{_uuid.uuid4().hex}.metadata.json",
            )
            store.put(new_location, new_md.to_json().encode())
            try:
                return current.catalog.update_table(
                    current.identifier, new_location, current._metadata_location
                )
            except CommitConflictError:
                if attempt == max_retries:
                    raise
                _time.sleep(_random.uniform(0.01, 0.05) * (attempt + 1))
                current = current.catalog.load_table(current.identifier)
        raise AssertionError("unreachable")

    def set_ref(
        self,
        name: str,
        snapshot_id: int | None = None,
        ref_type: str = "tag",
        min_snapshots_to_keep: int | None = None,
        max_snapshot_age_ms: int | None = None,
        max_ref_age_ms: int | None = None,
    ) -> "Table":
        """Create/move a named snapshot ref (Iceberg tag/branch): pins
        ``snapshot_id`` (default: current) under ``name`` via the same CAS
        metadata commit as any other change. Tags make a corpus version
        reproducible by name — ``to_df(ref='train-v1')`` reads the exact
        files of that commit forever (expire_snapshots retains pinned
        snapshots). Cost is O(1) metadata, no data movement.

        PER-REF RETENTION (Iceberg's spec keys, stored on the ref):
        ``min_snapshots_to_keep`` / ``max_snapshot_age_ms`` govern how much
        of a BRANCH's history ``expire_snapshots`` retains beyond the head;
        ``max_ref_age_ms`` lets the ref itself expire (tag or branch) once
        its head snapshot is older than the age — after which its pins are
        released. Absent keys fall back to the expiry call's global policy,
        exactly Iceberg's layering. Existing ref properties (including a
        WAP branch's ``base-snapshot-id``) survive a move."""
        from dataclasses import replace as _dc_replace

        if ref_type not in ("tag", "branch"):
            raise ValueError(f"ref_type must be tag|branch, got {ref_type}")
        if min_snapshots_to_keep is not None and ref_type != "branch":
            raise ValueError("min-snapshots-to-keep applies to branches only")
        if max_snapshot_age_ms is not None and ref_type != "branch":
            raise ValueError("max-snapshot-age-ms applies to branches only")
        for label, v in (
            ("min-snapshots-to-keep", min_snapshots_to_keep),
            ("max-snapshot-age-ms", max_snapshot_age_ms),
            ("max-ref-age-ms", max_ref_age_ms),
        ):
            # 0/negative would invert the policy (Python's [-0:] slice is
            # the WHOLE list — "keep nothing extra" would pin everything)
            if v is not None and int(v) < 1:
                raise ValueError(f"{label} must be >= 1, got {v}")
        sid = snapshot_id if snapshot_id is not None else self.metadata.current_snapshot_id
        if sid is None or sid not in self.metadata.snapshot_ids():
            raise ValueError(f"unknown snapshot for ref {name!r}: {sid}")
        retention = {
            k: int(v)
            for k, v in (
                ("min-snapshots-to-keep", min_snapshots_to_keep),
                ("max-snapshot-age-ms", max_snapshot_age_ms),
                ("max-ref-age-ms", max_ref_age_ms),
            )
            if v is not None
        }

        def edit(md):
            if sid not in md.snapshot_ids():
                raise ValueError(f"snapshot for ref {name!r} expired during retry: {sid}")
            prior = md.refs.get(name, {})
            return _dc_replace(
                md,
                refs={
                    **md.refs,
                    name: {
                        **prior,
                        "snapshot-id": sid,
                        "type": ref_type,
                        **retention,
                    },
                },
            )

        return self._commit_metadata_edit(edit, "ref")

    def drop_ref(self, name: str) -> "Table":
        """Remove a named ref (its snapshot becomes expirable again)."""
        from dataclasses import replace as _dc_replace

        if name not in self.metadata.refs:
            raise ValueError(f"no such ref: {name}")

        def edit(md):
            return _dc_replace(md, refs={k: v for k, v in md.refs.items() if k != name})

        return self._commit_metadata_edit(edit, "ref")

    #: table-property keys the ENGINE maintains (evolution logs, hash
    #: algorithm pins, sketch state) — user SET/UNSET of these would corrupt
    #: reads of pre-evolution files, so the property DDL refuses them loudly
    ENGINE_PROPERTY_KEYS = (
        "column-renames",
        "column-defaults",
        "partition-entry-renames",
        "write.bucket-hash",
        # the manifest-format marker is stamped by the metadata writer
        # itself (r16: without this entry SHOW CREATE TABLE / SHOW
        # TBLPROPERTIES leaked it as a user property)
        "format.manifest-implementation",
    )

    @classmethod
    def is_engine_property(cls, key: str) -> bool:
        """True for properties the engine maintains itself and users must
        not set (and which SHOW CREATE TABLE / DESCRIBE EXTENDED must not
        emit — replaying an ``ALTER ... SET TBLPROPERTIES`` that carries
        them would be refused by :meth:`update_properties`, breaking the
        reconstructible-DDL round-trip): the fixed structured-log keys,
        ANALYZE's ``ndv.*`` sketch/estimate keys, and streaming sinks'
        ``stream.<sink>.*`` exactly-once fence high-water marks."""
        return (
            key in cls.ENGINE_PROPERTY_KEYS
            or key.startswith("ndv.")
            or key.startswith("stream.")
        )

    def update_properties(
        self, set_props: dict | None = None, unset_keys: list[str] | None = None
    ) -> "Table":
        """Iceberg's ``updateProperties``: SET/UNSET table properties as one
        metadata-only CAS commit (the engine behind ``ALTER TABLE ... SET
        TBLPROPERTIES``). Properties are the table's public knob surface —
        ``commit.retry.num-retries`` bounds the CAS retry loop,
        ``write.target-file-size-bytes`` sizes compaction output — so a SET
        is O(1) metadata at any table size. Engine-internal keys (rename/
        default logs) are refused; unknown UNSET keys are refused (a typo'd
        unset that silently no-ops hides a misconfigured pipeline)."""
        from dataclasses import replace as _dc_replace

        set_props = {str(k): str(v) for k, v in (set_props or {}).items()}
        unset_keys = [str(k) for k in (unset_keys or [])]
        for k in (*set_props, *unset_keys):
            if self.is_engine_property(k):
                raise ValueError(f"property {k!r} is engine-maintained; refusing")
        overlap = set(set_props) & set(unset_keys)
        if overlap:
            raise ValueError(f"cannot SET and UNSET the same key(s): {sorted(overlap)}")

        def edit(md):
            for k in unset_keys:
                if k not in md.properties:
                    raise ValueError(f"cannot UNSET unknown property {k!r}")
            props = {k: v for k, v in md.properties.items() if k not in unset_keys}
            props.update(set_props)
            return _dc_replace(md, properties=props)

        return self._commit_metadata_edit(edit, "properties")

    def replace_sort_order(self, columns: list[str] | None) -> "Table":
        """Iceberg's replaceSortOrder / ``ALTER TABLE ... WRITE ORDERED
        BY`` (r16): declare the table's DEFAULT write order — every
        subsequent ``append_dataframe`` without an explicit ``sort_by`` /
        ``zorder_by`` range-distributes on these columns, so files cover
        disjoint key slices and manifest bounds stay maximally selective.
        Each entry is a column name or a ``(name, asc|desc[,
        nulls-first|nulls-last])`` spec (r17 — ``ORDERED BY ts DESC`` is
        the newest-first event-log layout; bounds pruning is
        direction-agnostic, so selectivity is identical either way).
        Metadata-only CAS commit; existing data is untouched (Iceberg
        semantics — the order applies to FUTURE writes; compact/rewrite
        to re-cluster history). ``None``/empty restores the unsorted
        order 0."""
        from dataclasses import replace as _dc_replace

        def edit(md):
            if not columns:
                return _dc_replace(md, default_sort_order_id=0)
            return md.with_sort_order(list(columns))

        return self._commit_metadata_edit(edit, "sort-order")

    def set_identifier_fields(self, names: list[str] | None) -> "Table":
        """Iceberg's ``setIdentifierFields`` / ``ALTER TABLE ... SET
        IDENTIFIER FIELDS (a, b)`` (r17): declare the table's row identity
        — the schema's ``identifier-field-ids`` (the reference test sets
        this directly, ``mod.rs:433``). Stored as field IDS, so renames
        follow through; consumed by ``merge_into``/``merge_sql`` when no
        ``ON`` keys are given (upsert-by-declared-identity) and protected
        by ``commit_schema`` (identifier columns cannot be dropped).
        ``None``/empty clears the identity (``DROP IDENTIFIER FIELDS``).

        Float/double and nested columns are refused (Iceberg's rule —
        NaN != NaN makes float equality a broken identity). Deviation
        from Iceberg, documented: NULLABLE columns are accepted, because
        the merge algebra joins null-safely (``<=>``) on key columns and
        this engine's DDL has no NOT NULL constraint surface; Iceberg
        proper additionally requires identifier fields be ``required``.
        Metadata-only CAS commit."""
        from dataclasses import replace as _dc_replace

        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            FloatType,
            MapType,
            StructType as _St,
        )

        names = [str(n) for n in (names or [])]

        def edit(md):
            from iceberg_catalog_postgres_spark.catalog.metadata import (
                schema_to_spark,
            )

            spark_fields = {f.name: f for f in schema_to_spark(md.schema).fields}
            ids = {f["name"]: int(f["id"]) for f in md.schema.get("fields", [])}
            field_ids = []
            for n in names:
                if n not in ids:
                    raise ValueError(
                        f"SET IDENTIFIER FIELDS: unknown column {n!r}"
                    )
                dt = spark_fields[n].dataType
                if isinstance(dt, (FloatType, DoubleType)):
                    raise ValueError(
                        f"SET IDENTIFIER FIELDS: {n!r} is floating-point — "
                        "NaN != NaN makes float equality a broken identity"
                    )
                if isinstance(dt, (ArrayType, MapType, _St)):
                    raise ValueError(
                        f"SET IDENTIFIER FIELDS: {n!r} is a nested type; "
                        "identifier fields must be primitive"
                    )
                field_ids.append(ids[n])
            return _dc_replace(
                md, schema={**md.schema, "identifier-field-ids": field_ids}
            )

        return self._commit_metadata_edit(edit, "identifier-fields")

    def rollback_to(self, snapshot_id: int) -> "Table":
        """Iceberg's rollback_to_snapshot: point ``current_snapshot_id``
        back to an earlier RETAINED snapshot via a metadata-only CAS commit.
        Nothing is deleted — the rolled-past snapshots stay in history (and
        remain time-travelable until expiry), so a bad commit is undone in
        O(1) metadata with a preserved audit trail; the next data commit
        chains from the restored state.

        Unlike refs/spec edits, rollback does NOT commute with concurrent
        data commits — it deliberately discards them from the main lineage.
        The CAS retry therefore re-applies the rollback over any concurrent
        winner (rollback-wins semantics, matching Iceberg where rollback is
        itself just a commit); callers who want fail-on-concurrent-write
        should check the pointer afterwards.

        Streaming fences are NOT rolled back: ``stream.<sink>.*`` batch-id
        properties keep their high-water marks, so a checkpointed stream
        restarted after a rollback will (correctly for the fence, but
        perhaps surprisingly) SKIP batches whose data the rollback just
        discarded — exactly-once protects against duplicates, not against
        an operator discarding committed data. An operator rolling back a
        fenced table who wants those batches re-ingested must also clear
        the sink's fence property (or use a new sink_id with a fresh
        checkpoint); leaving it is the safe default, since auto-resetting
        fences on rollback would let a zombie replay double-commit into
        the restored lineage.
        """
        from dataclasses import replace as _dc_replace

        if snapshot_id not in self.metadata.snapshot_ids():
            raise ValueError(f"cannot roll back to unknown snapshot {snapshot_id}")

        def edit(md):
            if snapshot_id not in md.snapshot_ids():
                raise ValueError(f"snapshot {snapshot_id} expired during rollback retry")
            return _dc_replace(md, current_snapshot_id=snapshot_id)

        return self._commit_metadata_edit(edit, "rollback")

    def to_df(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        prune: tuple | None = None,
        partition_filter: dict | None = None,
        transformed_filter: dict | None = None,
        transformed_range: tuple | None = None,
        transformed_ranges: dict | None = None,
        ref: str | None = None,
        file_subset: list[str] | None = None,
        as_of_ms: int | None = None,
        with_row_lineage: bool = False,
        with_scan_identity: bool = False,
    ) -> DataFrame:
        """DataFrame over the snapshot's file list (time travel via
        ``snapshot_id``). Empty table => empty DataFrame with the declared
        schema, so downstream plans always resolve.

        ``with_row_lineage=True`` adds the Iceberg v3 lineage pair:
        ``_row_id`` — for files committed by appends the id is INHERITED
        (``first_row_id + row position``, computed from a broadcast of the
        O(files) lineage map — zero storage cost); files written by a
        lineage-preserving rewrite carry a MATERIALIZED physical ``_row_id``
        column, read directly (NULL rows inherit fresh ids). Files that
        predate lineage read NULL. Ids are stable for the row's lifetime
        across MOR deletes and lineage-preserving compaction — the identity
        a CDC consumer can key updates on.
        ``_last_updated_sequence_number`` — the commit sequence that last
        MODIFIED the row: inherited rows read their file's seq (exact —
        append rows are untouched since their commit); materialized rows
        read the physical value with NULL coalescing to the rewriting
        commit's seq, which is exactly right for merge-updated/inserted
        rows while compaction-carried rows keep their original value.

        ``prune=(column, lo, hi)`` narrows the planned file list via
        ``planned_files`` BEFORE Spark sees it — file-level skipping on top
        of Spark's own row-group pushdown. The caller still applies the
        row-level filter; pruning only guarantees no matching row is lost,
        not that every surviving row matches.

        Merge-on-read: if the snapshot carries equality-delete files, the
        deleted keys are anti-joined out here — the delete side is typically
        tiny relative to the table, so Spark broadcasts it and the read plan
        stays a single scan + broadcast anti-join (no shuffle of the 100 TB
        side). Deletes are sequence-scoped (Iceberg v2): an equality delete
        applies only to data files committed BEFORE it, so a key re-inserted
        after the delete survives the read. Key comparison is null-safe
        (``<=>``) — a delete key with NULL in a column removes rows with the
        same NULL, matching Iceberg equality-delete semantics. Data files are
        never rewritten on the delete path; compaction or an overwrite
        materializes the deletes and clears them.
        """
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass either ref or snapshot_id, not both")
            if ref not in self.metadata.refs:
                raise ValueError(f"no such ref: {ref}")
            snapshot_id = self.metadata.refs[ref]["snapshot-id"]
        if as_of_ms is not None:
            if snapshot_id is not None:
                raise ValueError("pass either as_of_ms or snapshot_id/ref, not both")
            snap_t = self.metadata.snapshot_as_of(as_of_ms)
            if snap_t is None:
                return spark.createDataFrame([], self.schema)
            snapshot_id = snap_t.snapshot_id
        snap = (
            self.metadata.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.metadata.current_snapshot()
        )
        if prune is not None:
            files = self.planned_files(*prune, snapshot_id=snapshot_id)
        else:
            files = self.data_files(snapshot_id)
        if partition_filter is not None:
            part_files = set(
                self.planned_files_partition(partition_filter, snapshot_id=snapshot_id)
            )
            files = [f for f in files if f in part_files]
        if transformed_ranges is None and transformed_range is not None:
            _c, _lo, _hi = transformed_range
            transformed_ranges = {_c: (_lo, _hi)}
        if transformed_filter is not None and transformed_ranges:
            # BOTH predicate kinds: one composed planner walk of the
            # manifest index instead of two intersected walks (at 10^7
            # files the index walk IS the planning cost). r13:
            # ``transformed_ranges`` carries ANY number of range columns
            # (ts BETWEEN ... AND k BETWEEN ... on a (day(ts),
            # truncate(k)) layout intersects in the same single walk).
            comp = set(
                self.planned_files_composed(
                    ranges=dict(transformed_ranges),
                    points=transformed_filter,
                    snapshot_id=snapshot_id,
                )
            )
            files = [f for f in files if f in comp]
        elif transformed_ranges is not None and len(transformed_ranges) > 1:
            comp = set(
                self.planned_files_composed(
                    ranges=dict(transformed_ranges), snapshot_id=snapshot_id
                )
            )
            files = [f for f in files if f in comp]
        elif transformed_filter is not None:
            # transform-aware point pruning ({source col: value} mapped
            # through bucket/truncate/temporal specs) composed INSIDE the
            # reader, so MOR deletes / renames / defaults still apply below
            tf = set(
                self.planned_files_transformed(
                    transformed_filter, snapshot_id=snapshot_id
                )
            )
            files = [f for f in files if f in tf]
        elif transformed_ranges:
            # monotone-transform range pruning (single column), same contract
            ((_c, (_lo, _hi)),) = transformed_ranges.items()
            tr = set(
                self.planned_files_transformed_range(
                    _c, _lo, _hi, snapshot_id=snapshot_id
                )
            )
            files = [f for f in files if f in tr]
        if file_subset is not None:
            # caller-chosen slice of the snapshot (table-relative paths) —
            # used by maintenance rewrites so the read still applies
            # sequence-scoped MOR deletes to exactly the right cohorts
            store_ = self.catalog.object_store()
            subset_abs = {store_.resolve(f) for f in file_subset}
            files = [f for f in files if f in subset_abs]
        if with_row_lineage and any(
            f.name in ("_row_id", "_last_updated_sequence_number")
            for f in self.schema.fields
        ):
            raise ValueError(
                "with_row_lineage: the table schema already has a lineage column"
            )
        if not files:
            from pyspark.sql.types import LongType as _L
            from pyspark.sql.types import StringType as _Se
            from pyspark.sql.types import StructField as _SFe
            from pyspark.sql.types import StructType as _STe

            extra = []
            if with_row_lineage:
                extra += [
                    _SFe("_row_id", _L(), True),
                    _SFe("_last_updated_sequence_number", _L(), True),
                ]
            if with_scan_identity:
                extra += [_SFe("__mfile", _Se(), True), _SFe("__mpos", _L(), True)]
            return spark.createDataFrame(
                [], _STe([*self.schema.fields, *extra])
            )
        snap_refs = snap.chunk_refs() if snap is not None else None
        if (
            not with_row_lineage  # lineage needs the per-file map below
            and snap_refs is not None
            and not self.column_renames()
            and not self.column_defaults()
            and not snap.deletion_vectors
            and all(
                c["summary"]["counts"]["eq-delete"] == 0
                and c["summary"]["counts"]["pos-delete"] == 0
                for c in snap_refs
            )
        ):
            # Manifest-list fast path: the chunk summaries PROVE there are no
            # deletes to apply and the rename log is empty, so the (possibly
            # chunk-pruned) file list is read directly with the declared
            # schema. Combined with summary-driven planned_files this makes a
            # pruned scan of an append-only table O(matching chunks) in
            # metadata I/O end to end — the snapshot is never inflated.
            fp = spark.read.schema(self.schema).parquet(*files)
            if with_scan_identity:
                fp = fp.withColumn(
                    "__mfile", F.col("_metadata.file_path")
                ).withColumn("__mpos", F.col("_metadata.row_index"))
            return fp
        pos_dels = self.position_delete_files(snapshot_id)
        dels = self.delete_files(snapshot_id)
        dv_map = dict(snap.deletion_vectors) if snap else {}
        store = self.catalog.object_store()
        seqs = dict(snap.file_seqs) if snap else {}

        def _seq(abs_or_rel: str) -> int:
            # file_seqs is keyed by table-relative path; fall back to 0
            # (pre-sequence metadata => deletes apply to everything, the
            # round-1 behavior) when the map is empty.
            return seqs.get(abs_or_rel, 0)

        frids = dict(snap.first_row_ids) if snap else {}
        # Position-scoped deletes (pos-parquet, deletion vectors) need the
        # scan's file/position identity. Spark's ``_metadata`` pseudo-column
        # does not resolve through a Union, and a cohort read (renames,
        # defaults, mixed inherited/materialized lineage) IS a union — so
        # the identity is captured INSIDE each cohort projection as
        # ``__mfile``/``__mpos`` (keep_metadata_cols) and dropped at the end.
        # ``with_scan_identity=True`` KEEPS the pair in the output — the
        # rename/union-safe way for callers (MOR merges, DELETE WHERE) to
        # address rows positionally where ``col("_metadata...")`` on the
        # returned frame would fail to resolve.
        need_meta = bool(pos_dels or dv_map) or with_scan_identity

        def _read_members(members: list[str]) -> DataFrame:
            """Cohort read, lineage-aware when requested: INHERITED files
            get ``_row_id = first_row_id + row position`` via a broadcast
            of the O(files) lineage map; MATERIALIZED files (written by a
            lineage-preserving rewrite, map value None) read their physical
            ``_row_id`` column; pre-lineage files read NULL."""
            if not with_row_lineage:
                return self._read_data_files(
                    spark, members, seqs, keep_metadata_cols=need_meta
                )
            from pyspark.sql.functions import broadcast, coalesce, col
            from pyspark.sql.types import LongType as _L

            def _is_mat(rel: str) -> bool:
                return isinstance(frids.get(rel), dict)

            def _first(rel):
                v = frids.get(rel)
                if isinstance(v, dict):
                    return int(v["first"])
                return None if v is None else int(v)

            def _join_firsts(p: DataFrame, rels: list[str], phys: bool) -> DataFrame:
                pairs = [
                    ("file:" + store.resolve(r), _first(r), int(seqs.get(r, 0)))
                    for r in rels
                    if _first(r) is not None
                ]
                if not pairs:
                    if not need_meta:
                        p = p.drop("__mfile", "__mpos")
                    if not phys:
                        p = p.withColumn("_row_id", F.lit(None).cast("long"))
                        return p.withColumn(
                            "_last_updated_sequence_number",
                            F.lit(None).cast("long"),
                        )
                    return p
                mdf = spark.createDataFrame(
                    pairs, "__lfile string, __first long, __lseq long"
                )
                # file identity comes from the cohort-scoped __mfile/__mpos
                # projection (keep_metadata_cols): _metadata itself does not
                # resolve through the rename-cohort Union
                p = (
                    p.withColumnRenamed("__mfile", "__lf")
                    .withColumnRenamed("__mpos", "__lp")
                    .join(broadcast(mdf), col("__lf") == col("__lfile"), "left")
                )
                inherited = (col("__first") + col("__lp")).cast("long")
                # materialized files: the physical columns win; NULL rows
                # (merge inserts/updates, pre-lineage legacy) inherit — the
                # v3 null-assignment rule. For _last_updated, the file's own
                # seq is the rewriting commit's seq, exactly the update time
                # of a row the rewrite changed.
                rid = coalesce(col("_row_id"), inherited) if phys else inherited
                lus = (
                    coalesce(col("_last_updated_sequence_number"), col("__lseq"))
                    if phys
                    else col("__lseq")
                )
                p = (
                    p.withColumn("_row_id", rid)
                    .withColumn("_last_updated_sequence_number", lus.cast("long"))
                    .drop("__lfile", "__first", "__lseq")
                )
                if need_meta:  # hand the identity back to the delete steps
                    return p.withColumnRenamed("__lf", "__mfile").withColumnRenamed(
                        "__lp", "__mpos"
                    )
                return p.drop("__lf", "__lp")

            mat = [r for r in members if _is_mat(r)]
            rest = [r for r in members if not _is_mat(r)]
            parts2 = []
            if rest:
                parts2.append(
                    _join_firsts(
                        self._read_data_files(
                            spark, rest, seqs, keep_metadata_cols=True
                        ),
                        rest,
                        False,
                    )
                )
            if mat:
                parts2.append(
                    _join_firsts(
                        self._read_data_files(
                            spark,
                            mat,
                            seqs,
                            extra_phys_cols=[
                                ("_row_id", _L()),
                                ("_last_updated_sequence_number", _L()),
                            ],
                            keep_metadata_cols=True,
                        ),
                        mat,
                        True,
                    )
                )
            out = parts2[0]
            for p in parts2[1:]:
                out = out.unionByName(p)
            return out

        def _apply_pos_dels(part: DataFrame) -> DataFrame:
            # identity comes from the cohort-captured __mfile/__mpos (kept
            # for the next delete step; dropped once at the end of to_df)
            from pyspark.sql.functions import broadcast, col

            pd_df = spark.read.parquet(*pos_dels).withColumnsRenamed(
                {"file_path": "__del_file", "row_index": "__del_pos"}
            )
            return part.join(
                broadcast(pd_df),
                (col("__mfile") == col("__del_file"))
                & (col("__mpos") == col("__del_pos")),
                "left_anti",
            )

        def _apply_dvs(part: DataFrame, members_rel: list[str]) -> DataFrame:
            """Anti-join out deletion-vector positions (Iceberg v3). One
            RANGED blob read per planned file with a vector — never a
            footer walk, never one open per delete COMMIT (the win over
            parquet positional deletes at 100 TB: read amplification is
            O(files with live deletes), not O(delete history)).

            Two physical strategies, chosen from the vector CARDINALITIES
            (snapshot metadata, no decode):
            - small (default <= 2M positions): decode driver-side, one
              broadcast anti-join — pure JVM row filtering, the fast path
              for the common kilobyte-scale delete;
            - large: executor-side membership filter (mapInPandas) where
              each task ranged-reads ONLY its own file's blob from the
              sidecar and drops rows via vectorized searchsorted — driver
              and closure state stay O(files with vectors), so the plan
              survives delete cardinalities that would break a broadcast.
            Threshold: spark conf ``spark.icebergps.dv.maxBroadcastPositions``.
            """
            import pandas as _pd

            from pyspark.sql.functions import broadcast, col
            from pyspark.sql.types import (
                LongType as _Long,
                StringType as _Str,
                StructField as _F,
                StructType as _T,
            )

            from iceberg_catalog_postgres_spark.catalog.dv import read_dv

            touched = sorted(set(members_rel) & set(dv_map))
            if not touched:
                return part
            total = sum(int(dv_map[rel]["cardinality"]) for rel in touched)
            max_bcast = int(
                spark.conf.get("spark.icebergps.dv.maxBroadcastPositions", "2000000")
            )
            if total > max_bcast:
                mapping = {
                    "file:" + store.resolve(rel): (
                        store.resolve(dv_map[rel]["puffin"]),
                        int(dv_map[rel]["offset"]),
                        int(dv_map[rel]["length"]),
                    )
                    for rel in touched
                }
                part2 = part.withColumn("__dvf", col("__mfile")).withColumn(
                    "__dvp", col("__mpos")
                )
                return part2.mapInPandas(
                    _dv_membership_filter(mapping), part2.schema
                ).drop("__dvf", "__dvp")

            frames = []
            for rel in touched:
                pos = read_dv(store, dv_map[rel])
                if len(pos) == 0:
                    continue
                frames.append(
                    _pd.DataFrame(
                        {
                            "__dv_file": "file:" + store.resolve(rel),
                            "__dv_pos": pos.astype("int64"),
                        }
                    )
                )
            if not frames:
                return part
            dv_df = spark.createDataFrame(
                _pd.concat(frames, ignore_index=True),
                _T([_F("__dv_file", _Str()), _F("__dv_pos", _Long())]),
            )
            return part.join(
                broadcast(dv_df),
                (col("__mfile") == col("__dv_file"))
                & (col("__mpos") == col("__dv_pos")),
                "left_anti",
            )

        def _apply_eq_dels(part: DataFrame, del_files: list[str]) -> DataFrame:
            from functools import reduce

            from pyspark.sql.functions import broadcast, col

            # Delete files were written with the LOGICAL key names of their
            # commit time; map each file's columns forward through any later
            # renames so the anti-join compares current names. Grouped by
            # resulting signature — one tiny read per group, one union.
            by_sig: dict[tuple, list[str]] = {}
            for f in del_files:
                k = spark.read.parquet(store.resolve(f)).columns
                sig = tuple(self.current_name(c, _seq(f)) for c in k)
                by_sig.setdefault((tuple(k), sig), []).append(f)
            keyframes = []
            key_cols: list[str] = []
            for (written, sig), members in sorted(by_sig.items()):
                kf = spark.read.parquet(*[store.resolve(f) for f in members])
                remap = {o: n for o, n in zip(written, sig) if o != n}
                if remap:
                    kf = kf.withColumnsRenamed(remap)
                keyframes.append(kf)
                key_cols = list(sig)
            keys = keyframes[0]
            for kf in keyframes[1:]:
                keys = keys.unionByName(kf)
            aliased = keys.select([col(c).alias(f"__k_{c}") for c in key_cols])
            cond = reduce(
                lambda a, b: a & b,
                [part[c].eqNullSafe(col(f"__k_{c}")) for c in key_cols],
            )
            return part.join(broadcast(aliased), cond, "left_anti")

        # rel-path view of the (possibly pruned) plan, for cohorting + seqs
        planned = set(files)
        rel_data = [f for f in snap.data_files if store.resolve(f) in planned]

        if not dels or not seqs:
            # no equality deletes, or pre-sequence metadata: single cohort
            # (the rename-aware reader regroups internally if needed)
            df = _read_members(rel_data)
            if pos_dels:
                df = _apply_pos_dels(df)
            if dv_map:
                df = _apply_dvs(df, rel_data)
            if dels:
                df = _apply_eq_dels(df, snap.delete_files)
            if need_meta and not with_scan_identity:
                df = df.drop("__mfile", "__mpos")
            return df

        # Sequence-scoped read: group data files into cohorts by which delete
        # files apply to them (delete seq > data seq). In steady state this is
        # two cohorts — "old files, all deletes apply" and "files appended
        # after the last delete, none apply" — so the plan stays scan +
        # broadcast anti-join per cohort, unioned; no shuffle of the big side.
        rel_dels = snap.delete_files
        cohorts: dict[tuple[str, ...], list[str]] = {}
        for f in rel_data:
            applicable = tuple(d for d in rel_dels if _seq(d) > _seq(f))
            cohorts.setdefault(applicable, []).append(f)
        parts = []
        for applicable, members in cohorts.items():
            part = _read_members(members)
            if pos_dels:
                part = _apply_pos_dels(part)
            if dv_map:
                part = _apply_dvs(part, members)
            if applicable:
                part = _apply_eq_dels(part, list(applicable))
            parts.append(part)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if need_meta and not with_scan_identity:
            df = df.drop("__mfile", "__mpos")
        return df

    def incremental_df(
        self, spark: SparkSession, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> DataFrame:
        """Incremental read: ONLY the rows added between two snapshots —
        the file-set difference, planned straight from metadata (no data
        diffing, no full scan). This is the change-feed primitive that lets
        downstream consumers process a 100 TB table's *delta* per run.

        Valid only across append snapshots; an intervening overwrite rewrote
        history, so the file-set difference would be meaningless — raise.
        """
        to_id = to_snapshot_id if to_snapshot_id is not None else self.metadata.current_snapshot_id
        snaps = self.metadata.snapshots
        from_idx = next(i for i, s in enumerate(snaps) if s.snapshot_id == from_snapshot_id)
        to_idx = next(i for i, s in enumerate(snaps) if s.snapshot_id == to_id)
        # per-ADJACENT-PAIR deltas (not one end-to-end file-set diff): a
        # lineage-preserving compaction inside the range renames every file
        # while adding zero rows — the pairwise walk skips it for free,
        # where the end-to-end diff would wrongly re-emit the whole table
        new_files: list[str] = []
        # Each delta file's sequence number comes from the SNAPSHOT THAT
        # ADDED it, not from the end snapshot: a later in-range
        # lineage-preserving compaction removes delta files from the final
        # file set, so to_snap.file_seqs would miss them and _seq_for's
        # 0-fallback makes a rename-aware read resolve pre-rename physical
        # names — NULL columns for those rows (ADVICE r10).
        delta_seqs: dict[str, int] = {}
        for i in range(from_idx + 1, to_idx + 1):
            s, parent = snaps[i], snaps[i - 1]
            if s.operation == "append":
                old = set(parent.data_files)
                for f in s.data_files:
                    if f not in old:
                        new_files.append(f)
                        delta_seqs[f] = s.file_seqs.get(f, s.sequence_number)
                continue
            if (
                s.operation == "overwrite"
                and s.summary.get("lineage-preserving") == "true"
            ):
                continue  # provably adds no rows (see changelog_df)
            raise ValueError(
                f"incremental read crosses non-append snapshot {s.snapshot_id} ({s.operation})"
            )
        if not new_files:
            return spark.createDataFrame([], self.schema)
        return self._read_data_files(spark, new_files, delta_seqs)

    def changelog_df(
        self, spark: SparkSession, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> DataFrame:
        """Row-level CHANGELOG between two snapshots (Iceberg's
        ``table$changes``): every row added or removed in the range, tagged
        ``_change_type`` ('insert' | 'delete') and ``_change_ordinal`` (the
        producing snapshot's sequence number, so consumers can replay in
        commit order). This is the CDC surface a downstream sync reads to
        mirror a 100 TB table without diffing it.

        Per snapshot in (from, to]:
        - append: the delta files' rows are inserts (pure metadata
          planning, same as ``incremental_df``);
        - MOR delete: the rows REMOVED are reconstructed by replaying the
          new delete files against the PARENT snapshot's state — equality
          keys via a null-safe broadcast semi-join, positional deletes via
          the scan's ``_metadata`` identity. Cost is O(parent-scan of
          affected cohorts + delete size), never O(history).

        Overwrites raise (rewritten history has no well-defined row-level
        diff without row lineage — the same contract as
        ``incremental_df``).
        """
        from functools import reduce as _reduce

        to_id = (
            to_snapshot_id if to_snapshot_id is not None else self.metadata.current_snapshot_id
        )
        snaps = self.metadata.snapshots
        from_idx = next(i for i, s in enumerate(snaps) if s.snapshot_id == from_snapshot_id)
        to_idx = next(i for i, s in enumerate(snaps) if s.snapshot_id == to_id)
        store = self.catalog.object_store()
        parts: list[DataFrame] = []
        for i in range(from_idx + 1, to_idx + 1):
            s, parent = snaps[i], snaps[i - 1]
            if s.operation == "append":
                old = set(parent.data_files)
                delta = [f for f in s.data_files if f not in old]
                if delta:
                    parts.append(
                        self._read_data_files(spark, delta, dict(s.file_seqs))
                        .withColumn("_change_type", F.lit("insert"))
                        .withColumn("_change_ordinal", F.lit(s.sequence_number).cast("long"))
                    )
                continue
            if (
                s.operation == "overwrite"
                and s.summary.get("lineage-preserving") == "true"
            ):
                # lineage-preserving compaction: the rewrite keeps every
                # row's _row_id and only materializes deletes ALREADY
                # emitted at their own commits — provably zero row-level
                # changes, so the changelog crosses it silently instead of
                # raising (rewrites stop being a CDC barrier)
                continue
            if s.operation in ("overwrite", "rowdelta") and s.id_diffable():
                # r13: the shared Snapshot.id_diffable predicate — a manual
                # overwrite that MATERIALIZED row ids diffs exactly like a
                # merge; plain overwrites (no marker) still refuse below.
                # lineage-diffable MERGE (CoW overwrite or MOR row delta —
                # to_df applies the row delta's new vectors, so the state
                # diff below is representation-agnostic):
                # reconstruct row-level changes by
                # joining the parent and merged states on _row_id — the
                # stable identity makes UPDATE before/after pairs
                # expressible, which no file-set diff can do. Cost is two
                # snapshot reads + one id-keyed join, the honest price of
                # diffing a rewrite; rows without ids (pre-lineage legacy)
                # degrade to delete+insert.
                cols = [f.name for f in self.schema.fields]
                pre = self.to_df(
                    spark, snapshot_id=parent.snapshot_id, with_row_lineage=True
                )
                post = self.to_df(
                    spark, snapshot_id=s.snapshot_id, with_row_lineage=True
                )
                a = pre.select(
                    F.col("_row_id").alias("__rid_a"),
                    F.lit(True).alias("__in_a"),
                    *[F.col(c).alias(f"__a_{c}") for c in cols],
                )
                b = post.select(
                    F.col("_row_id").alias("__rid_b"),
                    F.lit(True).alias("__in_b"),
                    *[F.col(c).alias(f"__b_{c}") for c in cols],
                )
                # plain == join: NULL ids never match, so legacy rows fall
                # out as unmatched on both sides (delete + insert)
                j = a.join(b, F.col("__rid_a") == F.col("__rid_b"), "full_outer")
                ordv = F.lit(s.sequence_number).cast("long")
                dels = j.filter(
                    F.col("__in_a").isNotNull() & F.col("__in_b").isNull()
                ).select(
                    *[F.col(f"__a_{c}").alias(c) for c in cols],
                    F.lit("delete").alias("_change_type"),
                    ordv.alias("_change_ordinal"),
                )
                ins = j.filter(
                    F.col("__in_b").isNotNull() & F.col("__in_a").isNull()
                ).select(
                    *[F.col(f"__b_{c}").alias(c) for c in cols],
                    F.lit("insert").alias("_change_type"),
                    ordv.alias("_change_ordinal"),
                )
                changed = _reduce(
                    lambda x, y: x | y,
                    [
                        ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
                        for c in cols
                    ],
                )
                both = j.filter(
                    F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull()
                ).filter(changed)
                upd_before = both.select(
                    *[F.col(f"__a_{c}").alias(c) for c in cols],
                    F.lit("update_before").alias("_change_type"),
                    ordv.alias("_change_ordinal"),
                )
                upd_after = both.select(
                    *[F.col(f"__b_{c}").alias(c) for c in cols],
                    F.lit("update_after").alias("_change_type"),
                    ordv.alias("_change_ordinal"),
                )
                parts.extend([dels, ins, upd_before, upd_after])
                continue
            if s.operation != "delete":
                raise ValueError(
                    f"changelog crosses non-append/delete snapshot {s.snapshot_id} ({s.operation})"
                )
            base = self.to_df(spark, snapshot_id=parent.snapshot_id)
            new_eq = [f for f in s.delete_files if f not in set(parent.delete_files)]
            new_pos = [
                f
                for f in s.position_delete_files
                if f not in set(parent.position_delete_files)
            ]
            # Union all the snapshot's new delete files PER KEY SIGNATURE and
            # run ONE semi-join per signature — mirroring _apply_eq_dels.
            # Per-file semi-joins would emit a 'delete' change once per file
            # for a key whose rows were split across part files (ADVICE r5);
            # the semi-join against the unioned key frame dedups for free.
            by_sig: dict[tuple[str, ...], list[DataFrame]] = {}
            for d in new_eq:
                kf = spark.read.parquet(store.resolve(d))
                sig = [self.current_name(c, s.file_seqs.get(d, 0)) for c in kf.columns]
                remap = {o: n for o, n in zip(kf.columns, sig) if o != n}
                if remap:
                    kf = kf.withColumnsRenamed(remap)
                key = tuple(sorted(sig))
                by_sig.setdefault(key, []).append(kf.select(*key))
            for key, frames in by_sig.items():
                keys_df = _reduce(lambda a, b: a.unionByName(b), frames)
                aliased = keys_df.select([F.col(c).alias(f"__k_{c}") for c in key])
                cond = _reduce(
                    lambda a, b: a & b,
                    [base[c].eqNullSafe(F.col(f"__k_{c}")) for c in key],
                )
                parts.append(
                    base.join(F.broadcast(aliased), cond, "left_semi")
                    .withColumn("_change_type", F.lit("delete"))
                    .withColumn("_change_ordinal", F.lit(s.sequence_number).cast("long"))
                )
            if new_pos:
                pd_df = spark.read.parquet(
                    *[store.resolve(f) for f in new_pos]
                ).withColumnsRenamed({"file_path": "__del_file", "row_index": "__del_pos"})
                parts.append(
                    base.withColumn("__file", F.col("_metadata.file_path"))
                    .withColumn("__pos", F.col("_metadata.row_index"))
                    .join(
                        F.broadcast(pd_df),
                        (F.col("__file") == F.col("__del_file"))
                        & (F.col("__pos") == F.col("__del_pos")),
                        "left_semi",
                    )
                    .drop("__file", "__pos")
                    .withColumn("_change_type", F.lit("delete"))
                    .withColumn("_change_ordinal", F.lit(s.sequence_number).cast("long"))
                )
            # Deletion-vector commits: the rows removed are exactly the
            # positions in this snapshot's vector MINUS the parent's vector
            # for each changed file. Semi-joining against ``base`` (the
            # PARENT's state) makes representation conversions emit nothing
            # for free: positions the parent had already deleted via pos
            # parquet files are absent from base.
            dv_changed = {
                rel: e
                for rel, e in s.deletion_vectors.items()
                if parent.deletion_vectors.get(rel) != e
            }
            if dv_changed:
                import numpy as _np
                import pandas as _pd

                from pyspark.sql.types import LongType as _Long
                from pyspark.sql.types import StringType as _Str
                from pyspark.sql.types import StructField as _SFd
                from pyspark.sql.types import StructType as _STd

                from iceberg_catalog_postgres_spark.catalog.dv import read_dv

                dv_frames = []
                for rel in sorted(dv_changed):
                    new_v = read_dv(store, dv_changed[rel])
                    prev_e = parent.deletion_vectors.get(rel)
                    prev_v = (
                        read_dv(store, prev_e)
                        if prev_e
                        else _np.empty(0, dtype="uint64")
                    )
                    delta = _np.setdiff1d(new_v, prev_v)
                    if len(delta):
                        dv_frames.append(
                            _pd.DataFrame(
                                {
                                    "__del_file": "file:" + store.resolve(rel),
                                    "__del_pos": delta.astype("int64"),
                                }
                            )
                        )
                if dv_frames:
                    dv_pairs = spark.createDataFrame(
                        _pd.concat(dv_frames, ignore_index=True),
                        _STd(
                            [_SFd("__del_file", _Str()), _SFd("__del_pos", _Long())]
                        ),
                    )
                    parts.append(
                        base.withColumn("__file", F.col("_metadata.file_path"))
                        .withColumn("__pos", F.col("_metadata.row_index"))
                        .join(
                            F.broadcast(dv_pairs),
                            (F.col("__file") == F.col("__del_file"))
                            & (F.col("__pos") == F.col("__del_pos")),
                            "left_semi",
                        )
                        .drop("__file", "__pos")
                        .withColumn("_change_type", F.lit("delete"))
                        .withColumn(
                            "_change_ordinal", F.lit(s.sequence_number).cast("long")
                        )
                    )
        if not parts:
            from pyspark.sql.types import LongType as _Lng
            from pyspark.sql.types import StringType as _Str
            from pyspark.sql.types import StructField as _SF
            from pyspark.sql.types import StructType as _ST

            empty = _ST(
                [
                    *self.schema.fields,
                    _SF("_change_type", _Str(), False),
                    _SF("_change_ordinal", _Lng(), False),
                ]
            )
            return spark.createDataFrame([], empty)
        return _reduce(lambda a, b: a.unionByName(b), parts)

    def new_transaction(self, branch: str = "main") -> "Transaction":  # mod.rs:466
        """``branch="main"`` commits advance the table head (reference
        behavior). A non-main branch stages append commits on a named branch
        ref WITHOUT moving main — the write half of write-audit-publish
        (WAP): readers of the table see nothing until ``publish_branch``."""
        return Transaction(self, branch=branch)

    def publish_branch(self, name: str, drop: bool = True) -> "Table":
        """Fast-forward main to a branch head (the WAP publish step): one
        CAS metadata commit flips current_snapshot_id to the audited branch
        snapshot — atomic, O(1), no data movement. ``drop`` removes the
        branch ref after publishing."""
        from dataclasses import replace as _dc_replace

        if name not in self.metadata.refs:
            raise ValueError(f"no such branch: {name}")

        def edit(md):
            if name not in md.refs:
                raise ValueError(f"branch {name} disappeared during retry")
            ref = md.refs[name]
            base = ref.get("base-snapshot-id")
            if base is not None and md.current_snapshot_id != base:
                # Fast-forward requires main to be where the branch forked;
                # a concurrent main commit would be silently orphaned by
                # flipping the head. Caller must re-stage on the new main.
                raise CommitConflictError(
                    f"{self.identifier}: main advanced past branch {name!r}'s "
                    "base; re-stage the branch from the current head before "
                    "publishing"
                )
            refs = {k: v for k, v in md.refs.items() if not (drop and k == name)}
            return _dc_replace(md, current_snapshot_id=ref["snapshot-id"], refs=refs)

        return self._commit_metadata_edit(edit, "pub")

    def commit_schema(
        self, new_schema: StructType, defaults: dict | None = None, _retries: int = 3
    ) -> "Table":
        """Schema evolution: commit a new schema version through the same CAS
        pointer swap as a data commit. Field ids carried in
        ``StructField.metadata['iceberg.field-id']`` are preserved; new
        fields get fresh ids — columns are tracked by ID, not name, which is
        what makes renames/adds safe across existing data files
        (reference schema model: mod.rs:431-453, SURVEY §1.2).

        Old data files lack the new columns; ``to_df`` reads with the
        declared schema so missing parquet columns surface as nulls — the
        standard additive-evolution contract.

        RENAMES (same field id, new name) are recorded in the metadata's
        ``column-renames`` log with the sequence number they take effect at;
        reads resolve each file's PHYSICAL column names through the log
        (``physical_name``/``_read_data_files``), so data written under the
        old name keeps its values after the rename — no file rewrite, which
        is the entire point of id-based evolution at 100 TB. Stats pruning
        and equality-delete keys go through the same mapping.
        """
        from iceberg_catalog_postgres_spark.catalog.metadata import (
            FIELD_ID_KEY,
            TableMetadata,
            schema_to_iceberg,
        )

        current_ids = {
            f.name: f.metadata.get(FIELD_ID_KEY)
            for f in self.schema.fields
            if f.metadata and FIELD_ID_KEY in f.metadata
        }
        # Type changes must be WIDENING-safe (Iceberg's promotion rules:
        # int -> long, float -> double). Old files keep their narrow
        # physical type; Spark's parquet reader up-casts them at scan time,
        # so widening needs zero data movement — but a narrowing or
        # incompatible change would corrupt every existing file's read and
        # is rejected here at commit time.
        from pyspark.sql.types import DoubleType as _Dbl
        from pyspark.sql.types import FloatType as _Flt
        from pyspark.sql.types import IntegerType as _Int
        from pyspark.sql.types import LongType as _Lng

        _widen_ok = {(_Int, _Lng), (_Flt, _Dbl)}
        old_types_by_id = {
            f.metadata[FIELD_ID_KEY]: f.dataType
            for f in self.schema.fields
            if f.metadata and FIELD_ID_KEY in f.metadata
        }
        for f in new_schema.fields:
            meta = f.metadata or {}
            fid = meta.get(FIELD_ID_KEY) or current_ids.get(f.name)
            if fid is None or fid not in old_types_by_id:
                continue  # new column
            old_t = old_types_by_id[fid]
            if old_t != f.dataType and (type(old_t), type(f.dataType)) not in _widen_ok:
                raise ValueError(
                    f"incompatible type change for field id {fid}"
                    f" ({old_t.simpleString()} -> {f.dataType.simpleString()});"
                    " only int->long and float->double widen safely"
                )
        next_id = max(current_ids.values(), default=0)
        fields = []
        for f in new_schema.fields:
            meta = dict(f.metadata or {})
            if FIELD_ID_KEY not in meta:
                if f.name in current_ids:  # existing column keeps its id
                    meta[FIELD_ID_KEY] = current_ids[f.name]
                else:  # genuinely new column gets a fresh id
                    next_id += 1
                    meta[FIELD_ID_KEY] = next_id
            from pyspark.sql.types import StructField as _SF

            fields.append(_SF(f.name, f.dataType, f.nullable, meta))
        evolved = StructType(fields)

        from dataclasses import replace as _dc_replace

        md = self.metadata
        # Detect renames: same field id, different name. Record them with
        # the NEXT sequence number — every existing file's seq is below it,
        # every future file's at-or-above, which is exactly the cohort
        # boundary reads need.
        old_names_by_id = {
            f.metadata[FIELD_ID_KEY]: f.name
            for f in self.schema.fields
            if f.metadata and FIELD_ID_KEY in f.metadata
        }
        renames = []
        for f in evolved.fields:
            fid = f.metadata[FIELD_ID_KEY]
            if fid in old_names_by_id and old_names_by_id[fid] != f.name:
                renames.append(
                    {
                        "field-id": fid,
                        "from": old_names_by_id[fid],
                        "to": f.name,
                        "as-of-seq": md.next_sequence_number(),
                    }
                )
        props = dict(md.properties)
        new_spec = list(md.partition_spec)
        new_spec_log = [list(s) for s in md.partition_spec_log]
        if renames:
            props["column-renames"] = [*props.get("column-renames", []), *renames]
            # Rename follow-through (r7): partition-spec entries and NDV
            # properties reference source columns BY NAME — remap them in
            # the SAME commit or they silently reference a dead name (specs
            # crashed the next partitioned write; a later column re-using
            # the name inherited the old column's NDV — a planner lie).
            entry_renames = list(props.get("partition-entry-renames", []))
            for r in renames:
                seen_aliases = set()
                for spec_ in (new_spec, *new_spec_log):
                    # historical specs get the same follow-through: their
                    # entries name source columns too (old files' tuple keys
                    # AND the serialized partition-specs history resolve
                    # through current names)
                    for i, entry in enumerate(spec_):
                        kind, param, col = parse_partition_field(entry)
                        if col == r["from"]:
                            new_entry = build_partition_entry(kind, param, r["to"])
                            if (entry, new_entry) not in seen_aliases:
                                seen_aliases.add((entry, new_entry))
                                entry_renames.append(
                                    {
                                        "from": entry,
                                        "to": new_entry,
                                        # seq-scoped (r8): tuple-key matching
                                        # resolves the SINGLE label per file
                                        # cohort and detects recycled labels
                                        "as-of-seq": r["as-of-seq"],
                                    }
                                )
                            spec_[i] = new_entry
                for prefix in ("ndv.sketch.", "ndv.estimate.", "ndv.covered-files."):
                    old_key = prefix + r["from"]
                    if old_key in props:
                        props[prefix + r["to"]] = props.pop(old_key)
            if entry_renames:
                props["partition-entry-renames"] = entry_renames
        # Drop guards (r7): removing a column that other table state still
        # references by name would corrupt later operations loudly or —
        # worse — quietly. Reject at commit time instead (Iceberg does the
        # same for partition sources).
        evolved_names = {f.name for f in evolved.fields}
        for entry in new_spec:
            src_col = parse_partition_field(entry)[2]
            if src_col not in evolved_names:
                raise ValueError(
                    f"cannot drop column {src_col!r}: it is the source of "
                    f"partition-spec entry {entry!r}; evolve the partition "
                    "spec first (commit_partition_spec)"
                )
        evolved_ids = {f.metadata.get(FIELD_ID_KEY) for f in evolved.fields}
        dropped = {
            name for fid, name in old_names_by_id.items() if fid not in evolved_ids
        }
        if dropped and self.metadata.current_delete_files():
            import pyarrow.parquet as _pq

            store_ = self.catalog.object_store()
            for df_rel in self.metadata.current_delete_files():
                key_names = set(
                    _pq.read_schema(store_.resolve(df_rel)).names
                )
                # forward-map the delete file's written key names through
                # renames BEFORE comparing (a pre-rename key is fine)
                seq = self.metadata.current_file_seqs().get(df_rel, 0)
                cur_keys = {self.current_name(k, seq) for k in key_names}
                hit = cur_keys & dropped
                if hit:
                    raise ValueError(
                        f"cannot drop column(s) {sorted(hit)}: pending "
                        f"equality-delete file {df_rel!r} is keyed on them; "
                        "materialize deletes first (rewrite/compact)"
                    )
        if dropped:
            # NDV hygiene: estimates for columns that left the schema are
            # meaningless (and a later column re-using the name must not
            # inherit them — the recycled-name trap, again)
            for k in list(props):
                for prefix in ("ndv.sketch.", "ndv.estimate.", "ndv.covered-files."):
                    if k.startswith(prefix) and k[len(prefix):] in dropped:
                        del props[k]
        if defaults:
            # Iceberg v3 initial-default: only meaningful on NEW columns —
            # existing files predate them, so the seq-scoped fill at read
            # time is exactly "what this column would have contained".
            ids_by_name = {f.name: f.metadata[FIELD_ID_KEY] for f in evolved.fields}
            unknown = [n for n in defaults if n not in ids_by_name]
            if unknown:
                raise ValueError(f"default for unknown column(s): {unknown}")
            entries = []
            for n, v in defaults.items():
                fid = ids_by_name[n]
                if fid in old_names_by_id:
                    raise ValueError(
                        f"initial-default only applies to newly added columns: {n}"
                    )
                entries.append(
                    {"field-id": fid, "default": v, "as-of-seq": md.next_sequence_number()}
                )
            props["column-defaults"] = [*props.get("column-defaults", []), *entries]
        # identifier-field-ids survive evolution (r17): ids, not names, so
        # renames need nothing; DROPPING an identifier column is refused
        # (Iceberg's rule — the declared identity must stay resolvable)
        ident_ids = [int(i) for i in md.schema.get("identifier-field-ids", [])]
        if ident_ids:
            kept_ids = {f.metadata[FIELD_ID_KEY] for f in evolved.fields}
            dropped = [i for i in ident_ids if i not in kept_ids]
            if dropped:
                by_id = {
                    int(f["id"]): f["name"] for f in md.schema.get("fields", [])
                }
                raise ValueError(
                    "cannot drop identifier field(s) "
                    f"{[by_id.get(i, i) for i in dropped]}; clear the "
                    "identity first (set_identifier_fields(None))"
                )
        new_md = _dc_replace(
            md,
            schema=schema_to_iceberg(evolved, identifier_field_ids=ident_ids),
            properties=props,
            partition_spec=new_spec,
            partition_spec_log=new_spec_log,
        ).with_log_entry(self._metadata_location, md.last_updated_ms)
        import posixpath as _pp
        import uuid as _uuid

        store = self.catalog.object_store()
        new_location = _pp.join(
            md.location, "metadata", f"s{len(md.snapshots)}-{_uuid.uuid4().hex}.metadata.json"
        )
        store.put(new_location, new_md.to_json().encode())
        try:
            return self.catalog.update_table(
                self.identifier, new_location, self._metadata_location
            )
        except CommitConflictError:
            # A DATA commit racing a schema edit commutes: reload the winner
            # and re-apply (validation, rename detection, and as-of-seq all
            # recompute against the winner). A concurrent SCHEMA change does
            # NOT commute — two editors must see each other — so only retry
            # when the winner's schema is byte-identical to our base.
            if _retries <= 0:
                raise
            import random as _random
            import time as _time

            _time.sleep(_random.uniform(0.01, 0.05))
            winner = self.catalog.load_table(self.identifier)
            if winner.metadata.schema != md.schema or (
                winner.metadata.partition_spec != md.partition_spec
            ):
                raise
            return winner.commit_schema(
                new_schema, defaults=defaults, _retries=_retries - 1
            )

    def commit_partition_spec(self, partition_by: list[str]) -> "Table":
        """Partition-spec evolution (Iceberg spec evolution): change the
        identity-partition columns with a metadata-only CAS commit. Existing
        data files keep the tuples they were written with; future appends
        record tuples under the new spec. ``planned_files_partition`` keeps
        files without a matching recorded tuple (superset-safe), so
        mixed-spec tables prune newly-written files by the new columns while
        never losing old-spec rows — exactly Iceberg's evolution contract
        (no data rewrite, ever).
        """
        from dataclasses import replace as _dc_replace

        validate_partition_spec(partition_by, self.schema)

        def edit(md):
            if list(partition_by) == list(md.partition_spec):
                return md  # no-op evolution: don't grow the spec log
            return _dc_replace(
                md,
                partition_spec=list(partition_by),
                # superseded spec joins the history so the metadata document
                # serializes the FULL partition-specs list with real
                # spec-ids (mixed-spec tables describe their own layout)
                partition_spec_log=[*md.partition_spec_log, list(md.partition_spec)],
            )

        return self._commit_metadata_edit(edit, "spec")

    def refresh(self) -> "Table":
        return self.catalog.load_table(self.identifier)


class Transaction:
    """Snapshot transaction: stage appended/overwritten files, commit via the
    catalog CAS with bounded retry.

    Commit algorithm (write path E3 in SURVEY §3):
      1. next metadata = current.with_snapshot(new snapshot)
      2. PUT new metadata JSON at a fresh location (never overwrite)
      3. CAS UPDATE pointer old->new; on conflict: reload, re-apply staged
         snapshot on the winner's metadata, retry (append commutes; overwrite
         last-writer-wins) — up to ``max_retries`` with jittered backoff.
    """

    def _hash_write_target_rows(self) -> int | None:
        """The per-file row budget a ``distribution_mode='hash'`` write
        splits hot partitions by (r17): ``write.target-rows`` directly,
        else ``write.target-file-size-bytes`` converted through the
        table's manifest row width (``maintenance._resolve_target_rows``,
        a metadata fold). None when the table declares no target — the
        write then keeps the classic one-file-per-value layout, and the
        count-by-value agg is skipped entirely (zero cost by default)."""
        props = self.table.metadata.properties
        if "write.target-rows" in props:
            return max(int(props["write.target-rows"]), 1)
        if "write.target-file-size-bytes" in props:
            from iceberg_catalog_postgres_spark.catalog.maintenance import (
                _resolve_target_rows,
            )

            try:
                return _resolve_target_rows(self.table)
            except ValueError:
                return None  # empty table: no row width to derive yet
        return None

    def __init__(
        self, table: Table, max_retries: int | None = None, branch: str = "main"
    ):
        self.table = table
        # Iceberg's commit.retry.num-retries property bounds the CAS loop
        # (default 5 here); an explicit argument still wins — tests and
        # internal callers pin their own budget
        if max_retries is None:
            max_retries = int(
                table.metadata.properties.get("commit.retry.num-retries", 5)
            )
        self.max_retries = max_retries
        self.branch = branch
        self._operation: str | None = None
        self._staged_files: list[str] = []
        self._staged_delete_files: list[str] = []
        self._staged_pos_delete_files: list[str] = []
        # deletion-vector staging (Iceberg v3): data-file REL path -> numpy
        # uint64 positions to delete. Merged with the CURRENT parent's
        # vectors INSIDE the commit loop (not here) so a CAS retry unions
        # against the winner's vectors — the v3 "one superseding vector per
        # file" invariant survives concurrent DV writers.
        self._staged_dv_positions: dict = {}
        # lineage-preserving rewrites (compaction) pre-declare the
        # first_row_id of files whose rows carry MATERIALIZED ids — the
        # commit keeps these instead of minting fresh ids
        self._lineage_first_row_ids: dict[str, int] = {}
        self._summary_extra: dict[str, str] = {}
        self._staged_partitions: dict[str, dict] = {}
        # rel path -> {"record_count", "bounds"} collected from the writer's
        # own footers at staging time; committed into the snapshot's
        # file_stats so reads never open footers (Iceberg manifest metrics).
        self._staged_stats: dict[str, dict] = {}
        # Base file set this transaction was computed against — used to
        # validate overwrite retries (Iceberg's validateNoNewFiles): an
        # overwrite's output was derived from these files, so if a concurrent
        # commit changed the set, blindly re-applying would drop the winner's
        # rows (e.g. compaction racing a streaming append).
        self._base_data_files: frozenset[str] = frozenset(
            table.metadata.current_data_files()
        )
        # property updates that land in the SAME metadata document / CAS swap
        # as the snapshot — e.g. a streaming sink's batch-id fence must be
        # atomic with the data it fences, or a torn writer can double-commit
        self._staged_props: dict = {}
        self._fence: tuple[str, int] | None = None
        # sort-order declared by this transaction's write (sort_by=...):
        # registered into the metadata document's ``sort-orders`` at commit
        self._sort_by: list[str] | None = None

    # -- staging ----------------------------------------------------------

    def set_properties(self, props: dict) -> "Transaction":
        """Stage table-property updates to commit atomically with this
        transaction's snapshot (one metadata write, one CAS)."""
        self._staged_props.update(props)
        return self

    def fence(self, key: str, epoch: int) -> "Transaction":
        """Epoch/batch-id fencing (the streaming exactly-once contract): the
        commit lands ONLY if the table's ``key`` property is still below
        ``epoch``; otherwise commit() returns the current table untouched —
        a replayed micro-batch (restart after a torn write) or a zombie twin
        of this writer finds the fence already advanced and becomes a no-op.
        The check re-runs inside every CAS retry against the winner's
        metadata, so two racing writers of the same epoch cannot both land:
        the loser's retry sees the winner's fence. ``set_properties`` is
        staged automatically so the fence advances atomically with the data.
        """
        self._fence = (key, int(epoch))
        self._staged_props[key] = int(epoch)
        return self

    def append_files(
        self,
        files: list[str],
        stats: dict | None = None,
        partitions: dict | None = None,
    ) -> "Transaction":
        if self._operation in ("overwrite", "delete"):
            raise ValueError(f"cannot mix append and {self._operation} in one transaction")
        self._operation = self._operation or "append"
        self._staged_files.extend(files)
        if stats:
            self._staged_stats.update({f: stats[f] for f in files if f in stats})
        if partitions:
            self._staged_partitions.update(
                {f: partitions[f] for f in files if f in partitions}
            )
        return self

    def cherry_pick(self, snapshot_id: int) -> "Transaction":
        """Re-apply an APPEND snapshot's file delta onto the CURRENT head
        (Iceberg's cherry-pick): the snapshot's newly-added data files are
        staged as a fresh append — stats and partition tuples carried over,
        zero data movement — so a commit staged on a branch (or stranded by
        a rollback) lands on main without rewriting anything. Only append
        snapshots cherry-pick cleanly; anything else needs a data-aware
        merge and raises."""
        md = self.table.metadata
        try:
            snap = md.snapshot_by_id(snapshot_id)
        except StopIteration:
            raise ValueError(f"no such snapshot: {snapshot_id}") from None
        if snap.operation != "append":
            raise ValueError(
                f"only append snapshots cherry-pick (got {snap.operation})"
            )
        # The snapshot's OWN delta, read from its recorded per-file sequence
        # numbers (a file added BY this snapshot carries its sequence
        # number), never from list-position diffing: the snapshots list is
        # commit-ordered across branches, so the positional predecessor of a
        # branch commit can be an unrelated main snapshot — diffing against
        # an interleaved overwrite there would resurrect the whole old
        # lineage as "new" files (r6 self-review find).
        delta = [
            f for f in snap.data_files
            if snap.file_seqs.get(f) == snap.sequence_number
        ]
        if not delta:
            raise ValueError(
                f"snapshot {snapshot_id} added no data files; nothing to "
                "cherry-pick"
            )
        return self.append_files(
            delta, stats=dict(snap.file_stats), partitions=dict(snap.file_partitions)
        )

    def overwrite_files(self, files: list[str]) -> "Transaction":
        self._operation = "overwrite"
        self._staged_files = list(files)
        return self

    def append_dataframe(
        self,
        df: DataFrame,
        sort_by: list[str] | None = None,
        n_files: int | None = None,
        zorder_by: list[str] | None = None,
        bloom_filters: dict[str, int] | None = None,
        distribution_mode: str = "none",
    ) -> "Transaction":
        """Write df as parquet under the table location, stage the new files.

        ``distribution_mode="hash"`` (Iceberg's ``write.distribution-mode``)
        pre-shuffles the rows by the PARTITION TRANSFORM expressions before
        the partitioned write, so each partition value lands in one task
        and writes ONE file instead of one per (task x value). At 100 TB
        this is the small-files control for wide appends: 1000 tasks x 365
        day-partitions is 365k files under "none" and 365 under "hash" —
        the trade is one extra shuffle of the appended data. Default stays
        "none" (task-local writes, no shuffle), matching Iceberg's default
        for unsorted appends.

        ``bloom_filters`` maps column -> expected NDV: the parquet writer
        embeds a split-block bloom filter per row group for those columns
        (``parquet.bloom.filter.enabled#<col>``), and the columns are
        recorded in the ``write.bloom-filter-columns`` table property
        (committed atomically with the snapshot). At 100 TB this is the
        point-lookup complement to min/max bounds: a high-cardinality
        equality predicate over unsorted data (where every row group's
        min/max spans the domain) still skips row groups at plan time —
        parquet-mr's RowGroupFilter consults the bloom before any page
        read (r9).

        The write is executor-parallel (df.write.parquet); only the file-name
        listing happens on the driver. Files land in a unique subdir so
        concurrent writers never collide before their CAS resolves order.

        If the table declares a partition spec (identity columns), the write
        partitions by shadow copies of those columns (``__p_<col>``) so the
        DATA files keep the full schema (reads are unchanged) while each
        file's hive-style path yields its partition tuple, which is recorded
        in the snapshot metadata for metadata-only scan pruning.

        ``sort_by`` is Iceberg's range write-distribution: rows are
        range-repartitioned on the given columns (``n_files`` output files,
        default the session parallelism) and sorted within each file, so
        every file covers a DISJOINT slice of the sort key and the manifest
        bounds written at commit become maximally selective — the difference
        between a range query planning 1 file and planning all of them.
        This is a write-side knob; reads are unchanged.
        """
        store = self.table.catalog.object_store()
        rel_dir = posixpath.join(self.table.metadata.location, "data", f"part-{uuid.uuid4().hex}")
        abs_dir = store.resolve(rel_dir)
        import glob as _glob
        import os as _os
        import urllib.parse as _up

        _ensure_stats_friendly_writes(df.sparkSession)
        bloom_opts: dict[str, str] = {}
        if bloom_filters:
            missing = [c for c in bloom_filters if c not in df.columns]
            if missing:
                raise ValueError(f"bloom_filters column(s) not in frame: {missing}")
            for col, ndv in bloom_filters.items():
                bloom_opts[f"parquet.bloom.filter.enabled#{col}"] = "true"
                bloom_opts[f"parquet.bloom.filter.expected.ndv#{col}"] = str(int(ndv))
            import json as _json_bf

            self._staged_props["write.bloom-filter-columns"] = _json_bf.dumps(
                sorted(bloom_filters)
            )
        if sort_by and zorder_by:
            raise ValueError("pass either sort_by or zorder_by, not both")
        if not sort_by and not zorder_by:
            # the table's declared DEFAULT write order (r16, ``ALTER TABLE
            # ... WRITE ORDERED BY``) applies when the caller didn't pick a
            # distribution; skipped if a projection dropped an order column
            default_order = self.table.metadata.default_sort_fields()
            if default_order and all(
                c in df.columns for c, _, _ in default_order
            ):
                sort_by = default_order
        if sort_by:
            # declare the order in the metadata document (spec sort-orders);
            # normalized to (name, direction, null_order) triples (r17 —
            # entries may carry desc / nulls-last)
            from iceberg_catalog_postgres_spark.catalog.metadata import (
                normalize_sort_specs,
            )

            sort_by = normalize_sort_specs(list(sort_by))
            self._sort_by = sort_by
        if zorder_by:
            # z-order is NOT expressible as an Iceberg sort order (sort
            # transforms are the partition transforms; Morton interleaving
            # isn't one) — record the write-clustering columns as a table
            # property instead, atomically with this commit
            import json as _json

            self._staged_props["write.zorder-columns"] = _json.dumps(list(zorder_by))
            # Z-ORDER write distribution: cluster files along the Morton
            # curve of N columns so each file's manifest bounds are tight
            # in EVERY dimension — an N-D box query then prunes by
            # intersecting the per-column planned sets. Pure JVM bit-ops,
            # whole-stage-codegen'd; the curve key never hits disk. Bits
            # per dimension shrink as dimensions grow (total <= 63), the
            # standard trade: more dims = coarser per-dim resolution (r9:
            # generalized from the 2-column restriction).
            if len(zorder_by) < 2:
                raise ValueError("zorder_by needs at least 2 columns")
            from pyspark.sql import functions as _F

            from iceberg_catalog_postgres_spark.operators.scale_patterns import (
                _z_value_n,
            )

            width = n_files or df.sparkSession.sparkContext.defaultParallelism
            # Columns on different scales interleave uselessly (the smaller
            # domain's high bits are constant zero), so each dimension is
            # min-max normalized onto the curve's full bit range first —
            # the same per-column range scaling Delta/Iceberg z-order does.
            # The per-column min/max ride the WRITE plan as a broadcast
            # 1-row aggregate instead of an eager .first() (r18, VERDICT
            # r17 item 8): one driver-blocking pre-scan fewer per z-order
            # write; same fp64 arithmetic, so the curve keys — and the
            # written clustering — are unchanged. An empty frame or
            # all-NULL / constant column has no range to normalize: its
            # dimension emits the constant 0 (coalesce + the hi<=lo guard
            # below), i.e. it drops out of the curve, exactly the old
            # driver-side degenerate-domain rule (ADVICE r5).
            stats = df.agg(
                *[
                    m
                    for i, c in enumerate(zorder_by)
                    for m in (
                        _F.coalesce(_F.min(c).cast("double"), _F.lit(0.0)).alias(
                            f"__zlo{i}"
                        ),
                        _F.coalesce(_F.max(c).cast("double"), _F.lit(0.0)).alias(
                            f"__zhi{i}"
                        ),
                    )
                ]
            )
            bits = min(11, 63 // len(zorder_by))
            top = (1 << bits) - 1

            def _scaled(col, i):
                lo, hi = _F.col(f"__zlo{i}"), _F.col(f"__zhi{i}")
                return _F.when(hi <= lo, _F.lit(0).cast("long")).otherwise(
                    _F.round(
                        (_F.col(col).cast("double") - lo) / (hi - lo) * top
                    ).cast("long")
                )

            zcol = _z_value_n(
                [_scaled(c, i) for i, c in enumerate(zorder_by)], bits
            )
            df = (
                df.crossJoin(_F.broadcast(stats))
                .withColumn("__z", zcol)
                .repartitionByRange(width, _F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z", *[f"__z{s}{i}" for i in range(len(zorder_by)) for s in ("lo", "hi")])
            )
        if sort_by:
            width = n_files or df.sparkSession.sparkContext.defaultParallelism
            # direction-honoring sort expressions (r17): DESC orders put
            # the newest/largest keys in the FIRST file — file bounds stay
            # disjoint either way, but readers consuming files in manifest
            # order see the declared direction (newest-first event logs)
            exprs = sort_field_exprs(sort_by)
            df = df.repartitionByRange(width, *exprs).sortWithinPartitions(*exprs)
        spec = self.table.metadata.partition_spec
        if spec:
            import re as _re2

            dtypes = {f.name: f.dataType for f in df.schema.fields}

            def _shadow_name(entry: str) -> str:
                return "__p_" + _re2.sub(r"[^A-Za-z0-9_]", "_", entry)

            shadow_to_entry = {_shadow_name(e): e for e in spec}
            _bh = _bucket_hash_of(self.table.metadata)
            aug = df
            for e in spec:
                col = parse_partition_field(e)[2]
                aug = aug.withColumn(
                    _shadow_name(e),
                    transform_column(e, dtypes.get(col), bucket_hash=_bh),
                )
            if distribution_mode == "hash":
                from pyspark.sql import functions as _Fd

                aug = aug.repartition(*[_Fd.col(_shadow_name(e)) for e in spec])
                # Hot-partition split (r17, judge item 7): hash distribution
                # writes ONE file per partition value — the small-files fix
                # that introduces the large-files bug when a value is hot.
                # When the table declares a size target (write.target-rows /
                # write.target-file-size-bytes), the WRITER rolls to a new
                # file every `target` rows (maxRecordsPerFile): a hot value
                # yields exactly ceil(rows/target) files, each still wholly
                # within its value, so pruning and tuples are untouched —
                # zero extra passes, deterministic, and AQE-proof (a salt
                # column would need its shuffle pinned against coalescing
                # and still splits ragged). Cluster note: the hot value's
                # files are written serially by its one task; if writer
                # wall-time (not file size) becomes the bottleneck, salt
                # the repartition too — the files stay correct either way.
                target = self._hash_write_target_rows()
                if target:
                    bloom_opts["maxRecordsPerFile"] = str(int(target))
            elif distribution_mode != "none":
                raise ValueError(
                    f"distribution_mode must be 'none' or 'hash', got {distribution_mode!r}"
                )
            aug.write.mode("overwrite").options(**bloom_opts).partitionBy(
                *[_shadow_name(e) for e in spec]
            ).parquet(abs_dir)
            new_files = []
            abs_by_rel = {}
            for p in sorted(
                _glob.glob(_os.path.join(abs_dir, *["*"] * len(spec), "*.parquet"))
            ):
                rel = posixpath.join(rel_dir, _os.path.relpath(p, abs_dir))
                tuple_vals = {}
                for seg in _os.path.relpath(p, abs_dir).split(_os.sep)[:-1]:
                    k, _, v = seg.partition("=")
                    # tuple key is the SPEC ENTRY ("col" for identity,
                    # "bucket(N,col)" / "truncate(W,col)" for transforms)
                    entry = shadow_to_entry.get(k, k[len("__p_"):] if k.startswith("__p_") else k)
                    val = _up.unquote(v)
                    tuple_vals[entry] = None if val == "__HIVE_DEFAULT_PARTITION__" else val
                self._staged_partitions[rel] = tuple_vals
                abs_by_rel[rel] = p
                new_files.append(rel)
        else:
            df.write.mode("overwrite").options(**bloom_opts).parquet(abs_dir)
            new_files = []
            abs_by_rel = {}
            for p in sorted(_glob.glob(_os.path.join(abs_dir, "*.parquet"))):
                rel = posixpath.join(rel_dir, _os.path.basename(p))
                abs_by_rel[rel] = p
                new_files.append(rel)
        stats = collect_file_stats_many(abs_by_rel)
        # Spark emits a schema-only part file for an empty write; committing
        # it would put a 0-record entry in every future manifest scan (and,
        # at scale, one per empty write task). Iceberg writers drop empty
        # files before commit — do the same, from the stats just collected.
        empty = {rel for rel, st in stats.items() if st.get("record_count") == 0}
        if empty:
            new_files = [r for r in new_files if r not in empty]
            for r in empty:
                stats.pop(r, None)
                self._staged_partitions.pop(r, None)
        self._staged_stats.update(stats)
        return self.append_files(new_files)

    def append_rows(self, spark: SparkSession, rows: list, schema) -> "Transaction":
        """Append a handful of DRIVER-LOCAL literal rows without a Spark
        write job (r18, VERDICT r17 item 6). Profiling the lifecycle
        certification rows showed their floor is NOT commit machinery
        (CAS + manifest + stats ≈ 0.08 s per commit) but the one-task
        ``df.write.parquet`` job each tiny fixture append launches
        (~97% of the five-append wall). The rows already live on the
        driver, so the file is written directly with the same parquet
        library the stats reader uses — one footer, one file, zero jobs —
        and staged through the IDENTICAL stats/commit path as
        ``append_dataframe`` (``collect_file_stats`` reads the fresh
        footer; the CAS, manifest chunks, and snapshot summaries that the
        lifecycle rows certify are untouched).

        Gated to exact physical-type matches with Spark's writer (int32 /
        int64 / float32 / float64 / string / boolean / date32); any other
        schema — and any partitioned table or declared write order, whose
        write-side layout rules live in ``append_dataframe`` — falls back
        to the distributed write. Real data appends (anything that is a
        Spark plan over files) always take ``append_dataframe``; at scale
        this path only ever sees O(1) fixture/repair rows."""
        from pyspark.sql.types import (
            BooleanType,
            DateType,
            DoubleType,
            FloatType,
            IntegerType,
            LongType,
            StringType,
            StructType,
        )

        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        _PA_TYPES = {
            LongType: "int64",
            IntegerType: "int32",
            DoubleType: "float64",
            FloatType: "float32",
            StringType: "string",
            BooleanType: "bool_",
            DateType: "date32",
        }
        md = self.table.metadata
        if (
            md.partition_spec
            or md.default_sort_fields()
            or any(type(f.dataType) not in _PA_TYPES for f in schema.fields)
        ):
            return self.append_dataframe(
                spark.createDataFrame(rows, schema).coalesce(1)
            )
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        store = self.table.catalog.object_store()
        rel_dir = posixpath.join(md.location, "data", f"part-{uuid.uuid4().hex}")
        abs_dir = store.resolve(rel_dir)
        _os.makedirs(abs_dir, exist_ok=True)
        pa_schema = _pa.schema(
            [
                (f.name, getattr(_pa, _PA_TYPES[type(f.dataType)])())
                for f in schema.fields
            ]
        )
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        table_pa = _pa.Table.from_arrays(
            [_pa.array(list(c), type=t) for c, t in zip(cols, pa_schema.types)],
            schema=pa_schema,
        )
        if table_pa.num_rows == 0:
            return self  # empty append: nothing to stage (same as the
            # empty-part-file drop in append_dataframe)
        fname = f"part-00000-{uuid.uuid4().hex}.snappy.parquet"
        _pq.write_table(table_pa, _os.path.join(abs_dir, fname), compression="snappy")
        rel = posixpath.join(rel_dir, fname)
        self._staged_stats.update(
            collect_file_stats_many({rel: _os.path.join(abs_dir, fname)})
        )
        return self.append_files([rel])

    def overwrite_dataframe(
        self,
        df: DataFrame,
        sort_by: list[str] | None = None,
        n_files: int | None = None,
        lineage_materialized: bool = False,
    ) -> "Transaction":
        """Write df as parquet and stage it as a full-table OVERWRITE
        snapshot (replaces the current file set atomically at commit).
        ``sort_by`` applies the same range write-distribution as
        ``append_dataframe`` — the re-cluster path: an overwrite that
        rewrites the table into disjoint sort-key slices so manifest
        bounds become maximally selective.

        ``lineage_materialized=True`` declares that ``df`` carries the v3
        ``_row_id`` column with the rows' EXISTING lineage ids (a
        lineage-preserving rewrite — see ``compact_table``): the commit
        keeps ids instead of minting fresh ones, marks the new files as
        materialized in the snapshot's lineage map, and tags the snapshot
        ``lineage-preserving`` so the changelog can prove it introduces no
        row-level changes."""
        if lineage_materialized and "_row_id" not in df.columns:
            raise ValueError(
                "lineage_materialized requires the _row_id column "
                "(read the input with to_df(with_row_lineage=True))"
            )
        self.append_dataframe(df, sort_by=sort_by, n_files=n_files)
        self._operation = "overwrite"
        if lineage_materialized:
            self._lineage_first_row_ids = {f: None for f in self._staged_files}
            # "materialized" records HOW ids are stored; whether the rewrite
            # is row-level CHANGE-FREE ("lineage-preserving", compaction) or
            # lineage-DIFFABLE (a merge) is the caller's claim — see
            # compact_table / merge_upsert
            self._summary_extra["lineage-materialized"] = "true"
        return self

    def delete_keys_dataframe(self, keys: DataFrame) -> "Transaction":
        """Merge-on-read DELETE: write ``keys`` (the equality-key columns of
        the rows to remove) as a delete file and stage a DELETE snapshot.
        No data file is read or rewritten — the commit is O(delete keys)
        regardless of table size, which is the whole point at 100 TB: a
        GDPR-style purge of a few thousand keys costs seconds, and readers
        apply it as a broadcast anti-join until compaction materializes it.
        """
        if self._operation in ("append", "overwrite"):
            raise ValueError("cannot mix data writes and deletes in one transaction")
        self._operation = "delete"
        store = self.table.catalog.object_store()
        rel_dir = posixpath.join(
            self.table.metadata.location, "data", f"eqdel-{uuid.uuid4().hex}"
        )
        abs_dir = store.resolve(rel_dir)
        _ensure_stats_friendly_writes(keys.sparkSession)
        keys.write.mode("overwrite").parquet(abs_dir)
        import glob as _glob
        import os as _os

        abs_by_rel = {}
        for p in sorted(_glob.glob(_os.path.join(abs_dir, "*.parquet"))):
            rel = posixpath.join(rel_dir, _os.path.basename(p))
            abs_by_rel[rel] = p
        stats = collect_file_stats_many(abs_by_rel)
        # drop Spark's schema-only empty part files (same rule as data
        # appends): a 0-key delete file is manifest noise at scale
        for rel, st in sorted(stats.items()):
            if st.get("record_count") == 0:
                continue
            self._staged_delete_files.append(rel)
            self._staged_stats[rel] = st
        return self

    def delete_positions_dataframe(self, positions: DataFrame) -> "Transaction":
        """Merge-on-read positional DELETE: ``positions`` must have exactly
        the columns (file_path string, row_index long) — the scan-provided
        ``_metadata`` identity of the rows to remove. Commits O(matched
        rows); no data file is rewritten. This is the arbitrary-predicate
        counterpart to equality deletes: filter the table WITH its metadata
        columns, keep (file_path, row_index), stage them here.
        """
        if self._operation in ("append", "overwrite"):
            raise ValueError("cannot mix data writes and deletes in one transaction")
        if set(positions.columns) != {"file_path", "row_index"}:
            raise ValueError(f"positions must be (file_path, row_index), got {positions.columns}")
        self._operation = "delete"
        store = self.table.catalog.object_store()
        rel_dir = posixpath.join(
            self.table.metadata.location, "data", f"posdel-{uuid.uuid4().hex}"
        )
        abs_dir = store.resolve(rel_dir)
        _ensure_stats_friendly_writes(positions.sparkSession)
        positions.write.mode("overwrite").parquet(abs_dir)
        import glob as _glob
        import os as _os

        abs_by_rel = {}
        for p in sorted(_glob.glob(_os.path.join(abs_dir, "*.parquet"))):
            rel = posixpath.join(rel_dir, _os.path.basename(p))
            abs_by_rel[rel] = p
            self._staged_pos_delete_files.append(rel)
        self._staged_stats.update(collect_file_stats_many(abs_by_rel))
        return self

    def delete_positions_dv(self, positions: DataFrame) -> "Transaction":
        """Positional DELETE as an Iceberg v3 DELETION VECTOR: same input
        contract as ``delete_positions_dataframe`` — (file_path, row_index)
        from the scan's ``_metadata`` columns — but instead of appending a
        parquet pair file per commit, the positions fold into ONE roaring
        bitmap per data file, stored as a ``deletion-vector-v1`` Puffin
        blob (catalog/dv.py). Reads then cost one RANGED blob fetch per
        file with live deletes, independent of how many delete commits
        produced them — v3's answer to MOR read amplification, vs one
        parquet open per pos-delete commit here.

        The vector union against the parent's existing vector happens
        inside the commit CAS loop, so a retry merges against the WINNER's
        vectors (the at-most-one-superseding-vector-per-file invariant
        holds under concurrent writers). Bitmaps are encoded per file ON
        EXECUTORS; the driver holds only (rel, vector bytes, cardinality)
        per touched file (r12 — see ``_stage_dv_positions``).
        """
        if self._operation in ("append", "overwrite"):
            raise ValueError("cannot mix data writes and deletes in one transaction")
        self._operation = "delete"
        return self._stage_dv_positions(positions)

    def _stage_dv_positions(self, positions: DataFrame) -> "Transaction":
        """Fold a (file_path, row_index) frame into the staged per-file
        deletion vectors — shared by ``delete_positions_dv`` (a DELETE
        commit) and ``row_delta`` (an atomic MOR merge commit).

        The fold runs ON EXECUTORS (r12; VERDICT r11 #2): each file's
        positions are deduped and roaring-ENCODED inside an
        ``applyInPandas`` group, and the driver collects only
        ``(rel, vector bytes, cardinality)`` — O(touched files) rows whose
        payloads are compressed bitmaps, never the raw O(changed rows)
        position frame a ``toPandas()`` would pull (a 10⁹-row update merge
        stays executor-bound; the driver holds bitmap bytes, ~2 B/position
        worst case). Staged entries are ``rel -> (vec_bytes, cardinality)``;
        the commit unions against the CAS winner's vectors per touched
        file only."""
        import pandas as _pd

        if set(positions.columns) != {"file_path", "row_index"}:
            raise ValueError(
                f"positions must be (file_path, row_index), got {positions.columns}"
            )
        store = self.table.catalog.object_store()
        root = store.resolve("")  # store root, for abs -> rel mapping

        def _encode(pdf: _pd.DataFrame) -> _pd.DataFrame:
            import os as _os
            import posixpath as _pp

            import numpy as _np

            from iceberg_catalog_postgres_spark.catalog.dv import (
                serialize_roaring64,
            )

            fp = str(pdf["file_path"].iloc[0])
            if fp == MERGE_CARDINALITY_SENTINEL:
                # guard row folded into this pass by merge_into (r15):
                # surface it to the driver-side loop below, which raises
                return _pd.DataFrame({"rel": [fp], "vec": [b""], "card": [0]})
            p = fp[5:] if fp.startswith("file:") else fp
            rel = _pp.relpath(p, root) if _os.path.isabs(p) else p
            pos = _np.unique(pdf["row_index"].to_numpy(dtype="uint64"))
            return _pd.DataFrame(
                {"rel": [rel], "vec": [serialize_roaring64(pos)], "card": [len(pos)]}
            )

        encoded = (
            positions.groupBy("file_path")
            .applyInPandas(_encode, schema="rel string, vec binary, card long")
            .collect()
        )
        if any(r["rel"] == MERGE_CARDINALITY_SENTINEL for r in encoded):
            raise ValueError(
                "merge_into: multiple source rows match the same target row "
                "— aggregate the source to one row per key first (MERGE "
                "cardinality violation)"
            )
        for row in encoded:
            self._staged_dv_positions[row["rel"]] = self._merge_staged_vec(
                self._staged_dv_positions.get(row["rel"]),
                (bytes(row["vec"]), int(row["card"])),
            )
        return self

    @staticmethod
    def _merge_staged_vec(prev, new):
        """Union two staged (vector bytes, cardinality) entries — decode,
        union, re-encode; bounded by the one file's staged positions."""
        if prev is None:
            return new
        import numpy as _np

        from iceberg_catalog_postgres_spark.catalog.dv import (
            deserialize_roaring64,
            serialize_roaring64,
        )

        u = _np.union1d(deserialize_roaring64(prev[0]), deserialize_roaring64(new[0]))
        return (serialize_roaring64(u), len(u))

    def row_delta(
        self,
        df: DataFrame,
        positions: DataFrame,
        lineage_materialized: bool = False,
        n_files: int | None = None,
    ) -> "Transaction":
        """Atomic ROW DELTA (Iceberg's MOR write for MERGE/UPDATE): stage
        ``df`` as NEW data files AND ``positions`` (file_path, row_index —
        the scan's ``_metadata`` identity) as deletion-vector deletes
        against EXISTING files, committed as ONE snapshot. Readers see
        pre- or post-merge state, never the half with deletes applied but
        updates missing — the atomicity a delete-commit + append-commit
        pair cannot give.

        This is the O(changed rows) merge path at 100 TB: no data file is
        rewritten (copy-on-write cost is O(table)); the commit adds only
        the updated/inserted rows' files plus one superseding vector per
        touched file. ``lineage_materialized=True`` declares ``df``
        carries the v3 ``_row_id`` column (updated rows riding their old
        identity; inserts NULL), exactly like
        ``overwrite_dataframe(lineage_materialized=True)``.

        Composes with the CAS protocol: retries validate the base file set
        (validateNoNewFiles — the staged positions were computed from it)
        and re-union vectors against the winner's state."""
        if self._operation is not None:
            raise ValueError(
                f"cannot mix row_delta with {self._operation} in one transaction"
            )
        if lineage_materialized and "_row_id" not in df.columns:
            raise ValueError(
                "lineage_materialized requires the _row_id column "
                "(read the input with to_df(with_row_lineage=True))"
            )
        if set(positions.columns) != {"file_path", "row_index"}:
            # validate BEFORE append_dataframe writes any parquet — a
            # malformed call must not leave orphan data files behind
            raise ValueError(
                f"positions must be (file_path, row_index), got {positions.columns}"
            )
        # r15 (VERDICT r14 #3): stage the DVs FIRST — the positions frame
        # may carry the MERGE cardinality sentinel, and a violation must
        # abort before any parquet is written (same reason as the column
        # check above). This also makes the DV collect the action that
        # builds the merge-join cache, replacing the dedicated guard scan.
        self._stage_dv_positions(positions)
        self.append_dataframe(df, n_files=n_files)
        if lineage_materialized:
            self._lineage_first_row_ids = {f: None for f in self._staged_files}
            self._summary_extra["lineage-materialized"] = "true"
        self._operation = "rowdelta"
        return self

    # -- commit -----------------------------------------------------------

    def commit(self, pointer_swap=None) -> Table:
        """``pointer_swap`` (internal, multi-table commits): a callable
        ``(identifier, new_location, prev_location) -> Table|None`` that
        REPLACES the catalog CAS — ``MultiTableTransaction`` passes a
        recorder so every staged table's metadata builds first and ALL
        pointers swap in one backend transaction. None (the default) is
        the single-table ``catalog.update_table`` path, unchanged."""
        if self._operation is None:
            return self.table  # empty transaction: no-op
        if self.branch != "main" and self._operation != "append":
            # Branch staging is append-only: WAP stages new data for audit;
            # overwrite/delete on a branch would need branch-scoped conflict
            # rules main commits don't see. Explicit > silently wrong.
            raise ValueError(f"branch commits are append-only, got {self._operation}")

        catalog = self.table.catalog
        identifier = self.table.identifier
        store = catalog.object_store()
        current = self.table  # holds (metadata, metadata_location) we read

        for attempt in range(self.max_retries + 1):
            if self._fence is not None:
                fkey, fepoch = self._fence
                cur_epoch = current.metadata.properties.get(fkey)
                if cur_epoch is not None and int(cur_epoch) >= fepoch:
                    # this epoch already landed (micro-batch replay after a
                    # torn write, or a zombie twin won the race): no-op —
                    # exactly-once holds because fence + data moved in ONE CAS
                    return current
            if attempt > 0 and self._operation in ("overwrite", "rowdelta"):
                # validateNoNewFiles: the staged overwrite (compaction, merge
                # upsert, CoW rewrite) or row delta (MOR merge — its delete
                # positions reference base files) was computed from the base
                # file set; a concurrent commit that changed it (e.g. an
                # append that won the race) would be silently dropped or
                # mis-targeted by re-applying. Appends and MOR deletes
                # commute and retry blindly; overwrites/row deltas fail.
                winner_files = frozenset(current.metadata.current_data_files())
                if winner_files != self._base_data_files:
                    raise CommitConflictError(
                        f"{self.table.identifier}: concurrent commit changed the "
                        "data-file set during an overwrite transaction; recompute "
                        "the overwrite from the current snapshot and retry"
                    )
            # Branch commits chain on the BRANCH head (if any), not main:
            # a metadata view with current_snapshot_id repointed makes every
            # current_* read below branch-aware with one switch.
            base_md = current.metadata
            if self.branch != "main" and self.branch in base_md.refs:
                from dataclasses import replace as _dc_replace

                base_md = _dc_replace(
                    base_md,
                    current_snapshot_id=base_md.refs[self.branch]["snapshot-id"],
                )
            next_seq = current.metadata.next_sequence_number()
            inherited_seqs = base_md.current_file_seqs()
            inherited_parts = base_md.current_file_partitions()
            inherited_stats = base_md.current_file_stats()
            # v3 row lineage: assign each NEW data file a first_row_id from
            # the document's next-row-id high-water mark (ids never reused;
            # recomputed per CAS attempt so a retry chains on the winner's
            # mark). Record counts come from the staged stats; a statless
            # raw append_files file falls back to one footer read here.
            def _rc(f: str) -> int | None:
                st = self._staged_stats.get(f) or {}
                if "record_count" in st:
                    return int(st["record_count"])
                import pyarrow.parquet as _pq_rc

                try:
                    return _pq_rc.ParquetFile(store.resolve(f)).metadata.num_rows
                except Exception:
                    # statless AND unreadable at commit time (e.g. a
                    # recovery replay registering files by path): no
                    # lineage for this file — its rows read _row_id NULL,
                    # and the never-reuse invariant stays intact
                    return None

            def _assign_row_ids(new_files: list, carried: dict) -> tuple[dict, int]:
                rid = int(base_md.next_row_id)
                out = dict(carried)
                for f in new_files:
                    n = _rc(f)
                    if n is None:
                        continue
                    if f in self._lineage_first_row_ids:
                        # lineage-materializing rewrite: the file carries a
                        # physical _row_id column with the rows' EXISTING
                        # ids. Per the v3 rule it STILL gets a fresh
                        # first_row_id — readers coalesce(physical,
                        # first + position), so rows written with NULL ids
                        # (true inserts in a merge, pre-lineage legacy rows)
                        # inherit fresh stable ids instead of staying NULL.
                        out[f] = {"first": rid, "materialized": True}
                        rid += n
                        continue
                    out[f] = rid
                    rid += n
                return out, rid

            if self._operation == "overwrite":
                # full rewrite: replaces the file set AND materializes/clears
                # any pending deletes (both flavors, deletion vectors too) —
                # but files CARRIED byte-identical through the overwrite
                # (overwrite_files keeping pruned-out files, e.g. a CoW
                # delete) were NOT rewritten: they keep their existing
                # first_row_id entries (v3 id stability — reassigning would
                # silently change those rows' _row_id) and their pending
                # deletion vectors (clearing would RESURRECT deleted rows).
                data_files = list(self._staged_files)
                delete_files: list[str] = []
                pos_delete_files: list[str] = []
                base_frids = base_md.current_first_row_ids()
                base_dvs = base_md.current_deletion_vectors()
                carried_ids = {f: base_frids[f] for f in data_files if f in base_frids}
                dv_entries: dict = {f: base_dvs[f] for f in data_files if f in base_dvs}
                first_row_ids, new_next_row_id = _assign_row_ids(
                    [f for f in data_files if f not in carried_ids], carried_ids
                )
                file_seqs = {f: next_seq for f in data_files}
                file_partitions = dict(self._staged_partitions)
                # overwrite_files-style commits can carry over untouched files
                # (CoW delete keeps pruned-out files byte-identical); those
                # keep their inherited stats — only genuinely new files need
                # the writer-collected ones.
                file_stats = {
                    **{f: inherited_stats[f] for f in data_files if f in inherited_stats},
                    **self._staged_stats,
                }
            elif self._operation == "delete":
                # merge-on-read: data files untouched, delete files accumulate
                data_files = list(current.metadata.current_data_files())
                delete_files = [
                    *current.metadata.current_delete_files(),
                    *self._staged_delete_files,
                ]
                pos_delete_files = [
                    *current.metadata.current_position_delete_files(),
                    *self._staged_pos_delete_files,
                ]
                dv_entries = dict(base_md.current_deletion_vectors())
                # data files untouched: lineage carried verbatim
                first_row_ids = dict(base_md.current_first_row_ids())
                new_next_row_id = int(base_md.next_row_id)
                file_seqs = {
                    **inherited_seqs,
                    **{
                        f: next_seq
                        for f in (*self._staged_delete_files, *self._staged_pos_delete_files)
                    },
                }
                file_partitions = inherited_parts
                file_stats = {**inherited_stats, **self._staged_stats}
            else:  # append / rowdelta: new data joins the base file set;
                # pending deletes carry (rowdelta's OWN deletes are staged
                # DV positions, merged into dv_entries below in the same
                # snapshot — the atomic MOR merge write)
                data_files = [*base_md.current_data_files(), *self._staged_files]
                delete_files = list(base_md.current_delete_files())
                pos_delete_files = list(base_md.current_position_delete_files())
                dv_entries = dict(base_md.current_deletion_vectors())
                first_row_ids, new_next_row_id = _assign_row_ids(
                    self._staged_files, base_md.current_first_row_ids()
                )
                file_seqs = {
                    **inherited_seqs,
                    **{f: next_seq for f in self._staged_files},
                }
                file_partitions = {**inherited_parts, **self._staged_partitions}
                file_stats = {**inherited_stats, **self._staged_stats}
            sid = new_snapshot_id(current.metadata.snapshot_ids())
            if self._staged_dv_positions:
                # merge staged vectors with the CURRENT parent's (on a CAS
                # retry this is the race winner's state): the new blob per
                # touched file is the union, so it supersedes — untouched
                # files keep pointing into their older sidecars. Staged
                # entries are executor-encoded (vec bytes, cardinality);
                # only files that ALREADY carry a vector pay a decode +
                # union here — the rest pass through as bytes, keeping the
                # driver at O(touched files) bitmap bytes.
                import numpy as _np

                from iceberg_catalog_postgres_spark.catalog.dv import (
                    deserialize_roaring64,
                    read_dv,
                    write_dv_sidecar,
                )

                merged: dict = {}
                for rel, ent in self._staged_dv_positions.items():
                    if rel in dv_entries:
                        merged[rel] = _np.union1d(
                            deserialize_roaring64(ent[0]),
                            read_dv(store, dv_entries[rel]),
                        )
                    else:
                        merged[rel] = ent
                dv_entries = {
                    **dv_entries,
                    **write_dv_sidecar(
                        store, current.metadata.location, merged, sid, next_seq
                    ),
                }
            snapshot = Snapshot(
                snapshot_id=sid,
                timestamp_ms=int(time.time() * 1000),
                operation=self._operation,
                data_files=data_files,
                delete_files=delete_files,
                position_delete_files=pos_delete_files,
                deletion_vectors=dv_entries,
                first_row_ids=first_row_ids,
                sequence_number=next_seq,
                file_seqs=file_seqs,
                file_partitions=file_partitions,
                file_stats=file_stats,
                summary={
                    "added-files": str(len(self._staged_files)),
                    "added-delete-files": str(
                        len(self._staged_delete_files) + len(self._staged_pos_delete_files)
                    ),
                    **(
                        {"added-dvs": str(len(self._staged_dv_positions))}
                        if self._staged_dv_positions
                        else {}
                    ),
                    "added-records": str(
                        sum(
                            self._staged_stats.get(f, {}).get("record_count", 0)
                            for f in self._staged_files
                        )
                    ),
                    # Iceberg snapshot-summary totals: an in-memory fold over
                    # the stats already in hand (no I/O). total-records is
                    # data-file rows (pre-MOR-delete, like Iceberg); omitted
                    # when any file is statless (raw append_files) rather
                    # than reported wrong — Table.record_count() still
                    # answers via the footer fallback.
                    "total-data-files": str(len(data_files)),
                    **(
                        {
                            "total-records": str(
                                sum(file_stats[f]["record_count"] for f in data_files)
                            )
                        }
                        if all(
                            "record_count" in file_stats.get(f, {}) for f in data_files
                        )
                        else {}
                    ),
                    **self._summary_extra,
                },
            )
            # Spill large file lists to manifest chunks; appends and MOR
            # deletes are additive, so they reuse the parent's chunks and
            # write only an O(delta) chunk.
            staged_entries = None
            if self._operation in ("append", "rowdelta"):
                # rowdelta's delete side lives in the snapshot's inline DV
                # map (vectors are per-file metadata, never chunked), so its
                # chunk delta is the appended data files alone
                staged_entries = [
                    {"path": f, "kind": "data", "seq": next_seq} for f in self._staged_files
                ]
            elif self._operation == "delete":
                staged_entries = [
                    {"path": f, "kind": "eq-delete", "seq": next_seq}
                    for f in self._staged_delete_files
                ] + [
                    {"path": f, "kind": "pos-delete", "seq": next_seq}
                    for f in self._staged_pos_delete_files
                ]
            if staged_entries is not None:
                for e in staged_entries:
                    if e["path"] in self._staged_partitions:
                        e["partition"] = self._staged_partitions[e["path"]]
                    if e["path"] in self._staged_stats:
                        e["stats"] = self._staged_stats[e["path"]]
            plan_manifests(
                store,
                current.metadata.location,
                self._operation,
                base_md.current_snapshot(),
                staged_entries,
                snapshot,
            )
            if self.branch == "main":
                new_metadata = current.metadata.with_snapshot(snapshot)
            else:
                # branch commit: snapshot joins the lineage, the branch ref
                # moves, main's head does NOT — readers see nothing until
                # publish_branch fast-forwards.
                from dataclasses import replace as _dc_replace

                # First commit to a branch records main's head as the branch
                # BASE; chained commits carry it forward. publish_branch
                # validates main is still at the base before fast-forwarding,
                # so a concurrent main commit can never be silently dropped.
                prior = current.metadata.refs.get(self.branch, {})
                base = prior.get(
                    "base-snapshot-id", current.metadata.current_snapshot_id
                )
                new_metadata = _dc_replace(
                    current.metadata,
                    snapshots=[*current.metadata.snapshots, snapshot],
                    refs={
                        **current.metadata.refs,
                        self.branch: {
                            "snapshot-id": snapshot.snapshot_id,
                            "type": "branch",
                            "base-snapshot-id": base,
                        },
                    },
                    last_updated_ms=int(time.time() * 1000),
                )
            if new_next_row_id != int(base_md.next_row_id):
                from dataclasses import replace as _dc_replace

                new_metadata = _dc_replace(
                    new_metadata, next_row_id=new_next_row_id
                )
            if self._staged_props:
                from dataclasses import replace as _dc_replace

                new_metadata = _dc_replace(
                    new_metadata,
                    properties={**new_metadata.properties, **self._staged_props},
                )
            if self._sort_by:
                # the write declared a sort order — register it (or reuse an
                # identical one) and make it the document default, in the
                # same CAS as the data it describes
                new_metadata = new_metadata.with_sort_order(self._sort_by)
            new_metadata = new_metadata.with_log_entry(
                current.metadata_location(), current.metadata.last_updated_ms
            )
            new_location = posixpath.join(
                new_metadata.location,
                "metadata",
                f"v{len(new_metadata.snapshots) + 1}-{uuid.uuid4().hex}.metadata.json",
            )
            store.put(new_location, new_metadata.to_json().encode())
            if pointer_swap is not None:
                # multi-table commit: the caller owns the CAS (and retries)
                return pointer_swap(
                    identifier, new_location, current.metadata_location()
                )
            try:
                return catalog.update_table(identifier, new_location, current.metadata_location())
            except CommitConflictError:
                if attempt == self.max_retries:
                    raise
                # Re-read the winner's state and re-apply our staged files.
                time.sleep(random.uniform(0.01, 0.05) * (attempt + 1))
                current = catalog.load_table(identifier)
        raise AssertionError("unreachable")
