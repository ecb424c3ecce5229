"""Iceberg v3 deletion vectors — positional deletes as roaring bitmaps in
Puffin sidecars (blob type ``deletion-vector-v1``), replacing one parquet
delete-file open per delete commit with ONE ranged sidecar read per data
file.

Why this exists at 100 TB: merge-on-read read amplification is dominated
by delete-file opens — a table that took 1,000 positional-delete commits
makes every scan open 1,000 extra parquet files. A deletion vector is the
v3 answer (and the direction of the reference's iceberg-rs lineage; the
commit model it attaches to is mod.rs:296-347): AT MOST ONE bitmap per
data file, each new vector superseding (containing) every earlier delete
for that file, stored as a blob whose (offset, length) is recorded in the
snapshot — a reader fetches exactly its blob bytes, no footer walk, no
per-commit fan-out. Storage drops too: a roaring bitmap costs ~2 bytes
per deleted row worst-case (dense ranges approach 0) vs ~16+ bytes per
(path, pos) parquet pair row.

Blob layout (Iceberg v3 spec, Puffin ``deletion-vector-v1``):

    length(vector+magic)  : 4 bytes big-endian
    magic                 : D1 D3 39 64
    vector                : 64-bit roaring bitmap, "portable" format
    crc                   : CRC-32 of magic+vector, 4 bytes big-endian

Blob metadata carries the spec's required ``referenced-data-file`` and
``cardinality`` properties. The blob's Puffin footer offset/length are
mirrored into the snapshot's ``deletion-vectors`` map so readers can
range-read the blob without parsing the footer (the spec stores the same
pair as ``content-offset``/``content-size-in-bytes`` in delete manifests).

The 64-bit roaring "portable" format (RoaringBitmap format spec, public):
uint64 LE bucket count, then per ascending high-32-bit key: uint32 LE key
followed by a standard 32-bit roaring serialization. The 32-bit writer
here emits array (cardinality <= 4096) and bitmap containers — always
spec-valid; the reader additionally understands run containers so foreign
bitmaps round-trip. CRC is zlib's CRC-32 (the spec's checksum — NOT
Castagnoli/CRC-32C, which Puffin does not use for this blob).

Everything is numpy-vectorized; serializing or decoding a multi-million
position vector is array ops, not Python loops.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DV_BLOB_TYPE = "deletion-vector-v1"

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_ARRAY_MAX = 4096  # containers above this cardinality serialize as bitmaps


# ---------------------------------------------------------------------------
# 32-bit roaring serialization
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Serialize sorted unique uint32 values: no-run cookie, descriptive
    header, offset header (mandatory in the no-run format), then array or
    bitmap containers in key order."""
    keys = (values >> np.uint32(16)).astype(np.uint16)
    lows = (values & np.uint32(0xFFFF)).astype(np.uint16)
    uniq, starts = np.unique(keys, return_index=True)
    bounds = np.append(starts, len(values))
    n = len(uniq)
    head = bytearray(struct.pack("<II", _COOKIE_NO_RUN, n))
    payloads: list[bytes] = []
    for i in range(n):
        seg = lows[bounds[i] : bounds[i + 1]]
        card = len(seg)
        head += struct.pack("<HH", int(uniq[i]), card - 1)
        if card <= _ARRAY_MAX:
            payloads.append(seg.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            # the shift amount must be uint64: uint64 << uint16 promotes the
            # RESULT through the uint16 side on some numpy versions and
            # silently drops bits >= 16
            np.bitwise_or.at(
                bits,
                (seg >> np.uint16(6)).astype(np.int64),
                np.uint64(1) << (seg & np.uint16(63)).astype(np.uint64),
            )
            payloads.append(bits.astype("<u8").tobytes())
    # offsets are from the START of this 32-bit stream (cookie byte 0)
    off = 8 + 4 * n + 4 * n
    offsets = bytearray()
    for p in payloads:
        offsets += struct.pack("<I", off)
        off += len(p)
    return bytes(head) + bytes(offsets) + b"".join(payloads)


def _deserialize_roaring32(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    """Parse one 32-bit roaring stream at ``buf[off:]``; returns (sorted
    uint32 values, offset past the stream). Handles array, bitmap, AND run
    containers (we never write runs, foreign bitmaps may)."""
    (cookie,) = struct.unpack_from("<I", buf, off)
    off += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        run_bits = bytes(buf[off : off + (n + 7) // 8])
        off += (n + 7) // 8
        is_run = [(run_bits[i // 8] >> (i % 8)) & 1 for i in range(n)]
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        is_run = [0] * n
    else:
        raise ValueError(f"roaring: unknown cookie {cookie}")
    desc = [struct.unpack_from("<HH", buf, off + 4 * i) for i in range(n)]
    off += 4 * n
    has_offsets = cookie == _COOKIE_NO_RUN or n >= 4
    if has_offsets:
        off += 4 * n  # containers are read sequentially; offsets unused
    parts: list[np.ndarray] = []
    for i in range(n):
        key, card_m1 = desc[i]
        card = card_m1 + 1
        base = np.uint32(key) << np.uint32(16)
        if is_run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=off)
            off += 4 * n_runs
            segs = [
                np.arange(runs[2 * j], runs[2 * j] + runs[2 * j + 1] + 1, dtype=np.uint32)
                for j in range(n_runs)
            ]
            vals = np.concatenate(segs) if segs else np.empty(0, dtype=np.uint32)
        elif card <= _ARRAY_MAX:
            vals = np.frombuffer(buf, dtype="<u2", count=card, offset=off).astype(
                np.uint32
            )
            off += 2 * card
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=off)
            off += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
        parts.append(base + vals)
    out = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return out, off


# ---------------------------------------------------------------------------
# 64-bit portable roaring
# ---------------------------------------------------------------------------


def serialize_roaring64(positions) -> bytes:
    """Portable 64-bit roaring bytes for an iterable/array of non-negative
    row positions (deduped + sorted here — callers pass raw position
    lists)."""
    pos = np.unique(np.asarray(list(positions) if not isinstance(positions, np.ndarray) else positions, dtype=np.uint64))
    highs = (pos >> np.uint64(32)).astype(np.uint32)
    lows = (pos & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, len(pos))
    out = bytearray(struct.pack("<Q", len(uniq)))
    for i, h in enumerate(uniq):
        out += struct.pack("<I", int(h))
        out += _serialize_roaring32(lows[bounds[i] : bounds[i + 1]])
    return bytes(out)


def deserialize_roaring64(data: bytes) -> np.ndarray:
    """Inverse of ``serialize_roaring64``: sorted uint64 positions."""
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    off = 8
    parts: list[np.ndarray] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, off)
        off += 4
        lows, off = _deserialize_roaring32(data, off)
        parts.append((np.uint64(high) << np.uint64(32)) + lows.astype(np.uint64))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


# ---------------------------------------------------------------------------
# deletion-vector-v1 blob payload
# ---------------------------------------------------------------------------


def dv_payload(positions) -> bytes:
    """Spec blob bytes: BE length of (magic + vector), magic, portable
    roaring64 vector, BE CRC-32 of (magic + vector)."""
    return dv_payload_from_vec(serialize_roaring64(positions))


def dv_payload_from_vec(vec: bytes) -> bytes:
    """``dv_payload`` for an ALREADY-ENCODED portable roaring64 vector —
    lets executor-encoded vectors flow into a sidecar without a driver
    decode/re-encode round trip."""
    body = DV_MAGIC + vec
    return struct.pack(">i", len(body)) + body + struct.pack(">I", zlib.crc32(body))


def parse_dv_payload(payload: bytes) -> np.ndarray:
    """Parse + verify a deletion-vector-v1 blob; raises on bad magic,
    length, or checksum (a corrupt vector must fail loudly, never
    resurrect rows)."""
    (length,) = struct.unpack_from(">i", payload, 0)
    body = payload[4 : 4 + length]
    if len(body) != length:
        raise ValueError("deletion vector: truncated blob")
    if body[:4] != DV_MAGIC:
        raise ValueError("deletion vector: bad magic")
    (crc,) = struct.unpack_from(">I", payload, 4 + length)
    if zlib.crc32(body) != crc:
        raise ValueError("deletion vector: CRC mismatch")
    return deserialize_roaring64(body[4:])


# ---------------------------------------------------------------------------
# sidecar write / ranged read (snapshot `deletion-vectors` map helpers)
# ---------------------------------------------------------------------------


def write_dv_sidecar(
    store,
    table_location: str,
    dvs: dict,
    snapshot_id: int,
    sequence_number: int,
) -> dict[str, dict]:
    """Write ONE Puffin sidecar holding a deletion-vector-v1 blob per
    entry of ``dvs`` (data-file rel path -> deleted positions). Returns the
    snapshot's ``deletion-vectors`` map entries:

        rel_data_file -> {"puffin": rel_sidecar, "offset": int,
                          "length": int, "cardinality": int}

    offset/length address exactly the blob bytes inside the sidecar (the
    spec's content-offset/content-size) — the read path seeks straight to
    them. One sidecar per COMMIT; files whose vector did not change keep
    pointing into their older sidecar (GC treats any referenced sidecar as
    live).

    Entry values may be position arrays OR executor-encoded
    ``(vector bytes, cardinality)`` pairs (r12) — the latter wrap straight
    into a payload, so a bulk MOR merge's vectors never decode on the
    driver."""
    import posixpath
    import uuid as _uuid

    from iceberg_catalog_postgres_spark.catalog.puffin import write_puffin

    rel = posixpath.join(table_location, "data", f"dv-{_uuid.uuid4().hex}.puffin")
    blobs = []
    order = sorted(dvs)
    for data_rel in order:
        ent = dvs[data_rel]
        if isinstance(ent, tuple):
            vec, card = bytes(ent[0]), int(ent[1])
            payload = dv_payload_from_vec(vec)
        else:
            pos = np.unique(np.asarray(ent, dtype=np.uint64))
            payload, card = dv_payload(pos), int(len(pos))
        blobs.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "payload": payload,
                "properties": {
                    "referenced-data-file": data_rel,
                    "cardinality": str(card),
                },
            }
        )
    _size, _fsize, meta = write_puffin(store.resolve(rel), blobs)
    return {
        data_rel: {
            "puffin": rel,
            "offset": int(m["offset"]),
            "length": int(m["length"]),
            "cardinality": int(m["properties"]["cardinality"]),
        }
        for data_rel, m in zip(order, meta)
    }


def read_dv(store, entry: dict) -> np.ndarray:
    """Ranged read of one deletion vector: seek to the blob's offset, read
    exactly its length, parse + CRC-verify. Never reads the sidecar footer
    or sibling blobs."""
    with open(store.resolve(entry["puffin"]), "rb") as fh:
        fh.seek(int(entry["offset"]))
        payload = fh.read(int(entry["length"]))
    return parse_dv_payload(payload)
