"""Puffin statistics files — the public Iceberg sidecar format that
carries table-level statistics blobs (NDV sketches) referenced from the
metadata document's top-level ``statistics`` field.

Layout per the published Puffin spec (format-version 1):

    Magic  Blob₁ … Blobₙ  Footer
    Footer = Magic  FooterPayload  FooterStruct
    FooterStruct = PayloadSize(int32 LE)  Flags(4 bytes)  Magic
    Magic = 0x50 0x46 0x41 0x31  ("PFA1")

FooterPayload is the UTF-8 JSON ``{"blobs": [BlobMetadata…],
"properties": {...}}``; each BlobMetadata carries ``type``, ``fields``
(source field ids), ``snapshot-id``, ``sequence-number``, ``offset``,
``length`` and optional ``properties``. We write uncompressed payloads
and footer (all flag bits 0) — no codec dependency, and the files stay
byte-walkable by any reader.

Blob type note (documented deviation): the registered Puffin NDV blob is
``apache-datasketches-theta-v1``; our sketches are Apache DataSketches
HLL (Spark's ``hll_sketch_agg`` wire format), written with the type tag
``apache-datasketches-hll-v1`` and the spec-style ``ndv`` property on
the blob metadata — engines that plan from the ``ndv`` property (the
common CBO path) read it without touching the sketch bytes.

Reference grounding: this is the statistics surface iceberg-rs exposes
from the metadata document the reference round-trips (mod.rs:217-220).
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"


def write_puffin(
    path: str,
    blobs: list[dict],
    file_properties: dict[str, str] | None = None,
) -> tuple[int, int, list[dict]]:
    """Write a Puffin file. Each blob dict: ``{"type": str, "fields":
    [int], "snapshot-id": int, "sequence-number": int, "payload": bytes,
    "properties": {str: str}}``. Returns (file_size, footer_size,
    blob_metadata) — the sizes and the footer's blob-metadata list
    (with offsets/lengths) that the metadata ``statistics`` entry
    mirrors."""
    body = bytearray(MAGIC)
    meta = []
    for b in blobs:
        payload = b["payload"]
        meta.append(
            {
                "type": b["type"],
                "fields": list(b["fields"]),
                "snapshot-id": int(b["snapshot-id"]),
                "sequence-number": int(b["sequence-number"]),
                "offset": len(body),
                "length": len(payload),
                **({"properties": dict(b["properties"])} if b.get("properties") else {}),
            }
        )
        body += payload
    payload_json = json.dumps(
        {"blobs": meta, "properties": dict(file_properties or {})}
    ).encode("utf-8")
    footer = MAGIC + payload_json + struct.pack("<i", len(payload_json)) + b"\x00" * 4 + MAGIC
    with open(path, "wb") as fh:
        fh.write(bytes(body) + footer)
    return len(body) + len(footer), len(footer), meta


def read_puffin(path: str) -> tuple[list[dict], dict, dict[int, bytes]]:
    """Parse a Puffin file: returns (blob_metadata, file_properties,
    payloads keyed by blob index). Validates all three magics and the
    footer structure — a malformed file raises instead of misreading."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"puffin: bad leading/trailing magic in {path!r}")
    payload_size = struct.unpack("<i", data[-12:-8])[0]
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise ValueError("puffin: compressed footer payload not supported")
    payload_start = len(data) - 12 - payload_size
    if data[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError(f"puffin: bad footer magic in {path!r}")
    doc = json.loads(data[payload_start : payload_start + payload_size].decode("utf-8"))
    blobs = doc.get("blobs", [])
    payloads = {
        i: data[b["offset"] : b["offset"] + b["length"]] for i, b in enumerate(blobs)
    }
    return blobs, doc.get("properties", {}), payloads
